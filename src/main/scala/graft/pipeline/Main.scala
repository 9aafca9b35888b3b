package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's
  * (`/root/reference/src/pipeline.py:206-300`): input/output paths as
  * flags, `input side`/`input_side` fallback for the CSV, output dir
  * created, `--runner` repurposed as the Spark master.
  *
  * Usage:
  *   runMain graft.pipeline.Main \
  *     [--input_json_glob G] [--input_csv C] \
  *     [--output_folder output] [--output_prefix result] [--master local[*]]
  */
object Main {

  case class Args(
      inputJsonGlob: Option[String] = None,
      inputCsv: Option[String] = None,
      outputFolder: String = "output",
      outputPrefix: String = "result",
      master: String = "local[*]")

  def parseArgs(argv: Array[String]): Args = {
    @annotation.tailrec
    def go(rest: List[String], acc: Args): Args = rest match {
      case "--input_json_glob" :: v :: t => go(t, acc.copy(inputJsonGlob = Some(v)))
      case "--input_csv" :: v :: t => go(t, acc.copy(inputCsv = Some(v)))
      case "--output_folder" :: v :: t => go(t, acc.copy(outputFolder = v))
      case "--output_prefix" :: v :: t => go(t, acc.copy(outputPrefix = v))
      case "--master" :: v :: t => go(t, acc.copy(master = v))
      case "--runner" :: _ :: t => go(t, acc) // Beam compat: accepted, ignored
      case Nil => acc
      case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
    }
    go(argv.toList, Args())
  }

  /** Path resolution with the reference's `input side` fallback
    * (`/root/reference/src/pipeline.py:232-256`), relative to `root`.
    */
  def resolvePaths(root: String, a: Args): (String, String, String) = {
    val glob = a.inputJsonGlob.getOrElse(s"$root/input/*fan_engagement-000-of-001.json")
    val csv = a.inputCsv.getOrElse {
      val candidates = Seq(s"$root/input_side/country_data_v2.csv",
        s"$root/input side/country_data_v2.csv")
      candidates.find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        .getOrElse(candidates.head)
    }
    val outDir = s"$root/${a.outputFolder}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    (glob, csv, outDir)
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val (glob, csv, outDir) = resolvePaths(new java.io.File(".").getCanonicalPath, a)
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(a.master).appName("graft-fan-pipeline")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try FanPipeline.run(spark, glob, csv, outDir, a.outputPrefix)
    finally spark.stop()
  }
}
