package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_SF_DIR` and prints ONE bare JSON line on stdout (the
  * driver parses it into BENCH_r{N}.json — build.sbt's StdoutOutput
  * keeps sbt from prefixing it). A failed query is reported as -1 in
  * `queries` and listed in `errors` instead of being silently timed as
  * a fast pass.
  */
object Bench {
  import JsonText.{quote => jstr}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // one shared config surface (GraftSession.tune); explicit partition
    // count override so local[N] and shuffle partitions stay in lockstep
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warmup so startup cost isn't billed to the first query
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(300)
          System.err.println(s"[bench] $name FAILED")
          e.printStackTrace()
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) =>
      s"${jstr(k)}:${if (errors.contains(k)) -1.0 else v}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    val errJson = errors.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
