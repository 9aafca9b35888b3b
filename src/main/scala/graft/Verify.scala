package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Also writes
  * queries.json (the declared query manifest) and _failures.json so a
  * query that throws shows up as a FAIL instead of silently vanishing
  * from the dump set (ADVICE r01).
  */
object Verify {
  import JsonText.{quote => q}

  /** The driver loads each dump into pandas and sorts rows; struct/map/
    * array columns arrive as unhashable dict/list values and crash the
    * sort (r01: q_pipeline_parity's LocationData). Serialize any nested
    * column to its JSON text — deterministic, and no oracle'd query
    * returns a nested type, so hash-compares are unaffected.
    */
  private def flattenNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: MapType | _: ArrayType => to_json(col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // one shared config surface (GraftSession.tune); explicit partition
    // count override so local[N] and shuffle partitions stay in lockstep
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // dev loop only: SPARK_GRAFT_ONLY=q_a,q_b dumps a subset; the driver
    // sets no env so it always gets the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // fail fast on a typo'd name: a silent no-match sweep would exit
    // green with zero dumps and read as a pass (ADVICE r08)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try flattenNested(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(500)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // the manifest and oracle set honor the same filter as the dumps —
    // otherwise a SPARK_GRAFT_ONLY dev run declares the full surface and
    // compare_oracle.py drowns the one result in MISSING-DUMP failures
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      SparkEntry.queries.keys.filter(k => only.forall(_.contains(k)))
        .toSeq.sorted.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/_failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // cautionary-plan tags: which queries are kept as measurable
    // scale-antipattern twins, and which sibling is the production plan
    Files.writeString(Paths.get(s"$outDir/query_meta.json"),
      SparkEntry.cautionary
        .map { case (k, twin) =>
          s"${q(k)}: {${q("cautionary")}: true, ${q("production_twin")}: ${q(twin)}}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
