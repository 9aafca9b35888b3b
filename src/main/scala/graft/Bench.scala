package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_SF_DIR` and prints two bare JSON lines on stdout
  * (build.sbt's StdoutOutput keeps sbt from prefixing them):
  *
  *   1. a LONG detail line with per-query median timings (`queries`),
  *      per-query spreads (`runs` omitted to stay line-bounded) and
  *      error messages — useful to humans, may be tail-truncated by
  *      the driver;
  *   2. a SHORT summary line — `{"metric":"total",...}` — printed
  *      LAST so it survives the driver's tail truncation (rounds 1-3
  *      produced `parsed: null` because the total sat at the head of
  *      the one long line).
  *
  * Each query runs `SPARK_GRAFT_REPS` times (default 3) and reports
  * the MEDIAN: single-shot numbers on this host swing up to ±7× on
  * identical binaries (r2→r3 evidence in VERDICT.md). A failed query
  * is reported as -1 and listed in `errors` instead of being silently
  * timed as a fast pass.
  */
object Bench {
  import JsonText.{quote => jstr}

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) -1.0 else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
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
      val times = (1 to reps).flatMap { _ =>
        if (errors.contains(name)) None // don't re-run a query that already failed
        else {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(300)
              System.err.println(s"[bench] $name FAILED")
              e.printStackTrace()
              None
          }
        }
      }
      name -> median(times)
    }
    val qs = results.map { case (k, v) =>
      s"${jstr(k)}:${if (errors.contains(k)) -1.0 else v}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    val errJson = errors.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }.mkString("{", ",", "}")
    // long human/detail line first (may be truncated by the driver)...
    println(s"""{"metric":"detail","reps":$reps,"queries":$qs,"errors":$errJson,"sf":${jstr(sfDir)}}""")
    // ...short machine line LAST so tail truncation can't eat it
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"reps":$reps,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
