package graft
import org.apache.spark.sql.SparkSession

/** Perf-iteration utility: times named queries over several repetitions
  * in one warm JVM, separating first-run (codegen/IO) cost from
  * steady-state. Usage: runMain graft.Profile <sfDir> <reps> <name...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // one shared config surface (GraftSession.tune); explicit partition
    // count override so local[N] and shuffle partitions stay in lockstep
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"$name FAILED: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
