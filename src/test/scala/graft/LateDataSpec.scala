package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Watermark late-data semantics across a genuine batch boundary: the
  * watermark is persisted in the checkpoint, so an event older than it
  * arriving in a LATER run is dropped — its window never materializes in
  * append mode. (A single AvailableNow replay can't show this: within one
  * first batch the watermark is still 0 and nothing is late.)
  */
class LateDataSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("event beyond the checkpointed watermark is dropped on restart") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-late-src-").toString
    val ckpt = Files.createTempDirectory("graft-late-ckpt-").toString

    def addFile(name: String, rows: Seq[(Timestamp, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft-late-stage-").toString
      rows.toDF("ts", "k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
      Files.move(part, java.nio.file.Paths.get(src, name))
    }

    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

    def runOnce(): Set[String] = {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("ts", org.apache.spark.sql.types.TimestampType)
        .add("k", org.apache.spark.sql.types.StringType)
      val agg: DataFrame = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
      val got = scala.collection.mutable.Set[String]()
      // foreachBatch sink: supports checkpoint recovery (memory doesn't)
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .foreachBatch { (df: DataFrame, _: Long) =>
          got ++= df.select(col("window.start").cast("string"))
            .collect().map(_.getString(0))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSet
    }

    // run 1: on-time events → watermark ends at 10:31 − 10 min = 10:21
    addFile("a.parquet", Seq((t("10:00"), "x"), (t("10:07"), "x"), (t("10:31"), "x")))
    val run1 = runOnce()
    assert(run1 == Set("2024-01-01 10:00:00", "2024-01-01 10:05:00"), run1)

    // run 2 (same checkpoint → watermark restored): 09:00 is far older
    // than the watermark → dropped; 10:25 on-time; 10:50 advances the
    // watermark to 10:40, closing the 10:25 and 10:30 windows
    addFile("b.parquet", Seq((t("09:00"), "late"), (t("10:25"), "x"), (t("10:50"), "x")))
    val run2 = runOnce()
    assert(run2.contains("2024-01-01 10:25:00"), run2)
    assert(run2.contains("2024-01-01 10:30:00"), run2)
    assert(!run2.exists(_.startsWith("2024-01-01 09:")), s"late data leaked: $run2")
  }
}
