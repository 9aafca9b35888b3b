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
/** One-shot crash injector for the recovery test: armed in the JVM the
  * local executors share, throws exactly once mid-batch, then disarms so
  * the checkpoint restart can replay the same file successfully.
  */
object CrashOnce {
  @volatile var armed = false
  def boom(k: String): Boolean = {
    if (armed && k == "poison") {
      armed = false
      throw new RuntimeException("injected mid-replay crash")
    }
    true
  }
}

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

  /** Exactly-once under a mid-replay CRASH: batch 2 dies from an injected
    * task failure (not a graceful stop), the query is restarted from the
    * same checkpoint, and the file sink's `_spark_metadata`-filtered view
    * must equal the batch oracle with no duplicate or missing windows —
    * even though the failed batch may have left stray part files behind.
    */
  test("file-sink watermarked agg is exactly-once across a mid-replay crash") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-crash-src-").toString
    val ckpt = Files.createTempDirectory("graft-crash-ckpt-").toString
    val out = Files.createTempDirectory("graft-crash-out-").toString

    def addFile(name: String, rows: Seq[(Timestamp, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft-crash-stage-").toString
      rows.toDF("ts", "k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
      Files.move(part, java.nio.file.Paths.get(src, name))
    }
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

    // 3 files -> 3 micro-batches (maxFilesPerTrigger=1); the poison row
    // rides in file 2 so the crash lands mid-replay, after batch 1 commits
    addFile("f1.parquet", Seq((t("10:00"), "x"), (t("10:07"), "x"), (t("10:31"), "x")))
    addFile("f2.parquet", Seq((t("10:26"), "x"), (t("10:33"), "poison"), (t("10:52"), "x")))
    addFile("f3.parquet", Seq((t("10:41"), "x"), (t("11:30"), "x")))

    val boomUdf = udf(CrashOnce.boom _)
    def runOnce(): Unit = {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("ts", org.apache.spark.sql.types.TimestampType)
        .add("k", org.apache.spark.sql.types.StringType)
      val agg = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "10 minutes")
        .filter(boomUdf(col("k")))
        .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string").as("ws"), col("n"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    CrashOnce.armed = true
    val crash = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    assert(crash.getMessage.contains("injected") ||
      Option(crash.getCause).exists(_.toString.contains("injected")), crash.getMessage)
    assert(!CrashOnce.armed, "poison batch never executed — crash was not mid-replay")

    runOnce() // restart from the same checkpoint; replays batch 2, then 3

    // batch oracle: same agg over ALL rows in batch mode, append-closed
    // windows only (window.end <= final watermark = max(ts) - 10 min)
    val all = spark.read.schema(
        new org.apache.spark.sql.types.StructType()
          .add("ts", org.apache.spark.sql.types.TimestampType)
          .add("k", org.apache.spark.sql.types.StringType))
      .parquet(src)
    val maxTs = all.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val wmMillis = maxTs.getTime - 10 * 60 * 1000
    val expected = all
      .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
      .filter(col("window.end").cast("long") * 1000 <= wmMillis)
      .select(col("window.start").cast("string").as("ws"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // the read goes through _spark_metadata: only COMMITTED batches are
    // visible, so the crashed attempt's stray files (if any) are ignored
    val sinkRows = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sinkRows.length == sinkRows.toSet.size,
      s"duplicate rows in sink after crash-restart: ${sinkRows.toList.sorted}")
    assert(sinkRows.toSet == expected,
      s"sink ${sinkRows.toList.sorted} != batch oracle ${expected.toList.sorted}")
    assert(Files.exists(java.nio.file.Paths.get(out, "_spark_metadata")),
      "file sink wrote no transaction log")
  }

  /** The arbitrary-state path under failure: a mid-batch crash must roll
    * the RocksDB state store back to the last committed version, so the
    * restarted batch replays against batch-1 state — double-counting the
    * crashed attempt's partial updates is exactly what the store's
    * versioned commits exist to prevent.
    */
  test("transformWithState (RocksDB) totals are exactly-once across a mid-replay crash") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    val src = Files.createTempDirectory("graft-twscrash-src-").toString
    val ckpt = Files.createTempDirectory("graft-twscrash-ckpt-").toString

    def addFile(name: String, rows: Seq[(String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft-twscrash-stage-").toString
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
      Files.move(part, java.nio.file.Paths.get(src, name))
    }
    // poison rides in file 2: batch 1 commits state, the crash lands on
    // batch 2, the restart must replay batch 2 from batch-1 state
    addFile("f1.parquet", Seq(("a", 1L), ("b", 10L), ("a", 2L)))
    addFile("f2.parquet", Seq(("a", 4L), ("poison", 100L), ("b", 20L)))
    addFile("f3.parquet", Seq(("b", 30L), ("c", 7L)))

    class Totals extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), (String, Long, Long)] {
      @transient private var st: ValueState[(Long, Long)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long)]("t",
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong),
          TTLConfig.NONE)
      override def handleInputRows(k: String, rows: Iterator[(String, Long)],
          tv: TimerValues): Iterator[(String, Long, Long)] = {
        var (n, s) = if (st.exists()) st.get() else (0L, 0L)
        rows.foreach { r => n += 1; s += r._2 }
        st.update((n, s))
        Iterator.single((k, n, s))
      }
    }

    val boomUdf = udf(CrashOnce.boom _)
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val finalTotals = scala.collection.mutable.Map[String, (Long, Long)]()
    def runOnce(): Unit = {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.StringType)
        .add("v", org.apache.spark.sql.types.LongType)
      val updated = session.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(boomUdf(col("k")))
        .as[(String, Long)]
        .groupByKey(_._1)
        .transformWithState(new Totals, TimeMode.None(), OutputMode.Update())
      val q = updated.toDF("k", "n", "total").writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r =>
            finalTotals(r.getString(0)) = (r.getLong(1), r.getLong(2)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    CrashOnce.armed = true
    val crash = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    assert(crash.getMessage.contains("injected") ||
      Option(crash.getCause).exists(_.toString.contains("injected")), crash.getMessage)
    assert(!CrashOnce.armed, "poison batch never executed — crash was not mid-replay")

    runOnce() // restart: batch 2 must replay against batch-1 state

    val expected = Map(
      "a" -> (3L, 7L), // 1+2 then +4 — NOT 4 rows / 11 (double-count)
      "b" -> (3L, 60L),
      "c" -> (1L, 7L),
      "poison" -> (1L, 100L))
    assert(finalTotals.toMap == expected,
      s"state not exactly-once after crash-restart: $finalTotals vs $expected")
  }
}
