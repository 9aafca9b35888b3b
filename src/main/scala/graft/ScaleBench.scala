package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Dedup, Relational, Similarity, TextAnalysis}

/** Data-dominated scale proof (VERDICT r6 #1): the sf0.1 bench measures
  * mostly per-query fixed cost (scheduling, codegen, micro-batch
  * machinery), so it cannot distinguish "scales linearly" from "constant
  * overhead". This main self-replicates the sf0.1 tables `factor`× into a
  * work dir and times the 10 data-dominated queries at 1× and factor×,
  * interleaved pairwise with the same pinned calibration probe Bench
  * uses, printing per-query ratios. ~`factor`× growth (or less, as fixed
  * cost amortizes) on rising data is the empirical evidence behind
  * PLANS.md's 100 TB projections.
  *
  * Replication must not manufacture pathological self-similarity — 10
  * byte-identical copies of every document would turn near-dup queries
  * into |copies|² pair explosions that say nothing about engine scaling
  * (real 10× corpora are 10× more DISTINCT data). So each replica is
  * decorrelated, preserving per-row size and distribution shape:
  *  - lineitem: `l_orderkey` offset per replica (columns used by the
  *    scan/agg/sort queries are key-independent);
  *  - documents: `doc_id` offset + per-replica Caesar rotation of the
  *    text (byte/length/entropy distributions survive; shingles and
  *    MinHash signatures decorrelate, so near-dup structure per replica
  *    matches the original's);
  *  - embeddings: `vec_id` offset + per-replica circular shift of the
  *    vector dims (orthogonal transform: intra-replica geometry is
  *    EXACTLY preserved, cross-replica cosines decorrelate);
  *  - events: `event_id`/`user_id` offsets — replica users are new
  *    users, so per-user session/funnel structure is preserved while
  *    user-partition fan-out grows with the factor.
  *
  * q_ann_selfjoin additionally follows its own documented scale path:
  * `bitsPerTable` grows with log2(corpus) so LSH bucket occupancy stays
  * constant — the knob a real deployment turns as the corpus grows
  * (see `Similarity.annSelfJoin`). Every other query runs unmodified.
  */
object ScaleBench {
  import JsonText.{quote => jstr}

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Decorrelated `factor`× replication of the four tables the
    * data-dominated queries read. Idempotent via a marker file (version
    * suffix v2: pre-events replicas must regenerate).
    */
  def replicate(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_SCALE_READY_v2_$factor")
    if (marker.exists()) return

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val okSpan = li.agg(max(col("l_orderkey"))).collect()(0).getLong(0) + 1
    (0 until factor).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * okSpan))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docSpan = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val lower = "abcdefghijklmnopqrstuvwxyz"
    (0 until factor).map { i =>
      val rot = i % 26
      val shifted = lower.drop(rot) + lower.take(rot)
      docs
        .withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text",
          if (rot == 0) col("text")
          else translate(col("text"), lower + lower.toUpperCase,
            shifted + shifted.toUpperCase))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecSpan = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    (0 until factor).map { i =>
      val shift = (i * 13) % dim
      emb
        .withColumn("vec_id", col("vec_id") + lit(i * vecSpan))
        .withColumn("embedding",
          if (shift == 0) col("embedding")
          else concat(slice(col("embedding"), shift + 1, dim - shift),
            slice(col("embedding"), 1, shift)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events: replica users are NEW users (user_id offset), so per-user
    // session/funnel structure inside each replica matches the original
    // exactly while total user count — and with it the window/shuffle
    // fan-out — grows with the factor (ts stays raw nanos; Tables
    // converts at read)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val evSpan = ev.agg(max(col("event_id"))).collect()(0).getLong(0) + 1
    val userSpan = ev.agg(max(col("user_id"))).collect()(0).getLong(0) + 1
    (0 until factor).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * evSpan))
        .withColumn("user_id", col("user_id") + lit(i * userSpan))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    marker.createNewFile()
    ()
  }

  /** The 13 data-dominated queries; the Int is the scale factor of the dir
    * being read (only q_ann_selfjoin uses it, for its log2 bits knob).
    */
  private def targets: Seq[(String, (SparkSession, String, Int) => DataFrame)] = Seq(
    "q_pricing_summary" -> ((s, d, _) => Relational.pricingSummary(s, d)),
    "q_filter_project" -> ((s, d, _) => Relational.filterProject(s, d)),
    "q_global_sort" -> ((s, d, _) => Relational.globalSortLineitems(s, d)),
    "q_dedup_survivors" -> ((s, d, _) => Dedup.exactDedupSurvivors(s, d)),
    "q_byte_entropy" -> ((s, d, _) => TextAnalysis.byteEntropy(s, d)),
    "q_minhash_neardups" -> ((s, d, _) => Dedup.minhashNearDups(s, d)),
    "q_split_assign" -> ((s, d, _) => TextAnalysis.deterministicSplit(s, d)),
    // window-function + user-keyed-join families (r7 analytics adds):
    // sort/state per user partition, joins exchanging |users| rows
    "q_sessionize" -> ((s, d, _) => Analytics.sessionize(s, d)),
    "q_funnel" -> ((s, d, _) => Analytics.funnelConversion(s, d)),
    // corpus-hygiene family (late r7 adds): decontaminate is a per-doc
    // distinct + broadcast digest probe (Caesar-rotated replicas keep the
    // per-replica contamination rate constant); heavy hitters is the O(k)
    // sketch scan + bounded re-count (rotation disjoins replica vocabs, so
    // the n/(k+1) bar rises with n — the timed work is the two scans);
    // zorder is the 1-row bounds pass + a pure codegen'd projection
    // the buffering-vs-bounded-state exact-quantile pair: percentile_cont
    // holds each group's whole multiset in one reducer, the distributed
    // form holds one range slice per task — same numbers, different
    // memory story as groups grow
    "q_percentiles" -> ((s, d, _) => Relational.percentiles(s, d)),
    "q_percentiles_dist" -> ((s, d, _) => Relational.distributedPercentiles(s, d)),
    "q_decontaminate" -> ((s, d, _) => TextAnalysis.decontaminate(s, d)),
    "q_heavy_hitters" -> ((s, d, _) => graft.functions.MisraGries.heavyHitters(s, d)),
    "q_zorder" -> ((s, d, _) => graft.operators.ZOrder.zValuedEvents(s, d)),
    // streaming replays: the events replica multiplies USERS (new ids per
    // replica), so windowed-aggregate and per-user state-store volume both
    // grow with the factor — this measures the state path, not just the
    // scan (micro-batch machinery is the constant term)
    "q_stream_tumbling" -> ((s, d, _) => graft.streaming.Streaming.tumblingCounts(s, d)),
    "q_stream_stateful" -> ((s, d, _) => graft.streaming.Streaming.statefulUserTotals(s, d)),
    // default -1 = the operator's own self-scaling bits (log2 of corpus
    // count, constant occupancy) — the production path; SCALE_ANN_BITS
    // overrides for occupancy-vs-cost experiments
    "q_ann_selfjoin" -> ((s, d, _) => Similarity.annSelfJoin(s, d,
      bitsPerTable = sys.env.get("SCALE_ANN_BITS").map(_.toInt).getOrElse(-1))))

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft-scale")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.register(spark)

    replicate(spark, sfDir, workDir, factor)

    // warm JIT/codegen paths on the small side before timing anything
    try force(SparkEntry.entry(spark)) catch { case _: Throwable => () }

    val calibTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def runCalib(): Unit = {
      val t0 = System.nanoTime()
      // same pinned probe as Bench (same code path, via SparkEntry's q1
      // shape would drift — call Bench's own impl)
      try { Bench.calibrationProbe(spark, sfDir); calibTimes += (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => () }
    }

    def time(fn: (SparkSession, String, Int) => DataFrame, dir: String, f: Int): Double =
      median((1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, dir, f))
        (System.nanoTime() - t0) / 1e9
      })

    def r4(x: Double): Double = math.rint(x * 10000) / 10000
    // SCALE_ONLY=q_a,q_b restricts the sweep; SCALE_ANN_BITS overrides
    // the ANN bits knob — for occupancy-vs-cost experiments
    val only = sys.env.get("SCALE_ONLY").map(_.split(",").toSet)
    // q_percentiles (the buffering twin) is MEASURED to OOM the JVM at
    // 100× (BASELINE.md) — that demonstration is q_percentiles_dist's
    // reason to exist, but it must not kill an unattended full sweep;
    // an explicit SCALE_ONLY still runs it at any factor
    val skipAtScale = if (factor > 10) Set("q_percentiles") else Set.empty[String]
    val rows = targets
      .filter(t => only.map(_(t._1)).getOrElse(!skipAtScale(t._1)))
      .map { case (name, fn) =>
      runCalib()
      val t1 = time(fn, sfDir, 1)
      val tN = time(fn, workDir, factor)
      (name, t1, tN)
    }
    runCalib()
    val oneX = rows.map { case (n, t1, _) => s"${jstr(n)}:${r4(t1)}" }.mkString("{", ",", "}")
    val nX = rows.map { case (n, _, tN) => s"${jstr(n)}:${r4(tN)}" }.mkString("{", ",", "}")
    val ratio = rows.map { case (n, t1, tN) =>
      s"${jstr(n)}:${r4(if (t1 > 0) tN / t1 else -1)}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale","factor":$factor,"reps":$reps,"t_1x":$oneX,"t_${factor}x":$nX,"ratio":$ratio,"calib_runs":${calibTimes.map(r4).mkString("[", ",", "]")},"calib":${r4(median(calibTimes.toSeq))},"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
