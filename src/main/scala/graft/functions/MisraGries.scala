package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Exact heavy hitters in two scans: a Misra-Gries candidate pass, then
  * an exact re-count of the candidates.
  *
  * Pass 1 runs the Misra-Gries frequent-items sketch as a typed
  * `Aggregator`: O(k) counters per partition with map-side partial
  * aggregation, merged associatively (the mergeable-summaries rule: add
  * counters pointwise, then subtract the (k+1)-th largest count and drop
  * the non-positive). The sketch guarantees any token with true count
  * > n/(k+1) survives, so its ≤ k survivors are a SUPERSET of the heavy
  * hitters. Pass 2 collects the bounded candidate list (≤ k rows — the
  * same justified driver touch as the IVF centroids) and re-counts those
  * tokens exactly, keeping count > n/(k+1).
  *
  * The second pass is what makes the answer EXACT and oracle-checkable —
  * a one-pass sketch's counts carry up to n/(k+1) error each. This
  * candidate-then-verify shape is how exact heavy hitters are done at
  * 100 TB: a plain groupBy-count works until the key space explodes
  * (URLs, n-grams, user agents) and the shuffle carries the whole key
  * universe; here pass 1 shuffles O(k × partitions) no matter the
  * cardinality and pass 2 shuffles only rows matching ≤ k keys.
  */
object MisraGries {

  /** The MG update step, exposed for the property tests: increment a
    * live counter, open one if a slot is free, otherwise decrement all
    * (amortized O(1) — each decrement retires k+1 arrivals).
    */
  private[graft] def mgReduce(m: Map[String, Long], t: String, k: Int): Map[String, Long] =
    m.get(t) match {
      case Some(c) => m.updated(t, c + 1)
      case None if m.size < k => m.updated(t, 1L)
      case None => m.collect { case (s, c) if c > 1 => s -> (c - 1) }
    }

  /** The mergeable-summaries combine: add pointwise, then subtract the
    * (k+1)-th largest count and drop the non-positive — preserves the
    * "any item with true count > n/(k+1) survives" guarantee across
    * arbitrary partitionings.
    */
  private[graft] def mgMerge(x: Map[String, Long], y: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = (x.keySet ++ y.keySet).iterator
      .map(s => s -> (x.getOrElse(s, 0L) + y.getOrElse(s, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (s, c) if c > cut => s -> (c - cut) }
    }
  }

  /** Heavy-hitter tokens over `documents.text`: every token whose
    * frequency exceeds n_tokens/(k+1), with its exact count.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .as[String]

    // buffer = (MG counters, exact running n) so the total token count
    // rides along in the same scan instead of costing a third pass
    val sketch = new Aggregator[String, (Map[String, Long], Long), (Map[String, Long], Long)] {
      override def zero: (Map[String, Long], Long) = (Map.empty, 0L)
      override def reduce(b: (Map[String, Long], Long), t: String): (Map[String, Long], Long) =
        (mgReduce(b._1, t, k), b._2 + 1)
      override def merge(x: (Map[String, Long], Long), y: (Map[String, Long], Long)): (Map[String, Long], Long) =
        (mgMerge(x._1, y._1, k), x._2 + y._2)
      override def finish(b: (Map[String, Long], Long)): (Map[String, Long], Long) = b
      // session-free encoders: resolving these through `spark.implicits`
      // makes the anon Aggregator capture the SparkSession, which stops
      // serializing once anything (e.g. Dataset.observe) initializes the
      // session's lazy non-serializable ObservationManager field
      override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
        ExpressionEncoder[(Map[String, Long], Long)]()
      override def outputEncoder: Encoder[(Map[String, Long], Long)] =
        ExpressionEncoder[(Map[String, Long], Long)]()
    }

    val (candidates, total) = toks.select(sketch.toColumn).head()
    val threshold = total.toDouble / (k + 1)
    toks.toDF("token")
      .filter(col("token").isin(candidates.keys.toSeq.map(x => x: Any): _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
  }
}
