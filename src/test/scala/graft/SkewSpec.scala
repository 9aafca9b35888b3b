package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted join / skew-safe aggregation: equivalence to the plain
  * formulation on a pathologically skewed key distribution.
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("saltedJoin equals plain join on 95%-hot-key data") {
    import spark.implicits._
    // 10k rows, 95% key=7
    val big = spark.range(10000)
      .select((when(pmod(col("id"), lit(20)) < 19, 7L).otherwise(pmod(col("id"), lit(5)))).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (4L, "e"), (7L, "hot")).toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", "sk")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("skewSafeDistinctCount equals plain countDistinct") {
    val events = graft.sources.Tables(spark, TestSpark.sf0001, "events")
    val plain = events.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_distinct"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val safe = Skew.skewSafeDistinctCount(events, col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(safe == plain)
  }
}
