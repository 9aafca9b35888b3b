package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Spatial radius join by grid bucketing — the planar candidate-join
  * every distributed geo pipeline starts from (geohash/S2 cells are this
  * verb with a spherical cell function; the join topology is identical).
  *
  * The testdata has no coordinates, so each entity gets a DETERMINISTIC
  * synthetic position on a 10000×10000 integer grid from the shared md5
  * arithmetic (`GraftFunctions.md5Bucket` — the same contract the split/
  * sampling oracles replicate). Integer coordinates keep every distance
  * comparison exact on both engines: the predicate is squared euclidean
  * `dx² + dy² ≤ r²` in BIGINT, no trig, no doubles, no boundary ulps.
  */
object Geo {

  private def coord(key: Column, salt: String): Column =
    graft.functions.GraftFunctions.md5Bucket(concat(key.cast("string"), lit(salt)))
      .cast("bigint")

  /** All (customer, supplier) pairs within `radius` grid units, by
    * cell-bucketed equi-join: each customer maps to its `radius`-sized
    * cell ONCE; each supplier explodes to its 3×3 cell neighborhood
    * (any point within `radius` of it lies in one of those cells —
    * explode the SMALL side, scan the big side once); the join is then
    * a pure (cx, cy) hash equi-join with the exact integer distance
    * check as a post-filter. Nothing is ever all-pairs: candidate
    * fan-out is bounded by cell occupancy, the same skew logic as the
    * LSH bucket joins (a degenerate cell would cap the same way).
    * At 100 TB both sides shuffle by cell — no broadcast needed, though
    * Catalyst will broadcast the exploded dim here since it is tiny.
    */
  def customersNearSuppliers(spark: SparkSession, dir: String,
      radius: Int = 400): DataFrame = {
    val r2 = radius.toLong * radius
    val cust = Tables(spark, dir, "customer").select(
      col("c_custkey"),
      coord(col("c_custkey"), "cx").as("x"),
      coord(col("c_custkey"), "cy").as("y"))
      .withColumn("cx", floor(col("x") / radius))
      .withColumn("cy", floor(col("y") / radius))
    val supp = Tables(spark, dir, "supplier").select(
      col("s_suppkey"),
      coord(col("s_suppkey"), "sx").as("sx"),
      coord(col("s_suppkey"), "sy").as("sy"))
      .withColumn("dxy", explode(array((for {
        dx <- -1 to 1; dy <- -1 to 1
      } yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .withColumn("cx", floor(col("sx") / radius) + col("dxy.dx"))
      .withColumn("cy", floor(col("sy") / radius) + col("dxy.dy"))
      .drop("dxy")
    cust.join(supp, Seq("cx", "cy"))
      .filter((col("x") - col("sx")) * (col("x") - col("sx")) +
        (col("y") - col("sy")) * (col("y") - col("sy")) <= r2)
      .select(col("c_custkey"), col("s_suppkey"),
        ((col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy"))).as("dist2"))
  }
}
