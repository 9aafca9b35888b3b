package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.{Roundtrip, Tables}

/** The Spark-4 language/source surface added in round 8: VARIANT typed
  * extraction, collated grouping, recursive CTEs, SQL-body UDFs, and the
  * XML source — each pinned by a driver-side recompute of the semantics
  * (the DuckDB oracle already hash-pins the full result sets).
  */
class Spark4SurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("variant: typed path extraction round-trips every source column losslessly") {
    val out = Relational.variantFunctions(spark, TestSpark.sf0001)
    val base = Tables(spark, TestSpark.sf0001, "events")
      .selectExpr("event_id", "CAST(get_json_object(props, '$.k') AS LONG) AS k",
        "event_type AS etype", "value AS v", "user_id AS tag")
    // exact frame equality including double bits and nulls
    assert(out.count() == base.count() && out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
  }

  test("collation: case-mangled segments group case-insensitively back to 5 groups") {
    val out = Relational.collatedSegments(spark, TestSpark.sf0001).collect()
    val nCustomers = Tables(spark, TestSpark.sf0001, "customer").count()
    assert(out.length == 5) // 10 case variants fold to 5 collated groups
    assert(out.map(_.getLong(1)).sum == nCustomers)
    assert(out.forall(r => r.getString(0) == r.getString(0).toLowerCase))
  }

  test("recursive CTE: path counts equal a driver BFS walk count over the same edges") {
    val events = Tables(spark, TestSpark.sf0001, "events")
      // events.ts is TIMESTAMP_NTZ; epoch micros give a plain sortable long
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tsu", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val edges = events.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.toSet
    // count walks from 'signup' of length <= 3 by dynamic programming
    var frontier = Map("signup" -> 1L)
    val expected = scala.collection.mutable.Map(("signup", 0) -> 1L)
    for (depth <- 1 to 3) {
      frontier = frontier.toSeq
        .flatMap { case (t, n) => edges.collect { case (`t`, next) => next -> n } }
        .groupBy(_._1).map { case (t, ns) => t -> ns.map(_._2).sum }
      frontier.foreach { case (t, n) => expected((t, depth)) = n }
    }
    val got = Relational.sqlRecursivePaths(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected.toMap)
  }

  test("sql udf: the catalog function computes the inlined body") {
    val out = Relational.sqlScalarUdf(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val inlined = Tables(spark, TestSpark.sf0001, "orders")
      .selectExpr("substr(o_orderpriority, instr(o_orderpriority, '-') + 1) AS pclass",
        "o_totalprice")
      .groupBy($"pclass")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum($"o_totalprice".cast("decimal(12,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == inlined && out.keySet ==
      Set("URGENT", "HIGH", "MEDIUM", "NOT SPECIFIED", "LOW"))
  }

  test("xml roundtrip: aggregate through XML equals aggregate over parquet") {
    val viaXml = Roundtrip.xmlParts(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Tables(spark, TestSpark.sf0001, "part")
      .groupBy($"p_brand")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum($"p_retailprice".cast("decimal(12,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaXml == direct && viaXml.nonEmpty)
  }
}
