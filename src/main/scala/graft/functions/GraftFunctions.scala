package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Column-level entry points for graft's custom Catalyst expressions, plus
  * SQL registration. Keep every custom scalar here so sessions register one
  * set of functions.
  */
object GraftFunctions {

  /** `standardize_race_id` as a native codegen'd Catalyst expression. */
  def standardize_race_id(c: Column): Column =
    ColumnBridge.column(StandardizeRaceId(ColumnBridge.expression(c)))

  /** Same semantics as [[standardize_race_id]] but composed purely from
    * built-in Column functions — the differential-test partner for the
    * custom expression (SURVEY §4.2) and proof the op needs no UDF at all.
    */
  def standardizeRaceIdColumns(c: Column): Column = {
    val t = trim(c)
    val word = lower(regexp_replace(t, "[^A-Za-z]+", ""))
    val digits = regexp_replace(t, "[^0-9]+", "")
    when(length(word) > 0 && length(digits) > 0, concat(word, digits))
      .otherwise(lower(regexp_replace(t, "[^0-9a-zA-Z]+", "")))
  }

  /** The same normalization as a classic Scala UDF — the general escape
    * hatch when logic can't be a Column expression. Exists to complete the
    * UDF surface (and as a benchmark foil: the Expression version stays in
    * codegen, this one pays serialization per row — prefer the Expression).
    */
  val standardizeRaceIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) null else StandardizeRaceId.normalize(s))

  /** Deterministic hash bucket in [0, buckets): first 8 hex digits of
    * md5(key as string). THE shared contract for reproducible splits and
    * samples (`TextAnalysis.deterministicSplit`, `Sampling`) — every
    * DuckDB oracle replicates this exact arithmetic, so there must be
    * one copy of it.
    */
  def md5Bucket(key: Column, buckets: Int = 10000): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  // mirror of GraftExtensions' arity guard: wrong-arity SQL calls get an
  // invalid-arguments message, not an IndexOutOfBoundsException
  private def arity[A](name: String, exprs: Seq[A], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: expected $n, got ${exprs.length}")

  /** Register all custom functions for SQL use (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "standardize_race_id",
      exprs => { arity("standardize_race_id", exprs, 1); StandardizeRaceId(exprs.head) },
      "scala_udf")
    spark.udf.register("standardize_race_id_udf", standardizeRaceIdUdf)
    // SQL text surface for the vector expression: SELECT dot_product(a, b)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => { arity("dot_product", exprs, 2); DotProduct(exprs.head, exprs(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => { arity("jaro_winkler", exprs, 2)
        JaroWinklerSimilarity(exprs.head, exprs(1)) },
      "scala_udf")
    // Spark's runtime-filter bloom pair, surfaced as SQL text: the engine
    // ships them only as internal expressions (InjectRuntimeFilter plants
    // them), but the explicit semi-join-reduction verb needs them callable —
    // build the filter with one distributed aggregate, probe it map-side
    // via a scalar subquery (BloomFilterMightContain accepts exactly
    // foldables and subqueries, so the probe never needs a driver literal).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => { arity("graft_bloom_agg", exprs, 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1), exprs(2)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => { arity("graft_might_contain", exprs, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1)) },
      "scala_udf")
  }
}
