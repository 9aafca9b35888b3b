package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Drift, Quantization, Stats, TextAnalysis}

/** Semantics pins for the drift/fit tier (PSI, JSD, chi-square, OLS,
  * feature hashing, JL projection): bounds the statistics must satisfy,
  * plus driver recomputes of the closed forms from the raw rows — the
  * invariants the hash-match oracle can't state.
  */
class DriftSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf0001

  test("psi: nonnegative per type, halves partition the non-null rows") {
    val rows = Drift.psiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    // each PSI term (p_cur - p_ref)·ln(p_cur/p_ref) has matching signs:
    // the total is ≥ 0, with equality iff the smoothed histograms agree
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"negative PSI: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, s"empty side: $r")
    }
    val total = graft.sources.Tables(spark, sf, "events")
      .filter(col("value").isNotNull).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "ref+cur must partition the non-null event rows")
  }

  test("jsd: within [0, ln 2], matches a driver recompute") {
    val out = Drift.jsDivergence(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val jsd = r.getDouble(3)
    assert(jsd >= 0.0 && jsd <= math.log(2) + 1e-9, s"JSD out of range: $jsd")
    // recompute from raw counts
    val counts = graft.sources.Tables(spark, sf, "events")
      .select(col("event_type"), (pmod(col("user_id"), lit(2)) === 0).as("a"))
      .groupBy(col("event_type"), col("a")).count().collect()
      .map(x => (x.getString(0), x.getBoolean(1)) -> x.getLong(2)).toMap
    val types = counts.keys.map(_._1).toSeq.distinct
    val na = types.map(t => counts.getOrElse((t, true), 0L)).sum.toDouble
    val nb = types.map(t => counts.getOrElse((t, false), 0L)).sum.toDouble
    val expect = types.map { t =>
      val p = counts.getOrElse((t, true), 0L) / na
      val q = counts.getOrElse((t, false), 0L) / nb
      val m = (p + q) / 2
      (if (p > 0) p * math.log(p / m) / 2 else 0.0) +
        (if (q > 0) q * math.log(q / m) / 2 else 0.0)
    }.sum
    assert(math.abs(jsd - expect) < 1e-6, s"jsd $jsd != recompute $expect")
  }

  test("chi2: matches a driver recompute over the full marginals grid") {
    val out = Drift.chi2Independence(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("lang"), col("source")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = docs.length.toDouble
    val langs = docs.map(_._1).distinct
    val sources = docs.map(_._2).distinct
    val expect = (for (l <- langs; s <- sources) yield {
      val o = docs.count(d => d == ((l, s))).toDouble
      val e = docs.count(_._1 == l) * docs.count(_._2 == s) / n
      (o - e) * (o - e) / e
    }).sum
    assert(r.getLong(0) == docs.length)
    assert(r.getLong(3) == (langs.length - 1).toLong * (sources.length - 1),
      "df = (r-1)(c-1)")
    assert(math.abs(r.getDouble(4) - expect) < 1e-5,
      s"chi2 ${r.getDouble(4)} != recompute $expect")
  }

  test("cramers v: normalizes its own chi2 into [0,1] by the closed form") {
    val chi = Drift.chi2Independence(spark, sf).collect().head
    val v = Drift.cramersV(spark, sf).collect().head
    assert(v.getDouble(3) == chi.getDouble(4), "V must carry the same chi2")
    val k = math.min(chi.getLong(1) - 1, chi.getLong(2) - 1).toDouble
    val expect = math.sqrt(chi.getDouble(4) / (chi.getLong(0) * k))
    assert(math.abs(v.getAs[Double]("cramers_v") - expect) < 1e-6)
    assert(v.getAs[Double]("cramers_v") >= 0 && v.getAs[Double]("cramers_v") <= 1)
  }

  test("ols: agrees with Spark's own covar/var/corr closed forms") {
    val fits = Stats.olsRegression(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fits.nonEmpty)
    val direct = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        (covar_samp(col("l_quantity"), col("l_extendedprice")) /
          var_samp(col("l_quantity"))).as("slope"),
        (avg(col("l_extendedprice")) -
          covar_samp(col("l_quantity"), col("l_extendedprice")) /
            var_samp(col("l_quantity")) * avg(col("l_quantity"))).as("intercept"),
        (corr(col("l_quantity"), col("l_extendedprice")) *
          corr(col("l_quantity"), col("l_extendedprice"))).as("r2"))
      .collect().map(r => r.getString(0) -> r).toMap
    fits.foreach { case (g, fit) =>
      val d = direct(g)
      assert(math.abs(fit.getDouble(2) - d.getDouble(1)) < 1e-4, s"slope $g")
      assert(math.abs(fit.getDouble(3) - d.getDouble(2)) < 1e-2, s"intercept $g")
      assert(math.abs(fit.getDouble(4) - d.getDouble(3)) < 1e-4, s"r2 $g")
    }
  }

  test("feature hash: buckets in range, per-doc mass equals token count") {
    val fh = TextAnalysis.featureHash(spark, sf).cache()
    try {
      assert(fh.filter(col("bucket") < 0 || col("bucket") >= 64).count() == 0)
      val mass = fh.groupBy(col("doc_id")).agg(sum(col("tf")).as("m"))
      val toks = graft.sources.Tables(spark, sf, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      // featurization loses no mass: Σ tf over buckets == token count
      assert(mass.join(toks, "doc_id").filter(col("m") =!= col("n")).count() == 0)
    } finally fh.unpersist()
  }

  test("random projection: matches a per-vector driver recompute") {
    val proj = Quantization.randomProjection(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(3).collect()
    def sign(i: Int, j: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_${j}".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    emb.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      val scale = v.map(math.abs).max
      val codes =
        if (scale == 0) v.map(_ => 0L)
        else v.map(x => math.floor(x * 127.0 / scale + 0.5).toLong)
      for (j <- 0 until 8) {
        val expect = codes.zipWithIndex.map { case (c, i) => sign(i, j) * c }.sum
        assert(proj((id, j)) == expect, s"proj($id, $j)")
      }
    }
    // every vector projects to exactly 8 coordinates
    val nVec = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(proj.size == nVec * 8)
  }
}
