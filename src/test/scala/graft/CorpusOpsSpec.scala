package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries
import graft.operators.{Multimodal, TextAnalysis}

/** Semantics pins for the round-7 corpus operators: benchmark
  * decontamination, two-pass heavy hitters, and the real GIF video
  * demux (the DuckDB hash-match is the driver's gate; these pin the
  * invariants the SQL can't state).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  import TestSpark.spark.implicits._

  test("decontaminate: verdict covers exactly the training slice; flags are hit-consistent") {
    val out = TextAnalysis.decontaminate(spark, sf).collect()
    val trainDocs = graft.sources.Tables(spark, sf, "documents")
      .filter(pmod(col("doc_id"), lit(17)) =!= 0).count()
    assert(out.length == trainDocs, "one total verdict per training doc")
    assert(out.forall(r => r.getLong(0) % 17 != 0), "benchmark docs must not be judged")
    assert(out.forall(r => (r.getLong(1) > 0) == r.getBoolean(2)))
    assert(out.exists(_.getBoolean(2)), "corpus has cross-slice dups; some doc must flag")
  }

  test("decontaminate: planted overlaps are flagged, everything else is clean") {
    // doc 0 and 34 are benchmark (0%17, 34%17); doc 1 copies doc 0's
    // sentence verbatim (contaminated), doc 2 shares only 7 of doc 34's
    // 8-gram (one token short — must NOT flag), doc 3 is disjoint.
    val bench0 = "alpha bravo charlie delta echo foxtrot golf hotel"
    val bench34 = "india juliet kilo lima mike november oscar papa"
    val docs = Seq(
      (0L, bench0),
      (34L, bench34),
      (1L, s"noise before $bench0 and after"),
      (2L, "india juliet kilo lima mike november oscar quebec"),
      (3L, "romeo sierra tango uniform victor whiskey xray yankee zulu"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.decontaminateDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "verdicts for exactly the non-benchmark docs")
    assert(got(1L)._2 && got(1L)._1 == 1, "verbatim 8-gram copy must flag exactly once")
    assert(got(2L) == ((0L, false)), "7-token overlap is below the 8-gram bar")
    assert(got(3L) == ((0L, false)), "disjoint doc must stay clean")
  }

  test("decontaminate bloom: no false negatives vs exact, FP excess bounded") {
    val exact = TextAnalysis.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val bloom = TextAnalysis.decontaminateBloom(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(bloom.keySet == exact.keySet, "same total per-doc verdict set")
    // a Bloom filter can only ADD hits: every exact flag survives with at
    // least its exact shingle count
    exact.foreach { case (id, (nExact, flagged)) =>
      assert(bloom(id)._1 >= nExact, s"doc $id lost hits: ${bloom(id)._1} < $nExact")
      if (flagged) assert(bloom(id)._2, s"false negative on doc $id")
    }
    // per-doc FP rate ≈ shingles × fpp (the union bound the scaladoc
    // documents): at fpp=1e-4 and ≲100 shingles/doc, ≈1% of clean docs
    // may flag — bound at 5% for slack
    val cleanExact = exact.count(!_._2._2)
    val fpDocs = exact.keys.count(id => bloom(id)._2 && !exact(id)._2)
    assert(fpDocs <= math.max(2, cleanExact / 20), s"$fpDocs FP docs of $cleanExact clean")
  }

  test("decontaminate bloom: probe inlines the digest at most once") {
    // Regression pin for the r14 10× cliff: predicate pushdown
    // substitutes a derived column's defining expression into the
    // predicate PER REFERENCE — the first probe cut read the digest 14
    // times (7 KM positions × 2 conv halves) and pushdown inlined 14
    // md5(concat_ws(shingle)) subtrees into the Filter. The fix is the
    // single-argument UDF probe; this pin fails if a refactor ever
    // multiplies the digest references again. (optimized LOGICAL plan:
    // pushdown is an optimizer move, and the AQE wrapper hides
    // physical children from collect().)
    val plan = TextAnalysis.bloomStages(spark, sf).hits.queryExecution.optimizedPlan
    val filterConds = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.toString
    }
    val overInlined = filterConds.filter(c => "md5".r.findAllIn(c).size > 1)
    assert(overInlined.isEmpty,
      s"probe filter re-inlined the digest computation:\n${overInlined.mkString("\n")}")
    assert(filterConds.exists(_.contains("UDF")), "bloom probe filter missing from plan")
  }

  test("heavy hitters: equals the brute-force grouped count at the same threshold") {
    val k = 256
    val got = MisraGries.heavyHitters(spark, sf, k)
      .as[(String, Long)].collect().toMap
    val toks = graft.sources.Tables(spark, sf, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    val brute = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / (k + 1))
      .as[(String, Long)].collect().toMap
    assert(got == brute, "two-pass MG result must be EXACT, not approximate")
    assert(brute.nonEmpty, "threshold too high for the fixture — test proves nothing")
  }

  test("heavy hitters: small k still yields the exact answer (superset guarantee)") {
    // k=8 forces heavy counter churn — decrements and merge-cuts happen
    val got = MisraGries.heavyHitters(spark, sf, k = 8).as[(String, Long)].collect().toMap
    val toks = graft.sources.Tables(spark, sf, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    val brute = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / 9)
      .as[(String, Long)].collect().toMap
    assert(got == brute)
  }

  test("video frames: demuxed frame bytes are byte-exact vs the padded payload") {
    val sample = graft.sources.Tables(spark, sf, "documents")
      .filter(length(col("text")) >= 1).orderBy(col("doc_id")).limit(5)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val got = Multimodal.videoFrames(spark, sf)
      .filter(col("doc_id").isin(sample.keys.toSeq.map(x => x: Any): _*)).collect()
    assert(got.nonEmpty)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    got.foreach { r =>
      val (docId, idx, nFrames) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val payload = sample(docId).getBytes("UTF-8")
      assert(nFrames == (payload.length + 63) / 64, s"doc $docId: demuxed frame count")
      assert(idx % 4 == 0 && idx < nFrames)
      val padded = java.util.Arrays.copyOf(payload, nFrames * 64)
      java.util.Arrays.fill(padded, payload.length, padded.length, ' '.toByte)
      val frame = java.util.Arrays.copyOfRange(padded, idx * 64, (idx + 1) * 64)
      md5.reset()
      val expect = md5.digest(frame).map("%02x".format(_)).mkString
      assert(r.getString(3) == expect,
        s"doc $docId frame $idx: decoded pixels differ from muxed bytes (GIF round-trip)")
      assert(math.abs(r.getDouble(4) - frame.map(_ & 0xFF).sum / 64.0) < 1e-9)
    }
  }

  test("decontaminate: the contamination probe broadcasts the benchmark digests") {
    // the 100 TB contract: the training side's shingle relation joins a
    // BROADCAST benchmark digest set — if this ever planned as a shuffle
    // join the corpus side would re-exchange on the digest
    val plan = TextAnalysis.decontaminate(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast probe in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"digest probe shuffled the corpus side:\n$plan")
  }

  test("mixture resample: rates move the mix toward target, capped classes keep all") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val before = docs.groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    val kept = graft.operators.Sampling.mixtureResample(spark, sf).collect()
    val after = kept.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val total = before.values.sum
    val target = Map("en" -> 0.5, "es" -> 0.3).withDefaultValue(0.2)
    before.foreach { case (lang, n) =>
      val thr = kept.find(_.getString(1) == lang).map(_.getLong(2))
      if (n.toDouble / total <= target(lang)) {
        // under-target class: capped at keep-everything
        assert(thr.forall(_ == 10000L), s"$lang should cap at 10000")
        assert(after.getOrElse(lang, 0L) == n, s"$lang must keep every doc")
      } else {
        // over-target class: kept count ≈ target share of the corpus
        // (md5 buckets are uniform; ±20% slack on a small fixture)
        val expect = target(lang) * total
        val got = after.getOrElse(lang, 0L).toDouble
        assert(math.abs(got - expect) / expect < 0.2,
          s"$lang kept $got, expected ≈ $expect")
      }
    }
    // determinism: the sample is a pure function of doc_id
    val again = graft.operators.Sampling.mixtureResample(spark, sf).collect()
    assert(kept.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
  }

  test("group sample: exactly min(n, |group|) per class, invariant under repartitioning") {
    val got = graft.operators.Sampling.groupSample(spark, sf, n = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val sizes = graft.sources.Tables(spark, sf, "documents")
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.length == math.min(20L, sizes(lang)),
        s"$lang drew ${rs.length} of ${sizes(lang)}")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"$lang ranks not dense")
    }
    // membership is a pure function of the keys — recomputation must
    // draw the identical sample
    val again = graft.operators.Sampling.groupSample(spark, sf, n = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // rank-by-hash is a top-k window: the group limit must push below
    // the shuffle (map tasks forward ≤ n rows per group), never a full
    // per-group materialize-then-filter
    val plan = graft.operators.Sampling.groupSample(spark, sf, n = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("substring dupes: span windows genuinely repeat; spans disjoint with gap > w") {
    val w = 20
    val spans = TextAnalysis.substringDupes(spark, sf, w).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(spans.nonEmpty, "fixture has no repeated 20-token windows — test is vacuous")
    val toks = graft.sources.Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty)).toMap
    val windowCounts = toks.values.flatMap(t =>
      t.sliding(w).filter(_.length == w).map(_.mkString(" "))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    spans.foreach { case (d, s, e, n) =>
      assert(e - s >= w, s"doc $d: span [$s,$e) shorter than one window")
      assert(n >= 1 && n <= e - s - w + 1, s"doc $d: $n windows can't fit in [$s,$e)")
      // the span's first window must occur ≥2 times corpus-wide —
      // that's the definition of duplicated
      val first = toks(d).slice(s, s + w).mkString(" ")
      assert(windowCounts(first) >= 2, s"doc $d: span-start window is unique")
    }
    // runs split only on gaps > w, so per-doc spans are strictly disjoint
    spans.groupBy(_._1).foreach { case (d, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3, s"doc $d: spans [$a,$b] overlap")
        case _ => ()
      }
    }
  }

  test("bm25: matches a driver-side recompute of the Okapi formula") {
    val got = TextAnalysis.bm25(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty, "no doc matched any query term — test is vacuous")
    val docs = graft.sources.Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val n = docs.length
    val avgdl = docs.map(_._2.length.toDouble).sum / n
    val terms = Seq("hash", "join", "scan")
    val df = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
    val expect = docs.flatMap { case (id, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else Some(math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl)))
      }
      if (contribs.isEmpty) None else Some(id -> contribs.sum)
    }.toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-3, s"doc $id: $s vs ${expect(id)}")
    }
  }

  test("cooccurrence: pair counts equal brute force; PMI matches the ratio") {
    val minC = 2L
    val got = TextAnalysis.cooccurrencePmi(spark, sf, w = 3, minCount = minC).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    val toks = graft.sources.Tables(spark, sf, "documents").collect()
      .map(_.getAs[String]("text").split("\\s+").filter(_.nonEmpty))
    val pairs = collection.mutable.Map.empty[(String, String), Long]
    toks.foreach { t =>
      for (i <- t.indices; j <- (i + 1) to math.min(i + 3, t.length - 1)) {
        val k = if (t(i) <= t(j)) (t(i), t(j)) else (t(j), t(i))
        pairs(k) = pairs.getOrElse(k, 0L) + 1
      }
    }
    val expect = pairs.filter(_._2 >= minC).toMap
    assert(got.keySet == expect.keySet,
      s"pair sets differ: ${(got.keySet diff expect.keySet).take(3)} / ${(expect.keySet diff got.keySet).take(3)}")
    got.foreach { case (k, (nab, _)) => assert(nab == expect(k), s"count mismatch at $k") }
    val bigT = toks.map(_.length).sum.toDouble
    val bigP = pairs.values.sum.toDouble
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    got.foreach { case ((a, b), (nab, pmi)) =>
      val e = math.log((nab / bigP) / ((uni(a) / bigT) * (uni(b) / bigT)))
      assert(math.abs(pmi - e) < 1e-3, s"pmi($a,$b): $pmi vs $e")
    }
  }

  test("weighted sample: exact A-Res draw, deterministic, bounded per class") {
    import graft.operators.Sampling
    def run() = Sampling.weightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    val got = run()
    assert(got.nonEmpty)
    assert(got.toSeq == run().toSeq, "draw must be a pure function of the keys")
    got.groupBy(_._2).foreach { case (l, rs) =>
      assert(rs.length <= 20, s"lang $l drew ${rs.length} > n")
      assert(rs.map(_._5).sorted.toSeq == (1 to rs.length), s"lang $l ranks not 1..k")
    }
    // replicate the md5Bucket + ln(u)/w key and the per-class argmax draw
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Int): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val b = java.lang.Long.parseLong(hex, 16) % 1000000
      math.log((b + 1).toDouble / 1000001.0) / w
    }
    val docs = graft.sources.Tables(spark, sf, "documents").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text").split("\\s+").count(_.nonEmpty)))
      .filter(_._3 > 0)
    val expect = docs.groupBy(_._2).values.flatMap { ds =>
      ds.sortBy(d => (-key(d._1, d._3), d._1)).take(20).zipWithIndex
        .map { case ((id, l, w), i) => (id, l, w, i + 1) }.toSeq
    }.toSet
    assert(got.map(r => (r._1, r._2, r._3, r._5)).toSet == expect)
    // same scale contract as groupSample: the per-class limit must push
    // below the shuffle
    val plan = Sampling.weightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("decile stats: buckets partition each class; totals are decimal-exact") {
    val got = graft.operators.Relational.decileStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(got.nonEmpty)
    val byClass = got.groupBy(_._1._1)
    val ev = graft.sources.Tables(spark, sf, "events")
      .filter(col("value").isNotNull).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value"))
    byClass.foreach { case (cls, cells) =>
      val vals = ev.filter(_._1 == cls).map(_._2)
      // bucket counts partition the class
      assert(cells.map(_._2._1).sum == vals.length, s"$cls: counts don't partition")
      // deciles within 1..10 and lo/hi nested inside neighbors
      val sorted = cells.sortBy(_._1._2)
      assert(sorted.forall(c => c._1._2 >= 1 && c._1._2 <= 10))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2._4 <= b._2._3,
          s"$cls: decile ${a._1._2} hi > decile ${b._1._2} lo")
        case _ => ()
      }
      // decimal totals equal an exact driver sum per class
      val totalGot = BigDecimal(cells.map(c => BigDecimal(c._2._2)).sum.toDouble)
      val totalExp = vals.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert((totalGot - totalExp).abs < BigDecimal(0.01), s"$cls: $totalGot vs $totalExp")
    }
  }

  test("mad outliers: flagged set matches a driver-side median/MAD recompute") {
    val got = graft.operators.Relational.madOutlierEvents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    def q50(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      val hi = math.min(lo + 1, s.length - 1)
      BigDecimal(s(lo) + frac * (s(hi) - s(lo)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ev = graft.sources.Tables(spark, sf, "events")
      .filter(col("value").isNotNull).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val expect: Map[Long, Double] = ev.groupBy(_._2).values.flatMap { es =>
      val med = q50(es.map(_._3).toSeq)
      val mad = q50(es.map(e => math.abs(e._3 - med)).toSeq)
      if (mad <= 0) Seq.empty[(Long, Double)]
      else es.toSeq.flatMap { case (id, _, v) =>
        val rz = BigDecimal(0.6745 * (v - med) / mad)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (math.abs(rz) > 3.5) Some(id -> rz) else None
      }
    }.toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, rz) =>
      assert(math.abs(rz - expect(id)) < 1e-9, s"event $id: $rz vs ${expect(id)}")
    }
    assert(got.nonEmpty, "fixture flags no robust outliers — test is vacuous")
  }

  test("ngram novelty: matches brute-force mean log corpus frequency") {
    val got = TextAnalysis.ngramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty)
    val toks = graft.sources.Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty))
      .filter(_._2.length >= 2).toMap
    val bigrams = toks.view.mapValues(t =>
      t.sliding(2).map(_.mkString(" ")).toSeq).toMap
    val corpus = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    assert(got.keySet == bigrams.keySet)
    got.foreach { case (id, (n, mlf)) =>
      val bs = bigrams(id)
      assert(n == bs.length, s"doc $id bigram count")
      val e = bs.map(b => math.log(corpus(b).toDouble)).sum / bs.length
      assert(math.abs(mlf - e) < 1e-3, s"doc $id: $mlf vs $e")
      assert(mlf >= 0.0, s"doc $id: counts >= 1 force a non-negative mean, got $mlf")
    }
  }

  test("incremental agg: base+delta merge is EXACTLY the full recompute") {
    val full = graft.operators.Relational.revenueByNation(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2)))).toMap
    val merged = graft.operators.Relational.incrementalRevenueByNation(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2)))).toMap
    assert(merged == full, "decimal partial-state merge must be bit-equal to recompute")
    // the decomposition is genuine: both slices carry orders
    val o = graft.sources.Tables(spark, sf, "orders")
    assert(o.filter(pmod(col("o_orderkey"), lit(10)) === 0).count() > 0)
    assert(o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0).count() > 0)
  }

  test("delta join view: four-slice maintenance is EXACTLY the full join recompute") {
    val orders = graft.sources.Tables(spark, sf, "orders")
    val customer = graft.sources.Tables(spark, sf, "customer")
    val full = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .collect()
      .map(r => r.getString(0) ->
        ((java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2)))).toMap
    val maintained = graft.operators.Relational.deltaJoinView(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2)))).toMap
    assert(maintained == full, "delta-join identity must be bit-equal to recompute")
    // the split is genuine on BOTH relations (all four slice joins carry rows)
    assert(orders.filter(pmod(col("o_orderkey"), lit(10)) === 0).count() > 0)
    assert(customer.filter(pmod(col("c_custkey"), lit(7)) === 0).count() > 0)
  }

  test("winsorize: clips to the exact per-class [p5, p95], touches nothing inside") {
    val rows = graft.operators.Relational.winsorizedEvents(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.exists(r => r._2 != r._3), "fixture has no tail — vacuous")
    // bounds per class from the buffered exact aggregate (the semantic
    // twin the distributed plan is differentially pinned against)
    val bounds = graft.sources.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(expr("round(percentile(value, 0.05), 4)").as("p5"),
        expr("round(percentile(value, 0.95), 4)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (tpe, v, w) =>
      val (p5, p95) = bounds(tpe)
      assert(w >= p5 && w <= p95, s"$tpe: clipped $w outside [$p5, $p95]")
      if (v >= p5 && v <= p95) assert(w == v, s"$tpe: in-range $v rewritten to $w")
      else assert(w == p5 || w == p95, s"$tpe: tail $v clipped to $w, not a bound")
    }
  }

  test("outliers: flagged set matches a driver-side recompute, stats never window the log") {
    val got = graft.operators.Relational.outlierEvents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    val ev = graft.sources.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val expect: Map[Long, Double] = byType.toSeq.flatMap { case (_, rows) =>
      val xs = rows.map(_._3)
      val mu = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1))
      rows.toSeq.map { case (id, _, v) =>
        id -> BigDecimal((v - mu) / sd).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble }
        .filter { case (_, z) => math.abs(z) > 2.5 }
    }.toMap
    assert(got.keySet == expect.keySet,
      s"flag sets differ: extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet}")
    // the stats pass is an aggregate + broadcast join back — a Window
    // here would co-locate every type's full row set in one task
    val plan = graft.operators.Relational.outlierEvents(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"outlier stats planned as a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"stats not broadcast back:\n$plan")
  }

  test("snapshot diff: every status lands exactly where the construction puts it") {
    val got = graft.operators.Upsert.snapshotDiffCorpus(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseIds = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id")).as[Long].collect().toSet
    baseIds.foreach { id =>
      val expect =
        if (id % 11 == 3) "removed"
        else if (id % 7 == 0) "changed" // re-crawl rewrites the text (rev 2 wins)
        else "unchanged"
      assert(got(id) == expect, s"doc $id: expected $expect, got ${got(id)}")
    }
    // spawned docs appear as added unless the deletion slice caught them
    baseIds.filter(_ % 13 == 0).foreach { id =>
      val spawned = id + 100000
      if (spawned % 11 == 3) assert(!got.contains(spawned))
      else assert(got(spawned) == "added", s"spawned $spawned should be added")
    }
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(got.values.toSet),
      "fixture must exercise all four statuses")
  }

  test("schema evolution: merged read is null-correct per generation") {
    val ev = graft.sources.Tables(spark, sf, "events")
    val rows = graft.sources.Roundtrip.schemaEvolutionEvents(spark, sf).collect()
    val totals = ev.groupBy(col("event_type")).count().as[(String, Long)].collect().toMap
    val withValue = ev.filter(col("event_id") % 2 =!= 0)
      .groupBy(col("event_type")).count().as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == totals(t), s"$t: merged read must see every row")
      assert(r.getLong(2) == withValue.getOrElse(t, 0L),
        s"$t: COUNT(value) must count only gen-2 rows")
      assert(r.getLong(2) < r.getLong(1), s"$t: fixture must have gen-1 rows")
    }
  }

  test("video frames: agrees with the codegen'd sampling stub on non-tail frames") {
    // same frame layout, same stride: wherever the stub's frame is a full
    // 64 bytes the real demux must produce the identical md5
    val real = Multimodal.videoFrames(spark, sf)
      .select(col("doc_id"), col("frame_idx"), col("frame_md5").as("real_md5"))
    val stub = Multimodal.frameSampleStub(spark, sf)
      .filter(col("frame_len") === 64)
      .select(col("doc_id"), col("frame_idx"), col("frame_md5").as("stub_md5"))
    val joined = stub.join(real, Seq("doc_id", "frame_idx"))
    assert(joined.count() > 0)
    assert(joined.filter(col("real_md5") =!= col("stub_md5")).count() == 0)
  }

  test("bigram LM: probabilities valid, matches a driver recompute") {
    val sf = TestSpark.sf0001
    val lm = TextAnalysis.bigramLm(TestSpark.spark, sf).collect()
    assert(lm.nonEmpty)
    lm.foreach { r =>
      assert(r.getLong(2) >= 3 && r.getLong(2) <= r.getLong(3), s"c12 out of range: $r")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0, s"p out of range: $r")
    }
    // driver recompute of the full table from raw text
    val pairs = graft.sources.Tables(TestSpark.spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(r => r.getString(0).split("\\s+").filter(_.nonEmpty).sliding(2)
        .collect { case Array(a, b) => (a, b) })
    val c12 = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expect = c12.filter(_._2 >= 3)
    assert(lm.length == expect.size, s"${lm.length} rows vs ${expect.size} recomputed")
    lm.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(c12(key) == r.getLong(2) && c1(key._1) == r.getLong(3), s"counts differ at $key")
    }
  }
  test("feature hashing: md5 dim/sign replay, collision-free totals preserved") {
    val rows = TextAnalysis.featureHashing(TestSpark.spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 64, s"dim out of range: $r")
      assert(math.abs(r.getAs[Long]("weight")) <= r.getAs[Long]("n_terms"),
        s"|weight| cannot exceed term count: $r")
    }
    // driver replay of the identical md5 arithmetic
    val docs = graft.sources.Tables(TestSpark.spark, sf, "documents")
      .filter(col("doc_id") < 200).select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String = {
      val d = md.digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    val expect = docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { tok =>
        val h = hex(tok)
        val dim = (java.lang.Long.parseLong(h.substring(0, 8), 16) % 64).toInt
        val sign = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
        ((id, dim), sign)
      }
    }.groupBy(_._1).view.mapValues(ss => (ss.map(_._2).sum, ss.length.toLong)).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getLong(0), r.getInt(1))
      val (w, n) = expect(k)
      assert(r.getAs[Long]("weight") == w && r.getAs[Long]("n_terms") == n,
        s"vector mismatch at $k")
    }
    // sum of n_terms equals the total token count of the slice
    val totalToks = docs.map(_._2.toLowerCase.split("\\s+").count(_.nonEmpty).toLong).sum
    assert(rows.map(_.getAs[Long]("n_terms")).sum == totalToks)
  }
  test("tokenizer fertility: exact integer sums match a driver recompute") {
    val rows = TextAnalysis.tokenizerFertility(TestSpark.spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("chars_per_token"), r.getAs[Double]("bytes_per_token"))).toMap
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables(TestSpark.spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val nt = ds.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
      val nc = ds.map(_._2.length.toLong).sum
      val nb = ds.map(_._2.getBytes("UTF-8").length.toLong).sum
      val (gd, gt, cpt, bpt) = rows(lang)
      assert(gd == ds.length && gt == nt, s"$lang counts")
      assert(math.abs(cpt - nc.toDouble / nt) < 1e-6, s"$lang chars/token")
      assert(math.abs(bpt - nb.toDouble / nt) < 1e-6, s"$lang bytes/token")
      assert(bpt >= cpt - 1e-9, "bytes can never undercut chars (UTF-8)")
    }
  }
}
