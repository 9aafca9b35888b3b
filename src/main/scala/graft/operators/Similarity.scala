package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over an `Array[Float]` embedding column (SURVEY §2B).
  *
  * Two tiers, as a 100 TB engine needs:
  *   - [[knnBrute]]: exact top-k — broadcast the (small) query set, score
  *     map-side with codegen'd higher-order functions, take per-query
  *     top-k. Cost O(|corpus| × |queries|), the right tool when queries
  *     are few; it is one scan, zero corpus shuffles before the top-k.
  *   - [[annCosine]]: approximate top-k via random-hyperplane LSH —
  *     bucket the corpus by sign bits, probe only matching buckets
  *     (multi-probe on 1-bit flips), exact re-rank inside the candidate
  *     set. Corpus side scales out by bucket; no all-pairs product.
  */
object Similarity {

  /** Trained PQ codebooks per (dir, m, nCodes, dim, sampleSize,
    * iterations) — the bounded-model memoization shared with the BPE
    * merge table (a deterministic model of the corpus; re-training per
    * query invocation is not what any deployment does).
    */
  private[operators] val pqCodebookCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Int, Int, Int, Int, Int), Array[Array[Array[Double]]]]

  // Native codegen'd loops (see functions.DotProduct) — the HOF
  // aggregate/zip_with formulation is CodegenFallback and ran ~10×
  // slower on the brute-force scoring path.
  private def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  private def sqNorm(a: Column): Column = graft.functions.VectorFunctions.sqNorm(a)

  /** Exact top-k cosine neighbors for each query vector (vec_id < nQueries),
    * self-match excluded. Output (q_id, neighbor_id, rank) — ranks are
    * deterministic via the (cosine desc, vec_id asc) tie-break.
    */
  def knnBrute(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(sqNorm(col("embedding"))).as("norm"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    // bounded top-k aggregate, NOT a row_number window: the scored
    // relation is corpus × nQueries with only nQueries distinct keys, so
    // a window would funnel the ENTIRE corpus through nQueries sort
    // tasks (the exact hazard TopKAggregator documents). The aggregator
    // keeps O(k) state per query with map-side partials — every scan
    // task contributes its local best-k and only nQueries × k rows
    // shuffle. Comparator matches the old window order
    // (cosine desc, vec_id asc; NaN-total order), so results and the
    // DuckDB oracle are unchanged.
    boundedTopK(scored.select(col("q_id").as("a_id"),
        col("vec_id").as("b_id"), col("cosine")), k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }

  /** MATRYOSHKA TRUNCATION EVAL (Kusupati et al. 2022 / the MRL
    * deployment question): if retrieval ran on only the FIRST `dims`
    * dimensions — the memory/latency dial matryoshka-trained embedders
    * expose — how much of the full-dimension top-k survives? Per query:
    * exact top-k under full cosine, exact top-k under truncated-prefix
    * cosine, and the overlap fraction. Both rankings are the
    * [[knnBrute]] broadcast shape (bounded query set × corpus scan —
    * never corpus×corpus), ties broken by (cosine desc, vec_id) so
    * both engines pick identical sets.
    */
  def matryoshkaEval(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 10, dims: Int = 16): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        slice(col("embedding"), 1, dims).as("emb_t"))
      .select(col("vec_id"), col("embedding"), col("emb_t"),
        sqrt(sqNorm(col("embedding"))).as("norm"),
        sqrt(sqNorm(col("emb_t"))).as("norm_t"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("emb_t").as("q_emb_t"), col("norm").as("q_norm"),
        col("norm_t").as("q_norm_t"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_full",
        dot(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
      .withColumn("cos_trunc",
        dot(col("emb_t"), col("q_emb_t")) / (col("norm_t") * col("q_norm_t")))
    // same bounded-top-k-not-window reasoning as [[knnBrute]]: the
    // scored relation has only nQueries keys, so per-query ranking must
    // be an O(k)-state aggregate with map-side partials, never a
    // full-partition sort
    def topk(score: String) = boundedTopK(
      scored.select(col("q_id").as("a_id"), col("vec_id").as("b_id"),
        col(score).as("cosine")), k)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
    // LEFT join so a zero-overlap query still reports its 0 (an inner
    // join would silently drop it — the worst row is the readout)
    topk("cos_full")
      .join(topk("cos_trunc").withColumn("m", lit(1)), Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("n_overlap"))
      .select(col("q_id"), lit(k).as("k"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("overlap_frac"))
  }

  /** Seeded random hyperplanes — deterministic constants of the build
    * (seed 1234), exposed `private[graft]` so the DuckDB oracle can
    * interpolate the IDENTICAL doubles as SQL literals (the minhash-
    * coefficient device): `Double.toString` is shortest-round-trip, so
    * the parsed literal is bit-equal on both engines.
    */
  private[graft] def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(1234)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Per-table LSH bucket: `bits` sign bits of hyperplane projections,
    * packed into an int.
    */
  private def lshBucket(emb: Column, planes: Array[Array[Double]],
      table: Int, bits: Int): Column =
    (0 until bits).map { j =>
      when(dot(emb, lit(planes(table * bits + j)).cast("array<double>")) > 0,
        lit(1 << j)).otherwise(lit(0))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))

  /** ANN top-k via multi-table random-hyperplane LSH: L independent
    * tables of `bits` hyperplane sign bits each; candidates = corpus
    * vectors sharing any table's bucket with the query; exact cosine
    * re-rank on the candidates.
    *
    * Multiple small tables (L=8 × 4 bits) rather than one big key: a
    * neighbor at cosine θ agrees with a 4-bit bucket with prob p(θ)^4,
    * and missing all 8 independent tables is (1−p^4)^8 — high recall
    * with strong pruning on clustered data. Corpus-side cost is L rows
    * per vector in the bucket join (equi-join, shuffle-partitioned by
    * bucket — no all-pairs product at any scale). HASH-MATCHED since
    * r14: the seeded hyperplanes interpolate into the DuckDB oracle as
    * shortest-round-trip double literals, bucket signs and the cosine
    * re-rank replay on the q_knn_brute sequential-double device;
    * ScalaTest additionally measures recall against [[knnBrute]].
    */
  def annCosine(
      spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nTables: Int = 8, bitsPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nTables * bitsPerTable, dim)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(sqNorm(col("embedding"))).as("norm"))
    // Candidate generation over NARROW rows: only (vec_id, table, bucket)
    // rides the band join and the dedup shuffle — carrying the 64-float
    // embedding through the L× banding and hashing it in distinct() is
    // exactly the payload blow-up that breaks at corpus scale. Vectors
    // rejoin for the exact re-rank afterwards.
    val banded = emb.select(col("vec_id"),
      posexplode(array((0 until nTables).map(t =>
        lshBucket(col("embedding"), planes, t, bitsPerTable)): _*)))
      .withColumnRenamed("pos", "table_id").withColumnRenamed("col", "bucket")
    val qBand = banded.filter(col("vec_id") < nQueries)
      .select(col("table_id"), col("bucket"), col("vec_id").as("q_id"))
    val cand = banded.join(broadcast(qBand), Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val qEmb = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val candidates = cand
      .join(emb, Seq("vec_id"))
      .join(broadcast(qEmb), Seq("q_id"))
      .withColumn("cosine", dot(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Corpus×corpus ANN self-join: per-vector top-k over the WHOLE corpus
    * — the embedding-dedup shape. [[annCosine]] broadcasts its query-side
    * bands, which is right when queries are few and wrong when queries =
    * corpus; here candidate generation is a plain shuffle equi-join of
    * the banded relation with itself on (table_id, bucket), so both sides
    * scale out by bucket and nothing is broadcast or collected.
    *
    * Bucket width (bitsPerTable) is the cost/recall knob: a self-join's
    * candidate volume is Σ bucket² per table, so AT SCALE the bits grow
    * with the corpus (each +1 bit halves expected bucket size, quartering
    * pair volume) and recall is recouped across the L independent
    * tables. The DEFAULT is self-scaling: `bitsPerTable <= 0` derives
    * bits from one metadata-cheap corpus count via a TAPERED occupancy
    * target occ(n) = 125·(500/n)^0.275 — a power law pinned by the two
    * measured optima (BASELINE.md r7): n=500 wants ≈125/bucket (4 bits,
    * the occupancy the recall numbers below are calibrated against;
    * p≈0.6/bit → p^4≈0.13/table, 1−(1−0.13)^8 ≈ 0.67 recall@5 on the
    * synthetic near-cosine-0.3 neighbors), while the 100× ScaleBench
    * corpus (n=200k) wants ≈24/bucket — the SCALE_ANN_BITS sweep showed
    * occupancy 98 → 24 (11 → 13 bits) cutting the self-join 267 s →
    * 134.6 s. Constant occupancy would hold time ∝ n × occ but leave
    * that 2× on the table: candidate scoring outweighs the linear
    * banding pass more and more as n grows, so the optimum occupancy
    * FALLS with n. bits = max(4, round(log2(n / occ(n)))) interpolates
    * the two pins log-linearly; recall loss per bit is recouped across
    * the L tables. The ScalaTest measures recall against [[knnBrute]].
    *
    * `maxBucket` is the skew backstop: buckets above the cap are
    * dropped from candidate generation entirely — a bucket holding 1%
    * of the corpus means those vectors are near-identical and belong in
    * exact/MinHash dedup, not ANN, and ONE such bucket would otherwise
    * contribute |bucket|² pairs and stall its task. The cap count rides
    * the same (table_id, bucket) hash partitioning the self-join needs,
    * so enforcing it adds no extra exchange.
    *
    * Candidates stay NARROW (a_id, b_id) through the join+distinct;
    * embeddings rejoin per side for the exact cosine re-rank, then a
    * BOUNDED top-k aggregate (O(k) state per vector, map-side partials)
    * picks each vector's neighbors. Pairs materialize once in (a<b)
    * order and mirror afterwards, halving the join+dedup+score volume.
    * The first cut took top-k with a row_number window, which sorts the
    * ENTIRE mirrored pair list (n × occupancy × L rows) in sort
    * buffers before keeping k per vector — at 100× sf0.1 that sort was
    * the allocation that pushed a multi-query JVM over the 8 GiB heap
    * (r7). The aggregate collapses the pair list map-side before the
    * shuffle, so memory is O(groups × k) and spillable.
    */
  /** Shared front of the ANN self-join family: LSH banding with the
    * tapered auto-bits, the maxBucket skew backstop, narrow candidate
    * generation, and the exact-cosine scoring join — returning each
    * co-bucketed pair ONCE in canonical (a_id < b_id) order. The two
    * consumers diverge only in the tail: [[annSelfJoin]] mirrors and
    * takes a bounded top-k per vector; [[annEdges]] keeps pairs above a
    * similarity threshold (no ranking state at all).
    */
  private def annScoredPairs(
      spark: SparkSession, dir: String,
      nTables: Int, bitsPerTable: Int, dim: Int, maxBucket: Int): DataFrame = {
    val bits =
      if (bitsPerTable > 0) bitsPerTable
      else {
        // parquet footer count — no data scan; tapered occupancy target
        // (see scaladoc: 125/bucket at n=500 shrinking to 24/bucket at
        // n=200k, the two measured optima)
        val n = Tables(spark, dir, "embeddings").count().max(1L).toDouble
        val occ = 125.0 * math.pow(500.0 / n, 0.275)
        math.max(4, math.round(math.log(n / occ) / math.log(2.0)).toInt)
      }
    val planes = hyperplanes(nTables * bits, dim)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(sqNorm(col("embedding"))).as("norm"))
    val raw = emb.select(col("vec_id"),
      posexplode(array((0 until nTables).map(t =>
        lshBucket(col("embedding"), planes, t, bits)): _*)))
      .withColumnRenamed("pos", "table_id").withColumnRenamed("col", "bucket")
    // skew backstop: count per (table, bucket) under a whole-partition
    // window (same hash partitioning the join consumes) and drop
    // oversized buckets before any pair materializes
    val wBucket = Window.partitionBy(col("table_id"), col("bucket"))
    val banded = raw
      .withColumn("bucket_n", count(lit(1)).over(wBucket))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val left = banded.select(col("table_id"), col("bucket"), col("vec_id").as("a_id"))
    val right = banded.select(col("table_id"), col("bucket"), col("vec_id").as("b_id"))
    val pairs = left.join(right, Seq("table_id", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    pairs
      .join(emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("norm").as("a_norm")), Seq("a_id"))
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("norm").as("b_norm")), Seq("b_id"))
      .withColumn("cosine", dot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")))
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  def annSelfJoin(
      spark: SparkSession, dir: String,
      k: Int = 5, nTables: Int = 8, bitsPerTable: Int = -1,
      dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val scored = annScoredPairs(spark, dir, nTables, bitsPerTable, dim, maxBucket)
    // mirror so every vector sees its full neighbor list, then bounded
    // top-k (same ordering contract as the old window: cosine desc,
    // neighbor id asc on ties)
    val sym = scored.unionByName(scored.select(col("b_id").as("a_id"),
      col("a_id").as("b_id"), col("cosine")))
    boundedTopK(sym, k)
  }

  /** Thresholded ANN edge generation — the similarity-GRAPH form of the
    * self-join, for consumers that need "all pairs above τ" rather than
    * "each vector's k best" (semantic dedup, near-dup clustering).
    * Skipping the mirror + top-k aggregate matters twice over: the
    * O(n × occupancy) pair stream never shuffles into ranking state
    * (the filter runs inside the scoring stage, map-side, so only the
    * rare ≥ τ edges survive to move), and the k-cap approximation
    * disappears — every co-bucketed pair at ≥ τ is kept, so downstream
    * clustering sees the full candidate graph.
    */
  def annEdges(
      spark: SparkSession, dir: String, threshold: Double,
      nTables: Int = 8, bitsPerTable: Int = -1,
      dim: Int = 64, maxBucket: Int = 10000): DataFrame =
    annScoredPairs(spark, dir, nTables, bitsPerTable, dim, maxBucket)
      .filter(col("cosine") >= threshold)

  /** CORPUS-WIDE kNN-GRAPH CONSTRUCTION (VERDICT r11 #6) — the input
    * graph-based clustering / SemDeDup variants consume: every vector's
    * k best LSH-candidate neighbors ([[annSelfJoin]]'s bucket-join +
    * bounded top-k shape — never corpus×corpus), annotated with the
    * MUTUAL flag (`dst` also ranks `src` in its own top-k). Mutual-kNN
    * filtering is the standard densification cleanup before community
    * detection: hub vectors rank in many lists (high in-degree) without
    * reciprocating, and dropping one-way edges removes exactly those
    * hub artifacts.
    *
    * THE 100 TB SHAPE: edges are |V|·k rows; the mutuality check is one
    * self equi-join of that relation on the reversed key pair —
    * shuffle-partitioned by (src, dst), no scoring work repeated, no
    * new candidate generation. HASH-MATCHED since r14 (the self-join
    * core's oracle replays the self-scaling bits, maxBucket backstop,
    * mirrored-pair scoring, and the bounded top-k's window contract);
    * `SimilaritySpec` additionally pins recall vs brute force and the
    * mutual-symmetry property.
    */
  def knnGraph(
      spark: SparkSession, dir: String,
      k: Int = 5, nTables: Int = 8, bitsPerTable: Int = -1,
      dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val edges = annSelfJoin(spark, dir, k, nTables, bitsPerTable, dim, maxBucket)
      .select(col("q_id").as("src"), col("neighbor_id").as("dst"),
        col("rank"), col("cosine"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"),
      lit(1).as("m"))
    edges.join(rev, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), col("rank"), col("cosine"),
        col("m").isNotNull.as("mutual"))
  }

  /** Bounded per-key top-k over (a_id, b_id, cosine) rows — the shared
    * `functions.TopKAggregator.topK` aggregator (O(k) state, NaN-aware
    * window-order-compatible comparator) applied to the ANN tail.
    * Hash aggregation with map-side partials replaces the full-relation
    * sort a row_number window needs; the buffer stays sorted so most
    * rows short-circuit without re-sorting.
    */
  private[graft] def boundedTopK(sym: DataFrame, k: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("a_id"), col("cosine"), col("b_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(graft.functions.TopKAggregator.topK(k).toColumn.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col._2").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("col._1").as("cosine"))
  }

  /** Product-quantization ANN: split each (L2-normalized) vector into
    * `m` subvectors, learn a tiny per-subspace codebook (`nCodes`
    * centroids, Lloyd's on a bounded deterministic sample — the same
    * driver-resident-centroids-only training contract as [[ivfCosine]]),
    * encode the corpus as `m` one-byte codes, and answer queries by
    * ASYMMETRIC DISTANCE: the query stays exact, each corpus vector's
    * distance is the sum of `m` table lookups. On normalized vectors L2
    * order is cosine order, so the ADC ranking approximates cosine
    * ranking; an exact re-rank of the top-`rerank` ADC candidates
    * restores metric fidelity.
    *
    * The 100 TB shape: the corpus is stored/scanned as m bytes + 1 float
    * per vector (a 32× payload cut at m=8 over 64 float dims —
    * complementary to the int8 tier in `operators.Quantization`: PQ is
    * the coarse search layout, int8 the re-rank layout). Encoding is one
    * map-side pass against broadcast codebooks (no shuffle); the
    * distance table is a d×nCodes relation built from the QUERY side
    * (m×nCodes rows per query), so ADC is a broadcast equi-join on
    * (m, code) + one sum per (query, vector) — no all-pairs float work
    * anywhere. HASH-MATCHED since r14: training sums and the per-pair
    * ADC sum ride the q9 integer channel (order-free, so codebooks and
    * the rerank candidate set are bit-deterministic), and the DuckDB
    * oracle unrolls the per-subspace Lloyd's rounds + encoding + ADC;
    * the ScalaTest additionally pins recall@k against [[knnBrute]].
    */
  def pqCosine(
      spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, m: Int = 8, nCodes: Int = 16,
      dim: Int = 64, rerank: Int = 50,
      sampleSize: Int = 256, iterations: Int = 3): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subDim = dim / m
    // all-zero vectors pass through unnormalized (ANSI divide guard)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"),
        sqrt(sqNorm(col("embedding"))).as("nrm"))
      .select(col("vec_id"),
        when(col("nrm") === 0d, col("v0"))
          .otherwise(transform(col("v0"), x => x / col("nrm"))).as("v"))

    // --- train: per-subspace Lloyd's over one bounded sample. All m
    // subspaces train from the SAME sample scan per iteration (explode to
    // (sub, pos, value) and aggregate by (sub, cell, pos)) — m× codebooks
    // for one pass, only m×nCodes×subDim doubles ever on the driver.
    // nearest-centroid cell per subspace: argmin ||s−c||² = argmax (s·c − ||c||²/2).
    // The codebook enters as one LITERAL ARRAY traversed by HOF lambdas,
    // not nCodes unrolled dot expressions: the unrolled form × m subspaces
    // × the Generate consume path overflowed janino's 64 KB method limit
    // (whole-stage codegen compile failure → silent interpreted fallback
    // of the entire stage, found in the r8 Verify logs). Loops over
    // literal DATA keep the generated method near-constant-size no matter
    // how large m/nCodes grow.
    def cellOfSub(sub: Int, books: Array[Array[Array[Double]]])(s: Column): Column = {
      val cents = typedlit(books(sub).map(_.toSeq).toSeq)
      val scores = transform(cents, c =>
        aggregate(zip_with(s, c, (a, b) => a * b), lit(0d), (acc, x) => acc + x) -
          aggregate(zip_with(c, c, (a, b) => a * b), lit(0d), (acc, x) => acc + x) / 2)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    def subvec(v: Column, sub: Int): Column = slice(v, sub * subDim + 1, subDim)
    // The trained codebooks are a MODEL (deterministic given the corpus
    // and knobs) and memoize per JVM like the BPE merge table — the
    // encode/score half reuses them instead of re-running Lloyd's per
    // query invocation.
    val codebooksTrained = Similarity.pqCodebookCache.getOrElseUpdate(
      (Tables.fingerprint(dir, "embeddings"), m, nCodes, dim, sampleSize, iterations), {
    val sampleDf = emb.orderBy(col("vec_id")).limit(sampleSize)
      .select(col("vec_id"), col("v")).cache()
    val seeds = sampleDf.orderBy(col("vec_id")).limit(nCodes)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    // codebooks(sub)(code) = centroid of length subDim
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(sub => seeds.map(_.slice(sub * subDim, (sub + 1) * subDim)))
    for (_ <- 0 until iterations) {
      val assigned = sampleDf.select(col("vec_id"), posexplode(
        array((0 until m).map(sub =>
          struct(cellOfSub(sub, codebooks)(subvec(col("v"), sub)).as("cell"),
            subvec(col("v"), sub).as("s"))): _*)))
      // q9-bridged centroid sums (the IVF device): order-free exact
      // integers, so the trained codebooks are bit-identical run to run
      // AND replayable by the DuckDB oracle (q_ann_pq hash-matched
      // since r14)
      val stats = assigned
        .select(col("pos").as("sub"), col("col.cell").as("cell"), posexplode(col("col.s")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg(sum(floor(col("col") * lit(1.0e9) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = codebooks.map(_.map(_.clone())) // empty cells keep their centroid
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          (r.getDecimal(3).toBigInteger.doubleValue / 1.0e9) / r.getLong(4)
      }
      codebooks = next
    }
    sampleDf.unpersist()
    codebooks
    })

    // --- encode: m byte-codes per corpus vector, map-side only — one
    // native PqEncode eval per row (bit-identical to the HOF cellOfSub
    // chain, which walked interpreted nodes per element; see PqEncode)
    val coded = emb.withColumn("codes",
      graft.functions.VectorFunctions.pqEncode(col("v"), codebooksTrained))

    // --- distance tables from the query side: (q_id, sub, code, pdist)
    // with pdist = ||q_sub − c||², m×nCodes rows per query.
    val queries = coded.filter(col("vec_id") < nQueries)
    // same literal-data-not-unrolled-code rule as cellOfSub: the full
    // m×nCodes codebook is ONE nested literal, indexed transforms build
    // the (sub, code, pdist) entries — constant generated-code size
    val cbLit = typedlit(codebooksTrained.map(_.map(_.toSeq).toSeq).toSeq)
    val dtable = queries.select(col("vec_id").as("q_id"), posexplode(flatten(
        transform(cbLit, (subBooks, subIdx) =>
          transform(subBooks, (c, codeIdx) =>
            struct(subIdx.cast("int").as("sub"), codeIdx.cast("int").as("code"),
              aggregate(zip_with(slice(col("v"), subIdx * subDim + 1, lit(subDim)), c,
                (a, b) => (a - b) * (a - b)), lit(0d), (acc, x) => acc + x).as("pdist")))))))
      .select(col("q_id"), col("col.sub").as("sub"), col("col.code").as("code"),
        col("col.pdist").as("pdist"))

    // --- ADC: explode corpus codes, broadcast-join the tables, sum per
    // (q_id, vec_id), keep the best `rerank` candidates per query.
    val corpusCodes = coded.select(col("vec_id"), posexplode(col("codes")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "code")
    // the per-pair ADC sum rides the q9 integer channel: a raw double
    // sum of the m per-subspace terms is shuffle-order-dependent, and
    // the `rerank` cutoff below turns that ulp drift into a DIFFERENT
    // candidate set run to run — bridged, the ranking is exact and the
    // DuckDB oracle replays it bit-for-bit
    val adc = corpusCodes.join(broadcast(dtable), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(floor(col("pdist") * lit(1.0e9) + lit(0.5)).cast("long")).as("adc_dist"))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
    val cand = adc.withColumn("crank", row_number().over(wAdc))
      .filter(col("crank") <= rerank).select(col("q_id"), col("vec_id"))

    // --- exact cosine re-rank on the survivors (normalized → plain dot).
    val qv = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val rescored = cand.join(emb, Seq("vec_id")).join(broadcast(qv), Seq("q_id"))
      .withColumn("cosine", dot(col("v"), col("q_v")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Argmax-cosine cell id against broadcast centroid literals — pure
    * map-side expression, no shuffle. (array_position over the sims array
    * keeps the expression linear; a nested when()-reduce would duplicate
    * subtrees exponentially. ||v|| is constant across cells, so plain
    * dot/||c|| preserves the cosine argmax.)
    */
  private def cellOf(centroids: Array[Array[Double]])(v: Column): Column = {
    val sims = array(centroids.map(c =>
      dot(v, lit(c).cast("array<double>")) / math.sqrt(c.map(x => x * x).sum)): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nLists` Voronoi
    * cells via k-means, then search only the `nProbe` cells whose
    * centroids are nearest each query; exact cosine re-rank inside.
    *
    * Training is distributed Lloyd's over a bounded deterministic sample
    * that never leaves the executors: each iteration assigns cells
    * map-side against broadcast centroid literals, then reduces
    * per-(cell, dimension) partial sums — only k×dim aggregated doubles
    * reach the driver per iteration (the centroids themselves, which must
    * be driver-resident to be re-broadcast). At 100 TB the sample
    * selection becomes a hash-sample of the corpus; the per-iteration
    * cost stays one scan of the sample plus a k×dim-row aggregate.
    *
    * The 100 TB search shape: one pass to assign cells (broadcast
    * centroids, map-side argmax — no shuffle), candidate generation is an
    * equi-join on cell id, and recall/cost trades via nProbe. Complements
    * [[annCosine]]: IVF adapts to the data distribution (clustered
    * embeddings → tight cells), LSH is oblivious but needs no training.
    *
    * HASH-MATCHED since r14: centroid sums ride the q9 integer channel
    * (order-free, bit-deterministic run to run) and the DuckDB oracle
    * unrolls each Lloyd's round as assignment/stats/centroid CTEs; the
    * ScalaTest recall pin stays on top.
    */
  def ivfCosine(
      spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nLists: Int = 16, nProbe: Int = 4,
      sampleSize: Int = 256, iterations: Int = 3): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(sqNorm(col("embedding"))).as("norm"))

    // --- train: distributed Lloyd's on the deterministic sample — the
    // sampleSize lowest vec_ids regardless of id distribution (sparse or
    // offset ids included; a `vec_id < N` filter would silently shrink
    // the sample there). At corpus scale swap the orderBy.limit for a
    // hash-sample filter; the training plan below is unchanged.
    val sampleDf = emb.orderBy(col("vec_id")).limit(sampleSize)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // Seeds: the nLists lowest sample rows. These k rows ARE the initial
    // centroids — the k×dim floats that must live on the driver to be
    // broadcast into expressions; no other corpus vectors are collected.
    var centroids: Array[Array[Double]] = sampleDf
      .orderBy(col("vec_id")).limit(nLists).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iterations) {
      // per-(cell, dim) sums on the q9 integer channel (DECIMAL final
      // sum): a raw double SUM is partition-order-dependent — ulp drift
      // run to run — where the bridged sum is EXACT and order-free,
      // which is what lets the DuckDB oracle replay every Lloyd's round
      // bit-identically (q_ann_ivf is hash-matched since r14)
      val stats = sampleDf
        .select(cellOf(centroids)(col("v")).as("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(floor(col("col") * lit(1.0e9) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone()) // empty cells keep their centroid
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          (r.getDecimal(2).toBigInteger.doubleValue / 1.0e9) / r.getLong(3)
      }
      centroids = next
    }

    // --- assign: broadcast centroids, map-side argmax — no shuffle.
    val binned = emb.withColumn("cell", cellOf(centroids)(col("embedding")))

    // --- probe: nProbe nearest cells per query, equi-join on cell id
    val probeStructs = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((dot(col("embedding"), lit(c).cast("array<double>")) * -1
        / math.sqrt(c.map(x => x * x).sum)).as("negsim"), lit(i).as("cell"))
    }: _*)
    // As in annCosine: narrow (q_id, cell) probes and (q_id, vec_id)
    // candidate pairs through the joins/dedup; embeddings rejoin only for
    // the exact re-rank.
    val probes = binned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"),
        posexplode(slice(sort_array(probeStructs), 1, nProbe)))
      .select(col("q_id"), col("col.cell").as("cell"))
    val cand = binned.select(col("cell"), col("vec_id"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val qEmb = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val candidates = cand
      .join(emb, Seq("vec_id"))
      .join(broadcast(qEmb), Seq("q_id"))
      .withColumn("cosine", dot(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** The k-means ASSIGNMENT step — every vector to its nearest of k
    * fixed centroids by cosine (ties → lowest centroid id), the inner
    * loop of Lloyd's and the labeling pass of any centroid-based corpus
    * partitioning (clustered sampling, per-cluster quotas, SemDeDup's
    * cluster stage). Centroids here are the deterministic `vec_id < k`
    * vectors, making the whole step exact and oracle-checkable — the
    * TRAINED-centroid version is the IVF/PQ Lloyd's path already
    * exercised by [[annIvf]]/[[pqCosine]]; this isolates the assignment
    * operator itself. Shape: broadcast k centroid vectors, one map-side
    * scoring pass through the codegen'd dot product, a k-row
    * min-reduction per vector via one `q_id`-free window-free
    * `row_number` over (vec_id) — output exactly |corpus| rows, no
    * shuffle beyond the top-1 window on (vec_id, k) keys.
    */
  def kmeansAssign(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(sqNorm(col("embedding"))).as("norm"))
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val scored = emb.crossJoin(broadcast(cents))
      // zero-norm guard per the house ANSI contract
      .withColumn("cosine", when(col("norm") * col("c_norm") === 0d, 0d)
        .otherwise(dot(col("embedding"), col("c_emb")) / (col("norm") * col("c_norm"))))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("c_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cluster"), round(col("cosine"), 6).as("cosine"))
  }

  /** SEMANTIC decontamination screening — the embedding-space companion
    * of `TextAnalysis.decontaminate`'s 8-shingle overlap: for every
    * training vector, its nearest EVAL-SET neighbor by cosine, flagged
    * when similarity crosses the contamination threshold. Shingle
    * overlap catches verbatim leakage; this catches the paraphrased/
    * re-rendered eval items exact text matching structurally cannot.
    *
    * Scale contract (same as the shingle tier's broadcast digests): the
    * eval benchmark is CONSTANT-SIZE relative to the corpus (thousands
    * of items vs billions of documents) — enforced here by the
    * `vec_id < 3500` cap on the eval slice (inactive at verify scale,
    * it binds exactly when replication grows the corpus; without it
    * the 10× sweep measured 18× — train×eval goes quadratic the moment
    * the eval set tracks the corpus). The eval side broadcasts and the
    * whole screen is one map-side pass over the training corpus —
    * per-row cost |eval| codegen'd dot products, no shuffle at all
    * until the tiny top-1 window on |eval|-bounded groups. The
    * threshold (0.45 here) is calibrated to this synthetic corpus's
    * similarity range; production sets it from a held-out FPR target.
    */
  def semanticDecontaminate(spark: SparkSession, dir: String,
      threshold: Double = 0.45): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(sqNorm(col("embedding"))).as("norm"))
    val eval = emb.filter(pmod(col("vec_id"), lit(7)) === 0 && col("vec_id") < 3500)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"), col("norm").as("e_norm"))
    val train = emb.filter(pmod(col("vec_id"), lit(7)) =!= 0 || col("vec_id") >= 3500)
    val scored = train.crossJoin(broadcast(eval))
      .withColumn("cosine", when(col("norm") * col("e_norm") === 0d, 0d)
        .otherwise(dot(col("embedding"), col("e_emb")) / (col("norm") * col("e_norm"))))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("eval_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("train_id"), col("eval_id"),
        round(col("cosine"), 6).as("cosine"),
        (col("cosine") >= threshold).as("contaminated"))
  }

  /** PCA PROJECTION of the embedding corpus onto its top principal
    * components — the dimensionality probe every embedding pipeline
    * runs (effective-rank readout, 2-D inspection coordinates,
    * whitening prep). ONE scan folds every vector into exact
    * floor-scaled-integer sufficient statistics (n, Σx_i, upper-tri
    * Σx_i·x_j — 2,145 order-independent DECIMAL(38,0) sums at d = 64,
    * map-side combined from a single flattened-struct explode,
    * |dims|²-sized shuffle at ANY corpus size); the d×d covariance
    * eigensolves on the DRIVER via `squarings` trace-normalized matrix
    * squarings (C^2^11 separates a flat spectrum where plain power
    * iteration needs ~1,500 steps) + one bridged matvec from the
    * uniform start vector + Rayleigh λ, deflating between components;
    * the projection is a broadcast map-side pass with the component
    * vectors inlined as codegen'd zip_with/aggregate dots. No shuffle
    * touches corpus rows.
    *
    * HASH-EXACT by construction: every cross-row or cross-term sum
    * rides the q9 channel — q9(x) = ⌊x·1e9 + 0.5⌋, pure IEEE
    * multiply/add/floor, summed as exact integers (order-free), value
    * back as sum/1e9. Unlike ROUND(double, 9), whose BigDecimal path
    * is repr-sensitive at half-way digit boundaries (Java toString vs
    * an exact-binary rounder diverges ~1e-7/term, fatal when squaring
    * amplifies), q9 is bit-identical in ANY IEEE engine. All remaining
    * driver ops are IEEE +,·,/,√ in a fixed order — so the DuckDB
    * oracle replays the identical doubles bit-for-bit through the
    * squarings, the deflation, and the per-row projection
    * ([[graft.SparkEntry]]'s pcaOracleSql generates the unrolled CTE
    * chain). `SimilaritySpec` pins the variance-capture identities on
    * top (centering, decorrelation, EVR-vs-measured).
    */
  def pcaProject(spark: SparkSession, dir: String, nComponents: Int = 2,
      squarings: Int = 11): DataFrame = {
    val embRaw = Tables(spark, dir, "embeddings")
    val d = embRaw.select(size(col("embedding"))).head().getInt(0)
    val emb = embRaw.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    // the q9 integer channel, driver side (values bounded ≪ 2^53/1e9,
    // so the multiply/floor and the final integer→double are exact)
    def q9(x: Double): Long = math.floor(x * 1.0e9 + 0.5).toLong
    def dsum(ts: Iterator[Double]): Double = {
      var acc = 0L
      ts.foreach(t => acc += q9(t))
      acc.toDouble / 1.0e9
    }
    // ---- distributed sufficient stats on the q9 integer channel.
    // Per-partition combine in a flat Long buffer (tight JVM loop), then
    // a DECIMAL(38,0) final sum over the d(d+1)/2 × |partitions| partial
    // rows: the per-vector q9 terms are identical integers to the old
    // explode formulation, so the totals — and the oracle — are
    // bit-unchanged, but the shuffle drops from |corpus|·d(d+1)/2
    // decimal structs to 2080·partitions longs (7.0 s → well under 1 s
    // at sf0.1; partition partials stay ≪ Long.Max at any partition
    // size Spark would hand one task — ~1e6 rows × 1e9/term = 1e15).
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val pairCount = d * (d + 1) / 2
    val vecs = emb.select(col("v")).as[Seq[Double]]
    val gramParts = vecs.mapPartitions { it =>
      val acc = new Array[Long](pairCount)
      var any = false
      it.foreach { v =>
        any = true
        var i = 0
        var idx = 0
        while (i < d) {
          val xi = v(i)
          var j = i
          while (j < d) {
            acc(idx) += math.floor(xi * v(j) * 1.0e9 + 0.5).toLong
            idx += 1
            j += 1
          }
          i += 1
        }
      }
      if (!any) Iterator.empty
      else {
        var i = 0
        var idx = 0
        val out = new Array[(Int, Int, Long)](pairCount)
        while (i < d) {
          var j = i
          while (j < d) { out(idx) = (i, j, acc(idx)); idx += 1; j += 1 }
          i += 1
        }
        out.iterator
      }
    }.toDF("i", "j", "t")
    val gramTerms = gramParts
      .groupBy(col("i"), col("j"))
      .agg(sum(col("t").cast(DecimalType(38, 0))).as("g"))
    val sumParts = vecs.mapPartitions { it =>
      val acc = new Array[Long](d)
      var any = false
      it.foreach { v =>
        any = true
        var i = 0
        while (i < d) { acc(i) += math.floor(v(i) * 1.0e9 + 0.5).toLong; i += 1 }
      }
      if (!any) Iterator.empty else acc.iterator.zipWithIndex.map { case (s, i) => (i, s) }
    }.toDF("i", "s")
    val sumTerms = sumParts.groupBy(col("i"))
      .agg(sum(col("s").cast(DecimalType(38, 0))).as("s"))
    val n = emb.count()
    require(n > 1, "PCA needs at least two vectors")
    val nd = n.toDouble
    val sArr = new Array[Double](d)
    sumTerms.collect().foreach(r =>
      sArr(r.getInt(0)) = r.getDecimal(1).toBigInteger.doubleValue / 1.0e9)
    val mean = Array.tabulate(d)(i => sArr(i) / nd)
    val cov = Array.ofDim[Double](d, d)
    gramTerms.collect().foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val g = r.getDecimal(2).toBigInteger.doubleValue / 1.0e9
      val c = (g - nd * mean(i) * mean(j)) / (nd - 1.0)
      cov(i)(j) = c; cov(j)(i) = c
    }
    // ---- driver eigen: trace-normalized squarings, all sums bridged
    def topEig(m: Array[Array[Double]]): (Array[Double], Double) = {
      var p = m.map(_.clone())
      (1 to squarings).foreach { _ =>
        val t = dsum((0 until d).iterator.map(i => p(i)(i)))
        require(t > 0, "degenerate covariance: non-positive trace")
        val q = p.map(_.map(_ / t))
        p = Array.tabulate(d, d)((i, j) =>
          dsum((0 until d).iterator.map(k => q(i)(k) * q(k)(j))))
      }
      val u = 1.0 / math.sqrt(d.toDouble)
      val w = Array.tabulate(d)(i => dsum((0 until d).iterator.map(k => p(i)(k) * u)))
      val nrm = math.sqrt(dsum(w.iterator.map(x => x * x)))
      val v = w.map(_ / nrm)
      val cv = Array.tabulate(d)(i => dsum((0 until d).iterator.map(k => m(i)(k) * v(k))))
      val lam = dsum((0 until d).iterator.map(i => v(i) * cv(i)))
      (v, lam)
    }
    val comps = new Array[Array[Double]](nComponents)
    val lams = new Array[Double](nComponents)
    var cur = cov
    (0 until nComponents).foreach { k =>
      val (v, lam) = topEig(cur)
      comps(k) = v; lams(k) = lam
      if (k < nComponents - 1) {
        val prev = cur
        cur = Array.tabulate(d, d)((i, j) => prev(i)(j) - lam * v(i) * v(j))
      }
    }
    val trace = dsum((0 until d).iterator.map(i => cov(i)(i)))
    val evr = lams.map(l => if (trace > 0) math.max(l, 0.0) / trace else 0.0)
    // project map-side: pc_k = x·v_k − μ·v_k, both dots on the q9
    // channel (the centering term is a driver constant; the per-row dot
    // is one codegen'd zip_with/aggregate per component; the long
    // accumulator holds ≤ d·~1e10 ≪ Long.Max)
    def bridgedDot(vk: Array[Double]): Column =
      (aggregate(
        zip_with(col("v"), lit(vk), (a, b) => floor(a * b * lit(1.0e9) + lit(0.5))),
        lit(0L), (acc, x) => acc + x).cast("double") / lit(1.0e9))
    val projected = comps.zipWithIndex.foldLeft(emb) { case (df, (vk, i)) =>
      val shift = dsum(vk.iterator.zip(mean.iterator).map { case (a, b) => a * b })
      df.withColumn(s"pc${i + 1}", bridgedDot(vk) - lit(shift))
    }
    val withEvr = evr.zipWithIndex.foldLeft(projected) { case (df, (e, i)) =>
      df.withColumn(s"evr${i + 1}", lit(e))
    }
    withEvr.drop("v")
  }

  /** Per-label centroids as ordered double arrays, plus label sizes.
    *
    * EXACTNESS: each coordinate rounds to 9 decimals BEFORE the
    * cross-row sum (the house order-independent DECIMAL(38,9)
    * channel), so the centroid is deterministic under any row order;
    * the per-dimension division is the one double op. Shape: one
    * posexplode → (label, pos) map-side-combined sum (|labels|·dims
    * rows), centroids broadcast from there.
    */
  private def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val b9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val emb = Tables(spark, dir, "embeddings")
    val dims = emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
    val cent = dims.groupBy(col("label"), col("pos"))
      .agg(sum(round(col("x").cast("double"), 9).cast(b9)).as("sx"))
    val nl = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
    cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
        s => s.getField("sx").cast("double")).as("sx_arr"))
      .join(broadcast(nl), Seq("label"))
      .select(col("label"), col("n"),
        transform(col("sx_arr"), v => v / col("n").cast("double")).as("c_emb"))
  }

  /** SIMPLIFIED SILHOUETTE by label (Hruschka et al. 2004 — the
    * centroid-based silhouette that replaces the O(n²) pairwise
    * original with O(n·k) centroid distances, the only formulation
    * that survives 100 TB): per vector a = distance to OWN label
    * centroid, b = min distance to any OTHER, s = (b−a)/max(a,b);
    * published as the per-label mean — the cluster-quality audit of
    * the `label` column every embedding pipeline runs after
    * clustering or labeling.
    *
    * Distances use the expansion ‖x‖² + ‖c‖² − 2·x·c (one fused
    * codegen'd loop per term via [[graft.functions.VectorFunctions]]),
    * clamped at 0 against cancellation, mirrored verbatim in the
    * oracle; the per-label mean rides the round-9 DECIMAL channel.
    */
  def silhouetteByLabel(spark: SparkSession, dir: String): DataFrame = {
    val b9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        sqNorm(col("embedding")).as("sqx"))
    val cents = labelCentroids(spark, dir)
      .select(col("label").as("c_label"), col("c_emb"), sqNorm(col("c_emb")).as("sqc"))
    val pair = emb.crossJoin(broadcast(cents))
      .withColumn("d", sqrt(greatest(
        col("sqx") + col("sqc") - lit(2.0) * dot(col("embedding"), col("c_emb")),
        lit(0.0))))
    pair.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("label") === col("c_label"), col("d"))).as("a"),
        min(when(col("label") =!= col("c_label"), col("d"))).as("b"))
      .withColumn("s", when(greatest(col("a"), col("b")) > 0,
        (col("b") - col("a")) / greatest(col("a"), col("b"))).otherwise(lit(0.0)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("s"), 9).cast(b9)).as("s9"))
      .select(col("label"), col("n_vecs"),
        round(col("s9").cast("double") / col("n_vecs").cast("double"), 6)
          .as("mean_silhouette"))
  }

  /** CALINSKI–HARABASZ INDEX (1974) — the variance-ratio criterion
    * over the label partition: CH = (B/(k−1)) / (W/(N−k)) with B the
    * between-centroid and W the within-cluster squared-distance mass.
    * The single-number companion of [[silhouetteByLabel]] (higher =
    * tighter, better-separated clusters), and the index that needs
    * ONLY sufficient statistics — both terms assemble from the same
    * broadcast centroids; W is one corpus scan with the round-9
    * DECIMAL bridge, B folds over k label rows.
    */
  def calinskiHarabasz(spark: SparkSession, dir: String): DataFrame = {
    val b9 = org.apache.spark.sql.types.DecimalType(38, 9)
    def dd(c: Column) = c.cast("double")
    val cents = labelCentroids(spark, dir)
    // global centroid DEFINED from the corpus-wide per-dimension
    // round-9 DECIMAL sums (order-independent and exact — never a
    // double fold over the label centroids)
    val embForG = Tables(spark, dir, "embeddings")
    val gsum = embForG.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(round(col("x").cast("double"), 9).cast(b9)).as("gx"))
    val nTot = embForG.agg(count(lit(1)).as("n_total"))
    val tot = gsum
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("gx")))),
        s => s.getField("gx").cast("double")).as("gx_arr"))
      .crossJoin(nTot)
      .select(col("n_total"),
        transform(col("gx_arr"), v => v / col("n_total").cast("double")).as("g_emb"))
    val withG = cents.crossJoin(broadcast(tot))
      .withColumn("d2g", greatest(
        sqNorm(col("c_emb")) + sqNorm(col("g_emb"))
          - lit(2.0) * dot(col("c_emb"), col("g_emb")), lit(0.0)))
    val b = withG.agg(count(lit(1)).as("k"), max(col("n_total")).as("n_total"),
      sum(round(dd(col("n")) * col("d2g"), 9).cast(b9)).as("b9"))
    val emb = Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding"), sqNorm(col("embedding")).as("sqx"))
    val w = emb.join(broadcast(cents.select(col("label"), col("c_emb"),
        sqNorm(col("c_emb")).as("sqc"))), Seq("label"))
      .select(greatest(col("sqx") + col("sqc")
        - lit(2.0) * dot(col("embedding"), col("c_emb")), lit(0.0)).as("d2"))
      .agg(sum(round(col("d2"), 9).cast(b9)).as("w9"))
    val joined = b.crossJoin(w)
    val bss = dd(col("b9"))
    val wss = dd(col("w9"))
    val ch = (bss / (dd(col("k")) - 1.0)) / (wss / (dd(col("n_total")) - dd(col("k"))))
    joined.select(col("k").cast("int").as("k_labels"), col("n_total"),
      round(bss, 6).as("b_ss"), round(wss, 6).as("w_ss"),
      round(when(col("k") > 1 && col("n_total") > col("k") && wss > 0, ch), 6)
        .as("ch_index"))
  }
}
