package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Unigram-LM tokenizer (SentencePiece-style, Kudo 2018) — the
  * rows-only tier's pins: an INDEPENDENT pure-driver replay of the
  * whole trainer (seed → hard-EM → prune → final E-step) over the
  * collected word counts must reproduce the distributed model
  * bit-identically; Viterbi semantics (max log-prob, longest-piece
  * tie-break) pinned on hand fixtures; char coverage survives every
  * cut; and the apply verb's compression is consistent with the model.
  */
class UnigramSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val VocabSize = 120
  private val SeedSize = 400
  private val MaxLen = 6
  private val Rounds = 3

  /** Pure-driver reimplementation (no Spark) of the trainer's contract,
    * sharing ONLY [[TextAnalysis.viterbiSegment]] with production code —
    * an algorithmic divergence in seed, EM, coverage, or pruning fails
    * the equality pin.
    */
  private def replay(words: Array[(String, Long)]): Array[(String, Long, Double)] = {
    val charCounts: Map[String, Long] = words
      .flatMap { case (w, c) => w.map(ch => (ch.toString, c)) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val multiSeed = words
      .flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 2 to math.min(MaxLen, w.length - i)
        } yield (w.substring(i, i + l), c)
      }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      .toArray.sortBy { case (p, c) => (-c, p) }.take(SeedSize)
    def cover(counts: Array[(String, Long)]): Array[(String, Long)] = {
      val m = counts.toMap
      counts ++ charCounts.keysIterator.filterNot(m.contains).map(_ -> 0L)
    }
    def normalize(counts: Array[(String, Long)]): Map[String, Double] = {
      val total = math.max(1L, counts.map(c => math.max(1L, c._2)).sum).toDouble
      counts.map { case (p, c) => p -> math.log(math.max(1L, c) / total) }.toMap
    }
    def eStep(model: Map[String, Double]): Array[(String, Long)] = cover(
      words.flatMap { case (w, c) =>
          TextAnalysis.viterbiSegment(w, model, MaxLen).map(p => (p, c)) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }.toArray)
    var counts = cover(charCounts.toArray ++ multiSeed)
    var lp = normalize(counts)
    (1 to Rounds).foreach { _ => counts = eStep(lp); lp = normalize(counts) }
    val (chars, multi) = counts.partition(_._1.length == 1)
    val kept = chars ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, VocabSize - chars.length))
    lp = normalize(kept)
    val fin = eStep(lp).toMap
    val total = math.max(1L,
      kept.map(p => math.max(1L, fin.getOrElse(p._1, 0L))).sum).toDouble
    kept.map { case (p, _) =>
      val c = fin.getOrElse(p, 0L)
      (p, c, math.log(math.max(1L, c) / total))
    }.sortBy { case (p, c, _) => (-c, p) }
  }

  private def corpusWords(): Array[(String, Long)] = {
    val sp = spark
    import sp.implicits._
    graft.sources.Tables(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
  }

  test("distributed training == independent driver replay, full model table") {
    val sp = spark
    import sp.implicits._
    val words = spark.createDataset(corpusWords().toSeq)
    val dist = TextAnalysis.trainUnigramModel(words, VocabSize, SeedSize, MaxLen, Rounds)
    val local = replay(corpusWords())
    assert(dist.length == local.length)
    dist.zip(local).foreach { case ((p1, c1, l1), (p2, c2, l2)) =>
      assert(p1 == p2 && c1 == c2, s"piece/count diverged: ($p1,$c1) vs ($p2,$c2)")
      assert(math.abs(l1 - l2) < 1e-12, s"logprob diverged at $p1: $l1 vs $l2")
    }
  }

  test("viterbi: max log-prob wins; ties break to the longest piece; unseen falls back") {
    val lp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.0)
    assert(TextAnalysis.viterbiSegment("ab", lp, 6).toSeq == Seq("ab"),
      "one piece at -1 beats two at -2")
    val tie = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(TextAnalysis.viterbiSegment("ab", tie, 6).toSeq == Seq("ab"),
      "equal score must keep the longest piece (strict > keeps first candidate)")
    val better = Map("a" -> -0.4, "b" -> -0.4, "ab" -> -1.0)
    assert(TextAnalysis.viterbiSegment("ab", better, 6).toSeq == Seq("a", "b"))
    assert(TextAnalysis.viterbiSegment("xq", Map("x" -> -1.0), 6).toSeq == Seq("xq"),
      "a word with an uncovered char falls back to itself")
  }

  test("hand fixture: repeated bigram becomes a piece and dominates segmentation") {
    val sp = spark
    import sp.implicits._
    val words = spark.createDataset(Seq(("abab", 50L), ("ab", 20L), ("ba", 1L)))
    // maxPieceLen 2: the fixture pins the MERGE value of a frequent
    // bigram (with longer pieces allowed, "abab" itself wins — correct
    // but a different story)
    val model = TextAnalysis.trainUnigramModel(words, 10, 10, 2, 3)
    val lp = model.map(t => t._1 -> t._3).toMap
    assert(lp.contains("ab"), s"'ab' must survive as a piece, got ${lp.keySet}")
    assert(TextAnalysis.viterbiSegment("abab", lp, 2).toSeq == Seq("ab", "ab"))
  }

  test("char coverage: every corpus character is in the final model") {
    val sp = spark
    import sp.implicits._
    val words = corpusWords()
    val chars = words.flatMap(_._1.map(_.toString)).toSet
    val model = TextAnalysis
      .trainUnigramModel(spark.createDataset(words.toSeq), VocabSize, SeedSize, MaxLen, Rounds)
    val pieces = model.map(_._1).toSet
    val missing = chars -- pieces
    assert(missing.isEmpty, s"chars missing from the model: $missing")
  }

  test("train output shape; apply compresses below one piece per char") {
    val train = TextAnalysis.unigramTrain(spark, dir)
    val n = train.count()
    // kept = alphabet + top multi-char pieces, capped at VocabSize
    // (alphabet exempt if it alone exceeds the cap); hard-EM on the
    // tiny sf0.001 corpus legitimately concentrates usage on fewer
    // pieces than the cap, so pin the envelope, not an exact size
    assert(n >= 40 && n <= math.max(VocabSize, 256),
      s"expected a pruned vocab (cap $VocabSize), got $n")
    assert(train.columns.toSeq == Seq("piece", "freq", "logprob"))
    val ap = TextAnalysis.unigramApply(spark, dir)
    val row = ap.agg(sum("n_words"), sum("n_pieces")).collect().head
    val (nw, np) = (row.getLong(0), row.getLong(1))
    assert(np >= nw, "at least one piece per word")
    val totalChars = corpusWords().map { case (w, c) => w.length * c }.sum
    assert(np < totalChars,
      s"multi-char pieces must compress below char-level ($np vs $totalChars chars)")
  }
}
