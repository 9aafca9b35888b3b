package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Distributed LOGISTIC-REGRESSION training — full-batch gradient
  * descent run BY the engine: each iteration is one map-side-combined
  * aggregate computing the exact gradient over the corpus, the weight
  * vector lives on the driver (k doubles — the bounded-model contract
  * shared with IVF/PQ/BPE training), and the next iteration's scoring
  * expression embeds the updated weights as literals. The demo task:
  * predict `lang = 'en'` from two cheap quality features (length,
  * English-stopword ratio) — the shape of every "train a small filter
  * model on corpus signals" job a curation pipeline runs.
  *
  * EXACT-ORACLE ML TRAINING: unlike typical float training loops, every
  * iteration here is bit-reproducible across engines — per-row gradient
  * terms are rounded to 9 decimals and summed in DECIMAL (the house
  * order-free total contract; the round-9 absorbs any last-ulp
  * `exp`/`ln` libm differences), so the weight trajectory, final loss,
  * and accuracy hash-match a DuckDB oracle that unrolls the SAME
  * `iters` iterations as CTE stages (the `q_pagerank` precedent).
  *
  * 100 TB shape: per iteration ONE scan + one k-column aggregate; only
  * k gradient doubles ever reach the driver. Feature extraction is a
  * pure projection (no shuffle anywhere in the loop).
  *
  * On THIS corpus the label is near-independent of the features by
  * construction (the synthetic text sprinkles every language's
  * stopwords uniformly), so the converged accuracy sits at the class
  * prior — the pinned contract is the exact TRAJECTORY (weights, loss
  * strictly below the ln 2 initialization, accuracy), not classifier
  * quality.
  */
object LogReg {

  private val dec9 = DecimalType(38, 9)
  // must stay in lockstep with TextAnalysis.EnStop / q_stopword_ratio
  private val EnStop = Seq("the", "a", "of", "and", "to", "in", "is")

  private def features(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.operators.TextAnalysis.tokens(lower(col("text")))
    val hits = size(filter(t, x => x.isin(EnStop.map(s => s: Any): _*)))
    Tables(spark, dir, "documents").select(
      (col("lang") === "en").cast("int").as("y"),
      (col("n_chars") / lit(1000.0)).as("x1"),
      when(size(t) > 0, hits.cast("double") / size(t)).otherwise(0.0).as("x2"))
  }

  def trainEnClassifier(spark: SparkSession, dir: String,
      iters: Int = 8, lr: Double = 1.0): DataFrame = {
    val feats = features(spark, dir).persist()
    val n = feats.count()
    def sumDec(c: Column): Column = sum(round(c, 9).cast(dec9)).cast("double")
    var w = Array(0.0, 0.0, 0.0)
    def p: Column = lit(1.0) / (lit(1.0) +
      exp(-(lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2"))))
    for (_ <- 1 to iters) {
      val g = feats.withColumn("r", p - col("y"))
        .agg(sumDec(col("r")).as("g0"),
          sumDec(col("r") * col("x1")).as("g1"),
          sumDec(col("r") * col("x2")).as("g2"))
        .collect().head
      w = Array(
        w(0) - lr * (g.getDouble(0) / n),
        w(1) - lr * (g.getDouble(1) / n),
        w(2) - lr * (g.getDouble(2) / n))
    }
    val out = feats.withColumn("p", p)
      .agg(
        round(sumDec(-(col("y") * log(col("p")) +
          (lit(1) - col("y")) * log(lit(1.0) - col("p")))) / n, 6).as("log_loss"),
        round(count(when((col("p") >= 0.5) === (col("y") === 1), 1))
          .cast("double") / n, 6).as("accuracy"))
      .select(lit(n).as("n"),
        round(lit(w(0)), 6).as("w0"), round(lit(w(1)), 6).as("w1"),
        round(lit(w(2)), 6).as("w2"),
        col("log_loss"), col("accuracy"))
    feats.unpersist()
    out
  }

  /** The DuckDB oracle for [[trainEnClassifier]]: the same `iters`
    * gradient steps unrolled as CTE stages, every expression mirrored
    * shape-for-shape (lr = 1.0 folds into the bare `g/n` both sides
    * compute).
    */
  def oracleSql(iters: Int = 8): String = {
    val stops = EnStop.map(s => s"x = '$s'").mkString(" OR ")
    val base =
      s"""WITH f AS MATERIALIZED (SELECT CAST(lang = 'en' AS INTEGER) AS y,
         |    n_chars / CAST(1000 AS DOUBLE) AS x1,
         |    CASE WHEN LEN(toks) > 0
         |      THEN CAST(LEN(list_filter(toks, x -> $stops)) AS DOUBLE) / LEN(toks)
         |      ELSE 0.0 END AS x2
         |  FROM (SELECT lang, n_chars,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |    FROM documents)),
         |c AS MATERIALIZED (SELECT COUNT(*) AS n FROM f),
         |w0 AS MATERIALIZED (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1, CAST(0 AS DOUBLE) AS w2)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""s$i AS MATERIALIZED (SELECT y, x1, x2,
         |    CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(w.w0 + w.w1 * x1 + w.w2 * x2))) - y AS r
         |  FROM f CROSS JOIN w${i - 1} w),
         |w$i AS MATERIALIZED (SELECT
         |    (SELECT w0 FROM w${i - 1}) - (CAST(SUM(CAST(round(r, 9) AS DECIMAL(38,9))) AS DOUBLE) / (SELECT n FROM c)) AS w0,
         |    (SELECT w1 FROM w${i - 1}) - (CAST(SUM(CAST(round(r * x1, 9) AS DECIMAL(38,9))) AS DOUBLE) / (SELECT n FROM c)) AS w1,
         |    (SELECT w2 FROM w${i - 1}) - (CAST(SUM(CAST(round(r * x2, 9) AS DECIMAL(38,9))) AS DOUBLE) / (SELECT n FROM c)) AS w2
         |  FROM s$i)""".stripMargin
    }
    val fin =
      s"""fin AS (SELECT y,
         |    CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(w.w0 + w.w1 * x1 + w.w2 * x2))) AS p
         |  FROM f CROSS JOIN w$iters w)
         |SELECT (SELECT n FROM c) AS n,
         |  round((SELECT w0 FROM w$iters), 6) AS w0,
         |  round((SELECT w1 FROM w$iters), 6) AS w1,
         |  round((SELECT w2 FROM w$iters), 6) AS w2,
         |  round(CAST(SUM(CAST(round(-(y * ln(p) + (1 - y) * ln(CAST(1 AS DOUBLE) - p)), 9) AS DECIMAL(38,9))) AS DOUBLE) / (SELECT n FROM c), 6) AS log_loss,
         |  round(CAST(COUNT(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 END) AS DOUBLE) / (SELECT n FROM c), 6) AS accuracy
         |FROM fin""".stripMargin
    (Seq(base) ++ steps :+ fin).mkString(",\n")
  }
}
