package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.plans.{AsOfJoinExec, AsOfJoinOps}

/** The native as-of join operator (logical node + strategy + merge exec):
  * semantics vs the composed window formulation, tie-break and no-match
  * edges, and the plan shape the whole-operator tier buys (exchanges on
  * the key only — requirements handled by EnsureRequirements exactly as
  * for a shuffled join).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** All physical nodes, descending through AQE stage leaves. */
  private def allNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("native == composed on the events table, bit for bit") {
    val native = Relational.purchaseAfterSignupNative(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val composed = Relational.purchaseAfterSignup(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(native.nonEmpty && native.sameElements(composed))
  }

  test("plan: AsOfJoinExec node present, exchanges are key-only hash shuffles") {
    val df = Relational.purchaseAfterSignupNative(spark, TestSpark.sf0001)
    val nodes = allNodes(df)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), nodes.mkString("\n"))
    // both children arrive hash-clustered: one key exchange per side,
    // no broadcast, no cartesian
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    val parts = shuffles.map(_.outputPartitioning.toString)
    assert(shuffles.length == 2 &&
      parts.exists(_.contains("user_id")) && parts.exists(_.contains("s_user")),
      nodes.mkString("\n"))
  }

  test("tie-break: greatest tiebreak column wins at equal right times; <= is inclusive") {
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0"), (2L, 10L, "p2"))
      .toDF("k", "t", "tag")
      .select($"k".as("lk"), $"t".as("lt"), $"tag".as("ltag"))
    val right = Seq(
      (1L, 100L, 7L), (1L, 100L, 9L), // equal-time tie at exactly lt=100
      (1L, 40L, 1L), (2L, 11L, 5L) // k=2's only row is AFTER lt=10
    ).toDF("k", "t", "rid")
      .select($"k".as("rk"), $"t".as("rt"), $"rid".as("rid"))
    val out = AsOfJoinOps.asofLeft(left, right, "lk", "rk", "lt", "rt", Seq("rid"))
      .select($"ltag", $"rid").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out == Map(
      "p1" -> Some(9L), // inclusive <=, tie resolved to rid 9 over 7
      "p0" -> Some(1L), // only the t=40 row qualifies
      "p2" -> None // no right row at or before t=10 → null-extended
    ))
  }

  test("plans and runs while the CacheManager holds unrelated cached plans") {
    // Regression: cache lookup canonicalizes every subtree of a new query,
    // normalizing BOTH join children's attribute ids to position-based ones
    // that collide — a constructor-time disjointness `require` fires under
    // the canonical `copy`. The contract check lives in asofLeft instead.
    val cached = Seq((1L, "x")).toDF("id", "v").cache()
    try {
      cached.count() // materialize so the CacheManager entry is live
      val out = Relational.purchaseAfterSignupNative(spark, TestSpark.sf0001)
      assert(out.count() > 0)
    } finally cached.unpersist()
  }

  test("disjoint-attribute-id contract is enforced") {
    val df = Seq((1L, 2L)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinOps.asofLeft(df, df, "k", "k", "t", "t", Nil).collect()
    }
    assert(e.getMessage.contains("alias each side first"))
  }
}
