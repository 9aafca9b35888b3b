package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.GraftRelation

/** Native as-of join — the whole-operator tier (c) of graft's custom-op
  * preference order (SURVEY §4.2): a custom [[LogicalPlan]] node, a
  * [[SparkStrategy]] that plans it, and a [[SparkPlan]] that executes a
  * per-partition linear merge. The composed formulation
  * (`Relational.purchaseAfterSignup`: union + running `last` window) stays
  * as the built-in-operator path; this node exists because as-of is a
  * join Spark lacks natively and a first-class operator gives the planner
  * a handle the window formulation hides: distribution + ordering
  * REQUIREMENTS (so Catalyst places/reuses exchanges and sorts exactly as
  * for SortMergeJoin — bucketed/pre-sorted inputs plan with ZERO extra
  * exchange) and an O(left + right) merge with O(1) state instead of a
  * carried window column over the unioned stream.
  *
  * Left-outer semantics: every left row pairs with the LAST right row of
  * the same key whose time is <= the left time ("<=" inclusive, matching
  * DuckDB's `ASOF LEFT JOIN ... ON l.t >= r.t`), or nulls if none. Ties in
  * right time resolve to the row latest in `rightTieBreak` order — an
  * explicit, engine-independent contract where DuckDB's ASOF leaves
  * equal-time winners unspecified.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression])
  extends BinaryNode {

  // Children must not share attribute ids (a self-join without fresh
  // aliases would make binding ambiguous) — but that contract is checked
  // in [[AsOfJoinOps.asofLeft]], NOT here: a constructor `require` also
  // runs under `copy` during canonicalization, where BOTH children's ids
  // are normalized to position-based ones and legitimately collide.

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] → [[AsOfJoinExec]]. Injected from birth via
  * `GraftExtensions.injectPlannerStrategy`, or appended to a live session
  * through `spark.experimental.extraStrategies`
  * ([[GraftRelation.ensureStrategy]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.rightTieBreak, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: both children hash-clustered on the key
  * ([[ClusteredDistribution]] — EnsureRequirements co-partitions them
  * exactly as for a shuffled join) and sorted by (key, time[, tiebreak]),
  * then each partition pair merges in one forward pass. State is a single
  * buffered right row per in-flight key — no hash table, no window
  * buffer — so a partition of any size streams through in O(rows) time
  * and O(1) memory beyond the sorts the planner already accounts for.
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  // left rows pass through in their sorted order, one output row each —
  // partitioning and ordering survive, so a downstream per-key operator
  // reuses this exchange+sort (same contract as left-outer SMJ)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrdering = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTime = BindReferences.bindReference(leftTime, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTime = BindReferences.bindReference(rightTime, right.output)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the last right row already consumed but not yet <= any left time
        // (lookahead), and the best match so far for the current key
        private var pending: InternalRow = _
        private var pendingKey: Any = _
        private var pendingTime: Any = _
        private var matchRow: InternalRow = _
        private var matchKey: Any = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            pendingKey = rKey.eval(r)
            pendingTime = rTime.eval(r)
            // null keys/times can never satisfy key-equal + time<=, skip
            if (pendingKey == null || pendingTime == null) { pending = null; advanceRight() }
            else pending = r
          } else pending = null

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKey.eval(l)
          val t = lTime.eval(l)
          if (k == null || t == null) {
            numOutputRows += 1
            return joined(l, nullRight)
          }
          // drop right rows (and any stale match) from keys before k
          while (pending != null && keyOrdering.compare(pendingKey, k) < 0) advanceRight()
          if (matchKey != null && keyOrdering.compare(matchKey, k) != 0) {
            matchRow = null; matchKey = null
          }
          // consume right rows of key k with time <= t; the LAST consumed
          // wins, which under the (time, tiebreak) sort is the latest
          // time and, at equal times, the greatest tiebreak
          while (pending != null && keyOrdering.compare(pendingKey, k) == 0 &&
              timeOrdering.compare(pendingTime, t) <= 0) {
            matchRow = pending.copy() // sort iterators reuse row objects
            matchKey = pendingKey
            advanceRight()
          }
          numOutputRows += 1
          if (matchRow != null) joined(l, matchRow) else joined(l, nullRight)
        }
      }
    }
  }
}

/** DataFrame-level surface for the native operator. */
object AsOfJoinOps {

  /** As-of left join `left` to `right`: each left row picks the last
    * right row with `rightKey == leftKey` and `rightTime <= leftTime`
    * (ties in time resolved to the greatest `rightTieBreak`). Both
    * inputs must carry disjoint attribute ids — project fresh aliases
    * per side when both derive from one table.
    */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    GraftRelation.ensureStrategy(spark, AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join inputs must not share attribute ids; alias each side first")
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    GraftRelation.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime),
      rightTieBreak.map(resolve(rPlan, _))))
  }
}
