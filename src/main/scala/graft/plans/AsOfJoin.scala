package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** A whole custom operator — the builder-prompt ladder's option (c):
  * logical node + planner Strategy + physical SparkPlan, registered via
  * SparkSessionExtensions. Implements the time-series AS-OF JOIN: for
  * every left row, attach the latest right row of the same key with
  * rightTime <= leftTime (or nulls).
  *
  * The composable window formulation (Relational.asofJoin) answers the
  * one-table case; this operator joins two genuinely different relations
  * without first unioning them — the shape Spark's built-ins cannot
  * express without a range-join blowup.
  *
  * Physical strategy: both sides hash-clustered on the key and sorted by
  * (key, time) — declared via requiredChildDistribution/Ordering so the
  * planner inserts exactly the exchanges/sorts needed (and can elide
  * them if the data is already partitioned, e.g. bucketed tables). The
  * merge itself is a single forward pass per partition with O(1) state:
  * the last-seen right row per current key.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  // right side nullable: unmatched left rows carry nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output
    // typed comparators for the declared key/time types — keys can be
    // string, int, decimal…, not just long (round-1 limitation); the
    // ordering matches the SortOrder the planner inserts, so the merge
    // invariants hold for every orderable type
    val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftKey.dataType)
    val timeOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftTime.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against the nullability-adjusted output (right side emits a
      // null row for unmatched left rows even when its attributes were
      // declared non-nullable upstream)
      val proj = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered

      var matchKey: Any = null
      var hasMatch = false
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) {
          // SQL-equality semantics: a null key or time matches nothing.
          // No state change: null-keyed left rows sort first, so no
          // tracked match exists yet anyway.
          proj(joined(lRow, nullRight))
        } else {
          if (hasMatch && keyOrd.compare(matchKey, k) != 0) {
            hasMatch = false; matchRow = null
          }
          // advance the right side up to (k, t), keeping the last row
          // seen; null-keyed/timed right rows sort first (Ascending =
          // nulls first) and are consumed unmatched
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKey.eval(head)
            val ht = rTime.eval(head)
            if (hk == null || ht == null) { rBuf.next() }
            else {
              val c = keyOrd.compare(hk, k)
              if (c < 0 || (c == 0 && timeOrd.compare(ht, t) <= 0)) {
                val consumed = rBuf.next()
                if (c == 0) {
                  // copy BOTH retained values: the row (its UnsafeRow buffer
                  // is reused by the sorter) AND the key — a UTF8String /
                  // Decimal / Binary key points into that same reused memory,
                  // so an uncopied matchKey can spuriously compare equal to
                  // a later key under spill and emit a stale matchRow
                  matchRow = consumed.copy()
                  matchKey = InternalRow.copyValue(k)
                  hasMatch = true
                }
              } else advancing = false
            }
          }
          proj(joined(lRow, if (hasMatch) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        plan.output) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** DataFrame API: asofJoin(left, right, key, time) — key/time columns
    * may be any orderable type (string, int, long, decimal, timestamp…);
    * null keys/times match nothing; right columns appear nullable.
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    registerStrategy(spark)
    val lPlan = ColumnBridge.planOf(leftDf)
    val rPlan = ColumnBridge.planOf(rightDf)
    def resolve(p: LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${p.output.map(_.name)}"))
    val (lk, rk) = (resolve(lPlan, leftKey), resolve(rPlan, rightKey))
    val (lt, rt) = (resolve(lPlan, leftTime), resolve(rPlan, rightTime))
    // the merge loop compares RIGHT values under orderings built from
    // the LEFT types — a type mismatch must fail HERE, not as an
    // executor-side ClassCastException after the shuffle already ran
    require(lk.dataType == rk.dataType,
      s"as-of join key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of join time types differ: ${lt.dataType} vs ${rt.dataType}")
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }

  def registerStrategy(spark: SparkSession): Unit =
    // guard the SAME collection the strategy is appended to —
    // planner.extraPlanningStrategies never holds experimental
    // strategies, so the old check re-appended one copy per call and a
    // long-lived session planned every query through N duplicates
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

  /** spark.sql.extensions entry point. */
  class Extensions extends (SparkSessionExtensions => Unit) {
    override def apply(ext: SparkSessionExtensions): Unit =
      ext.injectPlannerStrategy(_ => AsOfStrategy)
  }
}
