package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Whole-operator as-of join — the custom `LogicalPlan` + `Strategy` +
  * `SparkPlan` tier ((c) in the build guidance), for the operator class
  * Catalyst can't express natively.
  *
  * The DataFrame-composed form (`operators.AsOfJoin`) unions both sides
  * and window-fills: ONE shuffle, but the sort runs over left+right rows
  * together and every left row drags a null payload struct through it.
  * This physical operator instead declares
  * `requiredChildDistribution = ClusteredDistribution(keys)` per side and
  * `requiredChildOrdering = (keys asc, time walk-direction)`, letting
  * EnsureRequirements plan two SMALLER co-partitioned sorts; `doExecute`
  * then merge-walks the two sorted iterators per partition holding ONE
  * candidate right row — O(1) state, no union blowup, no window buffer.
  * At 100 TB: same shuffle count as the union plan, ~half the sort
  * payload, and the payload struct never travels with left rows.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, p, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // keys ascending on both sides; time walks forward (asc) for backward
  // as-of and backward (desc) for forward as-of, so the merge below only
  // ever looks at the buffered head
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val dir = if (forward) Descending else Ascending
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, dir),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, dir))
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = payload
    val fwd = forward
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOutput)
      val payloadProj = UnsafeProjection.create(payloadB, rOutput)
      // the joined row's payload side can be the all-null row for
      // unmatched lefts, so the projection must bind against NULLABLE
      // payload attributes (the declared output) — binding the original
      // right-side attrs would skip the null check and read 0/defaults
      val outProj = UnsafeProjection.create(outAttrs,
        lOutput ++ payloadB.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      val nullPayload: InternalRow = new GenericInternalRow(payloadB.length)
      val joined = new JoinedRow
      val rBuf = rIt.buffered

      new Iterator[InternalRow] {
        // the ONE candidate right row's key + payload, copied out of the
        // projection buffers
        private var heldKey: InternalRow = _
        private var heldPayload: InternalRow = _

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          var walking = true
          while (walking && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) { // stale key group
              rBuf.next(); heldKey = null; heldPayload = null
            } else if (kc == 0) {
              val tc = timeOrd.compare(rTimeProj(r), lt)
              val usable = if (fwd) tc >= 0 else tc <= 0
              if (usable) {
                heldKey = rk.copy(); heldPayload = payloadProj(r).copy()
                rBuf.next()
              } else walking = false
            } else walking = false
          }
          val p =
            if (heldKey != null && keyOrd.compare(heldKey, lk) == 0) heldPayload
            else nullPayload
          outProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public surface: builds the logical node against analyzed children and
  * registers the strategy on the session (idempotent) — works without
  * any `spark.sql.extensions` config, and `GraftExtensions` injects it
  * too for configured sessions.
  */
object AsOfJoinPlan {

  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame =
    build(left, right, keyCols, leftTime, rightTime, rightPayload, forward = false)

  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame =
    build(left, right, keyCols, leftTime, rightTime, rightPayload, forward = true)

  private def build(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    leftTime: String, rightTime: String,
                    rightPayload: Seq[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    // time types must agree for the merge ordering; align right to left
    // (date -> timestamp matches the union-plan's implicit coercion)
    val lTimeType = left.schema(leftTime).dataType
    val rightAligned0 =
      if (right.schema(rightTime).dataType == lTimeType) right
      else right.withColumn(rightTime, col(rightTime).cast(lTimeType))
    // deterministic right side: one row per (key, time), greatest payload
    // struct — identical rule to operators.AsOfJoin
    val rightAligned = graft.operators.AsOfJoin.dedupRight(
      rightAligned0, keyCols, rightTime, rightPayload)

    val lplan = left.queryExecution.analyzed
    val rplan = rightAligned.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found"))
    val node = AsOfJoinNode(
      lplan, rplan,
      keyCols.map(attr(lplan, _)), keyCols.map(attr(rplan, _)),
      attr(lplan, leftTime), attr(rplan, rightTime),
      rightPayload.map(attr(rplan, _)), forward)
    org.apache.spark.sql.graftops.PlanBridge.dataFrame(spark, node)
  }
}
