package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the right row with the
  * greatest `rightTime <= leftTime` for the same key (SQL `ASOF JOIN`).
  * The reference has no joins at all (SURVEY §2.7); this is the classic
  * time-series operator a pipeline needs, built Spark-first.
  *
  * Algorithm: '''union + partitioned window fill''' — tag both sides,
  * union by name, sort each key's timeline once
  * (`Window.partitionBy(keys).orderBy(time, side)` with right rows first
  * on ties so `<=` is inclusive), propagate the latest right payload with
  * `last(_, ignoreNulls = true)` over the running frame, keep left rows.
  *
  * Scale: ONE shuffle (hash by key), no row blowup — compare the naive
  * `join(cond: rt <= lt) + row_number` which materializes every
  * (left, right-earlier) combination before picking one. This is the
  * standard distributed as-of shape; a custom SparkPlan (zipPartitions
  * over co-sorted sides) could shave the union but not the shuffle.
  *
  * Right-side duplicates on (key, time) are resolved before the join by
  * `rightDedup` (default: keep the row with the greatest first payload
  * column) so results are deterministic.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
               keyCols: Seq[String], leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame =
    asof(left, right, keyCols, leftTime, rightTime, rightPayload, forward = false)

  /** Forward as-of: attach the right row with the '''smallest'''
    * `rightTime >= leftTime` per key — the same one-shuffle union+window
    * plan with the timeline walked in reverse.
    */
  def forward(left: DataFrame, right: DataFrame,
              keyCols: Seq[String], leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame =
    asof(left, right, keyCols, leftTime, rightTime, rightPayload, forward = true)

  /** Deterministic right side: one row per (key, time). max over a struct
    * orders lexicographically, so this keeps ONE real row (greatest by
    * payload order) — per-column max would fabricate a row mixing values
    * from different inputs. Shared with the physical-operator form
    * (`plans.AsOfJoinPlan`).
    */
  def dedupRight(right: DataFrame, keyCols: Seq[String], rightTime: String,
                 rightPayload: Seq[String]): DataFrame =
    right
      // a null rightTime can never satisfy the as-of inequality (SQL ASOF
      // semantics); left in, a nulls-first sort would wrongly treat the
      // row as "earlier than everything" and attach its payload
      .filter(col(rightTime).isNotNull)
      .groupBy((keyCols :+ rightTime).map(col): _*)
      .agg(max(struct(rightPayload.map(col): _*)).as("_p"))
      .select((keyCols :+ rightTime).map(col) ++
        rightPayload.map(c => col(s"_p.$c").as(c)): _*)

  private def asof(left: DataFrame, right: DataFrame,
                   keyCols: Seq[String], leftTime: String, rightTime: String,
                   rightPayload: Seq[String], forward: Boolean): DataFrame = {
    require(rightPayload.nonEmpty, "need at least one right payload column")
    val dedupedRight = dedupRight(right, keyCols, rightTime, rightPayload)

    val leftCols = left.columns.toSeq
    // The entire right payload travels as ONE struct: `last(_, ignoreNulls)`
    // then skips only left rows (whose struct is null), never a right row
    // that happens to carry a null FIELD — per-column fills would resurrect
    // stale values past such a row and stitch columns from different rows.
    val payloadStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => dedupedRight.schema(c).copy(name = c)))
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(
        (keyCols.map(col) :+ col("_t") :+ col("_side")) ++
          leftCols.filterNot(keyCols.contains).map(col) :+
          lit(null).cast(payloadStructType).as("_r"): _*)
    val taggedRight = dedupedRight
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(
        (keyCols.map(col) :+ col("_t") :+ col("_side")) ++
          leftCols.filterNot(keyCols.contains).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightPayload.map(col): _*).as("_r"): _*)

    // right (0) before left (1) on time ties keeps the bound inclusive in
    // both directions; forward walks the timeline newest-first
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_r.$c").as(c)): _*)
  }
}
