package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global running total — the scalable replacement for
  * `sum(x) OVER (ORDER BY ...)`, whose unpartitioned window collapses the
  * whole dataset into ONE task's sort buffer.
  *
  * Classic two-pass prefix sum:
  *  1. range-repartition on the order columns and sort within partitions
  *     (Spark's distributed total sort — no single-node bottleneck);
  *  2. one tiny job collects the per-partition sums (#partitions rows to
  *     the driver), whose exclusive prefix becomes each partition's
  *     offset;
  *  3. a `mapPartitions` pass adds offset + local running sum.
  *
  * Partition boundaries come from range sampling and may vary run to run,
  * but the result never does: a running total over a TOTAL order is
  * boundary-independent (callers must pass a tie-broken order).
  *
  * The motivating pipeline op is token budgeting — "take the
  * highest-quality documents until the token budget is spent" — which is
  * exactly a cumulative sum in quality order (`q50_token_budget`).
  */
object PrefixSum {

  // collision-proof internal column name (guarded by the require below)
  private val ValCol = "__prefix_sum_v"

  /** Append `asCol` = running total of `valueCol` (must be integral; the
    * running value is a long) over the TOTAL order given by `orderCols`.
    */
  def runningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                   asCol: String): DataFrame = {
    require(!df.columns.contains(ValCol) && !df.columns.contains(asCol),
      s"input must not already contain '$ValCol' or '$asCol'")
    val spark = df.sparkSession
    val prepared = df
      .withColumn(ValCol, valueCol.cast(LongType))
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // BOTH passes run over this one RDD lineage: its single range-shuffle
    // dependency is computed once and its map outputs reused, so the
    // (sampled, run-varying) partition boundaries are identical for the
    // sum pass and the output pass. Converting to .rdd twice would build
    // two independent shuffles whose boundaries may disagree — offsets
    // applied to the wrong partitions, silently wrong totals.
    val rdd = prepared.rdd
    val vIdx = prepared.schema.length - 1 // ValCol is the last column
    // pass 1: per-partition sums -> exclusive prefix offsets (tiny: one
    // row per partition). Null values contribute nothing, matching
    // `sum() OVER` semantics.
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator((pid, s))
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](math.max(1, nParts))
    var acc = 0L
    for (pid <- 0 until nParts) {
      offsets(pid) = acc
      acc += partSums.getOrElse(pid, 0L)
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: offset + local running sum, preserving the per-partition
    // sort order
    val outSchema = StructType(prepared.schema.fields :+
      StructField(asCol, LongType, nullable = false))
    val resultRdd = rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var running = bcOffsets.value(pid)
      it.map { row =>
        if (!row.isNullAt(vIdx)) running += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ running)
      }
    }
    spark.createDataFrame(resultRdd, outSchema).drop(ValCol)
  }

  /** GROUPED running total — the scalable replacement for
    * `sum(x) OVER (PARTITION BY g ORDER BY ...)` when single groups are
    * huge: a plain window puts each group in ONE task's sort buffer, so
    * "cumulative tokens per language" with a 40 TB English slice is a
    * one-task sort. Same two-pass scheme as [[runningTotal]], range-
    * partitioned on (group, order) so groups may SPAN partitions freely:
    * pass 1 collects per-(partition, group) sums (one row per group per
    * partition it touches — #partitions x #groups-per-partition, tiny),
    * pass 2 seeds each group's running value from its cross-partition
    * exclusive prefix and resets at group boundaries within a partition
    * (rows arrive group-contiguous from the sort).
    */
  def runningTotalBy(df: DataFrame, groupCols: Seq[String],
                     orderCols: Seq[Column], valueCol: Column,
                     asCol: String): DataFrame = {
    require(groupCols.nonEmpty, "use runningTotal for the ungrouped form")
    require(!df.columns.contains(ValCol) && !df.columns.contains(asCol),
      s"input must not already contain '$ValCol' or '$asCol'")
    val spark = df.sparkSession
    val prepared = df
      .withColumn(ValCol, valueCol.cast(LongType))
      .repartitionByRange(groupCols.map(col) ++ orderCols: _*)
      .sortWithinPartitions(groupCols.map(col) ++ orderCols: _*)
    val rdd = prepared.rdd // one lineage for both passes (see runningTotal)
    val vIdx = prepared.schema.length - 1
    val gIdx = groupCols.map(prepared.schema.fieldIndex)
    def key(r: Row): List[Any] = gIdx.map(r.get(_)).toList
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      val sums = scala.collection.mutable.LinkedHashMap.empty[List[Any], Long]
      it.foreach { r =>
        if (!r.isNullAt(vIdx))
          sums.updateWith(key(r))(s => Some(s.getOrElse(0L) + r.getLong(vIdx)))
        else sums.getOrElseUpdate(key(r), 0L)
      }
      sums.iterator.map { case (k, s) => (pid, k, s) }
    }.collect()
    val offsets: Map[(Int, List[Any]), Long] = partSums.groupBy(_._2)
      .flatMap { case (k, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, s) =>
          val entry = (pid, k) -> acc; acc += s; entry
        }
      }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(prepared.schema.fields :+
      StructField(asCol, LongType, nullable = false))
    val resultRdd = rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var cur: List[Any] = null
      var running = 0L
      it.map { row =>
        val k = key(row)
        if (k != cur) { cur = k; running = bcOffsets.value.getOrElse((pid, k), 0L) }
        if (!row.isNullAt(vIdx)) running += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ running)
      }
    }
    spark.createDataFrame(resultRdd, outSchema).drop(ValCol)
  }
}
