package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact top-k rows per group with BOUNDED executor state and a BOUNDED
  * shuffle — the scale-safe replacement for the ubiquitous
  * `row_number().over(Window.partitionBy(group).orderBy(value))` pattern,
  * which sorts every group's FULL row set inside one task: a group
  * holding 10^9 rows (one language's n-gram vocabulary, one domain's
  * documents) single-tasks and spills, and the shuffle carries the whole
  * input. This operator is the grouped twin of
  * [[graft.search.Search.topK]]'s bounded-state plan:
  *
  *  - stage 1 (`mapPartitions`): one size-capped candidate buffer PER
  *    GROUP PER INPUT PARTITION (compacted to its top-k whenever it
  *    exceeds `2k`, so per-group state is O(k), never O(partition rows)) —
  *    emits at most `groups x k` rows per partition;
  *  - stage 2: a group-keyed rank over the survivors. The window here is
  *    SAFE by construction: each group's survivor set is <= k x
  *    #partitions rows (for k=10 on a 10^4-partition cluster, 10^5 rows
  *    worst case), so no task ever sees more than that regardless of how
  *    large the original group was.
  *
  * Total shuffle: <= groups x k x partitions survivor rows, vs. the
  * window form's full input. State honesty: stage-1 memory is O(k x
  * DISTINCT GROUPS SEEN BY THE PARTITION) — tight when groups are few
  * (domains, languages, facet values) or the input is already
  * clustered by group; for group cardinality approaching the row count
  * with scattered input, `repartition(group)` first (the shuffle then
  * matches the window form's, but the per-task full sort is still
  * replaced by an O(rows log k) heap that cannot spill-sort a hot
  * group). Rows pass through intact (any schema);
  * ordering is `orderCol` descending (`asc = true` flips it), ties broken
  * ascending by `tieCols` — ties MUST be broken fully for the stage-1
  * compaction cut to be exact (a boundary tie dropped under an
  * unspecified order could be the true winner), so `tieCols` must make
  * the sort total per group; a loud runtime check cannot see semantics,
  * but the spec grades a duplicate-heavy fixture against the naive
  * window form.
  *
  * Supported column types for `orderCol` and `tieCols`: numeric,
  * string, boolean, date, timestamp — anything whose JVM value is
  * `Comparable`. Null order values rank last in either direction; tie
  * values must be non-null. CAVEAT for strings: the stage-1 cut
  * compares with JVM `String.compareTo` (UTF-16 code units) while the
  * stage-2 window uses Spark's UTF-8 binary ordering — identical for
  * ASCII (hex digests, identifiers), divergent for some non-BMP text;
  * keep string order columns ASCII or the cut can disagree with the
  * final rank.
  */
object TopKPerGroup {

  def topK(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int,
           tieCols: Seq[String], asc: Boolean = false,
           rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    require(tieCols.nonEmpty,
      "tieCols must make the per-group order total (see scaladoc)")
    val spark = df.sparkSession
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val oIdx = schema.fieldIndex(orderCol)
    val tIdx = tieCols.map(schema.fieldIndex)
    val sign = if (asc) 1 else -1
    require(schema(oIdx).dataType match {
      case _: NumericType | StringType | BooleanType | DateType |
           TimestampType => true
      case _ => false
    }, s"orderCol '$orderCol' must be orderable (numeric/string/bool/" +
      s"date/timestamp), got ${schema(oIdx).dataType}")

    def cmp(a: Row, b: Row): Int = {
      val (oa, ob) = (a.get(oIdx), b.get(oIdx))
      val c0 =
        if (oa == null && ob == null) 0
        else if (oa == null) 1 // nulls last in either direction
        else if (ob == null) -1
        else sign * oa.asInstanceOf[Comparable[Any]].compareTo(ob)
      if (c0 != 0) return c0
      var i = 0
      while (i < tIdx.length) {
        val (va, vb) = (a.get(tIdx(i)), b.get(tIdx(i)))
        require(va != null && vb != null, s"null tie value in '${tieCols(i)}'")
        val c = va.asInstanceOf[Comparable[Any]].compareTo(vb)
        if (c != 0) return c
        i += 1
      }
      0
    }
    val ord: Ordering[Row] = (a, b) => cmp(a, b)

    val survivors = df.mapPartitions { it =>
      val best = new scala.collection.mutable.HashMap[
        Seq[Any], scala.collection.mutable.ArrayBuffer[Row]]
      it.foreach { r =>
        val key: Seq[Any] = gIdx.map(r.get)
        val buf = best.getOrElseUpdate(key,
          new scala.collection.mutable.ArrayBuffer[Row](k + 1))
        buf += r
        if (buf.length > 2 * k) {
          val keep = buf.sorted(ord).take(k)
          buf.clear(); buf ++= keep
        }
      }
      best.valuesIterator.flatMap(_.sorted(ord).take(k))
    }(Encoders.row(schema))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy((orderColExpr(orderCol, asc) +: tieCols.map(col)): _*)
    survivors
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  private def orderColExpr(c: String, asc: Boolean): Column =
    if (asc) col(c).asc_nulls_last else col(c).desc_nulls_last
}
