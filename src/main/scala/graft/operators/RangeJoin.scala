package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (band) self-join: pairs of rows with equal keys whose
  * timestamps fall within a bounded window of each other.
  *
  * The naive formulation — equi-join on the key with the band as a
  * post-join condition — degenerates when one key is hot: every pair for
  * that key materializes before the band filter runs, O(n_key²) rows for
  * a single shuffle group. Here the join key is (key, time-bucket) with
  * bucket width = the window: the left side probes its own bucket and the
  * next one (a row within `window` of `a` lives in one of those two), so
  * a join group is bounded by a key×bucket's population, not a key's.
  * Each qualifying pair matches exactly one probe (b's bucket is a.bkt or
  * a.bkt+1, never both), so no dedup pass is needed afterwards.
  */
object RangeJoin {

  /** Ordered pairs (a, b) with equal `keyCols` and
    * `a.time < b.time <= a.time + windowSec`. Non-key columns come back
    * prefixed `a_` / `b_`.
    */
  def pairsWithin(df: DataFrame, keyCols: Seq[String], timeCol: String,
                  windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val micros = windowSec * 1000000L
    val payload = df.columns.toSeq.filterNot(keyCols.contains)
    val bucketed = df.withColumn("__bkt",
      floor(unix_micros(col(timeCol)) / lit(micros)))
    val aSide = bucketed.select(
      keyCols.map(col) ++
        payload.map(c => col(c).as(s"a_$c")) :+
        explode(array(col("__bkt"), col("__bkt") + 1)).as("__bkt"): _*)
    val bSide = bucketed.select(
      keyCols.map(col) ++ payload.map(c => col(c).as(s"b_$c")) :+ col("__bkt"): _*)
    aSide.join(bSide, keyCols :+ "__bkt")
      .filter(
        unix_micros(col(s"b_$timeCol")) > unix_micros(col(s"a_$timeCol")) &&
          unix_micros(col(s"b_$timeCol")) <= unix_micros(col(s"a_$timeCol")) + micros)
      .drop("__bkt")
  }
}
