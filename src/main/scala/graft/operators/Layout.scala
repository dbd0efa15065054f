package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-layout control for scan pruning — the write-side half of "push
  * down and prune". Partition-directory pruning (`partitionBy`) is
  * proven elsewhere (LSH/IVF index layouts); this covers the OTHER
  * pruning axis: parquet row-group min/max statistics. A table written
  * range-sorted on its filter key gives every row group a tight key
  * interval, so a point or range predicate skips all but the overlapping
  * groups AT THE READER — no directory scheme, no index, just footer
  * stats. At 100 TB this is the difference between "read 100 TB to find
  * one key range" and "read the handful of row groups whose [min, max]
  * intersects it". Unsorted layouts silently defeat it: every row group
  * spans the whole key domain and nothing skips.
  *
  * `repartitionByRange` + `sortWithinPartitions` is the idiomatic Spark
  * spelling: one range shuffle clusters globally, the in-partition sort
  * orders within files, and parquet's writer emits per-row-group stats
  * for free.
  */
object Layout {

  /** Write `df` range-clustered and sorted on `sortCol` into `nFiles`
    * files. Overwrites `path`.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
                       nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
