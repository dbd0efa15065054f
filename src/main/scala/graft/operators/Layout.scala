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

  /** Spread a frame across the session's cores BEFORE an expensive
    * row-local stage (per-row hashing/shingling/decoding) when the
    * input's split count would serialize it. Small inputs arrive as ONE
    * parquet split (a few-MB file is far under
    * `spark.sql.files.maxPartitionBytes`), so without this every
    * downstream row-local UDF runs on a single core regardless of
    * session parallelism — the round-10 media-decode finding,
    * generalized to the text/hash operators. Plan-driven: a no-op when
    * the plan already carries at least the session's parallelism, so
    * cluster-scale inputs with hundreds of splits never pay the extra
    * exchange (the optimization rule that a bare "repartition for
    * parallelism" is an accidental shuffle at scale). Call it on the
    * NARROW projection that feeds the expensive stage — the exchange
    * then moves only the columns the stage needs.
    */
  def spreadForCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

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

  /** Z-ORDER (Morton) clustering — multi-column pruning where
    * [[writeRangeSorted]] covers one column: a single-column sort gives
    * THAT column tight row-group intervals and leaves every other
    * filter column scattered across the full domain, so "WHERE x
    * BETWEEN … AND y BETWEEN …" tables need interleaved clustering.
    * Each z-column maps to a quantile-bucket id (boundaries from ONE
    * `approxQuantile` pass — a sample-bounded sketch and a
    * driver-side array of 2^bits doubles, never a global sort or rank
    * window), the bucket ids' bits interleave into a Morton code, and
    * one range shuffle + in-partition sort on that code writes files
    * whose row groups are tight HYPER-RECTANGLES in bucket space —
    * a predicate on ANY subset of the z-columns skips row groups at
    * the reader (the Delta/Iceberg OPTIMIZE ZORDER discipline, spelled
    * in plain Spark).
    *
    * Numeric columns only; nulls cluster into the lowest bucket.
    * `bitsPerCol * zCols.size` must fit a long (<= 63).
    *
    * Deliberately NOT offered on collections: the COW journal plans
    * upsert/delete rewrites from `_key` footer ranges, and re-
    * clustering by other columns would make every small correction
    * rewrite the table (the exact leak ScaleProbe caught in compact()
    * once). Z-order the EXPORTED analytical copies, not the mutable
    * store.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    nFiles: Int, bitsPerCol: Int = 12): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    require(zCols.size >= 2, "z-ordering needs at least two columns " +
      "(use writeRangeSorted for one)")
    require(bitsPerCol >= 1 && bitsPerCol * zCols.size <= 63,
      s"bitsPerCol * nCols must be in 1..63, got ${bitsPerCol * zCols.size}")
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val doubled = zCols.foldLeft(df)((d, c) =>
      d.withColumn(s"__zq_$c", col(c).cast("double")))
    val bounds = doubled.stat.approxQuantile(
      zCols.map(c => s"__zq_$c").toArray, probs, 0.25 / nBuckets)
    val boundsB = df.sparkSession.sparkContext.broadcast(bounds)
    val nCols = zCols.size
    val zUdf = udf { (vals: Seq[Double]) =>
      val bs = boundsB.value
      var z = 0L
      var i = 0
      while (i < nCols) {
        val v = vals(i) // nulls arrive as -Inf (coalesced below) -> bucket 0
        val bucket = {
          val idx = java.util.Arrays.binarySearch(bs(i), v)
          if (idx >= 0) idx + 1 else -(idx + 1) // first boundary > v
        }
        var b = 0
        while (b < 32 && (bucket >> b) != 0) { // interleave set bits
          if (((bucket >> b) & 1) == 1) z |= 1L << (b * nCols + i)
          b += 1
        }
        i += 1
      }
      z
    }
    doubled
      .withColumn("__z", zUdf(array(zCols.map(c =>
        coalesce(col(s"__zq_$c"), lit(Double.NegativeInfinity))): _*)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((zCols.map(c => s"__zq_$c") :+ "__z"): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
