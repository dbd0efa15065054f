package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — approximate frequencies in
  * `depth x width` integers regardless of vocabulary size.
  *
  * At 100 TB the exact token-frequency table IS computable (one shuffle),
  * but it is corpus-vocabulary-sized state that many pipeline steps don't
  * want to carry: a CM sketch answers "roughly how often does X occur"
  * from a few KB that fold associatively across partitions, streams and
  * days (cells are plain sums — two sketches merge by addition, and a
  * map-side partial aggregate builds it in one pass with no
  * vocabulary-sized shuffle). Estimates never undercount; overcounts are
  * bounded by collisions (eps ~ e/width per row, beaten d times).
  *
  * Every hash is md5-derived (the engine's portable-hash discipline —
  * `Sampling.hashBucket`, `Keyword.tokenBucket`), so the sketch an
  * executor builds, the driver probes, and a SQL oracle re-derives are
  * bit-identical: the q114 gate grades the ESTIMATES exactly, not just
  * their error bound.
  */
object CountMin {

  /** Bucket of `tok` in hash row `i`: first 6 hex chars of
    * `md5(i:tok)` mod `width` — row-salted so the d rows are
    * independent hash functions.
    */
  def bucketCol(tok: Column, i: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(i.toString), tok)), 1, 6), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Sketch cells `(i, bucket, cnt)` from a one-column token frame —
    * one scan (the d buckets of each occurrence explode from an inline
    * array), one `depth x width`-sized aggregate with map-side partials.
    */
  def sketch(tokens: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth x $width")
    tokens
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), bucketCol(col(tokCol), i, width).as("bucket"))): _*)).as("p"))
      .select(col("p.i").as("i"), col("p.bucket").as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` (a small one-column token frame):
    * `(tok, cm_est)` where the estimate is the min over the d rows of
    * the token's cell — never below the true count. Probes are
    * broadcast-joined against the (tiny) cell table.
    */
  def estimate(cells: DataFrame, probes: DataFrame, tokCol: String,
               depth: Int, width: Int): DataFrame = {
    val probeBuckets = probes
      .select(col(tokCol), explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), bucketCol(col(tokCol), i, width).as("bucket"))): _*)).as("p"))
      .select(col(tokCol), col("p.i").as("i"), col("p.bucket").as("bucket"))
    probeBuckets
      .join(cells, Seq("i", "bucket"), "left")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }
}
