package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-distribution diagnostics — "measure before you join". Salting,
  * bloom-prefiltering, and broadcast decisions all hinge on facts about
  * the key distribution (is there a hot key? how hot? how many keys?),
  * and at 100 TB guessing wrong costs hours. Both entry points are one
  * aggregation over the key column: the per-key counts shuffle partial-
  * aggregated group keys (never rows), and the profile reduces those to
  * a single row.
  */
object SkewStats {

  /** One-row skew profile of `key`: key count, max/avg per-key
    * frequency, p50/p99 frequencies, and the max/avg skew ratio (1.0 =
    * perfectly uniform; AQE's skew threshold thinking starts around
    * ratios of 3-5x).
    */
  def profile(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"),
        round(avg(col("n")), 4).as("avg_n"),
        round(expr("percentile(n, 0.5)"), 4).as("p50_n"),
        round(expr("percentile(n, 0.99)"), 4).as("p99_n"))
      .withColumn("skew_ratio", round(col("max_n") / col("avg_n"), 4))

  /** The keys with frequency >= `minCount`, hottest first, capped at
    * `maxKeys` — a bounded driver-side list sized for `isin`/broadcast
    * use (the hot set of any real distribution is small; if more than
    * `maxKeys` keys clear the bar, the cap keeps the driver safe and the
    * caller's threshold was too low).
    */
  def hotKeys(df: DataFrame, key: String, minCount: Long,
              maxKeys: Int = 1000): Seq[Any] = {
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(desc("n"), col(key))
      .limit(maxKeys)
      .select(col(key))
      .collect().map(_.get(0)).toSeq
  }
}
