package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution AQE can't fix (e.g. a
  * few keys holding 30%+ of a 100 TB fact table).
  *
  * Classic salting: the large (skewed) side gets a '''deterministic'''
  * salt in `[0, factor)` derived from a stable hash of its whole row-key
  * tuple (never `rand()` — results must be reproducible and retries must
  * not reshuffle rows); the small side is exploded `factor` times, one
  * copy per salt value. The join key becomes `(key, salt)`, spreading
  * each hot key over `factor` partitions. Row multiplication is confined
  * to the SMALL side (factor * |small|).
  *
  * AQE's skew-join split handles sort-merge cases automatically; salting
  * remains the tool when the skew is in an aggregation-feeding join or
  * when partition-splitting isn't available (e.g. bucketed tables).
  */
object SaltedJoin {

  /** Inner-join `large` with `small` on `key`, salting `large` with
    * `factor` deterministic salts. `saltOn` columns (default: the join
    * key plus all large-side columns' hash) drive the salt so the same
    * logical row always lands in the same salt bucket.
    */
  def inner(large: DataFrame, small: DataFrame, key: String,
            factor: Int = 8): DataFrame =
    saltedJoin(large, small, key, factor, "inner")

  /** Left-outer variant: same salting scheme, null-extension preserved.
    * Correctness argument: the exploded small side carries EVERY key at
    * EVERY salt value, so a large row matches on `(key, salt)` iff its
    * key exists in `small` at all — an unmatched large row null-extends
    * exactly once (its single salt bucket), never `factor` times and
    * never zero.
    */
  def leftOuter(large: DataFrame, small: DataFrame, key: String,
                factor: Int = 8): DataFrame =
    saltedJoin(large, small, key, factor, "left_outer")

  /** Hot-key-aware inner join: only rows whose key is in `hot` take the
    * salted path; everything else joins plain. Blanket salting explodes
    * the ENTIRE small side `factor` times — at a 10^8-row dim and
    * factor 16 that is 1.6 x 10^9 shuffled rows to fix a handful of hot
    * keys. Splitting confines the explosion to the hot keys' dim rows
    * (|hot| x factor rows, usually thousands), while the cold path keeps
    * the unsalted plan AQE already handles well. `hot` comes from
    * [[SkewStats.hotKeys]] — a bounded, driver-side list; the two paths
    * partition the key space exactly, so plain-join equivalence holds
    * row for row.
    */
  def innerHotAware(large: DataFrame, small: DataFrame, key: String,
                    hot: Seq[Any], factor: Int = 8): DataFrame = {
    if (hot.isEmpty) large.join(small, Seq(key))
    else {
      val isHot = col(key).isin(hot: _*)
      inner(large.filter(isHot), small.filter(isHot), key, factor)
        .unionByName(large.filter(!isHot).join(small.filter(!isHot), Seq(key)))
    }
  }

  private def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                         factor: Int, joinType: String): DataFrame = {
    require(factor >= 1)
    // deterministic salt from the row content (xxhash64 is codegen'd and
    // stable across runs/partitions)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.toSeq.map(col): _*), lit(factor)).cast("int"))
    val exploded = small
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-stage (salted) aggregation: partial-aggregate on `(key, salt)`,
    * then final-aggregate on `key`. Spark's hash aggregate already does
    * map-side partials; this adds an extra reduce tier for the case where
    * even the partially-aggregated hot key overwhelms one reducer (very
    * high-cardinality aggregation states, e.g. collect-like buffers).
    */
  def twoStageCount(df: DataFrame, key: String, factor: Int = 8): DataFrame = {
    // the salt must vary WITHIN a key or nothing is split: a key-derived
    // salt sends every partial of the hot key to one reducer anyway.
    // spark_partition_id varies per input partition, so a hot key's
    // partials spread over up to `factor` stage-1 reducers.
    df.withColumn("_salt", pmod(spark_partition_id(), lit(factor)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
  }

  /** The collect-like-buffer case the two-stage tier exists for: a
    * distinct-set aggregation whose hot key's state is too large for one
    * reducer. Stage 1 builds per-`(key, salt)` partial sets (each at most
    * `1/factor`-ish of the hot key's distincts per reducer — dedup
    * happens IN the partial, so the stage-2 merge sees pre-shrunk
    * arrays), stage 2 unions them. Returns `(key, n_distinct, vals)` with
    * `vals` sorted for determinism.
    */
  def twoStageDistinctSet(df: DataFrame, key: String, valueCol: String,
                          factor: Int = 8): DataFrame = {
    df.withColumn("_salt", pmod(spark_partition_id(), lit(factor)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_partial"))))).as("vals"))
      .select(col(key), size(col("vals")).cast("long").as("n_distinct"), col("vals"))
  }
}
