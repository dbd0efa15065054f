package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-shard export — the last step of a data
  * pipeline: write the final corpus as fixed-size shards in a
  * reproducible global order, with a manifest the training job (and an
  * auditor) can verify counts and membership against.
  *
  * Shard identity derives from [[Shuffle.deterministicShuffle]]'s
  * position (salted-md5 global order), so re-running the export over
  * identical input reproduces identical shard membership AND in-shard
  * order — the property that makes a training run resumable and a
  * corpus release auditable. The manifest carries per-shard row counts,
  * position ranges and an order-binding checksum (sum over rows of
  * `key * (in-shard position + 1)` — plain BIGINT arithmetic, so an
  * external SQL engine re-derives it exactly; a swapped, dropped or
  * reordered row changes it).
  *
  * Scale shape: one deterministic-shuffle pass (range partition on the
  * hash + per-partition offsets — no global window), one hash
  * repartition by shard for the write (each shard's rows land in exactly
  * one task, so `partitionBy` emits exactly one file per shard), and a
  * shard-keyed partial aggregate for the manifest.
  */
object Export {

  /** `(rows + shard/pos columns, manifest)` — the plan both [[writeShards]]
    * and the oracle-gated manifest query share.
    */
  def shardPlan(df: DataFrame, keyCol: String, rowsPerShard: Int,
                salt: String = ""): (DataFrame, DataFrame) = {
    require(rowsPerShard >= 1, "rowsPerShard must be >= 1")
    val rows = Shuffle.deterministicShuffle(df, keyCol, salt)
      .withColumn("shard", (col("pos") / rowsPerShard).cast("long"))
    val manifest = rows.groupBy(col("shard")).agg(
        count(lit(1)).as("n_rows"),
        min(col("pos")).as("pos_min"),
        max(col("pos")).as("pos_max"),
        sum(col(keyCol).cast("long") *
          (col("pos") % rowsPerShard + lit(1L))).as("checksum"))
      .orderBy(col("shard"))
    (rows, manifest)
  }

  /** Write `outDir/shard=N/` (one file per shard, rows in deterministic
    * order) plus `outDir/_manifest` parquet. Returns the manifest.
    *
    * `format`: `parquet` (default — typed, splittable, the training
    * path) or `jsonl` (interchange — round-trips through `ImportJsonl`
    * and any other engine's JSON reader; types go through JSON's usual
    * inference on re-read, so prefer parquet when the consumer is
    * Spark). Both carry the `pos` column, so a consumer can re-derive
    * the manifest checksum and PROVE it received every row in order —
    * the manifest is not a trust-me artifact.
    */
  def writeShards(df: DataFrame, keyCol: String, outDir: String,
                  rowsPerShard: Int, salt: String = "",
                  format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "jsonl",
      s"format must be parquet|jsonl, got '$format'")
    val (rows, manifest) = shardPlan(df, keyCol, rowsPerShard, salt)
    val w = rows.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
    if (format == "jsonl") w.json(outDir) else w.parquet(outDir)
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** Split-aware export: assign every row a split via
    * [[Sampling.hashSplit]] (hash-range on the key — append-stable, so
    * a row can never drift from test into train between releases), then
    * write each split as its own deterministic shard tree under
    * `outDir/<split>/`. Returns the union of the per-split manifests
    * with a leading `split` column.
    *
    * The split assignment costs nothing extra (a map-side CASE on the
    * same pass); each split's shard order is the deterministic shuffle
    * of ITS rows, so a training job can consume `train/` while `test/`
    * ships to an eval harness, both auditable against their manifests.
    */
  def writeSplitShards(df: DataFrame, keyCol: String, outDir: String,
                       rowsPerShard: Int, splits: Seq[(String, Int)],
                       salt: String = "",
                       format: String = "parquet"): DataFrame = {
    val assigned = Sampling.hashSplit(df, keyCol, splits)
    splits.map { case (name, _) =>
      writeShards(assigned.filter(col("split") === name).drop("split"),
          keyCol, s"$outDir/$name", rowsPerShard, salt, format)
        .withColumn("split", lit(name))
        .select("split", "shard", "n_rows", "pos_min", "pos_max", "checksum")
    }.reduce(_ unionByName _)
  }
}
