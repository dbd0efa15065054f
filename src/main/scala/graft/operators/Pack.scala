package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "concat-and-chunk" step that turns a deduped,
  * filtered corpus into fixed-length training examples: documents are
  * concatenated in the deterministic shuffle order and the resulting
  * token stream is cut every `seqLen` tokens (GPT-style packing; a
  * document that straddles a cut contributes its tail to the next
  * sequence). The output is a PLAN — which tokens of which document land
  * in which training sequence — so the actual example materialization
  * (tokenize + slice) can run embarrassingly parallel downstream with no
  * further coordination.
  *
  * The reference engine has no training-export surface (it serves
  * search); this is a north-star pipeline extension like
  * [[Shuffle.deterministicShuffle]] and [[Export.shardPlan]], and it
  * composes with both: same order as the shuffle, and `seqLen`-sized
  * sequences play the role shards play in the export.
  *
  * Scale shape: the only global coordination is the running token total,
  * computed by the two-pass distributed [[PrefixSum]] (range-repartition
  * + per-partition offsets) — NO single-task `sum() OVER (ORDER BY ...)`
  * window anywhere. The doc→sequence explode emits
  * `ceil(n_tok / seqLen) + 1` rows per document at most (a document
  * overlaps that many sequences), and the per-sequence aggregate is an
  * ordinary partial-aggregated groupBy on a uniform key. Every stage is
  * O(n/p) per task at any corpus size.
  */
object Pack {

  /** Per-document placement in the packed token stream.
    *
    * Output: `keyCol`, `n_tok` (the document's token count), `tok_start`
    * (inclusive global token offset), `tok_end` (exclusive), `seq_first`
    * / `seq_last` (the first/last sequence ids the document touches).
    * Documents with `n_tok <= 0` carry no tokens and are dropped.
    *
    * Determinism: order is `(md5(salt || key), key)` — identical to
    * [[Shuffle.deterministicShuffle]], so re-runs (and other engines)
    * reproduce byte-identical placements.
    */
  def placements(df: DataFrame, keyCol: String, tokCol: String,
                 seqLen: Long, salt: String = ""): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val h = md5(concat(lit(salt), col(keyCol).cast("string")))
    val cum = PrefixSum.runningTotal(
      df.select(col(keyCol), col(tokCol).cast("long").as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("__h", h),
      Seq(col("__h"), col(keyCol)), col("n_tok"), "__cum")
    cum
      .withColumn("tok_start", col("__cum") - col("n_tok"))
      .withColumn("tok_end", col("__cum"))
      // integer `div`, not floor(a / b): the `/` route goes through f64,
      // which stops being exact past 2^52 total tokens
      .withColumn("seq_first", expr(s"tok_start div ${seqLen}"))
      .withColumn("seq_last", expr(s"(tok_end - 1) div ${seqLen}"))
      .select(col(keyCol), col("n_tok"), col("tok_start"), col("tok_end"),
        col("seq_first"), col("seq_last"))
  }

  /** Per-sequence manifest of the packed corpus: `seq_id`, `n_docs`
    * (documents contributing tokens to the sequence), `n_tokens` (always
    * `seqLen` except possibly the final sequence), and an order-binding
    * `checksum` = Σ key · (tokens the doc contributes to this sequence) —
    * a dropped, duplicated or re-ordered document changes at least one
    * sequence's row. Keys must be integral for the checksum.
    */
  def packPlan(df: DataFrame, keyCol: String, tokCol: String,
               seqLen: Long, salt: String = ""): DataFrame = {
    val p = placements(df, keyCol, tokCol, seqLen, salt)
    val contrib: Column =
      least(col("tok_end"), (col("seq_id") + 1) * seqLen) -
        greatest(col("tok_start"), col("seq_id") * seqLen)
    p.select(col(keyCol), col("tok_start"), col("tok_end"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .withColumn("__contrib", contrib)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__contrib")).as("n_tokens"),
        sum(col(keyCol).cast("long") * col("__contrib")).as("checksum"))
      .select(col("seq_id"), col("n_docs"), col("n_tokens"), col("checksum"))
  }
}
