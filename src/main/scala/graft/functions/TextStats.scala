package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-distribution statistics for data governance — the checks that
  * decide whether a source (or a new snapshot) still looks like the
  * corpus a pipeline was tuned on.
  */
object TextStats {

  /** Per-group unigram KL divergence `KL(group || corpus)` with add-1
    * smoothing over the corpus vocabulary — the drift/contrast score a
    * mixture owner watches per source (and, run on time buckets, the
    * snapshot-drift alarm): a source whose word distribution diverges
    * from the corpus is a different language, a new domain, or encoding
    * damage, and each of those invalidates per-corpus tuning (stopword
    * lists, quality thresholds, tokenizer fit) silently.
    *
    * Tokenization matches [[Bpe.wordFreqs]] (lowercased whitespace
    * words). Returns `(groupCol, n_tokens, kl)` with `kl` rounded to 6
    * decimals (the per-word terms are bit-identical across engines —
    * same f64 expression shape — and the final sum is rounded so
    * summation order cannot flip the gate).
    *
    * Scale shape: two corpus-linear token aggregates (corpus counts,
    * group counts — both partial-agg'd on word keys), then all work is
    * VOCABULARY-sized: a groups x vocab frame (the smoothed support —
    * absent words must still contribute to KL) built from two broadcast
    * joins, one per-group sum. No window, no corpus-sized shuffle
    * beyond the two count aggregates.
    */
  def vocabDrift(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = df.select(col(groupCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val corpus = toks.groupBy(col("word")).agg(count(lit(1)).as("__cn"))
    val totals = corpus.agg(
      sum(col("__cn")).as("__ct"),
      count(lit(1)).as("__v"))
    val groupCounts = toks.groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("__gn"))
    val groupTotals = toks.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__gt"))
    // smoothed support: every (group, vocab word) cell, absent words at
    // count 0 — vocab-sized work, broadcast-joined
    val support = groupTotals.crossJoin(broadcast(corpus))
      .join(groupCounts, Seq(groupCol, "word"), "left")
      .na.fill(0L, Seq("__gn"))
      .crossJoin(broadcast(totals))
    val ps = (col("__gn") + lit(1.0)) / (col("__gt") + col("__v"))
    val pc = (col("__cn") + lit(1.0)) / (col("__ct") + col("__v"))
    support
      .groupBy(col(groupCol))
      .agg(
        first(col("__gt")).as("n_tokens"),
        round(sum(ps * log(ps / pc)), 6).as("kl"))
  }
}
