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

  /** Per-group n-gram diversity: how repetitive is a source, before
    * dedup ever runs? A crawl that templates the same boilerplate page
    * has few distinct n-grams per occurrence (low type-token ratio, low
    * entropy); a genuinely diverse source approaches one distinct gram
    * per occurrence. The self-BLEU-flavored corpus diagnostic a mixture
    * owner reads next to [[vocabDrift]]: drift says "this source looks
    * different", diversity says "this source repeats itself".
    *
    * Scale shape: gram extraction is row-local (token-array slices, no
    * positional join), then two hash aggregations — (group, gram)
    * counts and per-group rollups — both map-side combined. No window,
    * no per-group collected list: the Shannon entropy accumulates in
    * FIXED POINT (each gram's `c·ln(c/T)` term rounded to integer
    * micro-units, summed as DECIMAL(38,0)) so the sum is exact under
    * any row order, partitioning, or engine — the Classifier gradient
    * discipline applied to an entropy.
    *
    * Output: (groupCol, n_docs, total_ngrams, distinct_ngrams,
    * ttr = distinct/total, entropy = -Σ (c/T)·ln(c/T), both rounded 6).
    * Groups whose docs are all shorter than n tokens report 0 grams and
    * 0.0 ratios.
    */
  def ngramDiversity(df: DataFrame, textCol: String, groupCol: String,
                     n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in 1..8, got $n")
    val toks = array_remove(
      TextFunctions.tokens(trim(lower(col(textCol)))), "")
    // filter BEFORE building the position sequence: sequence(1, 0) in
    // Spark is the DESCENDING [1, 0], not empty
    val grams = df
      .select(col(groupCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(groupCol),
        explode(transform(
          sequence(lit(1), size(col("__toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(n))))).as("gram"))
    val counts = grams.groupBy(col(groupCol), col("gram"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("distinct"))
    val ent = counts.join(totals, Seq(groupCol))
      .select(col(groupCol),
        round(col("c").cast("double")
            * log(col("c").cast("double") / col("total").cast("double"))
            * lit(1e6))
          .cast("long").cast("decimal(38,0)").as("__t"))
      .groupBy(col(groupCol)).agg(sum(col("__t")).as("__ent"))
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .join(totals, Seq(groupCol), "left")
      .join(ent, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"),
        coalesce(col("total"), lit(0L)).as("total_ngrams"),
        coalesce(col("distinct"), lit(0L)).as("distinct_ngrams"),
        round(coalesce(col("distinct").cast("double") / col("total"), lit(0.0)),
          6).as("ttr"),
        round(coalesce(-col("__ent").cast("double") / lit(1e6) / col("total"),
          lit(0.0)), 6).as("entropy"))
  }
}
