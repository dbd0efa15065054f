package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * "perplexity under a reference LM" quality filter (Wenzek et al. 2019,
  * arXiv:1911.00359), one model order above the unigram cross-entropy in
  * q65. The reference engine has no LM scoring at all; this is a
  * north-star training-pipeline extension on the `documents` fixture.
  *
  * Scale shape: training is two corpus-linear aggregations (bigram and
  * context counts, both partial-agg map-side combined); scoring joins the
  * per-doc bigram term-frequency table against the count tables on their
  * natural keys (sort-merge at scale, never all-pairs) and reduces per
  * doc. Nothing in the plan is quadratic and the only broadcast is the
  * single-row vocabulary size.
  *
  * Oracle parity: the per-doc f64 log-prob sum is folded in sorted
  * (w1, w2) order on BOTH engines (Spark `aggregate` over `sort_array`
  * == DuckDB `list_reduce` over `list(... ORDER BY w1, w2)`), so
  * accumulation order cannot flip the hash; the smoothed probability is
  * a single IEEE division of exactly-representable integers, and `ln`'s
  * ≤1-ulp cross-engine drift vanishes under the round-6 output
  * discipline (the q65/q109 precedent).
  */
object NgramLm {

  /** Lower-cased whitespace tokens with the split()-edge empties removed
    * (the `list_filter(t <> '')` oracle twin).
    */
  private def cleanTokens(text: Column): Column =
    array_remove(TextFunctions.tokens(lower(text)), "")

  /** Per-document bigram cross-entropy under the corpus's own add-k
    * smoothed bigram LM:
    *
    *   xent2(doc) = -(1/N) Σ_occurrences ln p(w2 | w1)
    *   p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)
    *
    * where c(w1 w2) is the corpus bigram count, c(w1 ·) the context
    * count (bigrams starting with w1 — NOT the unigram count, so the
    * conditional sums to 1 over the vocabulary), V the corpus unigram
    * vocabulary size, and N the document's bigram occurrence count.
    * Documents with fewer than two tokens have no bigrams and score 0.
    *
    * Output: (keyCol, xent2 DOUBLE rounded 6). Lower = more in-corpus;
    * the usual filter keeps the low-perplexity band.
    */
  def bigramCrossEntropy(docs: DataFrame, keyCol: String, textCol: String,
                         addK: Double = 1.0): DataFrame = {
    require(addK > 0, s"addK must be positive for smoothing, got $addK")
    val toks = docs.select(col(keyCol), cleanTokens(col(textCol)).as("toks"))
    // bigram occurrences via zipped slices (no positional join)
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col(keyCol),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
      .select(col(keyCol), col("b.0").as("w1"), col("b.1").as("w2"))
    val tf = bi.groupBy(col(keyCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c2 = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = toks.select(explode(col("toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val contrib = tf
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("c", col("tf") *
        log((col("c2") + lit(addK)) /
            (col("c1") + lit(addK) * col("v"))))
    // (w1, w2) is unique per doc in tf, so the struct sort is fully
    // determined by the gram — the c field is never compared
    val agg = contrib.groupBy(col(keyCol)).agg(
      aggregate(
        sort_array(collect_list(struct(col("w1"), col("w2"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("sumc"),
      sum(col("tf")).as("n"))
    docs.select(col(keyCol))
      .join(agg, Seq(keyCol), "left")
      .select(col(keyCol),
        round(coalesce(-col("sumc") / col("n"), lit(0.0)), 6).as("xent2"))
  }

  /** CCNet-style perplexity banding (Wenzek et al. 2019 §4.3): each
    * document lands in a `head` / `middle` / `tail` quality band
    * RELATIVE TO ITS OWN GROUP (language, usually) so a hard language
    * never loses its whole corpus to one global threshold. CCNet cuts at
    * per-language perplexity quantiles; computing exact quantiles
    * distributed means a per-group rank — a corpus-sized sort — so the
    * band cuts here are the mean and mean+stddev of the group's
    * cross-entropy instead: one aggregation pass, map-side combined, no
    * window, and the thresholds converge to fixed population statistics
    * as the corpus grows (quantiles of a unimodal score and mean/sigma
    * cuts band the same tails).
    *
    * Engine-checkable determinism: the banding input is the ROUNDED
    * xent2 (6 dp — exactly what [[bigramCrossEntropy]] emits, so both
    * engines band the identical doubles), scaled to integer micro-units
    * and summed as DECIMAL(38,0) — exact under any row order at any
    * scale (the q62 label-sum precedent). Mean and sigma then derive
    * from exact integers through one shared IEEE expression tree.
    *
    * Output: (keyCol, groupCol, xent2, band) with band in
    * {'head', 'middle', 'tail'}: head = xent strictly below the group
    * mean, middle = at most one sigma above (inclusive, so a
    * single-doc or score-flat group — xent == mean, sigma == 0 — is
    * 'middle', not 'tail'), tail = beyond. A NULL group value is a
    * group of its own (the stats join is null-safe `<=>`): unattributed
    * documents band against each other instead of silently vanishing
    * from the output, the way a plain equi-join would drop them.
    */
  def perplexityBands(docs: DataFrame, keyCol: String, textCol: String,
                      groupCol: String, addK: Double = 1.0): DataFrame = {
    val xent = bigramCrossEntropy(docs, keyCol, textCol, addK)
    // NOT materialized, deliberately (round 12): `scored` feeds both the
    // stats aggregate and the band join, so a full evaluation runs the
    // LM pipeline twice (24 corpus scans in the q208 plan; an eager
    // localCheckpoint cuts it to 4 and took q208 3.05 -> 2.65s) — but
    // the checkpoint barrier also blocks Catalyst's column pruning, and
    // consumers that never read the scores (count-style actions — q193's
    // bench shape) pay the full fold both engines would otherwise prune
    // (measured 0.47 -> 2.70s). Lazy keeps cheap consumers cheap; heavy
    // consumers should checkpoint the OUTPUT if they reuse it.
    val scored = docs.select(col(keyCol), col(groupCol))
      .join(xent, Seq(keyCol))
      .withColumn("__m", round(col("xent2") * 1e6).cast("long"))
    val stats = scored.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__m").cast("decimal(38,0)")).as("__s1"),
      // __m * __m stays in long range (xent2 < ~40 -> micro < 4e7,
      // squared < 1.6e15); the SUM is where overflow lives -> decimal
      sum((col("__m") * col("__m")).cast("decimal(38,0)")).as("__s2"))
    val n = col("__n").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val mean = s1 / n
    val sd = sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0)))
    // null-safe on the group: NULL <=> NULL matches, so unattributed
    // docs keep their own band group rather than dropping from the join
    scored.join(broadcast(stats.withColumnRenamed(groupCol, "__g")),
        col(groupCol) <=> col("__g"))
      .select(col(keyCol), col(groupCol), col("xent2"),
        when(col("__m").cast("double") < mean, "head")
          .when(col("__m").cast("double") <= mean + sd, "middle")
          .otherwise("tail").as("band"))
  }
}
