package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Per-source corpus summary — the "dataset card" table every corpus
  * release ships (docs, token volume, average size, and how much of the
  * source duplicates the rest of the corpus). The dup counter is
  * corpus-wide: a doc counts as duplicated if its exact fingerprint
  * appears ≥ 2 times ANYWHERE, so a source that copies another source
  * shows the overlap even when it has no internal dups.
  *
  * Scale shape: one narrow projection, one fingerprint-count aggregate,
  * one equi-join on the fingerprint (both sides shuffled on fp once —
  * no broadcast of anything corpus-sized), one per-source aggregate.
  * All sums are exact integers; the two ratios are single IEEE
  * divisions (avg_chars deliberately computed as sum/count rather than
  * `avg`, whose double-sum fold order would be nondeterministic at
  * scales where partial sums stop being exact).
  */
object DatasetCard {

  /** (sourceCol, n_docs, n_tokens, avg_chars r2, dup_docs, dup_frac r6)
    * per source, dup counted against corpus-wide exact fingerprints.
    */
  def perSource(docs: DataFrame, keyCol: String, textCol: String,
                sourceCol: String): DataFrame = {
    // NULL text folds to '' BEFORE fingerprinting: a null fp would fall
    // out of the fp equi-join and silently drop the doc from its
    // source's row (and null-text docs do legitimately dup each other)
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val f = docs.select(col(sourceCol), col(keyCol),
      TextFunctions.fingerprintMd5(t).as("fp"),
      TextFunctions.tokenCount(t).cast("long").as("toks"),
      length(t).cast("long").as("chars"))
    val fc = f.groupBy(col("fp")).agg(count(lit(1)).as("n"))
    f.join(fc, Seq("fp"))
      .groupBy(col(sourceCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        round(sum(col("chars")).cast("double") / count(lit(1)), 2)
          .as("avg_chars"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("dup_frac",
        round(col("dup_docs").cast("double") / col("n_docs"), 6))
  }
}
