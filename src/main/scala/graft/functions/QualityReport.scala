package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full per-document quality battery in one call — the report a
  * pipeline operator reads before deciding thresholds, and the input to
  * `Collection.cleanByQuality`'s filtering step. Composes the
  * independently-oracle-gated signals (q20-q23 surface stats, q31
  * language id, q131 bigram cross-entropy, q133 repetition) into one
  * per-key frame.
  *
  * Scale shape: the surface stats are a single narrow projection (no
  * shuffle at all); repetition and the bigram LM each aggregate on
  * doc-id-keyed groups; the three parts join back on the key — three
  * AQE-co-partitioned equi-joins, nothing corpus-quadratic. At 100 TB
  * this runs as one linear pass per signal family over the text column
  * only (column pruning keeps embeddings and payloads unread).
  */
object QualityReport {

  /** Per-document report: (key, n_chars, n_tokens, punct_ratio,
    * stopword_ratio, quality_score, lang, xent2, top2_frac, dup3_frac).
    * Ratios rounded 6 like their oracle-gated twins.
    */
  def report(docs0: DataFrame, keyCol: String, textCol: String): DataFrame = {
    // NULL text scores like the empty document — without this, every
    // surface stat propagates NULL and no cleanByQuality predicate can
    // ever match the row (NULL comparisons are never true in SQL)
    val docs = docs0.withColumn(textCol,
      coalesce(col(textCol).cast("string"), lit("")))
    val t = col(textCol)
    val surface = docs.select(col(keyCol),
      TextFunctions.charCount(t).cast("long").as("n_chars"),
      TextFunctions.tokenCount(t).cast("long").as("n_tokens"),
      round(TextFunctions.punctRatio(t), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(t), 6).as("stopword_ratio"),
      round(TextFunctions.qualityScore(t), 6).as("quality_score"),
      TextFunctions.langId(t).as("lang"))
    val xent = NgramLm.bigramCrossEntropy(docs, keyCol, textCol)
    val rep = Repetition.signals(docs, keyCol, textCol)
    surface
      .join(xent, Seq(keyCol))
      .join(rep, Seq(keyCol))
  }
}
