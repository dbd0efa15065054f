package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-document repetition signals — the Gopher repetition filters
  * (Rae et al. 2021, arXiv:2112.11446 Table A1): boilerplate and
  * degenerate (looping) text shows up as a few n-grams covering a large
  * character share of the document. Complements the cross-document dedup
  * family (q24-q30) and the length/punct/stopword quality scores
  * (q20-q23): those find COPIES and JUNK, these find SELF-repetition.
  *
  *  - `top2_frac`: characters claimed by the single most frequent
  *    2-gram (occurrences × gram length over total token characters) —
  *    the "top n-gram fraction" rule.
  *  - `dup3_frac`: fraction of token characters covered by any 3-gram
  *    that occurs at least twice in the document (overlapping coverage
  *    counted once, per the "duplicate n-gram character fraction" rule).
  *
  * Scale shape: everything is keyed by the document — token positions,
  * gram counts, coverage — so every join and aggregation here is a
  * doc_id-keyed equi-join that AQE co-partitions once; per-document work
  * is linear in token count (the coverage marking is positional, not the
  * O(L²) in-row scan a higher-order-function formulation would need).
  * No step is quadratic in the corpus and none broadcasts anything.
  *
  * Oracle parity: both fractions are single IEEE divisions of exact
  * integer counts (bit-identical in DuckDB), rounded 6; the top-gram
  * tie-break is (count DESC, w1, w2) on both engines.
  */
object Repetition {

  /** Per-document repetition signals: (keyCol, top2_frac, dup3_frac),
    * both DOUBLE rounded 6 and 0.0 where undefined (fewer than 2 or 3
    * tokens respectively, or an empty document).
    */
  def signals(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(keyCol),
      array_remove(TextFunctions.tokens(lower(col(textCol))), "").as("toks"))
    // 0-based token positions with lengths (the coverage denominator)
    val pos = toks.select(col(keyCol),
      posexplode(col("toks")).as(Seq("p", "tok")))
    val totals = pos.groupBy(col(keyCol))
      .agg(sum(length(col("tok"))).as("total_chars"))

    // top 2-gram character share
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col(keyCol),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
      .select(col(keyCol), col("b.0").as("w1"), col("b.1").as("w2"))
    val biCnt = bi.groupBy(col(keyCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val byCount = Window.partitionBy(col(keyCol))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
    val top2 = biCnt.withColumn("rn", row_number().over(byCount))
      .filter(col("rn") === 1)
      .select(col(keyCol),
        (col("cnt") * (length(col("w1")) + length(col("w2"))))
          .as("top_chars"))

    // positions covered by duplicated 3-grams (coverage deduped)
    val tri = toks.filter(size(col("toks")) >= 3)
      .select(col(keyCol),
        posexplode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 2),
          slice(col("toks"), lit(2), size(col("toks")) - 2),
          slice(col("toks"), lit(3), size(col("toks")) - 2))).as(Seq("i", "g")))
      .select(col(keyCol), col("i"),
        col("g.0").as("w1"), col("g.1").as("w2"), col("g.2").as("w3"))
    val dup = tri.groupBy(col(keyCol), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col(keyCol), col("w1"), col("w2"), col("w3"))
    val covered = tri
      .join(dup, Seq(keyCol, "w1", "w2", "w3"), "left_semi")
      .select(col(keyCol),
        explode(sequence(col("i"), col("i") + 2)).as("p"))
      .distinct()
    val dupChars = covered.join(pos, Seq(keyCol, "p"))
      .groupBy(col(keyCol)).agg(sum(length(col("tok"))).as("dup_chars"))

    docs.select(col(keyCol))
      .join(totals, Seq(keyCol), "left")
      .join(top2, Seq(keyCol), "left")
      .join(dupChars, Seq(keyCol), "left")
      .select(col(keyCol),
        round(coalesce(col("top_chars") / col("total_chars"), lit(0.0)), 6)
          .as("top2_frac"),
        round(coalesce(col("dup_chars") / col("total_chars"), lit(0.0)), 6)
          .as("dup3_frac"))
  }
}
