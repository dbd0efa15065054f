package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-flavored) subword tokenization (Kudo 2018,
  * arXiv:1804.10959): a vocabulary of word-internal substrings scored as
  * independent pieces, applied by Viterbi segmentation — the third
  * tokenizer family next to WordPiece (greedy longest-match against a
  * fixed vocab) and BPE (learned merges). Unigram's draw for a data
  * pipeline is that piece probabilities come straight from corpus
  * counts, so the vocabulary is re-derivable from the same tables the
  * engine already aggregates.
  *
  * Scale shape: candidate extraction is row-local (nested position ×
  * length transforms over each word — no positional join, no shuffle
  * until the count), counting is one hash aggregation, and selection is
  * `orderBy(score).limit(n)` — TakeOrderedAndProject, each partition's
  * local top-n heap merged on the driver, never a global sort (the
  * Bpe.learn discipline). Segmentation is a row-local UDF over the
  * broadcast vocabulary: no state, stream-safe.
  */
object UnigramLm {

  private def cleanTokens(text: org.apache.spark.sql.Column) =
    array_remove(TextFunctions.tokens(trim(lower(text))), "")

  /** All word-internal substrings of length 2..maxLen, counted by
    * occurrence across the corpus (single chars are the implicit
    * fallback alphabet — they carry no compression gain and are always
    * in the vocabulary, so they are not candidates). Output:
    * (token, cnt).
    */
  def candidates(docs: DataFrame, textCol: String,
                 maxLen: Int = 4): DataFrame = {
    require(maxLen >= 2 && maxLen <= 16, s"maxLen must be in 2..16, got $maxLen")
    val w = col("__w")
    val subs = flatten(transform(
      sequence(lit(1), length(w)),
      i => transform(
        sequence(lit(1), least(lit(maxLen), length(w) - i + 1)),
        l => w.substr(i, l))))
    docs.select(explode(cleanTokens(col(textCol))).as("__w"))
      .select(explode(subs).as("token"))
      .filter(length(col("token")) >= 2)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
  }

  /** Seed-vocabulary selection: the top-`n` candidates by compression
    * gain `cnt · (len − 1)` — the characters saved each time the piece
    * replaces its letters (the standard substring-seeding heuristic
    * before EM pruning; ties break on the token, so selection is total
    * and engine-checkable). Output: (token, cnt, score, rank 1..n) —
    * rank derived ON the n-row page (TakeOrdered first, never a
    * corpus-wide window).
    */
  def vocabSelect(cands: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val page = cands
      .withColumn("score", col("cnt") * (length(col("token")) - 1))
      .orderBy(desc("score"), col("token"))
      .limit(n)
    // n-row page: the unpartitioned window is the q132 bounded-page
    // precedent, not a corpus window
    page.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("score"), col("token"))).cast("long"))
      .select(col("token"), col("cnt"), col("score"), col("rank"))
  }

  /** Viterbi-segment one word under piece log-probs: dp[i] = best score
    * of the first i chars; at each position try every vocab piece of
    * length 1..maxLen ending there, plus the single-char unknown
    * fallback at `unkLogP`. Ties keep the FIRST candidate tried
    * (shorter piece, since lengths ascend) — deterministic and spec'd.
    * Always succeeds: the fallback covers any character.
    */
  private[graft] def viterbiWord(word: String, vocab: Map[String, Double],
                                 maxLen: Int, unkLogP: Double): Seq[String] = {
    val nn = word.length
    if (nn == 0) return Seq.empty
    val best = Array.fill(nn + 1)(Double.NegativeInfinity)
    val back = new Array[Int](nn + 1) // piece length ending at i
    best(0) = 0.0
    var i = 1
    while (i <= nn) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        val piece = word.substring(i - l, i)
        val lp =
          if (l == 1) vocab.getOrElse(piece, unkLogP)
          else vocab.getOrElse(piece, Double.NegativeInfinity)
        if (lp > Double.NegativeInfinity && best(i - l) + lp > best(i)) {
          best(i) = best(i - l) + lp
          back(i) = l
        }
        l += 1
      }
      i += 1
    }
    // walk back
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = nn
    while (p > 0) { out.prepend(word.substring(p - back(p), p)); p -= back(p) }
    out.toSeq
  }

  /** Segment every document's words under a trained vocabulary:
    * (input columns, pieces ARRAY<STRING>, n_pieces). `vocab` is a
    * (token, cnt) table (e.g. [[vocabSelect]]'s page) turned into
    * log-probs ln(cnt / total) on the driver — bounded by construction
    * (a vocabulary, not a corpus). Row-local, stream-safe.
    */
  def segment(docs: DataFrame, textCol: String,
              vocab: DataFrame, maxLen: Int = 4,
              unkLogP: Double = -20.0): DataFrame = {
    val entries = vocab.select(col("token").cast("string"),
        col("cnt").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)) // bounded: vocab
    val total = entries.map(_._2).sum.toDouble.max(1.0)
    val lp = entries.map { case (t, c) => t -> math.log(c / total) }.toMap
    val seg = udf((text: String) =>
      Option(text).map(_.toLowerCase.trim).getOrElse("")
        .split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(wd => viterbiWord(wd, lp, maxLen, unkLogP)))
    docs.withColumn("pieces", seg(col(textCol)))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }
}
