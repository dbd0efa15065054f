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
    // aggregate to DISTINCT words first (the q143 BPE wordFreqs
    // discipline): a word occurring f times contributes its substring
    // multiset f times, so summing f over the distinct-word explode
    // equals counting the occurrence explode exactly (integers) while
    // the substring blowup runs over the vocabulary, not the corpus.
    docs.select(explode(cleanTokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__f"), explode(subs).as("token"))
      .filter(length(col("token")) >= 2)
      .groupBy(col("token")).agg(sum(col("__f")).as("cnt"))
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

  /** The Viterbi SCORE of one word (best segmentation's total log-prob)
    * without the backtrace — the value [[viterbiWord]] maximizes. The
    * recurrence mirrors the SQL twin exactly: dp[k] = max over piece
    * lengths l of dp[k-l] + lp(piece), with missing multi-char pieces at
    * the -1e18 sentinel (never wins: the single-char fallback bounds
    * every dp above -unkLogP·len) — so both engines compute the same
    * IEEE additions and the same max.
    */
  private[graft] def viterbiScore(word: String, lp: Map[String, Double],
                                  maxLen: Int, unkLogP: Double): Double = {
    val nn = word.length
    if (nn == 0) return 0.0
    val dp = new Array[Double](nn + 1)
    var k = 1
    while (k <= nn) {
      var best = Double.NegativeInfinity
      var l = 1
      while (l <= math.min(maxLen, k)) {
        val piece = word.substring(k - l, k)
        val v =
          if (l == 1) lp.getOrElse(piece, unkLogP)
          else lp.getOrElse(piece, -1e18)
        val cand = dp(k - l) + v
        if (cand > best) best = cand
        l += 1
      }
      dp(k) = best
      k += 1
    }
    dp(nn)
  }

  /** Per-document unigram-LM log-likelihood: each word's Viterbi score
    * under the vocabulary, rounded to integer micro-units (HALF_UP, the
    * house fixed-point discipline) and summed — a SUBWORD-level quality
    * score next to the word-bigram cross-entropy (q131): boilerplate
    * and in-domain text segment into frequent pieces (high lp), junk
    * falls through to the unknown-char penalty. Row-local (one UDF over
    * the broadcast vocab — no shuffle, stream-safe); the fixed-point
    * sum makes the per-doc total independent of word order arithmetic.
    *
    * Output: input columns + (n_words, total_lp = Σ word scores,
    * rounded 6).
    */
  def docScores(docs: DataFrame, textCol: String, vocab: DataFrame,
                maxLen: Int = 4, unkLogP: Double = -20.0): DataFrame = {
    val entries = vocab.select(col("token").cast("string"),
        col("cnt").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)) // bounded: vocab
    val total = entries.map(_._2).sum.toDouble.max(1.0)
    val lp = entries.map { case (t, c) => t -> math.log(c / total) }.toMap
    val f = udf((text: String) => {
      val words = Option(text).map(_.toLowerCase.trim).getOrElse("")
        .split("\\s+").filter(_.nonEmpty)
      val micro = words.map { w =>
        // HALF_UP like Spark/DuckDB round(), NOT math.round (which is
        // half-toward-positive-infinity and differs on negative halves)
        java.math.BigDecimal.valueOf(
            viterbiScore(w, lp, maxLen, unkLogP) * 1000000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }.sum
      (words.length.toLong, micro)
    })
    docs.withColumn("__s", f(col(textCol)))
      .withColumn("n_words", col("__s._1"))
      .withColumn("total_lp", round(col("__s._2").cast("double") / 1e6, 6))
      .drop("__s")
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
