package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typo-tolerant vocabulary lookup (the pg_trgm / Elasticsearch-fuzzy
  * shape). The reference has no fuzzy matching at all; a keyword surface
  * without it strands every misspelled query, so this is part of the
  * search-completeness story.
  *
  * Candidate generation NEVER computes edit distance against the whole
  * vocabulary: vocabulary tokens explode into character trigrams once,
  * the query's trigrams (a driver-side literal list, <= len(term) of
  * them) semi-join candidates out, and only the candidates — typically a
  * few dozen — pay the Levenshtein rerank. At 100 TB the vocabulary
  * aggregate itself is the only corpus-scale stage (one groupBy whose
  * output is vocabulary-sized, i.e. tiny next to the corpus; with a
  * persistent keyword index, [[vocabFromPostings]] derives it from the
  * postings log instead and never touches the corpus).
  */
object Fuzzy {

  /** Character trigrams of a token column: substrings [i, i+2] for
    * 1 <= i <= len-2 (inner trigrams, no padding — matching is
    * symmetric between query and vocab so padding buys nothing here).
    * Row-local HOF; tokens shorter than 3 chars yield none (guarded
    * explicitly: Spark's `sequence(1, 0)` counts DOWN, it is not empty).
    */
  def trigrams(tok: Column): Column =
    when(length(tok) >= 3,
      transform(sequence(lit(1), length(tok) - 2), i => tok.substr(i, lit(3))))
      .otherwise(typedLit(Seq.empty[String]))

  /** Driver-side twin of [[trigrams]] for the query term. */
  def trigramsOf(term: String): Seq[String] =
    if (term.length < 3) Seq.empty
    else (0 to term.length - 3).map(i => term.substring(i, i + 3)).distinct

  /** Distinct corpus vocabulary with document frequency: `(tok, df)`. */
  def vocab(docs: DataFrame, idCol: String, textCol: String,
            analyzer: Analyzer = Analyzer.Whitespace): DataFrame =
    docs.select(col(idCol).as("key"),
        explode(analyzer.tokensCol(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("key")).as("df"))

  /** Vocabulary from a persistent keyword index's postings log: postings
    * are unique per (tok, key) net of tombstones, so the live row count
    * per token IS its document frequency. Reads the (tok, key) columns
    * of the postings log only — never the corpus.
    */
  def vocabFromPostings(postings: DataFrame): DataFrame =
    postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))

  /** Top-`k` vocabulary tokens fuzzily matching `term`:
    * `(tok, dist, df)` ordered by (edit distance, token). `maxDist`
    * drops hopeless candidates before the page cut so a dense trigram
    * neighborhood cannot crowd out nothing-shares-a-trigram truth.
    *
    * RECALL CONTRACT: the trigram gate is a candidate PRUNE, not an
    * exact filter. Recall is guaranteed when the match shares at least
    * one trigram with the query — always true when
    * `3 * dist < len(tok) - 2` (each edit destroys at most 3 trigrams)
    * — so long tokens at small distances are never missed, but a
    * 3-char token one substitution away ("cat" vs "bat") can share no
    * trigram and fall through the gate. Vocab tokens SHORTER than 3
    * chars produce no trigrams at all; those are unioned back in below
    * (the short-token set is tiny, so the Levenshtein rerank on it is
    * free), which makes recall exact for all sub-trigram vocab. The
    * residual miss window is exactly: tok length in [3, 3*dist+2] with
    * zero shared trigrams — accepted in exchange for never running
    * Levenshtein over the full vocabulary.
    */
  def vocabMatch(vocabDf: DataFrame, term: String, k: Int,
                 maxDist: Int = 3): DataFrame = {
    val t = term.toLowerCase
    val grams = trigramsOf(t)
    require(grams.nonEmpty,
      s"fuzzy match needs a term of >= 3 chars, got '$term'")
    val gated = vocabDf
      .join(
        vocabDf.select(col("tok"), explode(trigrams(col("tok"))).as("tg"))
          .filter(col("tg").isin(grams: _*))
          .select(col("tok")),
        Seq("tok"), "left_semi")
    // trigram-less vocab (len < 3) would NEVER pass the gate no matter
    // how close it is — union it back in; Levenshtein then adjudicates
    val short = vocabDf.filter(length(col("tok")) < 3)
    gated.unionByName(short)
      .select(col("tok"), levenshtein(col("tok"), lit(t)).as("dist"),
        col("df"))
      .filter(col("dist") <= maxDist)
      .orderBy(col("dist"), col("tok"))
      .limit(k)
  }

  /** One-shot corpus path: vocabulary + fuzzy page in one call. */
  def fuzzyTerms(docs: DataFrame, term: String, k: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 maxDist: Int = 3,
                 analyzer: Analyzer = Analyzer.Whitespace): DataFrame =
    vocabMatch(vocab(docs, idCol, textCol, analyzer), term, k, maxDist)
}
