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

  /** Resolve EVERY query term in ONE Spark job: a present term maps to
    * itself, an absent term of >= 3 chars to its best [[vocabMatch]]
    * candidate (min (edit distance, token), same trigram-or-short-token
    * candidate gate), an absent shorter term to nothing. Semantics are
    * exactly the per-term chain `if present -> term else vocabMatch(term,
    * k = 1)` that [[graft.core.Catalog.searchKeywordFuzzy]] used to run —
    * which cost one presence collect plus one job PER absent term; this
    * is one vocabulary pass total (the vocab frame is consumed once, so
    * the caller needs no checkpoint either). Returns term -> resolved
    * token for the terms that survive.
    */
  def resolveTerms(vocabToks: DataFrame, terms: Seq[String],
                   maxDist: Int): Map[String, String] = {
    require(terms.nonEmpty, "resolveTerms: empty term list")
    val spark = vocabToks.sparkSession
    import spark.implicits._
    val termDf = terms.distinct.map(t => (t, trigramsOf(t))).toDF("term", "tg")
    vocabToks.select(col("tok"))
      .withColumn("vg", trigrams(col("tok")))
      .crossJoin(broadcast(termDf))
      // candidate gate, row-local: exact presence (any length), the
      // short-vocab-token union (only meaningful for trigrammable
      // terms), or a shared trigram; absent sub-trigram terms get no
      // candidates and drop — all exactly vocabMatch's recall contract
      .filter(col("tok") === col("term") ||
        (length(col("tok")) < 3 && length(col("term")) >= 3) ||
        arrays_overlap(col("vg"), col("tg")))
      .withColumn("dist", levenshtein(col("tok"), col("term")))
      // a present term is kept regardless of maxDist (its distance is 0
      // anyway for any sane maxDist — spelled out for exactness)
      .filter(col("tok") === col("term") || col("dist") <= maxDist)
      .groupBy(col("term"))
      .agg(min(struct(col("dist"), col("tok"))).as("m"))
      .select(col("term"), col("m").getField("tok").as("tok"))
      .collect() // bounded: <= |terms| rows
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }
}
