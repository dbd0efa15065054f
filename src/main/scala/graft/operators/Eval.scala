package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: per-query recall@k, MRR and binary
  * nDCG@k of a ranked candidate list against a gold relevance set — the
  * harness that closes the search loop (measure BM25 vs semantic gold,
  * ANN vs exact, a reranker vs its first stage) and the dedup/dataset
  * loop (did near-dup removal hurt retrieval?).
  *
  * Engine-checkable float discipline (the q109/q131 lessons): every
  * division happens ONCE on exactly-derived operands, DCG/IDCG are
  * rank-ordered folds over sorted arrays (Spark `aggregate` over
  * `sort_array(collect_list(...))` == DuckDB `list_reduce` over
  * `list(... ORDER BY ...)`), and logs are natural `ln` with the ln(2)
  * literal inlined (1/log2(r+1) == ln2/ln(r+1)) — the same ln-parity
  * q131's cross-entropy oracle already proves.
  *
  * Scale shape: one equi-join of the candidate page against the gold
  * set (both query-keyed; gold sets are small — labels, not corpora)
  * and two query-keyed aggregates. Nothing touches the corpus; the
  * expensive part (producing `results`) is whatever search produced it.
  */
object Eval {

  private val Ln2 = 0.6931471805599453 // ln(2), exact literal both engines

  /** `results`: `(queryCol, keyCol, rankCol)` — a ranked candidate page
    * per query (rank 1-based). `gold`: `(queryCol, keyCol)` — the
    * relevant keys per query. Returns one row per GOLD query (queries
    * with no gold are excluded — their metrics are undefined; candidate
    * pages for unknown queries are ignored):
    * `(query, n_gold, hits, recall, mrr, ndcg)`, floats rounded to 6.
    */
  def retrievalMetrics(results: DataFrame, gold: DataFrame, k: Int,
                       queryCol: String = "query_id",
                       keyCol: String = "doc_id",
                       rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = gold.select(col(queryCol), col(keyCol)).distinct()
    val nGold = g.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_gold"))
    val hits = results.filter(col(rankCol) <= k)
      .join(g, Seq(queryCol, keyCol))
    val perQ = hits.groupBy(col(queryCol)).agg(
      count(lit(1)).as("hits"),
      min(col(rankCol)).as("__first"),
      sort_array(collect_list(col(rankCol).cast("long"))).as("__ranks"))
    val dcgOf = (ranks: org.apache.spark.sql.Column) =>
      aggregate(ranks, lit(0.0),
        (acc, r) => acc + lit(Ln2) / log(r.cast("double") + lit(1.0)))
    nGold.join(perQ, Seq(queryCol), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall",
        round(col("hits").cast("double") / col("n_gold"), 6))
      .withColumn("mrr", round(
        when(col("__first").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__first").cast("double")), 6))
      // IDCG over the first min(k, n_gold) ideal positions; a query with
      // zero hits has DCG 0 -> ndcg 0 (n_gold >= 1, so IDCG > 0)
      .withColumn("__dcg",
        coalesce(dcgOf(col("__ranks")), lit(0.0)))
      .withColumn("__idcg",
        dcgOf(sequence(lit(1L), least(lit(k.toLong), col("n_gold")))))
      .withColumn("ndcg", round(col("__dcg") / col("__idcg"), 6))
      .select(col(queryCol), col("n_gold"), col("hits"),
        col("recall"), col("mrr"), col("ndcg"))
  }
}
