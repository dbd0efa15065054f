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

  /** Upper bound on paired queries the bootstrap resampler accepts —
    * its stable-order rank is an unpartitioned window, safe only on
    * eval-set-sized inputs. 100k queries x 200 resamples is still a
    * 20M-row draw grid (fine); beyond that the caller should sample.
    */
  val MaxBootstrapQueries: Long = 100000L

  /** Paired bootstrap significance test (Sakai, SIGIR 2006 evaluation
    * practice): is system A's per-query metric really better than
    * system B's, or is the mean delta luck of the query draw? Takes the
    * two systems' per-query metric tables (e.g. two
    * [[retrievalMetrics]] outputs), pairs them by query, and resamples
    * the paired deltas `nBoot` times WITH replacement; the one-sided
    * p-value is the fraction of resamples whose mean delta is <= 0.
    *
    * Resampling is DETERMINISTIC — draw (b, i) picks the query ranked
    * `hex8(md5(b || ':' || i)) % n` by query id — so the p-value is a
    * reproducible function of the inputs, re-derivable in any engine
    * (the q64/q132 hash-sampling discipline applied to evaluation).
    *
    * Scale shape: the metric tables are per-QUERY (eval sets — hundreds
    * to thousands of rows, never corpora); the draw grid is nBoot × n
    * rows built from `sequence`, joined to deltas by rank — broadcast-
    * sized at any realistic eval size. Output: one row
    * `(n_queries, mean_delta, p_value)`, floats rounded 6.
    */
  def pairedBootstrap(metricsA: DataFrame, metricsB: DataFrame,
                      metricCol: String, nBoot: Int = 200,
                      queryCol: String = "query_id"): DataFrame = {
    val (perBoot, overall) =
      bootstrapMeans(metricsA, metricsB, metricCol, nBoot, queryCol)
    perBoot.agg(
        count(lit(1)).as("__nb"),
        sum(when(col("mean_delta") <= 0.0, 1L).otherwise(0L)).as("__le"))
      .crossJoin(overall)
      .select(col("__n").as("n_queries"),
        round(col("__sum") / col("__n"), 6).as("mean_delta"),
        round(col("__le").cast("double") / col("__nb"), 6).as("p_value"))
  }

  /** The shared resample engine behind [[pairedBootstrap]] and
    * [[bootstrapCi]]: `(per-resample means (b, mean_delta), overall
    * (__sum, __n))` over the hash-deterministic draw grid.
    */
  private def bootstrapMeans(metricsA: DataFrame, metricsB: DataFrame,
                             metricCol: String, nBoot: Int,
                             queryCol: String): (DataFrame, DataFrame) = {
    require(nBoot >= 1, s"nBoot must be >= 1, got $nBoot")
    val deltas = metricsA.select(col(queryCol),
        col(metricCol).cast("double").as("__a"))
      .join(metricsB.select(col(queryCol),
        col(metricCol).cast("double").as("__b")), Seq(queryCol))
      .select(col(queryCol), (col("__a") - col("__b")).as("delta"))
    val n = deltas.count()
    require(n >= 1, "no paired queries to resample")
    // LOUD row-bound guard (the ngramJaccardPairs precedent): the rank
    // below is an unpartitioned window — fine for eval sets (hundreds
    // to thousands of queries), a silent single-task stall if someone
    // feeds it a corpus-sized "query set". Refuse instead of degrading.
    require(n <= MaxBootstrapQueries,
      s"bootstrap resampling ranks the paired-delta table in ONE task; " +
      s"got $n paired queries (cap $MaxBootstrapQueries). This operator " +
      s"is for eval sets, not corpora — sample the query set down first.")
    // rank deltas by query id so draw -> query is a stable total order;
    // the delta table is eval-set-sized (guarded above), so the
    // unpartitioned rank runs on a bounded input — a rank join, not a
    // collect, but never a corpus-scale window
    val ranked = deltas
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(queryCol)))
        .cast("long"))
    val draws = ranked.sparkSession.range(1, nBoot + 1)
      .select(col("id").as("b"),
        explode(sequence(lit(1L), lit(n))).as("i"))
      .select(col("b"),
        (conv(substring(md5(concat(col("b").cast("string"), lit(":"),
          col("i").cast("string"))), 1, 8), 16, 10).cast("long") % n + 1L)
          .as("__r"))
    val perBoot = draws.join(ranked.select(col("__r"), col("delta")), Seq("__r"))
      .groupBy(col("b"))
      // deltas fold in sorted (draw index irrelevant — mean is over the
      // multiset; sum order pinned by sorting the drawn deltas)
      .agg(aggregate(sort_array(collect_list(col("delta"))), lit(0.0),
        (acc, x) => acc + x).as("__sum"), count(lit(1)).as("__n"))
      .select(col("b"), (col("__sum") / col("__n")).as("mean_delta"))
    val overall = deltas.agg(
      aggregate(sort_array(collect_list(col("delta"))), lit(0.0),
        (acc, x) => acc + x).as("__sum"), count(lit(1)).as("__n"))
    (perBoot, overall)
  }

  /** [[pairedBootstrap]]'s interval form: the same deterministic
    * resamples, summarized as a nearest-rank percentile confidence
    * interval on the mean delta — `(n_queries, mean_delta, ci_lo,
    * ci_hi)` with lo/hi the resample means ranked
    * `floor((nB-1)·α)` and `ceil((nB-1)·(1-α))` (0-based, exact
    * integer index arithmetic — no interpolation, so the interval is
    * bit-checkable in any engine). An interval excluding 0 is the
    * two-sided significance read; the p-value form answers the
    * one-sided question.
    */
  def bootstrapCi(metricsA: DataFrame, metricsB: DataFrame,
                  metricCol: String, nBoot: Int = 200,
                  alpha: Double = 0.025,
                  queryCol: String = "query_id"): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val (perBoot, overall) =
      bootstrapMeans(metricsA, metricsB, metricCol, nBoot, queryCol)
    val loIdx = math.floor((nBoot - 1) * alpha).toLong
    val hiIdx = math.ceil((nBoot - 1) * (1.0 - alpha)).toLong
    val ranked = perBoot.withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("mean_delta"), col("b"))).cast("long") - 1L)
    ranked.filter(col("__r") === loIdx)
      .select(col("mean_delta").as("ci_lo"))
      .crossJoin(ranked.filter(col("__r") === hiIdx)
        .select(col("mean_delta").as("ci_hi")))
      .crossJoin(overall)
      .select(col("__n").as("n_queries"),
        round(col("__sum") / col("__n"), 6).as("mean_delta"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"))
  }

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
