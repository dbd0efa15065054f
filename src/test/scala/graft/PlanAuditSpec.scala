package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape regression pins for the properties the 100 TB story
  * depends on: filters reach the parquet scan, projections prune the
  * read schema, small sides broadcast, and the stateless percolation
  * plan stays shuffle-free. These are the invariants `.explain` audits
  * established by hand in earlier rounds — pinned so a refactor that
  * silently loses one fails a test instead of a bench.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("key-fetch pushes its IN filter into the parquet scan") {
    val p = planOf(SparkEntry.queries("q_key_fetch")(spark, sf0001))
    assert(p.contains("PushedFilters: [In(doc_id"),
      s"IN filter not pushed to the scan:\n$p")
  }

  test("projection prunes the scan to exactly the selected columns") {
    val p = planOf(SparkEntry.queries("q_scan_project")(spark, sf0001))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan reads more than the projection needs:\n$p")
    assert(!p.contains("n_chars"), "unprojected column leaked into the scan")
  }

  test("search-and-fetch joins the top-k page by broadcast, not shuffle") {
    val p = planOf(SparkEntry.queries("q_search_fetch")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"hits page should broadcast-join the corpus:\n$p")
  }

  test("row-wise percolation plans zero shuffles") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val saved = Seq((1L, "fast join"), (2L, "vector window"))
      .toDF("query_id", "query")
    val p = planOf(graft.search.Keyword.percolateRowwise(
      docs, "doc_id", "text", saved))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"saved queries should broadcast:\n$p")
    // BroadcastExchange is fine (that's the point); SHUFFLE exchanges
    // (hash/range/single-partition) are what statelessness forbids
    assert(!"Exchange (hash|range|Single)".r.unanchored.matches(p),
      s"stateless percolation must not shuffle:\n$p")
  }

  test("stratified sampling and weighted sampling stay map-side (no shuffle before the filter)") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val w = graft.operators.Sampling.weighted(docs, "doc_id",
      least(lit(1.0), col("n_chars").cast("double") / lit(2000.0)))
    val p = planOf(w)
    assert(!p.contains("Exchange"),
      s"membership is a pure function of the key — no shuffle allowed:\n$p")
  }

  test("classifier serving (scoreUdf) plans zero shuffles") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val w = Array.fill(17)(0.01)
    val p = planOf(docs.select(col("doc_id"),
      graft.operators.Classifier.scoreUdf(w)(col("text")).as("score")))
    assert(!p.contains("Exchange"),
      s"row-local scoring must not shuffle (that's its point vs margins):\n$p")
  }

  test("classifier gradient is a partial aggregate (map-side combine)") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val feats = graft.operators.Classifier.hashedFeatures(docs, "doc_id", "text", 32)
    // the j-keyed sum that feeds the driver's weight update: dim+1 keys,
    // partial_sum before the exchange so the shuffle carries at most
    // dim+1 rows per map task
    val g = feats.groupBy(col("j")).agg(sum(col("x")).as("g"))
    val p = planOf(g)
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"gradient must combine map-side:\n$p")
  }

  test("phrase matching joins by hash/merge on (key, pos), never nested-loop") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val p = planOf(graft.search.Keyword.phraseMatches(docs,
      Seq("hash", "join", "fast")))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"aligned semi-joins must stay equi-joins:\n$p")
  }

  test("keyset vector page (topKAfter) has no window and a partial max") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = planOf(graft.search.Search.topKAfter(emb,
      Array.fill(384)(0.1f), 10, (0.5, 42L), keyColName = "vec_id"))
    assert(!p.contains("Window"),
      s"deep page must not window the corpus:\n$p")
    assert(p.contains("partial_max") || p.contains("Partial"),
      s"per-key max must combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the page cut must be TakeOrdered's k-per-partition bound:\n$p")
  }

  test("binary Hamming page: TakeOrdered both stages, broadcast rerank, pruned scan") {
    val p = planOf(SparkEntry.queries("q158_binary_hamming")(spark, sf0001))
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 2,
      s"both binary stages must be TakeOrdered k-per-partition cuts:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the rerank fetch must broadcast the candidate page:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a 40-row candidate page must never sort-merge:\n$p")
  }

  test("q143 ranks the vocab-sized pair table via TakeOrdered, not a global window") {
    val p = planOf(SparkEntry.queries("q143_bpe_round1")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      s"the 20-merge cut must be TakeOrdered's k-per-partition bound:\n$p")
    // any Window in the plan must sit ABOVE the 20-row limit (parent
    // prints first in the tree) — never over the raw pair-count table
    val w = p.indexOf("Window")
    assert(w == -1 || w < p.indexOf("TakeOrderedAndProject"),
      s"a window below the limit ranks the full pair table in one task:\n$p")
  }

  test("snippets are row-local on the hits page (no post-join shuffle)") {
    val p = planOf(SparkEntry.queries("q161_snippets")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"content fetch must broadcast the k-row page:\n$p")
    // the only exchanges are the BM25 aggregates; snippet/locate adds none
    assert(!p.contains("Window"), s"snippets must not window:\n$p")
  }

  test("context pack folds the page in one aggregate (no corpus-side work)") {
    val p = planOf(SparkEntry.queries("q166_context_pack")(spark, sf0001))
    assert(!p.contains("Window"), s"the greedy fold must not window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"page hydration must broadcast:\n$p")
  }

  test("expectations battery is one scan + partial aggregate") {
    val p = planOf(SparkEntry.queries("q163_expectations")(spark, sf0001))
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"N rules must cost ONE corpus scan:\n$p")
    assert(p.contains("Partial") || p.contains("partial"),
      s"the battery must combine map-side:\n$p")
  }

  test("grouped top-k windows only over the bounded survivor set") {
    val p = planOf(SparkEntry.queries("q175_top_ngrams")(spark, sf0001))
    // the stage-1 bounded cut is a typed mapPartitions; the (safe,
    // survivor-bounded) rank window must sit ABOVE it, never directly
    // on the full count table
    val wIdx = p.indexOf("Window")
    val mIdx = p.indexOf("MapPartitions")
    assert(wIdx >= 0 && mIdx >= 0 && wIdx < mIdx, // plans print top-down
      s"rank window must consume the mapPartitions survivor set:\n$p")
  }

  test("line-frequency filter plans no window anywhere") {
    val p = planOf(SparkEntry.queries("q173_line_freq_filter")(spark, sf0001))
    assert(!p.contains("Window"), s"line ops are window-free:\n$p")
  }

  test("image near-dup pairs come from an equi-join, never a product") {
    val p = planOf(SparkEntry.queries("q176_image_neardups")(spark, sf0001))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must be block-bucket equi-join generated:\n$p")
  }

  test("normalization is a row-local projection (no shuffle beyond the sort)") {
    val p = planOf(SparkEntry.queries("q179_normalize")(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"normalizeText must not shuffle:\n$p")
  }

  test("n-gram span masking plans no window and no product") {
    val p = planOf(SparkEntry.queries("q181_span_mask")(spark, sf0001))
    assert(!p.contains("Window"),
      s"span mask must stay window-free (per-doc folds are aggregates):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"hot-gram mask must be equi-join generated:\n$p")
  }

  test("tokenizer coverage joins the vocab by broadcast and ranks it via TakeOrdered") {
    val p = planOf(SparkEntry.queries("q182_tokenizer_coverage")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"vocab must be the broadcast side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N vocab must be TakeOrdered, not a global sort/window:\n$p")
    assert(!p.contains("Window"), s"coverage is window-free:\n$p")
  }

  test("time-decay sampling is a map-side filter (no shuffle before the sort)") {
    val p = planOf(SparkEntry.queries("q189_time_decay_sample")(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"decay sampling must not hash-shuffle:\n$p")
    assert(!p.contains("Window"), s"no window in the decay filter:\n$p")
  }

  test("script profiling is a row-local projection (no shuffle beyond the sort)") {
    val p = planOf(SparkEntry.queries("q192_script_profile")(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"scriptProfile must not shuffle:\n$p")
  }

  test("norm outlier screen is one stats pass broadcast into a row-local flagger") {
    val p = planOf(SparkEntry.queries("q184_norm_outliers")(spark, sf0001))
    assert(!p.contains("Window"), s"no window in the norm screen:\n$p")
    // the 1-row stats frame joins by broadcast nested loop (a scalar
    // crossJoin), never a shuffled cartesian
    assert(!p.contains("CartesianProduct"),
      s"stats frame must broadcast:\n$p")
  }

  test("preference-pair mining is ONE partial aggregate, no window") {
    val cands = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("value"))
    val p = planOf(graft.operators.Sft.minePreferencePairs(
      cands, "user_id", "event_id", "value"))
    assert(!p.contains("Window"),
      s"extremes are struct min/max aggregates, not rank windows:\n$p")
    assert(p.contains("partial_min") || p.contains("Partial"),
      s"extremes must combine map-side:\n$p")
  }

  test("perplexity banding: no window; group stats join by broadcast") {
    val p = planOf(SparkEntry.queries("q193_ppl_bands")(spark, sf0001))
    assert(!p.contains("Window"),
      s"banding by mean/sigma exists to avoid the per-group rank:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-group stats (label-cardinality rows) must broadcast:\n$p")
  }

  test("n-gram diversity: no window, no per-group collected list") {
    val p = planOf(SparkEntry.queries("q196_ngram_diversity")(spark, sf0001))
    assert(!p.contains("Window"), s"no window in diversity rollups:\n$p")
    assert(!p.contains("collect_list"),
      s"entropy is a fixed-point SUM, never a per-group list fold:\n$p")
  }

  test("group-aware split: the split itself is a map-side projection (no window, no product)") {
    val p = planOf(SparkEntry.queries("q200_group_split")(spark, sf0001))
    assert(!p.contains("Window"), s"no window in the split path:\n$p")
    assert(!p.contains("CartesianProduct"), s"no product:\n$p")
  }

  test("unigram vocab selection pages via TakeOrdered (rank only on the n-row page)") {
    val p = planOf(SparkEntry.queries("q202_unigram_vocab")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      s"candidate selection must be a local-heap top-n, not a global sort:\n$p")
  }
}
