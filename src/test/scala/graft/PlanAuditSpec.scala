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
}
