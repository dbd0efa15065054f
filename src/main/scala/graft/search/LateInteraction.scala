package graft.search

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions

/** Late-interaction (ColBERT-style MaxSim) multi-vector scoring: a query
  * is a SET of vectors and a document is a SET of chunk vectors;
  * `score(doc) = Σ over query vectors of max over doc chunks of cosine`.
  * Single-vector search collapses each side to one embedding before
  * comparing; late interaction keeps the per-chunk granularity on both
  * sides, which is what recovers fine-grained term-level matching from a
  * chunked index (the reference's one-vector-per-chunk layout,
  * src/collection/vector_index.rs:141-149, already stores exactly the
  * doc side of this — its search takes the per-key max over chunks,
  * i.e. the single-query-vector special case of MaxSim).
  *
  * Determinism discipline: floating-point ADDITION is order-sensitive,
  * so each per-(doc, query-vector) max — which IS order-independent —
  * is rounded to 6 places and summed as DECIMAL(18,6); the total is
  * exact whatever order partial aggregation delivers, and a SQL oracle
  * re-derives it bit-for-bit (the q109 BM25 fold discipline).
  *
  * Scale shape: the query side is a handful of vectors — a broadcast —
  * so the chunk scan is one map-side pass; the (doc, qid) max and the
  * per-doc sum are partial-aggregated groupBys (the shuffle carries one
  * small row per (doc, qid), never the chunk fanout); the final top-k is
  * a TakeOrderedAndProject (per-partition heads merged on the driver),
  * not a global sort.
  */
object LateInteraction {

  /** Top-`k` documents by MaxSim score of `queryChunks` (small: one row
    * per query vector, broadcast) against `docChunks` (one row per
    * document chunk). Output `(dKeyCol, score)` ordered by
    * `(score desc, key)` — the deterministic page contract of
    * [[Search.topK]].
    */
  def topK(queryChunks: DataFrame, qKeyCol: String, qEmbCol: String,
           docChunks: DataFrame, dKeyCol: String, dEmbCol: String,
           k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = queryChunks.select(col(qKeyCol).as("__qid"), col(qEmbCol).as("__qvec"))
    docChunks
      .select(col(dKeyCol), col(dEmbCol))
      .crossJoin(broadcast(q))
      .withColumn("__cos", VectorFunctions.cosine(col(dEmbCol), col("__qvec")))
      .groupBy(col(dKeyCol), col("__qid"))
      .agg(max(col("__cos")).as("__mx"))
      .withColumn("__term", round(col("__mx"), 6).cast(DecimalType(18, 6)))
      .groupBy(col(dKeyCol))
      .agg(sum(col("__term")).cast("double").as("score"))
      .orderBy(col("score").desc, col(dKeyCol))
      .limit(k)
  }
}
