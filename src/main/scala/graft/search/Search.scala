package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Keys.KeyCol
import graft.functions.VectorFunctions

/** Exact top-k cosine search over an embeddings table (K1-K5).
  *
  * The reference answers top-k from an in-memory usearch HNSW graph
  * (src/collection/vector_index.rs:128-152) and then hydrates text with a
  * `WHERE _key IN (...)` fetch plus a manual reorder
  * (src/actors/collection_actor.rs:507-584). Spark-native: score every
  * vector, `orderBy(desc).limit(k)` — Catalyst plans this as
  * `TakeOrderedAndProject` (per-partition heap top-k + driver merge of k·p
  * rows, NO global sort), then a broadcast join back for content; the
  * score-order falls out of the plan, no manual rejoin. That shape is
  * exactly what survives 100 TB: the scan is embarrassingly parallel and
  * only k rows per partition ever move.
  */
object Search {

  /** Reference HTTP layer clamps 1 <= limit <= 100, default 10
    * (src/serve.rs:53,155-161).
    */
  val DefaultLimit = 10
  val MaxLimit = 100
  def validateLimit(limit: Int): Unit =
    require(limit >= 1 && limit <= MaxLimit, s"limit must be in [1, $MaxLimit], got $limit")

  /** Score column for a literal query vector (computed in f64). */
  def scoreAgainst(embCol: Column, queryVec: Array[Float]): Column =
    VectorFunctions.cosine(embCol, typedLit(queryVec.map(_.toDouble).toSeq))

  /** K1: exact top-k `(_key, score)` for a query vector. */
  def topK(embeddings: DataFrame, queryVec: Array[Float], k: Int,
           keyColName: String = KeyCol, embColName: String = "embedding"): DataFrame =
    embeddings
      .select(col(keyColName), scoreAgainst(col(embColName), queryVec).as("score"))
      .orderBy(desc("score"), col(keyColName))
      .limit(k)

  /** K3: search-and-fetch — top-k hits joined back to the collection for
    * content; returns `(content, key, score)` like the reference's
    * `SearchResult` (collection_utils.rs:81-86), descending score.
    * The hits side is k rows — broadcast it so the fetch is a
    * shuffle-free broadcast-hash-join against the (arbitrarily large)
    * collection.
    */
  def searchAndFetch(collection: DataFrame, embeddings: DataFrame,
                     queryVec: Array[Float], k: Int,
                     contentCol: String): DataFrame = {
    val hits = topK(embeddings, queryVec, k)
    collection
      .join(broadcast(hits), KeyCol)
      .select(col(contentCol).as("content"), col(KeyCol).as("key"), col("score"))
      .orderBy(desc("score"), col("key"))
  }
}
