package graft.embed

import org.apache.spark.sql.Dataset

/** The one shared shape for keyed batch embedding — `(key, text)` pairs
  * chunked through `Embedder.embed` inside `mapPartitions`. Used by the
  * batch indexer, the streaming indexer, and the query pipelines so the
  * batching contract (order preservation, batch size, one embedder per
  * task) lives in exactly one place.
  */
object EmbedBatch {
  def pairs(ds: Dataset[(Long, String)], embedder: Embedder,
            batchSize: Int): Dataset[(Long, Array[Float])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { b =>
        b.iterator.map(_._1).zip(embedder.embed(b.iterator.map(_._2)))
      }
    }
  }

  /** md5 hex of a text as embedded (UTF-8, lowercase hex) — byte-identical
    * to Spark's and DuckDB's `md5()` so the stored fingerprint can be
    * compared against `md5(col)` without re-reading any vector.
    */
  def fingerprint(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** [[pairs]] plus the md5 fingerprint of each embedded text — the
    * staleness marker the index stores so a post-upsert re-embed can
    * detect rows whose text changed under an unchanged key
    * ([[graft.core.Collection.reembedChanged]]). Same batching contract.
    */
  def triples(ds: Dataset[(Long, String)], embedder: Embedder,
              batchSize: Int): Dataset[(Long, String, Array[Float])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { b =>
        b.iterator.map { case (k, t) => (k, fingerprint(t)) }
          .zip(embedder.embed(b.iterator.map(_._2)))
          .map { case ((k, f), v) => (k, f, v) }
      }
    }
  }
}
