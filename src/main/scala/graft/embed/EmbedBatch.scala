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

  /** Chunk-granularity twin of [[triples]]: each document is markdown-
    * chunked ([[graft.functions.Chunker]]) and EVERY chunk embeds as its
    * own vector under the document's key — the multi-vector-per-key
    * layout the reference opens its index with (`multi: true`,
    * collection_actor.rs:409-417). The stored fingerprint stays the md5
    * of the FULL document text, so staleness detection
    * ([[graft.core.Collection.reembedChanged]]) remains per-document: one
    * changed doc invalidates all of its chunk vectors at once. A doc the
    * chunker returns nothing for (blank text) embeds once as-is so every
    * key keeps at least one searchable vector. Chunk expansion happens
    * inside the partition iterator — no explode/shuffle; batches span
    * documents so short-doc-heavy partitions still fill embedder batches.
    */
  def chunkedTriples(ds: Dataset[(Long, String)], embedder: Embedder,
                     batchSize: Int, maxTokens: Int, overlapTokens: Int)
      : Dataset[(Long, String, Array[Float])] = {
    import ds.sparkSession.implicits._
    val cfg = graft.functions.Chunker.ChunkerConfig(
      maxTokens = maxTokens, overlapTokens = overlapTokens)
    ds.mapPartitions { it =>
      val expanded = it.flatMap { case (k, t) =>
        val fp = fingerprint(t)
        val chunks = graft.functions.Chunker.chunk(t, cfg)
        (if (chunks.isEmpty) Seq(t) else chunks).iterator.map(c => (k, fp, c))
      }
      expanded.grouped(batchSize).flatMap { b =>
        b.iterator.map { case (k, f, _) => (k, f) }
          .zip(embedder.embed(b.iterator.map(_._3)))
          .map { case ((k, f), v) => (k, f, v) }
      }
    }
  }
}
