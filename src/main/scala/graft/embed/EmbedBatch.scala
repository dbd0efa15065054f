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
}
