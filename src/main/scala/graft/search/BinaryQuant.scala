package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Keys.KeyCol

/** 1-bit (sign) vector quantization + Hamming-distance candidate search.
  *
  * The reference serves cosine top-k from full-precision vectors held in
  * an in-memory usearch graph (src/collection/vector_index.rs:57-152);
  * usearch itself documents `b1` bit-vectors as its cheapest quantization
  * tier. This is that tier, Spark-native: each dimension contributes one
  * SIGN bit, packed 32 dims per long word, so a 384-dim f32 vector
  * (1536 B) shrinks to 48 B — a 32x smaller candidate-ranking read, and
  * for random-hyperplane-distributed data Hamming distance on sign bits
  * is a monotone proxy for angular distance (the Charikar/SimHash bound:
  * P[bit differs] = angle/pi).
  *
  * Two-stage serving, same shape as [[Ann.pqTopKRerank]]:
  *   stage 1 ranks ALL rows by Hamming distance over the packed words
  *   only (bit_count(xor) per word — integer ops inside whole-stage
  *   codegen, planned as TakeOrderedAndProject: per-partition heap top-k,
  *   k rows per partition cross the wire);
  *   stage 2 fetches float vectors for the fetchK survivors (broadcast
  *   semi-join — pointwise reads, never a second corpus scan) and ranks
  *   them by exact f64 cosine.
  *
  * Everything is deterministic: sign is a strict `> 0` compare (float
  * widening to f64 preserves sign exactly), Hamming is integer, and ties
  * break on the key at both stages — so a DuckDB twin re-deriving the
  * words with the same bit layout hash-matches bit for bit.
  */
object BinaryQuant {

  /** Packed words needed for `dim` dims at 32 bits per word. 32 (not 64)
    * bits per word keeps every word non-negative in a signed i64, so the
    * SQL twin never wrestles BIGINT sign semantics.
    */
  def nWords(dim: Int): Int = (dim + 31) / 32

  /** Driver-side packing of a query vector: bit j of word w is set iff
    * v(32w + j) > 0 — the exact layout [[signWords]] emits per row.
    */
  def packSign(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](nWords(v.length))
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i / 32) |= 1L << (i % 32)
      i += 1
    }
    out
  }

  /** Sign-bit words of an `array<float>` (or `array<double>`) column as
    * `array<long>`. Unrolled per-bit CASE sum — row-local, no lambda
    * interpretation, stays inside whole-stage codegen.
    */
  def signWords(emb: Column, dim: Int): Column = {
    val words = (0 until nWords(dim)).map { w =>
      (0 until 32).map { j =>
        val i = w * 32 + j
        if (i >= dim) lit(0L)
        else when(element_at(emb, i + 1) > lit(0.0), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }

  /** Hamming distance between a packed-words column and a packed query:
    * sum over words of bit_count(xor). Integer-only, codegen'd.
    */
  def hamming(words: Column, qWords: Array[Long]): Column =
    qWords.zipWithIndex.map { case (qw, w) =>
      bit_count(element_at(words, w + 1).bitwiseXOR(lit(qw)))
    }.reduce(_ + _).cast("int")

  /** Two-stage binary search: Hamming top-`fetchK` over sign words, exact
    * cosine rerank to top-`k`. Output `(key, hamming, score)` with `score`
    * the RAW f64 cosine (callers round for display/gating).
    *
    * When the corpus already stores packed words (a binary sidecar built
    * once at index time), use [[topKRerankPrepacked]] so stage 1 never
    * touches float vectors.
    */
  def topKRerank(embDf: DataFrame, queryVec: Array[Float], k: Int, fetchK: Int,
                 keyCol: String = KeyCol, embCol: String = "embedding"): DataFrame = {
    val words = embDf.select(col(keyCol),
      signWords(col(embCol), queryVec.length).as("__w"))
    rerank(embDf, candidates(words, queryVec, fetchK, keyCol, "__w"),
      queryVec, k, keyCol, embCol)
  }

  /** Stage 1 over a pre-packed `(key, words)` table (the at-scale path:
    * words are 32x smaller than the vectors, so this scan reads ~3% of
    * the corpus bytes).
    */
  def topKRerankPrepacked(wordsDf: DataFrame, embDf: DataFrame,
                          queryVec: Array[Float], k: Int, fetchK: Int,
                          keyCol: String = KeyCol, embCol: String = "embedding",
                          wordsCol: String = "words"): DataFrame =
    rerank(embDf, candidates(wordsDf, queryVec, fetchK, keyCol, wordsCol),
      queryVec, k, keyCol, embCol)

  private def candidates(wordsDf: DataFrame, queryVec: Array[Float],
                         fetchK: Int, keyCol: String, wordsCol: String): DataFrame =
    wordsDf.select(col(keyCol),
        hamming(col(wordsCol), packSign(queryVec)).as("hamming"))
      .orderBy(col("hamming"), col(keyCol))
      .limit(fetchK)

  private def rerank(embDf: DataFrame, cand: DataFrame, queryVec: Array[Float],
                     k: Int, keyCol: String, embCol: String): DataFrame =
    embDf.join(broadcast(cand), Seq(keyCol))
      .select(col(keyCol), col("hamming"),
        Search.scoreAgainst(col(embCol), queryVec).as("score"))
      .orderBy(desc("score"), col(keyCol))
      .limit(k)
}
