package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a small
  * high-quality TARGET set by importance weighting under hashed n-gram
  * bag-of-words models. The workhorse of targeted pre-training mixes
  * (e.g. "select web pages that look like Wikipedia"); sits between the
  * pure-quality scores (q20-q23, q65, q131) and the diversity samplers
  * (q64, q112, q132) in the training-pipeline family.
  *
  *  1. Features: each token bigram hashes into one of `buckets` slots
  *     (md5-based, so the hash is identical in any engine).
  *  2. Two multinomials over slots are estimated with add-k smoothing:
  *     p̂ from the target rows, q̂ from the WHOLE raw corpus.
  *  3. A document's log importance weight is Σ_occurrences
  *     ln p̂(slot) - ln q̂(slot) — high where the doc uses the target's
  *     vocabulary, negative where it uses everything else's.
  *  4. Resampling keeps the top n by `lwt + g` where `g` is standard
  *     Gumbel noise from the row's own md5 fraction — Gumbel-top-k IS
  *     sampling-without-replacement ∝ softmax(lwt) (Vieira 2014), the
  *     paper's resampling step, made deterministic and append-stable by
  *     deriving the noise from the key hash.
  *
  * Scale shape: training both models is ONE corpus-linear aggregation
  * over (slot) — the target model folds in map-side via a `when` guard,
  * no second scan, no join against a target table; the model itself is
  * `buckets` rows (KB-sized) and broadcast into the scoring join.
  * Scoring is a per-doc slot-count aggregate joined against the model —
  * never a shuffle of raw text. The final selection is the
  * TakeOrderedAndProject pattern (per-partition heaps; no global sort).
  *
  * Oracle parity: slot counts are exact integers, the two smoothed
  * probabilities are single IEEE divisions, and the per-doc sum folds in
  * sorted slot order on both engines (the q65/q109/q131 discipline);
  * `ln`'s ≤1-ulp drift vanishes under round(6).
  */
object Dsir {

  private def cleanTokens(text: Column): Column =
    array_remove(TextFunctions.tokens(lower(text)), "")

  /** md5-derived hash slot for a bigram — first 8 hex chars mod buckets,
    * reproducible in DuckDB as `CAST(hex8 AS BIGINT) % buckets`.
    */
  private def slotOf(w1: Column, w2: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat_ws(" ", w1, w2)), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Per-document DSIR log importance weights.
    *
    * @param targetPred rows where this predicate holds are the target
    *                   sample (e.g. `col("lang") === "en"`); the raw
    *                   model is the whole input.
    * @return (keyCol, lwt DOUBLE rounded 6) for every input row; rows
    *         with fewer than two tokens carry weight 0.
    */
  def importanceWeights(docs: DataFrame, keyCol: String, textCol: String,
                        targetPred: Column, buckets: Int = 1024,
                        addK: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(addK > 0, s"addK must be positive for smoothing, got $addK")
    val toks = docs.select(col(keyCol), targetPred.as("is_t"),
      cleanTokens(col(textCol)).as("toks"))
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col(keyCol), col("is_t"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
      .select(col(keyCol), col("is_t"),
        slotOf(col("b.0"), col("b.1"), buckets).as("slot"))
    // per-doc slot term frequencies (is_t is constant per doc)
    val tf = bi.groupBy(col(keyCol), col("slot"))
      .agg(count(lit(1)).as("tf"), first(col("is_t")).as("is_t"))
    // both models in ONE pass: raw counts everywhere, target counts
    // where the predicate held — partial-agg combines map-side.
    // NOT materialized, deliberately (round 12): an eager checkpoint of
    // the bounded model table halves the PLAN's scan count (10 -> 6)
    // but measured flat on q135 (runtime ReusedExchange already dedups
    // the tf aggregation) and regressed q134 0.5 -> 1.4s — a consumer
    // that never reads lwt gets the whole scoring join ELIMINATED
    // (left-join cardinality preservation), which an eager barrier
    // forfeits.
    val model = tf.groupBy(col("slot")).agg(
      sum(col("tf")).as("r"),
      sum(when(col("is_t"), col("tf")).otherwise(lit(0L))).as("t"))
    val totals = model.agg(sum(col("r")).as("rtot"), sum(col("t")).as("ttot"))
    val lr = model.crossJoin(broadcast(totals))
      .select(col("slot"),
        (log((col("t") + lit(addK)) / (col("ttot") + lit(addK * buckets))) -
         log((col("r") + lit(addK)) / (col("rtot") + lit(addK * buckets))))
          .as("lr"))
    // (keyCol, slot) is unique in tf, so the sorted-struct fold is fully
    // determined by the slot — accumulation order cannot drift
    val scored = tf.join(broadcast(lr), Seq("slot"))
      .withColumn("c", col("tf") * col("lr"))
      .groupBy(col(keyCol)).agg(
        aggregate(
          sort_array(collect_list(struct(col("slot"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("sumc"))
    docs.select(col(keyCol))
      .join(scored, Seq(keyCol), "left")
      .select(col(keyCol),
        round(coalesce(col("sumc"), lit(0.0)), 6).as("lwt"))
  }

  /** A driver-side snapshot of the trained slot model — KB-sized
    * (≤ `buckets` entries), closed over by [[scoreWithModel]]'s
    * row-local scorer so scoring needs NO join and NO shuffle: the
    * serving/streaming shape (the percolation pattern). `defaultLr` is
    * the smoothed log-ratio of a slot absent from the training corpus —
    * what a genuinely novel bigram scores.
    */
  case class TrainedModel(lrBySlot: Map[Long, Double], defaultLr: Double,
                          buckets: Int)

  /** Trains the hashed-bigram model once and freezes it driver-side.
    * The log-ratios reproduce [[importanceWeights]]' expression-side
    * arithmetic operation-for-operation, so scoring a doc under the
    * frozen model equals the inline path bit-for-bit.
    */
  def train(docs: DataFrame, keyCol: String, textCol: String,
            targetPred: Column, buckets: Int = 1024,
            addK: Double = 1.0): TrainedModel = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(addK > 0, s"addK must be positive for smoothing, got $addK")
    val toks = docs.select(targetPred.as("is_t"),
      cleanTokens(col(textCol)).as("toks"))
    val counts = toks.filter(size(col("toks")) >= 2)
      .select(col("is_t"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
      .select(col("is_t"), slotOf(col("b.0"), col("b.1"), buckets).as("slot"))
      .groupBy(col("slot")).agg(
        count(lit(1)).as("r"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rtot = counts.map(_._2).sum.toDouble
    val ttot = counts.map(_._3).sum.toDouble
    def lr(t: Double, r: Double): Double =
      math.log((t + addK) / (ttot + addK * buckets)) -
        math.log((r + addK) / (rtot + addK * buckets))
    TrainedModel(
      counts.map { case (slot, r, t) => slot -> lr(t.toDouble, r.toDouble) }
        .toMap,
      lr(0.0, 0.0), buckets)
  }

  /** Scores rows under a FROZEN model: per-row tokenize → hash → fold,
    * no join, no shuffle, no state — safe on a streaming source in
    * append mode (the continuous-scoring twin; model refresh = restart
    * with a retrained snapshot, the pinned-corpus contract the
    * streaming near-dedup documents). On the training corpus itself
    * this equals [[importanceWeights]] exactly (spec'd); novel bigrams
    * score `defaultLr`.
    */
  def scoreWithModel(docs: DataFrame, keyCol: String, textCol: String,
                     m: TrainedModel): DataFrame = {
    val score = udf { text: String =>
      // the JVM twin of cleanTokens + slotOf + the sorted-slot fold
      val toks =
        if (text == null || text.trim.isEmpty) Array.empty[String]
        else text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) 0.0
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val slots = toks.iterator.zip(toks.iterator.drop(1)).map {
          case (w1, w2) =>
            md.reset()
            val hex = md.digest((w1 + " " + w2).getBytes("UTF-8"))
              .take(4).map("%02x".format(_)).mkString
            java.lang.Long.parseLong(hex, 16) % m.buckets
        }.toSeq
        slots.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (acc, (slot, tf)) =>
            acc + tf.toDouble * m.lrBySlot.getOrElse(slot, m.defaultLr)
          }
      }
    }
    docs.withColumn("lwt", round(score(col(textCol)), 6))
  }

  /** Gumbel-top-n resampling over the importance weights: keeps `n` rows
    * sampled without replacement with probability ∝ exp(lwt) — the
    * paper's resampling step. The Gumbel noise derives from the row key
    * (`g = -ln(-ln(u))`, u the exact md5 fraction), so selection is
    * deterministic, append-stable, and reproducible; `temperature`
    * sharpens (<1) or flattens (>1) toward/away from plain top-n.
    */
  def resample(docs: DataFrame, keyCol: String, textCol: String,
               targetPred: Column, n: Int, buckets: Int = 1024,
               addK: Double = 1.0, temperature: Double = 1.0): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val w = importanceWeights(docs, keyCol, textCol, targetPred, buckets, addK)
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    val keyed = docs.join(w, Seq(keyCol))
      .withColumn("gkey", col("lwt") / lit(temperature) - log(-log(u)))
    keyed.orderBy(col("gkey").desc, col(keyCol)).limit(n).drop("gkey")
  }
}
