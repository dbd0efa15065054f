package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weighting + Gumbel-top-n resampling (q134/q135). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with two clearly-separated vocabularies: target docs talk
  // about "alpha beta", off-target ones about "gamma delta"
  private def corpus() = (
    (0L until 20L).map(k => (k, "alpha beta alpha beta alpha beta", true)) ++
    (100L until 180L).map(k => (k, "gamma delta gamma delta gamma delta", false)) ++
    Seq((900L, "alpha beta gamma delta", false),   // mixed
        (901L, "solo", false), (902L, "", false))  // sub-bigram
  ).toDF("k", "text", "is_t")

  test("importanceWeights: target-vocabulary docs score higher") {
    val w = Dsir.importanceWeights(corpus(), "k", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 103, "every input row is scored")
    // all target-vocab docs share one text -> one weight, clearly above
    // the off-target weight
    assert(w(0L) == w(19L))
    assert(w(100L) == w(179L))
    assert(w(0L) > 0.0, s"target-vocab weight ${w(0L)}")
    assert(w(100L) < 0.0, s"off-target weight ${w(100L)}")
    // the mixed doc lands strictly between the two pure vocabularies
    assert(w(900L) > w(100L) && w(900L) < w(0L), s"mixed ${w(900L)}")
    // sub-bigram docs carry exactly 0
    assert(w(901L) == 0.0 && w(902L) == 0.0)
  }

  test("importanceWeights: weights depend on vocabulary, not membership") {
    // an off-target doc WITH the target vocabulary must score like the
    // target docs — DSIR selects by similarity, not by label
    val df = corpus().union(
      Seq((950L, "alpha beta alpha beta alpha beta", false))
        .toDF("k", "text", "is_t"))
    val w = Dsir.importanceWeights(df, "k", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(950L) == w(0L), "same text, same weight, any label")
  }

  test("resample: keeps mostly target-looking docs, deterministic, exact n") {
    val kept = Dsir.resample(corpus(), "k", "text", col("is_t"), n = 25)
    val keys = kept.select("k").as[Long].collect().toSet
    assert(keys.size == 25)
    // softmax over lwt: the 21 alpha-beta-vocab docs (incl. the mixed
    // one) are overwhelmingly preferred over 80 gamma-delta docs
    val targetVocab = keys.count(k => k < 20L || k == 900L)
    assert(targetVocab >= 15, s"target-vocab kept: $targetVocab of 25")
    // deterministic
    val again = Dsir.resample(corpus(), "k", "text", col("is_t"), n = 25)
      .select("k").as[Long].collect().toSet
    assert(keys == again)
    // output keeps the input columns plus lwt, minus the noise key
    assert(kept.columns.toSeq == Seq("k", "text", "is_t", "lwt"))
  }

  test("resample: temperature sharpens toward plain top-n") {
    // tiny temperature makes lwt dominate the Gumbel noise: the kept
    // set must then be exactly the top-n by lwt — the 20 pure
    // target-vocab docs (the mixed doc's weight is negative: its
    // gamma-delta slots outweigh, so even the empty docs' exact 0
    // outranks it)
    val keys = Dsir.resample(corpus(), "k", "text", col("is_t"), n = 20,
        temperature = 1e-6)
      .select("k").as[Long].collect().toSet
    assert(keys == (0L until 20L).toSet,
      s"cold resample must keep exactly the high-weight docs: $keys")
  }

  test("scoreWithModel under the corpus's own model equals importanceWeights") {
    val m = Dsir.train(corpus(), "k", "text", col("is_t"))
    val frozen = Dsir.scoreWithModel(corpus(), "k", "text", m)
      .select("k", "lwt").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inline = Dsir.importanceWeights(corpus(), "k", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(frozen == inline, "frozen-model scoring must equal the inline path")
  }

  test("scoreWithModel: novel bigrams score defaultLr; scoring is shuffle-free") {
    val m = Dsir.train(corpus(), "k", "text", col("is_t"))
    val novel = Seq((1L, "zzz yyy")).toDF("k", "text")
    val got = Dsir.scoreWithModel(novel, "k", "text", m)
      .select("lwt").head().getDouble(0)
    assert(got == BigDecimal(m.defaultLr)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"one novel bigram = defaultLr: $got vs ${m.defaultLr}")
    // smoothing artifact worth pinning: an unseen slot scores
    // ln((rtot+kB)/(ttot+kB)) > 0 when the target is a corpus minority
    // (the target model's smaller denominator inflates its smoothed
    // mass) — mildly pro-target, never a large magnitude
    assert(m.defaultLr > 0.0 && m.defaultLr < 2.0, s"defaultLr ${m.defaultLr}")
    val plan = Dsir.scoreWithModel(corpus(), "k", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "frozen scoring must not shuffle")
  }

  test("scoreWithModel: stream == batch on a closed input") {
    val m = Dsir.train(corpus(), "k", "text", col("is_t"))
    val rows = Seq((1L, "alpha beta gamma"), (2L, "gamma delta gamma"),
      (3L, "zzz yyy"), (4L, ""))
    val batch = Dsir.scoreWithModel(rows.toDF("k", "text"), "k", "text", m)
      .select("k", "lwt").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val query = Dsir.scoreWithModel(mem.toDF().toDF("k", "text"), "k", "text", m)
      .select("k", "lwt").writeStream.format("memory")
      .queryName("dsir_stream_out").outputMode("append").start()
    mem.addData(rows)
    query.processAllAvailable()
    val streamed = spark.table("dsir_stream_out")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    query.stop()
    assert(streamed == batch, "frozen DSIR scoring must agree on stream and batch")
  }

  test("importanceWeights plan: model is broadcast, no corpus-wide shuffle of text") {
    val plan = Dsir.importanceWeights(corpus(), "k", "text", col("is_t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "slot model must broadcast into scoring")
  }
}
