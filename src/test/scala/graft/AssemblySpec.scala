package graft

import org.apache.spark.sql.functions._
import graft.operators.{Batching, Sft}

/** SFT rendering (loss spans) and length-bucketed batching (padding
  * accounting) — the assembly steps between a clean corpus and a
  * training job. Engine parity is graded by q154/q155.
  */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  test("sft render: the loss span IS the response, by substring") {
    val pairs = Seq(
      (1L, "what is spark", "a distributed engine"),
      (2L, "", "empty prompt still renders"),
      (3L, "unanswered", ""),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("doc_id", "prompt", "response")
    val out = Sft.renderPairs(pairs, "doc_id", "prompt", "response",
        systemPrompt = Some("sys"))
      .orderBy("doc_id").collect()
    val responses = Map(1L -> "a distributed engine",
      2L -> "empty prompt still renders", 3L -> "", 4L -> "")
    out.foreach { r =>
      val (key, text, s, e) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val want = responses(key)
      assert(text.substring(s.toInt - 1, e.toInt) == want,
        s"key $key: span [$s, $e] of '$text'")
      assert(e - s + 1 == want.length.toLong)
      assert(text.startsWith("<|system|>\nsys\n<|user|>\n"))
      assert(text.endsWith("<|end|>"))
    }
    // no system prompt -> no system block
    val bare = Sft.renderPairs(pairs, "doc_id", "prompt", "response")
      .orderBy("doc_id").head().getString(1)
    assert(bare.startsWith("<|user|>\n"))
  }

  test("dpo render: two rows per pair, identical prefix, spans hold per side") {
    val triples = Seq(
      (1L, "pick one", "good answer", "bad answer!"),
      (2L, "empty rejected", "only side", "")
    ).toDF("doc_id", "prompt", "chosen", "rejected")
    val out = Sft.renderPreferencePairs(triples, "doc_id",
        "prompt", "chosen", "rejected")
      .orderBy("doc_id", "side").collect()
    assert(out.length == 4)
    val bySide = out.map(r => ((r.getLong(0), r.getString(1)),
      (r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // spans select the side's response
    def span(t: (String, Long, Long)) =
      t._1.substring(t._2.toInt - 1, t._3.toInt)
    assert(span(bySide((1L, "chosen"))) == "good answer")
    assert(span(bySide((1L, "rejected"))) == "bad answer!")
    assert(span(bySide((2L, "rejected"))) == "")
    // a pair's rows share the exact prompt prefix (the DPO contrast is
    // response-only)
    val (c, cs, _) = bySide((1L, "chosen"))
    val (j, js, _) = bySide((1L, "rejected"))
    assert(cs == js && c.substring(0, cs.toInt - 1) == j.substring(0, js.toInt - 1))
  }

  test("length batching: full batches, short tail, deterministic, less padding") {
    val docs = (1L to 100L).map(k => (k, (k * 37 % 97 + 3))).toDF("doc_id", "len")
    val bl = Batching.lengthBatches(docs, "doc_id", "len", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc assigned exactly once; batch sizes are 8 except the tail
    assert(bl.length == 100 && bl.map(_._1).distinct.length == 100)
    val sizes = bl.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.count(_ == 8) == 12 && sizes(12L) == 4)
    // batches are length-contiguous: batch 0 holds the longest rows
    val b0max = bl.filter(_._3 == 0L).map(_._2).min
    assert(bl.filter(_._3 > 0L).forall(_._2 <= b0max))
    // deterministic under partitioning
    val again = Batching.lengthBatches(docs.repartition(7), "doc_id", "len", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bl.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // padding accounting: n*max - sum, and length-bucketing wastes less
    val padLen = Batching.paddingStats(
        Batching.lengthBatches(docs, "doc_id", "len", 8), "len")
      .agg(sum("padding")).head().getLong(0)
    val padRnd = Batching.paddingStats(
        Batching.shuffledBatches(docs, "doc_id", "len", 8), "len")
      .agg(sum("padding")).head().getLong(0)
    assert(padLen < padRnd,
      s"length-bucketing must waste less padding: $padLen vs $padRnd")
    intercept[IllegalArgumentException] {
      Batching.lengthBatches(docs, "doc_id", "len", 0)
    }
  }
}
