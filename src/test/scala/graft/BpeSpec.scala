package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference BPE: word-freq table, best pair by
    * (count DESC, pair ASC), greedy left-to-right merge application.
    */
  private def refLearn(texts: Seq[String], rounds: Int,
                       minCount: Long = 2L): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (word, ws) =>
        word.map(_.toString).toVector -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val counts = vocab.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < minCount) done = true
        else {
          out += ((a, b, c))
          vocab = vocab.map { case (syms, f) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.result() -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    out.result()
  }

  test("learn matches the driver-side reference over 8 rounds") {
    val texts = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "new new new", "the the the the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learn(df, "text", numMerges = 8)
      .map(m => (m.a, m.b, m.count))
    assert(got == refLearn(texts, 8), s"got $got\nwant ${refLearn(texts, 8)}")
  }

  test("greedy left-to-right application merges overlapping runs non-overlapping") {
    // "aaaa" under rule (a,a): aa|aa, NOT a|aa|a — the fold must consume
    // the left occurrence first and never re-merge a fresh symbol
    val df = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val toks = Bpe.segment(df, "text",
        Seq(Bpe.Merge("a", "a", 0L)))
      .select(col("tokens")).head().getSeq[String](0)
    assert(toks == Seq("aa", "aa", "aa", "a"))
  }

  test("segment applies rules in learned order and round-trips the text") {
    val texts = Seq("banana bandana", "ban bananas", "a banana")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.learn(df, "text", numMerges = 6, minCount = 1L)
    assert(merges.nonEmpty)
    val seg = Bpe.segment(df, "text", merges)
      .select(col("text"), col("tokens")).collect()
    seg.foreach { r =>
      val joined = r.getSeq[String](1).mkString
      val wordsJoined = r.getString(0).toLowerCase.trim
        .split("\\s+").filter(_.nonEmpty).mkString
      assert(joined == wordsJoined, "tokens must concatenate back to the words")
    }
  }

  test("pair counts from the vocab table equal direct corpus token-pair counting") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val viaVocab = Bpe.pairCounts(Bpe.withSymbols(Bpe.wordFreqs(docs, "text")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // direct: every token occurrence contributes its adjacent char pairs
    val direct = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, length(w) - 1),
          |  i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"""
          .stripMargin)).as("p"))
      .groupBy("p.a", "p.b").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaVocab == direct)
  }

  test("learn stops when the best pair drops below minCount") {
    val df = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // (a,b) count 2 merges; afterwards every pair count is 1 < minCount=2
    val merges = Bpe.learn(df, "text", numMerges = 10, minCount = 2L)
    assert(merges.map(m => (m.a, m.b, m.count)) == Seq(("a", "b", 2L)))
  }
}
