package graft

import org.apache.spark.sql.functions._

import graft.operators.Rag
import graft.search.Keyword

class RagSpec extends SparkSpec {
  import spark.implicits._

  test("packContext: greedy rank order, skip-and-continue, budget exact") {
    val page = Seq(
      ("aaa bbb ccc", 1L, 0.9),        // 3 tokens, taken (3)
      ("dd " * 200, 2L, 0.8),          // 200 tokens, SKIPPED (3+200 > 10)
      ("eee fff", 3L, 0.7),            // 2 tokens, taken (5) — continue past skip
      ("ggg hhh iii jjj kkk", 4L, 0.6),// 5 tokens, taken (10) — budget exact
      ("lll", 5L, 0.5)                 // 1 token, skipped (over)
    ).toDF("content", "key", "score")
    val r = Rag.packContext(page, budgetTokens = 10).head()
    assert(r.getString(0) == "aaa bbb ccc\n\neee fff\n\nggg hhh iii jjj kkk")
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 10L)
  }

  test("packContext: tie-break on key, empty/null content, empty page") {
    val page = Seq(
      (null.asInstanceOf[String], 2L, 0.5), // null -> "" -> 0 tokens
      ("x y", 1L, 0.5)                      // same score, lower key first
    ).toDF("content", "key", "score")
    val r = Rag.packContext(page, budgetTokens = 5).head()
    assert(r.getString(0) == "x y\n\n") // null doc packs as empty, after key 1
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    val empty = Rag.packContext(page.limit(0), budgetTokens = 5).head()
    assert(empty.getString(0) == "" && empty.getLong(1) == 0L)
    intercept[IllegalArgumentException] { Rag.packContext(page, 0) }
  }

  test("facets: full match set (OR and AND), metadata counts, postings-pruned") {
    val docs = Seq(
      (1L, "spark shuffle spark", "en"),
      (2L, "spark only", "en"),
      (3L, "shuffle only", "de"),
      (4L, "neither here", "de"),
      (5L, "spark shuffle", "fr")
    ).toDF("doc_id", "text", "lang")
    val or = Keyword.facets(docs, Seq("spark", "shuffle"), "lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(or == Seq(("en", 2L), ("de", 1L), ("fr", 1L)), s"got $or")
    val and = Keyword.facets(docs, Seq("spark", "shuffle"), "lang",
        requireAll = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(and == Seq(("en", 1L), ("fr", 1L)), s"got $and")
  }
}
