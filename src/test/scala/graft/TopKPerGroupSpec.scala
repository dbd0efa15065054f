package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopKPerGroup

/** Round-9 serving/reporting additions: the bounded-state grouped top-k
  * vs the naive window form, more-like-this, line-frequency boilerplate
  * removal, and query-time synonym expansion.
  */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("grouped top-k equals the naive window form under heavy ties") {
    // value collides (i % 7) so ties are everywhere; tie col is unique.
    // 1000 rows over 4 partitions with k=3 forces many stage-1
    // compactions (cap = 2k = 6), so a boundary-tie pruning defect shows.
    val df = (0 until 1000)
      .map(i => (i % 5, (i % 7).toLong, i.toLong))
      .toDF("g", "v", "id").repartition(4)
    val got = TopKPerGroup.topK(df, Seq("g"), "v", k = 3, tieCols = Seq("id"))
      .select("g", "v", "id", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    val w = Window.partitionBy(col("g")).orderBy(desc("v"), col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == want && got.size == 15)
  }

  test("grouped top-k: all-tied values cut exactly at the tie order") {
    // every value equal: the true top-2 per group is the 2 SMALLEST ids —
    // survives only if stage-1 compaction respects the tie order
    val df = (0 until 400).map(i => (i % 2, 1L, i.toLong))
      .toDF("g", "v", "id").repartition(4)
    val got = TopKPerGroup.topK(df, Seq("g"), "v", k = 2, tieCols = Seq("id"))
      .select("g", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((0, 0L), (0, 2L), (1, 1L), (1, 3L)))
  }

  test("grouped top-k: ascending order, null order values rank last") {
    val df = Seq(
      ("a", Some(5L), 1L), ("a", Some(2L), 2L), ("a", None, 3L),
      ("a", Some(9L), 4L), ("b", None, 5L), ("b", Some(1L), 6L))
      .toDF("g", "v", "id")
    val got = TopKPerGroup.topK(df, Seq("g"), "v", k = 2,
        tieCols = Seq("id"), asc = true)
      .select("g", "v", "id", "rank")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
    // group a ascending: 2, 5 (null last, beyond k); group b: 1, then null
    assert(got == Set(("a", Some(2L), 2L), ("a", Some(5L), 1L),
      ("b", Some(1L), 6L), ("b", None, 5L)))
  }

  test("grouped top-k refuses a non-total order and bad k") {
    val df = Seq((1, 1L, 1L)).toDF("g", "v", "id")
    intercept[IllegalArgumentException] {
      TopKPerGroup.topK(df, Seq("g"), "v", k = 0, tieCols = Seq("id"))
    }
    intercept[IllegalArgumentException] {
      TopKPerGroup.topK(df, Seq("g"), "v", k = 1, tieCols = Nil)
    }
  }

  test("moreLikeThis excludes the seed and ranks by cosine") {
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(1f, 0.1f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(1f, 1f, 0f)), (5L, Seq(-1f, 0f, 0f)))
      .toDF("_key", "embedding")
    val got = graft.search.Search.moreLikeThis(emb, seedKey = 1L, k = 3)
      .select("_key").as[Long].collect().toSeq
    assert(got == Seq(2L, 4L, 3L)) // by cosine vs [1,0,0]: .995, .707, 0
    // k deeper than the corpus: seed still excluded, all others returned
    val all = graft.search.Search.moreLikeThis(emb, seedKey = 1L, k = 10)
      .select("_key").as[Long].collect().toSet
    assert(all == Set(2L, 3L, 4L, 5L))
    // unknown seed fails loudly instead of returning an empty page
    intercept[IllegalArgumentException] {
      graft.search.Search.moreLikeThis(emb, seedKey = 99L, k = 3)
    }
  }

  test("lineFrequencyFilter drops over-threshold lines everywhere") {
    val docs = Seq(
      (1L, "boiler\nunique a\n\nshared"),
      (2L, "boiler\nunique b\nshared"),
      (3L, "boiler\nunique c"),
      (4L, "unique d")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup
      .lineFrequencyFilter(docs, "text", "doc_id", maxDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // boiler (df=3) dies INCLUDING its first occurrence; shared (df=2)
    // survives everywhere; the blank separator passes through via minLen
    assert(out.toSeq == Seq(
      (1L, "unique a\n\nshared", 3L, 1L),
      (2L, "unique b\nshared", 2L, 1L),
      (3L, "unique c", 1L, 1L),
      (4L, "unique d", 1L, 0L)))
  }

  test("expandSynonyms: case-folded, deduplicated, query-scoped, sorted") {
    val dict = Seq(
      ("Join", "Merge"), ("join", "fuse"), ("scan", "filter"))
      .toDF("term", "synonym")
    val got = graft.search.Keyword.expandSynonyms(
      Seq("JOIN", "vector", "join"), dict)
    assert(got == Seq("fuse", "join", "merge", "vector"))
    intercept[IllegalArgumentException] {
      graft.search.Keyword.expandSynonyms(Nil, dict)
    }
  }
}
