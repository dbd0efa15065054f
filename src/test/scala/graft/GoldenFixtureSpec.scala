package graft

import org.apache.spark.sql.functions._

/** Pinned-result checks for the queries the DuckDB oracle cannot express
  * (approximate search, the chunker UDTF, media features) — plus the
  * dynamic-oracle queries (q_ivf_topk, q71_pq), where the pin is
  * deliberate redundancy: if the Verify-time oracle build ever fails and
  * the gate silently degrades to rows-only, the frozen values still trip.
  * Exact expected outputs on the sf0.001 fixture, computed once and
  * frozen here. A behavior change in any of these operators — hash
  * family, probe set, chunk splitting — fails an equality check instead
  * of sliding through a rows-only gate.
  */
class GoldenFixtureSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("golden: q_ann_topk exact top-10 (LSH probes, fixture-pinned)") {
    val got = q("q_ann_topk").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Seq(
      0L -> 1.0, 73L -> 0.297238, 212L -> 0.281399, 394L -> 0.248665,
      262L -> 0.238745, 104L -> 0.217828, 139L -> 0.202095, 380L -> 0.191359,
      446L -> 0.176948, 11L -> 0.168679)
    assert(got == want)
  }

  // IVF/PQ pins re-frozen when training moved from first-N-by-key to the
  // deterministic hash-ordered (content-blind) sample — different
  // centroids, same contract; the dynamic oracles re-derive from the
  // same sample, so these stay their redundancy.
  test("golden: q_ivf_topk exact top-10 (probed lists, fixture-pinned)") {
    val got = q("q_ivf_topk").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Seq(
      0L -> 1.0, 17L -> 0.334456, 225L -> 0.315127, 12L -> 0.311027,
      483L -> 0.300451, 402L -> 0.2745, 299L -> 0.268713, 232L -> 0.267338,
      497L -> 0.252082, 82L -> 0.2494)
    assert(got == want)
  }

  test("golden: q71_pq ADC top-10 (codebook-pinned)") {
    val got = q("q71_pq").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Seq(
      0L -> 0.540217, 12L -> 1.001673, 82L -> 1.026513, 212L -> 1.04696,
      402L -> 1.04855, 349L -> 1.07384, 468L -> 1.083522, 225L -> 1.086206,
      145L -> 1.104914, 258L -> 1.107367)
    assert(got == want)
  }

  test("golden: q_embed_search top-10 keys and scores") {
    val got = q("q_embed_search").select("key", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Seq(
      476L -> 0.730775, 310L -> 0.671908, 106L -> 0.633486, 343L -> 0.624815,
      195L -> 0.622483, 398L -> 0.61099, 44L -> 0.608082, 225L -> 0.596421,
      387L -> 0.595777, 497L -> 0.594035)
    assert(got == want)
  }

  test("golden: q33_chunks total count and document 0's chunks") {
    val chunks = q("q33_chunks")
    assert(chunks.count() == 4851L)
    val doc0 = chunks.filter(col("doc_id") === 0).orderBy(col("chunk_idx"))
      .collect().map(_.getString(2)).toSeq
    assert(doc0 == Seq(
      "the fast key order sort table",
      "scan merge part window small hash",
      "scan join order batch batch batch",
      "stream spark window window dup"))
  }

  test("golden: q34_media_features are unit-norm for every fixture row") {
    val feats = q("q34_media_features").collect()
    assert(feats.length == 500)
    assert(feats.forall(_.getDouble(3) == 1.0))
    assert(feats.map(_.getString(1)).toSet == Set("image", "audio", "video"))
  }
}
