package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import graft.operators.Eval

/** Hand-computed fixtures for the retrieval-quality harness — the
  * engine-vs-engine parity is graded by q146's oracle; this pins the
  * METRIC semantics against values derived on paper.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(results: Seq[(Long, Long, Long)],
                      gold: Seq[(Long, Long)], k: Int) =
    Eval.retrievalMetrics(
        results.toDF("query_id", "doc_id", "rank"),
        gold.toDF("query_id", "doc_id"), k)
      .orderBy("query_id").collect()

  test("perfect ranking: recall 1, mrr 1, ndcg 1") {
    val rows = metrics(
      results = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)),
      gold = Seq((1L, 10L), (1L, 11L), (1L, 12L)), k = 10)
    assert(rows === Array(Row(1L, 3L, 3L, 1.0, 1.0, 1.0)))
  }

  test("zero-hit gold query reports 0s, not a dropped row") {
    val rows = metrics(
      results = Seq((1L, 99L, 1L)),
      gold = Seq((1L, 10L), (2L, 20L)), k = 10)
    // query 2 has gold but no candidates at all; query 1 has a miss page
    assert(rows === Array(
      Row(1L, 1L, 0L, 0.0, 0.0, 0.0),
      Row(2L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("candidates for a query with no gold are excluded") {
    val rows = metrics(
      results = Seq((7L, 1L, 1L)),
      gold = Seq((1L, 10L)), k = 10)
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("single hit at rank 3 of 2 gold: hand-computed mrr and ndcg") {
    val rows = metrics(
      results = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)),
      gold = Seq((1L, 12L), (1L, 55L)), k = 10)
    val r = rows(0)
    assert((r.getLong(1), r.getLong(2)) === ((2L, 1L)))
    assert(r.getDouble(3) === 0.5)                  // recall 1/2
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 1e-6) // mrr 1/3
    // dcg = 1/log2(4); idcg = 1/log2(2) + 1/log2(3)
    val dcg = 1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getDouble(5) - dcg / idcg) < 1e-6)
  }

  test("k truncates both the candidate page and the ideal gain") {
    // hit at rank 3 is invisible at k=2; idcg uses min(k, n_gold)=2 slots
    val rows = metrics(
      results = Seq((1L, 10L, 1L), (1L, 12L, 3L)),
      gold = Seq((1L, 12L), (1L, 10L), (1L, 11L)), k = 2)
    val r = rows(0)
    assert(r.getLong(2) === 1L)     // only the rank-1 hit counts
    assert(math.abs(r.getDouble(3) - 1.0 / 3) < 1e-6)
    assert(r.getDouble(4) === 1.0)
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getDouble(5) - 1.0 / idcg) < 1e-6)
  }

  test("duplicate gold rows do not inflate n_gold") {
    val rows = metrics(
      results = Seq((1L, 10L, 1L)),
      gold = Seq((1L, 10L), (1L, 10L)), k = 5)
    assert(rows(0).getLong(1) === 1L)
    assert(rows(0).getDouble(3) === 1.0)
  }

  private def boot(a: Seq[(Long, Double)], b: Seq[(Long, Double)],
                   nBoot: Int = 100) =
    Eval.pairedBootstrap(a.toDF("query_id", "recall"),
      b.toDF("query_id", "recall"), "recall", nBoot).head()

  test("paired bootstrap: a strictly dominant system is significant") {
    val a = (1L to 20L).map(q => (q, 0.9))
    val b = (1L to 20L).map(q => (q, 0.5))
    val r = boot(a, b)
    assert(r.getLong(0) === 20L)
    assert(math.abs(r.getDouble(1) - 0.4) < 1e-9)
    assert(r.getDouble(2) === 0.0, "every resample's mean delta is 0.4 > 0")
  }

  test("paired bootstrap: loud refusal beyond the eval-set cap") {
    // the resampler's stable-order rank is an unpartitioned window —
    // an oversized "eval set" must refuse, not silently single-task
    val big = spark.range(0, Eval.MaxBootstrapQueries + 1)
      .select(col("id").as("query_id"), lit(0.5).as("recall"))
    val e = intercept[IllegalArgumentException] {
      Eval.pairedBootstrap(big, big, "recall", nBoot = 2).head()
    }
    assert(e.getMessage.contains("cap"), e.getMessage)
  }

  test("paired bootstrap: identical systems are maximally insignificant") {
    val a = (1L to 20L).map(q => (q, 0.7))
    val r = boot(a, a)
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 1.0,
      "zero deltas: every resample mean is 0 <= 0")
  }

  test("bootstrap CI: dominant system's interval excludes 0; identical straddles at 0") {
    val a = (1L to 20L).map(q => (q, 0.9))
    val b = (1L to 20L).map(q => (q, 0.5))
    val r = Eval.bootstrapCi(a.toDF("query_id", "recall"),
      b.toDF("query_id", "recall"), "recall", nBoot = 100).head()
    // constant deltas: every resample mean is exactly 0.4
    assert(math.abs(r.getDouble(1) - 0.4) < 1e-9)
    assert(r.getDouble(2) === 0.4 && r.getDouble(3) === 0.4)
    val same = Eval.bootstrapCi(a.toDF("query_id", "recall"),
      a.toDF("query_id", "recall"), "recall", nBoot = 100).head()
    assert(same.getDouble(2) === 0.0 && same.getDouble(3) === 0.0)
    // lo <= mean <= hi on a mixed fixture, and determinism
    val c = (1L to 15L).map(q => (q, (q % 5).toDouble / 5))
    val d0 = (1L to 15L).map(q => (q, (q % 3).toDouble / 3))
    val m1 = Eval.bootstrapCi(c.toDF("query_id", "recall"),
      d0.toDF("query_id", "recall"), "recall", nBoot = 150).head()
    assert(m1.getDouble(2) <= m1.getDouble(1) + 1e-9 &&
      m1.getDouble(1) <= m1.getDouble(3) + 1e-9)
    val m2 = Eval.bootstrapCi(c.reverse.toDF("query_id", "recall"),
      d0.toDF("query_id", "recall"), "recall", nBoot = 150).head()
    assert(m1 === m2)
    intercept[IllegalArgumentException] {
      Eval.bootstrapCi(c.toDF("query_id", "recall"),
        d0.toDF("query_id", "recall"), "recall", alpha = 0.6)
    }
  }

  test("paired bootstrap is deterministic and pairs by query id") {
    val a = (1L to 15L).map(q => (q, (q % 5).toDouble / 5))
    val b = (1L to 15L).map(q => (q, (q % 3).toDouble / 3))
    val r1 = boot(a, b, nBoot = 150)
    val r2 = boot(a.reverse, b, nBoot = 150) // row order must not matter
    assert(r1 === r2)
    // unpaired queries are excluded from the test
    val r3 = boot(a ++ Seq((99L, 1.0)), b)
    assert(r3.getLong(0) === 15L)
  }
}
