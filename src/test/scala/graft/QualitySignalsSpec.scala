package graft

import org.apache.spark.sql.functions._
import graft.functions.{NgramLm, Repetition}
import graft.operators.Sampling

/** Specs for the round-8 extension operators: bigram-LM cross-entropy
  * (q131), priority sampling (q132) and the Gopher repetition signals
  * (q133). Each is graded against a driver-side model small enough to
  * verify by hand.
  */
class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  // ---- bigram cross-entropy -------------------------------------------

  test("bigramCrossEntropy matches a hand-computed add-1 model") {
    // corpus: "a b a b" and "a c"; vocabulary {a, b, c}, V = 3
    // bigram counts: (a,b)=2 (a,c)=1 (b,a)=1; contexts: c(a,.)=3 c(b,.)=1
    val df = Seq((1L, "a b a b"), (2L, "a c"), (3L, "a"), (4L, ""))
      .toDF("doc_id", "text")
    val got = NgramLm.bigramCrossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val V = 3.0
    def p(c2: Double, c1: Double) = (c2 + 1.0) / (c1 + V)
    // doc 1: occurrences (a,b) x2, (b,a) x1, N = 3
    val x1 = -(2 * math.log(p(2, 3)) + 1 * math.log(p(1, 1))) / 3.0
    // doc 2: (a,c) x1, N = 1
    val x2 = -math.log(p(1, 3))
    assert(math.abs(got(1L) - x1) < 1e-6, s"doc1: ${got(1L)} vs $x1")
    assert(math.abs(got(2L) - x2) < 1e-6, s"doc2: ${got(2L)} vs $x2")
    // sub-bigram docs score 0 and are still present
    assert(got(3L) == 0.0 && got(4L) == 0.0)
    // an in-corpus doc scores strictly lower than a same-length doc of
    // rare transitions — the filter direction the operator exists for
    assert(got(1L) < x2)
  }

  test("bigramCrossEntropy: conditional sums to 1 over the vocabulary") {
    // the c(w1,.) context denominator (not the unigram count) makes
    // sum_w2 p(w2|w1) = 1 exactly; verify on the trained counts
    val df = Seq((1L, "x y x z x y")).toDF("doc_id", "text")
    // bigrams: (x,y)2 (y,x)1 (x,z)1 (z,x)1; contexts c(x,.)=3 c(y,.)=1
    // c(z,.)=1; V=3 — so p(y|x)+p(z|x)+p(x|x) = 3/6 + 2/6 + 1/6 = 1
    val got = NgramLm.bigramCrossEntropy(df, "doc_id", "text")
      .head().getDouble(1)
    val x = -(2 * math.log(3.0 / 6) + 1 * math.log(2.0 / 4) +
      1 * math.log(2.0 / 6) + 1 * math.log(2.0 / 4)) / 5.0
    assert(math.abs(got - x) < 1e-6, s"$got vs $x")
  }

  // ---- priority sampling ----------------------------------------------

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def priority(key: Long, w: Double): Double = {
    val u = (java.lang.Long.parseLong(md5hex(key.toString).take(8), 16) + 1.0) /
      4294967296.0
    w / u
  }

  test("prioritySample: exact top-n by w/u, deterministic, append-stable") {
    val rows = (0L until 500L).map(k => (k, (k % 7 + 1).toDouble))
    val df = rows.toDF("k", "w")
    val got = Sampling.prioritySample(df, "k", col("w"), 50)
      .select("k").as[Long].collect().toSet
    val want = rows.sortBy { case (k, w) => (-priority(k, w), k) }
      .take(50).map(_._1).toSet
    assert(got == want, "sample must equal the driver-side model's top-50")
    // deterministic across runs
    val again = Sampling.prioritySample(df, "k", col("w"), 50)
      .select("k").as[Long].collect().toSet
    assert(got == again)
    // append stability: one new row displaces AT MOST one survivor
    val grown = (rows :+ (9999L, 1000.0)).toDF("k", "w")
    val after = Sampling.prioritySample(grown, "k", col("w"), 50)
      .select("k").as[Long].collect().toSet
    assert((got -- after).size <= 1, "one insert displaces at most one")
    assert(after.contains(9999L), "a heavy row should force its way in")
  }

  test("prioritySample: heavier rows are sampled more often") {
    // two weight classes over many keys: the heavy class must win
    // sample slots roughly in proportion to weight share
    val rows = (0L until 1000L).map(k => (k, if (k < 100) 50.0 else 1.0))
    val got = Sampling.prioritySample(rows.toDF("k", "w"), "k", col("w"), 200)
      .select("k").as[Long].collect()
    val heavy = got.count(_ < 100L)
    // heavy share of total weight = 5000/5900 ~ 0.85; with only 100
    // heavy rows nearly all of them should be kept
    assert(heavy > 80, s"heavy rows kept: $heavy of 100")
  }

  test("prioritySample withEstimate: w_hat = max(w, tau), unbiased total") {
    val rows = (0L until 400L).map(k => (k, (k % 13 + 1).toDouble))
    val df = rows.toDF("k", "w")
    val got = Sampling.prioritySample(df, "k", col("w"), 60, withEstimate = true)
    val cols = got.columns.toSeq
    assert(cols.contains("tau") && cols.contains("w_hat"))
    val local = got.select("k", "w", "tau", "w_hat").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(local.length == 60)
    // tau = the 61st priority of the model
    val pris = rows.map { case (k, w) => (priority(k, w), k) }
      .sortBy { case (p, k) => (-p, k) }
    val tau = pris(60)._1
    assert(local.forall { case (_, _, t, _) => math.abs(t - tau) < 1e-9 })
    assert(local.forall { case (_, w, t, wh) => wh == math.max(w, t) })
    // the estimator: sum(w_hat) over the sample estimates total weight;
    // with a deterministic hash this is one draw — accept a wide band
    val est = local.map(_._4).sum
    val truth = rows.map(_._2).sum
    assert(est > truth * 0.5 && est < truth * 2.0,
      s"subset-sum estimate $est vs truth $truth")
  }

  test("prioritySample: corpus <= n keeps everything with tau = 0") {
    val df = (0L until 10L).map(k => (k, 2.0)).toDF("k", "w")
    val got = Sampling.prioritySample(df, "k", col("w"), 50, withEstimate = true)
      .select("k", "tau", "w_hat").collect()
    assert(got.length == 10)
    assert(got.forall(r => r.getDouble(1) == 0.0), "tau must be 0")
    assert(got.forall(r => r.getDouble(2) == 2.0), "w_hat degrades to w")
  }

  test("prioritySample plan: TakeOrdered, no global sort, no window") {
    val df = (0L until 100L).map(k => (k, 1.0)).toDF("k", "w")
    val plan = Sampling.prioritySample(df, "k", col("w"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    assert(!plan.contains("WindowExec"), "no single-task window")
  }

  // ---- repetition signals ---------------------------------------------

  test("repetition signals: degenerate loop text maxes both fractions") {
    val df = Seq(
      (1L, "x y x y x y"),          // pure loop
      (2L, "all these tokens differ"), // no repetition at all
      (3L, "one"),                  // sub-bigram
      (4L, "")                      // empty
    ).toDF("doc_id", "text")
    val got = Repetition.signals(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // doc 1: top bigram (x,y) occurs 3x of 5 bigrams; chars = 3*(1+1)/6
    assert(got(1L)._1 == 1.0, s"top2 ${got(1L)}")
    // every trigram (x,y,x)/(y,x,y) duplicates -> all positions covered
    assert(got(1L)._2 == 1.0, s"dup3 ${got(1L)}")
    // doc 2: every bigram occurs once; the (cnt DESC, w1, w2) tie-break
    // picks "all these" -> (3+5)/20 total chars; no dup trigram
    val d2 = got(2L)
    assert(math.abs(d2._1 - 8.0 / 20.0) < 1e-6, s"top2 $d2")
    assert(d2._2 == 0.0)
    // short/empty docs: both 0
    assert(got(3L) == ((0.0, 0.0)) && got(4L) == ((0.0, 0.0)))
  }

  // ---- curriculum staging ---------------------------------------------

  test("curriculum stages: rank order, exact stage sizes, no global window") {
    import graft.operators.Curriculum
    // scores with heavy ties to stress the key tie-break
    val df = (0L until 137L).map(k => (k, (k % 10).toDouble)).toDF("k", "s")
    val staged = Curriculum.stages(df, "k", col("s"), stageRows = 25)
    val rows = staged.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getAs[Long]("pos"),
        r.getAs[Long]("stage")))
    assert(rows.length == 137)
    // pos is a dense 0-based permutation
    assert(rows.map(_._3).sorted.toSeq == (0L until 137L).toSeq)
    // pos order == (score, key) order
    val byPos = rows.sortBy(_._3).map(t => (t._2, t._1)).toSeq
    assert(byPos == byPos.sorted, "rank must follow (score, key)")
    // stages are exact 25-row cuts of the rank (last one ragged)
    assert(rows.forall { case (_, _, pos, st) => st == pos / 25 })
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25, 4L -> 25,
      5L -> 12), sizes.toString)
    // deterministic across runs
    val again = Curriculum.stages(df, "k", col("s"), 25)
      .select("k", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == rows.map(t => (t._1, t._3)).toSet)
    // the engine must not funnel through a single-task window
    val plan = Curriculum.stages(df, "k", col("s"), 25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "no global window in rankBy")
  }

  // ---- mixture planning -----------------------------------------------

  test("mixture plan: flattening, epoch cap, shortfall accounting") {
    import graft.operators.Mixture
    val avail = Seq(("big", 90000L), ("mid", 10000L), ("small", 100L),
      ("empty", 0L)).toDF("source", "n_tokens")
    val plan = Mixture.plan(avail, "source", "n_tokens",
        budget = 50000L, alpha = 0.5, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getLong(5)))).toMap
    val wsum = math.sqrt(90000) + math.sqrt(10000) + math.sqrt(100) + 0.0
    // weights are the flattened shares (sqrt), rounded 6
    def w(x: Double) = BigDecimal(math.sqrt(x) / wsum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(plan("big")._2 == w(90000) && plan("mid")._2 == w(10000))
    // small source: share round(w * B) = 1220 > cap floor(100*2) = 200
    assert(plan("small")._3 == 200L, plan("small").toString)
    assert(plan("small")._4 == 2.0, "capped source runs maxEpochs")
    // big source: share binds, cap (180000) does not
    assert(plan("big")._3 == math.round(w(90000) * 50000),
      plan("big").toString)
    assert(plan("big")._4 < 1.0, "big source undersampled (flattening)")
    // empty source: zero take, zero epochs, present in the plan
    assert(plan("empty") == ((0L, 0.0, 0L, 0.0, plan("empty")._5)))
    // shortfall = unplaced budget, same scalar on every row
    val takes = plan.values.map(_._3).sum
    assert(plan.values.map(_._5).toSet.size == 1)
    assert(plan("big")._5 == math.max(0L, 50000L - takes))
  }

  // ---- span corruption ------------------------------------------------

  test("span corruption: reconstruction, sentinel pairing, rate extremes") {
    import graft.operators.SpanCorruption
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "alpha beta"), (3L, "solo"), (4L, "")).toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(docs, "doc_id", "text", rate = 0.3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    val sentinel = "<extra_id_\\d+>".r
    out.foreach { case (k, (inp, tgt, n)) =>
      // sentinels appear 0..n-1 exactly once each, in order, in BOTH
      val si = sentinel.findAllIn(inp).toSeq
      val st = sentinel.findAllIn(tgt).toSeq
      assert(si == (0L until n).map(i => s"<extra_id_$i>"), s"doc $k input $si")
      assert(st == si, s"doc $k target sentinels differ")
      // splicing the target's spans back into the input rebuilds the doc
      val spans = if (n == 0) Map.empty[String, String]
        else tgt.split("<extra_id_").drop(1).map { part =>
          val (id, rest) = part.span(_ != '>')
          s"<extra_id_$id>" -> rest.drop(1).trim
        }.toMap
      val rebuilt = sentinel.replaceAllIn(inp,
        m => java.util.regex.Matcher.quoteReplacement(spans(m.matched)))
        .replaceAll("\\s+", " ").trim
      val orig = docs.filter(col("doc_id") === k).head().getString(1)
        .toLowerCase.trim.replaceAll("\\s+", " ")
      assert(rebuilt == orig, s"doc $k: $rebuilt != $orig")
    }
    // rate 0: identity input, empty target
    val id0 = SpanCorruption.corrupt(docs, "doc_id", "text", rate = 0.0)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(id0(1L) == (("the quick brown fox jumps over the lazy dog again", 0L)))
    assert(id0(4L) == (("", 0L)))
    // rate 1: one all-covering span per non-empty doc
    val id1 = SpanCorruption.corrupt(docs, "doc_id", "text", rate = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(id1(3L) == (("<extra_id_0>", "<extra_id_0> solo", 1L)))
    assert(id1(1L)._3 == 1L && id1(1L)._1 == "<extra_id_0>")
    // salt re-deals the mask; same salt reproduces
    val a = SpanCorruption.corrupt(docs, "doc_id", "text", 0.3, salt = "s1")
      .collect().map(_.toSeq).toSet
    assert(a == SpanCorruption.corrupt(docs, "doc_id", "text", 0.3, "s1")
      .collect().map(_.toSeq).toSet)
  }

  // ---- dataset card ---------------------------------------------------

  test("dataset card: corpus-wide dup counting, exact stats per source") {
    import graft.operators.DatasetCard
    val df = Seq(
      (1L, "srcA", "shared text body"),
      (2L, "srcA", "unique alpha document"),
      (3L, "srcB", "Shared   TEXT body"),   // normalizes == doc 1
      (4L, "srcB", "unique beta document here"),
      (5L, "srcB", "")                       // empty: 0 tokens
    ).toDF("doc_id", "source", "text")
    val card = DatasetCard.perSource(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // srcA: 2 docs, 3+3 tokens; doc 1 duplicates CROSS-source
    assert(card("srcA") == ((2L, 6L, ((16 + 21) / 2.0), 1L, 0.5)),
      card("srcA").toString)
    // srcB: 3 docs; doc 3 dups doc 1; empty doc counts 0 tokens
    val b = card("srcB")
    assert(b._1 == 3L && b._2 == 3L + 4L + 0L && b._4 == 1L,
      card("srcB").toString)
    assert(math.abs(b._5 - 0.333333) < 1e-9)
  }

  test("dataset card: NULL text folds to '' — rows never drop from the join") {
    import graft.operators.DatasetCard
    val df = Seq(
      (1L, "srcA", Option("real body")),
      (2L, "srcA", Option.empty[String]),   // null text
      (3L, "srcA", Option.empty[String]),   // null text — dups doc 2
      (4L, "srcB", Option(""))              // empty — dups the nulls too
    ).toDF("doc_id", "source", "text")
    val card = DatasetCard.perSource(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    // a null fp would have silently dropped docs 2/3 here
    assert(card("srcA") == ((3L, 2L)), card.toString)
    assert(card("srcB") == ((1L, 1L)), card.toString)
  }

  test("repetition signals: overlapping dup-trigram coverage counts once") {
    // "a b a b a": trigrams (a,b,a) x2 overlap on position 2 (0-based);
    // all 5 positions are covered exactly once -> dup3 = 1.0
    val df = Seq((1L, "a b a b a"), (2L, "p q r p q r s t u v w x y z"))
      .toDF("doc_id", "text")
    val got = Repetition.signals(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L)._2 == 1.0, s"overlap coverage ${got(1L)}")
    // doc 2: (p,q,r) duplicated at 0 and 3 -> covers positions 0..5 of
    // 14 tokens, all 1-char: 6/14
    assert(math.abs(got(2L)._2 - 6.0 / 14.0) < 1e-6, s"${got(2L)}")
    // top bigram (p,q) occurs twice: 2*(1+1)/14
    assert(math.abs(got(2L)._1 - 4.0 / 14.0) < 1e-6, s"${got(2L)}")
  }
}
