package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dedup.ConnectedComponents
import graft.operators.{Shuffle, Upsert}
import graft.search.Keyword

/** Property-based invariants for the core operators, each checked
  * against a driver-side brute-force model over ScalaCheck-generated
  * inputs (seeded — runs are reproducible). The point is the INPUTS the
  * fixture specs never write by hand: degenerate graphs, overlapping
  * update keys, empty documents, batches that mix every edge case.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 10): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  /** Driver-side union-find with min-node labels. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 22)
    m <- Gen.choose(1, 36)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield es.filter(e => e._1 != e._2)

  test("property: connected-components labels equal union-find on random graphs") {
    check("cc-vs-union-find", Prop.forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val got = ConnectedComponents
          .labels(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges)
      }
    })
  }

  test("property: incremental mergeLabels equals a full recompute on any edge split") {
    check("merge-vs-full", Prop.forAll(for {
      es <- edgesGen
      cut <- Gen.choose(0, es.length)
    } yield (es, cut)) { case (es, cut) =>
      val (first, second) = es.splitAt(cut)
      (first.isEmpty || second.isEmpty) || {
        val standing = ConnectedComponents.labels(first.toDF("a", "b"), "a", "b")
        val merged = ConnectedComponents
          .mergeLabels(standing, second.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val full = ConnectedComponents.labels(es.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        merged == full
      }
    }, n = 8)
  }

  test("property: upsert equals replace-matched-then-append on any key overlap") {
    val rows = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 14L)).map(_.distinct))
    check("upsert-model", Prop.forAll(rows, rows) { (baseKeys, updKeys) =>
      (baseKeys.isEmpty || updKeys.isEmpty) || {
        val base = baseKeys.map(k => (k, s"base-$k")).toDF("_key", "v")
        val upd = updKeys.map(k => (k, s"upd-$k")).toDF("_key", "v")
        val got = Upsert(base, upd, "_key")
          .as[(Long, String)].collect().toMap
        val want = baseKeys.filterNot(updKeys.contains)
          .map(k => k -> s"base-$k").toMap ++
          updKeys.map(k => k -> s"upd-$k").toMap
        got == want
      }
    })
  }

  test("property: deterministic shuffle is a reproducible permutation") {
    val keysGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000L, 1000L)).map(_.distinct))
    check("shuffle-permutation", Prop.forAll(keysGen) { keys =>
      keys.isEmpty || {
        val df = keys.map(k => (k, s"row$k")).toDF("k", "payload")
        def run() = Shuffle.deterministicShuffle(df, "k")
          .select(col("k"), col("pos")).as[(Long, Long)].collect().toMap
        val a = run()
        a.values.toSeq.sorted == (0L until keys.length).toList && a == run()
      }
    })
  }

  test("property: rankBy equals the sequential sort model on any score multiset") {
    // heavy ties, negatives, duplicated scores across partition counts:
    // the rank must always equal sortBy((score, key)).zipWithIndex
    val rowsGen = for {
      n <- Gen.choose(1, 60)
      scores <- Gen.listOfN(n, Gen.choose(-5L, 5L))
      parts <- Gen.choose(1, 7)
    } yield (scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }, parts)
    check("rankBy-model", Prop.forAll(rowsGen) { case (rows, parts) =>
      val df = rows.toDF("k", "s").repartition(parts)
      val got = Shuffle.rankBy(df, Seq(col("s"), col("k")))
        .select(col("k"), col("pos")).as[(Long, Long)].collect().toMap
      val want = rows.sortBy { case (k, s) => (s, k) }
        .zipWithIndex.map { case ((k, _), i) => k -> i.toLong }.toMap
      got == want
    })
  }

  test("property: as-of join (backward + forward) equals the per-row model") {
    val sideGen = for {
      n <- Gen.choose(1, 15)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 30L); p <- Gen.choose(0L, 99L)
      } yield (k, t, p))
    } yield rows
    check("asof-model", Prop.forAll(sideGen, sideGen) { (l, r) =>
      val left = l.map { case (k, t, _) => (k, t) }.distinct.toDF("k", "lt")
      val right = r.toDF("k", "rt", "p")
      // the operator's documented right dedup: one row per (k, rt),
      // keeping the greatest payload
      val rd = r.groupBy(t => (t._1, t._2)).map { case ((k, t), rs) =>
        (k, t, rs.map(_._3).max)
      }.toSeq
      def model(forward: Boolean): Map[(Long, Long), Option[Long]] =
        left.as[(Long, Long)].collect().map { case (k, lt) =>
          val cands = rd.filter(x => x._1 == k &&
            (if (forward) x._2 >= lt else x._2 <= lt))
          val pick =
            if (cands.isEmpty) None
            else Some((if (forward) cands.minBy(_._2) else cands.maxBy(_._2))._3)
          (k, lt) -> pick
        }.toMap
      def got(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Option[Long]] =
        df.collect().map { row =>
          (row.getLong(0), row.getLong(1)) ->
            (if (row.isNullAt(2)) None else Some(row.getLong(2)))
        }.toMap
      got(graft.operators.AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("p"))
        .select(col("k"), col("lt"), col("p"))) == model(forward = false) &&
      got(graft.operators.AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("p"))
        .select(col("k"), col("lt"), col("p"))) == model(forward = true)
    }, n = 8)
  }

  test("property: distributed running total equals the sequential scan") {
    val rowsGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 500L)).map(_.distinct)
        .flatMap(ks => Gen.listOfN(ks.length, Gen.choose(-50L, 50L)).map(ks.zip(_))))
    check("prefix-sum-model", Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("ord", "v")
        val got = graft.operators.PrefixSum
          .runningTotal(df, Seq(col("ord")), col("v"), "cum")
          .select(col("ord"), col("cum")).as[(Long, Long)].collect().toMap
        var s = 0L
        val want = rows.sortBy(_._1).map { case (o, v) => s += v; (o, s) }.toMap
        got == want
      }
    })
  }

  test("property: weighted sampling membership is the md5-fraction model") {
    val rowsGen = Gen.choose(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-500L, 500L)).map(_.distinct))
    check("weighted-sample-model", Prop.forAll(rowsGen) { keys =>
      keys.isEmpty || {
        val df = keys.map(k => (k, (math.abs(k) % 100) / 100.0)).toDF("k", "p")
        val got = graft.operators.Sampling.weighted(df, "k", col("p"))
          .select("k").as[Long].collect().toSet
        def frac(k: Long): Double = {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(k.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(8)
          java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
        }
        val want = keys.filter(k => frac(k) < (math.abs(k) % 100) / 100.0).toSet
        got == want
      }
    })
  }

  test("property: percolation equals the brute-force matcher on random corpora") {
    val vocab = Vector("spark", "shuffle", "parquet", "join", "scan",
      "merge", "vector", "window")
    val word = Gen.oneOf(vocab)
    val docGen = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val queryGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val caseGen = for {
      nd <- Gen.choose(1, 10)
      nq <- Gen.choose(1, 5)
      docs <- Gen.listOfN(nd, docGen)
      qs <- Gen.listOfN(nq, queryGen)
      all <- Gen.oneOf(true, false)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
             qs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, all)
    check("percolate-model", Prop.forAll(caseGen) { case (docs, qs, requireAll) =>
      val got = Keyword.percolate(docs.toDF("doc_id", "text"), "doc_id", "text",
          qs.toDF("query_id", "query"), requireAll = requireAll)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = (for {
        (did, dtext) <- docs
        (qid, qtext) <- qs
        dToks = dtext.split("\\s+").filter(_.nonEmpty).toSet
        qToks = qtext.split("\\s+").filter(_.nonEmpty).toSet
        matched = qToks.count(dToks)
        if qToks.nonEmpty && (if (requireAll) matched == qToks.size else matched > 0)
      } yield (did, qid, matched.toLong, qToks.size.toLong)).toSet
      got == want
    }, n = 8)
  }

  test("property: pack manifest equals the sequential concat-and-chunk model") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gen = for {
      n <- Gen.choose(1, 30)
      toks <- Gen.listOfN(n, Gen.choose(0L, 40L)) // zeros exercise the drop
      len <- Gen.choose(1L, 17L)
    } yield (toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }, len)
    check("pack-model", Prop.forAll(gen) { case (rows, seqLen) =>
      val got = graft.operators.Pack.packPlan(
          rows.toDF("k", "t"), "k", "t", seqLen)
        .orderBy("seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      var cum = 0L
      val acc = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      rows.filter(_._2 > 0).sortBy { case (k, _) => (hex(k.toString), k) }
        .foreach { case (k, t) =>
          val (s, e) = (cum, cum + t); cum = e
          (s / seqLen to (e - 1) / seqLen).foreach { q =>
            val c = math.min(e, (q + 1) * seqLen) - math.max(s, q * seqLen)
            val (nd, nt, cs) = acc.getOrElse(q, (0L, 0L, 0L))
            acc(q) = (nd + 1, nt + c, cs + k * c)
          }
        }
      got == acc.toSeq.sortBy(_._1)
        .map { case (q, (nd, nt, cs)) => (q, nd, nt, cs) }
    }, n = 8)
  }

  test("property: capPerGroup keeps exactly the md5-order head of over-cap groups") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf(Some("a"), Some("b"), Some("c"), None)
      } yield g)
      cap <- Gen.choose(1, 12)
    } yield (rows.zipWithIndex.map { case (g, i) => (i.toLong, g) }, cap)
    check("cap-model", Prop.forAll(gen) { case (rows, cap) =>
      val got = graft.operators.Sampling.capPerGroup(
          rows.toDF("k", "g"), "g", "k", cap)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getString(1)))).toSet
      val want = rows.groupBy(_._2).flatMap { case (g, members) =>
        val kept =
          if (members.size <= cap) members
          else members.sortBy { case (k, _) => (hex(k.toString), k) }.take(cap)
        kept.map { case (k, _) => (k, g) }
      }.toSet
      got == want
    }, n = 8)
  }

  test("property: retrieval metrics equal the per-query brute-force model") {
    val gen = for {
      nq <- Gen.choose(1, 6)
      k <- Gen.choose(1, 6)
      gold <- Gen.listOf(for {
        q <- Gen.choose(1L, nq.toLong); d <- Gen.choose(1L, 12L)
      } yield (q, d))
      cand <- Gen.listOf(Gen.choose(1L, nq.toLong + 2))
    } yield (nq, k, gold.distinct,
      // candidate pages: ranked 1..m per query, docs drawn from the pool
      cand.distinct.map { q =>
        val docs = (1L to 12L).filter(d => (d * 7 + q) % 3 != 0).take(8)
        docs.zipWithIndex.map { case (d, i) => (q, d, i.toLong + 1) }
      }.flatten)
    check("retrievalMetrics", Prop.forAll(gen) { case (_, k, gold, results) =>
      gold.isEmpty || {
        val got = graft.operators.Eval.retrievalMetrics(
            results.toDF("query_id", "doc_id", "rank"),
            gold.toDF("query_id", "doc_id"), k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
        def dcgAt(ranks: Seq[Long]) =
          ranks.sorted.map(r => math.log(2) / math.log(r + 1.0)).sum
        val want = gold.groupBy(_._1).map { case (q, g) =>
          val gset = g.map(_._2).toSet
          val hits = results.filter(t => t._1 == q && t._3 <= k &&
            gset.contains(t._2)).map(_._3).sorted
          val n = gset.size.toLong
          val recall = math.rint(hits.size.toDouble / n * 1e6) / 1e6
          val mrr = math.rint(
            (if (hits.isEmpty) 0.0 else 1.0 / hits.min) * 1e6) / 1e6
          val idcg = dcgAt((1L to math.min(k.toLong, n)))
          val ndcg = math.rint(dcgAt(hits) / idcg * 1e6) / 1e6
          (q, n, hits.size.toLong, recall, mrr, ndcg)
        }.toSet
        got == want
      }
    }, n = 12)
  }

  test("property: batch assignment tiles the rank order; padding matches the model") {
    val gen = for {
      n <- Gen.choose(1, 40)
      b <- Gen.choose(1, 9)
      lens <- Gen.listOfN(n, Gen.choose(1L, 50L))
    } yield (b, lens.zipWithIndex.map { case (l, i) => (i.toLong + 1, l) })
    check("lengthBatches", Prop.forAll(gen) { case (b, rows) =>
      val got = graft.operators.Batching.lengthBatches(
          rows.toDF("k", "len"), "k", "len", b)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = rows.sortBy { case (k, l) => (-l, k) }.zipWithIndex
        .map { case ((k, _), i) => k -> (i / b).toLong }.toMap
      val pads = graft.operators.Batching.paddingStats(
          graft.operators.Batching.lengthBatches(
            rows.toDF("k", "len"), "k", "len", b), "len")
        .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
      val wantPads = rows.sortBy { case (k, l) => (-l, k) }.zipWithIndex
        .groupBy(_._2 / b).map { case (g, xs) =>
          val ls = xs.map(_._1._2)
          g.toLong -> (ls.size * ls.max - ls.sum)
        }
      got == want && pads == wantPads
    }, n = 12)
  }

  test("property: grouped top-k equals the sequential sort model on random multisets") {
    val rowsGen: Gen[List[(Int, Long, Long)]] = for {
      m <- Gen.choose(1, 120)
      rows <- Gen.listOfN(m, for {
        g <- Gen.choose(0, 4)
        v <- Gen.choose(0L, 6L) // heavy value collisions
        k <- Gen.choose(0L, 500L)
      } yield (g, v, k))
    } yield rows.distinctBy(_._3) // unique tie-break key
    check("topKPerGroup", Prop.forAll(rowsGen) { rows =>
      if (rows.isEmpty) true
      else {
        val k = 3
        val got = graft.operators.TopKPerGroup
          .topK(rows.toDF("g", "v", "key").repartition(4),
            Seq("g"), "v", k, tieCols = Seq("key"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            r.getInt(3))).toSet
        val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
          xs.sortBy { case (_, v, key) => (-v, key) }.take(k).zipWithIndex
            .map { case ((_, v, key), i) => (g, v, key, i + 1) }
        }.toSet
        got == want
      }
    }, n = 15)
  }

  test("minePreferencePairs equals the brute-force extremes model on random pools") {
    val poolGen = for {
      m <- Gen.choose(1, 80)
      rows <- Gen.listOfN(m, for {
        p <- Gen.choose(0L, 6L)
        c <- Gen.choose(0L, 200L)
        s <- Gen.choose(0, 8).map(_.toDouble) // heavy score ties
      } yield (p, c, s))
    } yield rows.distinctBy(t => (t._1, t._2))
    check("prefPairs", Prop.forAll(poolGen) { rows =>
      val got = graft.operators.Sft.minePreferencePairs(
          rows.toDF("p", "c", "s").repartition(4), "p", "c", "s",
          minMargin = 2.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val want = rows.groupBy(_._1).flatMap { case (p, xs) =>
        val chosen = xs.minBy { case (_, c, s) => (-s, c) }
        val worst = xs.minBy { case (_, c, s) => (s, c) }
        val margin = BigDecimal(chosen._3 - worst._3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (chosen._2 != worst._2 && margin >= 2.0)
          Some((p, chosen._2, worst._2, margin))
        else None
      }.toSet
      got == want
    }, n = 15)
  }

  test("groupAwareSplit labels equal union-find; splits never straddle a component") {
    val gen = for {
      nk <- Gen.choose(1, 60)
      ne <- Gen.choose(0, 40)
      edges <- Gen.listOfN(ne, for {
        a <- Gen.choose(1L, nk.toLong)
        b <- Gen.choose(1L, nk.toLong)
      } yield (a, b))
    } yield (nk.toLong, edges.filter(e => e._1 != e._2))
    check("groupSplit", Prop.forAll(gen) { case (nk, edges) =>
      val df = (1L to nk).toDF("k")
      val out = graft.operators.Sampling.groupAwareSplit(df, "k",
          edges.toDF("a", "b"), "a", "b",
          Seq("train" -> 70, "test" -> 30))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val uf = unionFind(edges)
      val labelsOk = out.forall { case (k, g, _) =>
        g == uf.getOrElse(k, k) }
      val atomic = out.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1)
      labelsOk && atomic && out.length == nk
    }, n = 15)
  }

  test("viterbiScore is the true maximum over ALL segmentations of short words") {
    val lp = Map("ab" -> math.log(0.3), "bc" -> math.log(0.2),
      "abc" -> math.log(0.15), "cc" -> math.log(0.1), "ca" -> math.log(0.05))
    val unk = -20.0
    def allScores(w: String): Seq[Double] =
      if (w.isEmpty) Seq(0.0)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val piece = w.substring(0, l)
        val v: Option[Double] =
          if (l == 1) Some(lp.getOrElse(piece, unk)) else lp.get(piece)
        v.toSeq.flatMap(x => allScores(w.substring(l)).map(_ + x))
      }
    val wordGen = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    check("viterbiOptimal", Prop.forAll(wordGen) { w =>
      val direct = graft.functions.UnigramLm.viterbiScore(w, lp, 4, unk)
      math.abs(direct - allScores(w).max) < 1e-9
    }, n = 40)
  }
}
