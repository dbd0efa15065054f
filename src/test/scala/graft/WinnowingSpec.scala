package graft

import org.apache.spark.sql.functions._

import graft.functions.Winnowing

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference winnowing: hashes via the same md5-hex8
    * scheme, window min with rightmost tie — the paper's Figure 5 rule.
    */
  private def refWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (norm.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = (0 to norm.length - k).map { i =>
      val hex = md.digest(norm.substring(i, i + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val windows =
      if (hashes.length <= w) Seq(hashes.indices)
      else (0 to hashes.length - w).map(j => j until (j + w))
    windows.map { win =>
      // min hash, rightmost position on ties
      val best = win.minBy(i => (hashes(i), -i))
      (best + 1, hashes(best)) // operator positions are 1-based
    }.toSet
  }

  test("fingerprints match the driver-side reference rule") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaa"), // degenerate: all grams hash equal -> ties
      (3L, "tiny"), // shorter than k: no fingerprints
      (4L, "exactly."), // 8 chars -> 4 grams == w: one window
      (5L, "Spaces   collapse\tand CASE  folds before gramming")
    ).toDF("doc_id", "text")
    val got = Winnowing.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1).toInt, r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = Seq(
      1L -> "The quick brown fox jumps over the lazy dog",
      2L -> "aaaaaaaaaaaa",
      3L -> "tiny",
      4L -> "exactly.",
      5L -> "Spaces   collapse\tand CASE  folds before gramming"
    ).map { case (id, t) => id -> refWinnow(t, 5, 4) }.toMap
    assert(got.getOrElse(3L, Set.empty) == Set.empty[(Int, Long)])
    want.filter(_._2.nonEmpty).foreach { case (id, fps) =>
      assert(got(id) == fps, s"doc $id")
    }
  }

  test("coverage guarantee: a shared substring of length w+k-1 yields a shared fingerprint") {
    // the winnowing theorem (SIGMOD 2003 §2): any match of length
    // >= w + k - 1 = 8 is caught. Embed one 8-char run in unrelated text.
    val shared = "zqxjkwvb"
    val docs = Seq(
      (1L, s"left padding text then $shared and some trailing words"),
      (2L, s"completely different prefix $shared closing differently")
    ).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
    val byDoc = fps.collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
  }

  test("selection density is ~2/(w+1) and every window is covered") {
    val text = ('a' to 'z').mkString(" ") * 8
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val k = 5; val w = 4
    val n = Winnowing.fingerprints(docs, "doc_id", "text", k, w).count()
    val grams = text.toLowerCase.replaceAll("\\s+", " ").trim.length - k + 1
    val density = n.toDouble / grams
    assert(density > 1.0 / w && density < 3.0 / (w + 1),
      s"density $density out of the winnowing range")
  }

  test("sharedFingerprintPairs counts shared fps, caps postings, orders keys") {
    val fps = Seq(
      // fp 100 shared by 1,2,3 (posting size 3 > cap 2 -> dropped)
      (1L, 100L), (2L, 100L), (3L, 100L),
      // fps 200/201 shared by (1,2) -> pair (1,2) shared=2
      (1L, 200L), (2L, 200L), (1L, 201L), (2L, 201L),
      // fp 300 shared by (2,3) only -> below minShared=2
      (2L, 300L), (3L, 300L)
    ).toDF("doc_id", "fp").withColumn("pos", lit(1L))
    val got = Winnowing.sharedFingerprintPairs(fps, "doc_id",
        minShared = 2, maxPostings = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L)))
  }

  test("winnowLocal (deque form) equals the naive model and the distributed form") {
    val fixtures = Seq(
      "The quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa", "tiny", "exactly.",
      "Spaces   collapse\tand CASE  folds before gramming",
      ('a' to 'z').mkString(" ") * 4)
    for (t <- fixtures; (k, w) <- Seq((5, 4), (8, 8), (3, 1))) {
      assert(graft.functions.Winnowing.winnowLocal(t, k, w) == refWinnow(t, k, w),
        s"k=$k w=$w text=${t.take(20)}")
    }
    assert(graft.functions.Winnowing.winnowLocal(null, 5, 4).isEmpty)
    // distributed == local over the real fixture
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val dist = graft.functions.Winnowing
      .fingerprints(docs, "doc_id", "text", 8, 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1).toInt, r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val want = graft.functions.Winnowing.winnowLocal(r.getString(1), 8, 8)
      assert(dist.getOrElse(r.getLong(0), Set.empty) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("contamination screen: batch form flags planted overlap, stream == batch") {
    import graft.functions.Winnowing
    val evalSet = Seq(
      (900L, "which ocean borders the republic of zanzibar exactly"),
      (901L, "name the smallest prime number greater than ninety"))
      .toDF("doc_id", "text")
    val benchFps = Winnowing.fingerprints(evalSet, "doc_id", "text", 8, 8)
      .select("fp").distinct()
    val docs = Seq(
      (1L, "totally unrelated text about spark shuffles and joins"),
      // quotes >= 15 consecutive chars of eval item 900 -> must flag
      (2L, "trivia dump: the republic of zanzibar exactly as asked"),
      (3L, "name the smallest prime number greater than ninety please"))
      .toDF("doc_id", "text")
    val batch = Winnowing.contaminationScreen(
        docs, "doc_id", "text", benchFps, 8, 8, minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.contains(3L), "near-verbatim quote must flag")
    assert(!batch.contains(1L), "unrelated text must not flag")

    // stream twin over the same docs: identical flagged set
    val benchSet = benchFps.collect().map(_.getLong(0)).toSet
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val screened = graft.streaming.Streams.contaminationScreenStream(
      mem.toDF().toDF("doc_id", "text"), benchSet, "text", 8, 8, minShared = 2)
    val q = screened.writeStream.format("memory")
      .queryName("contam_stream_out").outputMode("append").start()
    try {
      mem.addData((1L, "totally unrelated text about spark shuffles and joins"),
        (2L, "trivia dump: the republic of zanzibar exactly as asked"),
        (3L, "name the smallest prime number greater than ninety please"))
      q.processAllAvailable()
      val got = spark.table("contam_stream_out")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shared")).toMap
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("fingerprinting is doc-local: no exchange before the per-doc groupBy") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Winnowing.fingerprints(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // one shuffle for the doc-keyed aggregate + one for distinct is the
    // contract; the gram/window explode must not add more
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"unexpected exchanges in:\n$plan")
  }
}
