package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * An untimed warmup action runs first so JVM/codegen/parquet-reader
  * initialization isn't attributed to whichever query happens to run
  * first; queries then run in sorted-name order for stable attribution.
  */
object Bench {

  /** Deliberate heavies: queries whose cost is a GATE by design, not a
    * plan smell — so suite-total growth stays interpretable as more
    * gates land (the two multiclass queries train the same model twice
    * on purpose: bit-equal independent trainings ARE the determinism
    * check). The summary line carries their subtotal as `gate_sec`;
    * subtract it to compare suite totals across rounds on equal terms.
    */
  private val DeliberateHeavies: Map[String, String] = Map(
    "q199_multiclass" -> "train",            // 5x one-vs-rest GD fits
    "q209_multiclass_confusion" -> "train",  // independent re-train gate
    "q201_bitext_margin" -> "verify-twin",   // row-bound-guarded exact twin
    "q178_video_neardups" -> "decode",       // real per-frame RIFF decode
    "q176_image_neardups" -> "decode",       // real per-pixel BMP decode
    "q180_audio_neardups" -> "decode")       // real WAV sample decode

  /** 1-minute load average from /proc/loadavg (-1 when unreadable). */
  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Count of OTHER live JVM/sbt processes (excluding this one and its
    * ancestors' wrappers is overkill — just exclude self). Round 5's
    * driver bench was load-contaminated (~20 untouched queries inflated
    * 1.2-2.5x vs an idle run of the same commit); this plus the load
    * average makes a contaminated run machine-detectable from the JSON
    * itself instead of requiring a forensic per-query diff.
    */
  private def otherJvms(): Int =
    try {
      val self = ProcessHandle.current().pid()
      new java.io.File("/proc").listFiles()
        .filter(f => f.getName.forall(_.isDigit) && f.getName.toLong != self)
        .count { f =>
          try {
            val comm = new String(java.nio.file.Files.readAllBytes(
              f.toPath.resolve("comm")), "UTF-8").trim
            comm == "java" || comm == "sbt"
          } catch { case _: Throwable => false }
        }
    } catch { case _: Throwable => -1 }

  def main(args: Array[String]): Unit = {
    val loadStart = load1()
    val jvmsStart = otherJvms()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: parquet reader + codegen + shuffle machinery, untimed
    try {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
      docs.groupBy(col("lang")).count().count()
      Tables.embeddings(spark, sfDir)
        .select(graft.functions.VectorFunctions.l2Norm(col("embedding"))).count()
    } catch { case _: Throwable => () }

    // n runs per query, MEDIAN reported: the suite's run-to-run noise
    // floor is ±10-15%, so a single-run bench can't distinguish a real
    // regression from variance (r2's +16% shared-set drift was exactly
    // that ambiguity). A failed query keeps its wall time (the failure
    // cost is real) but is listed in "failures" so a regression can't
    // hide inside the total as a silent -1.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    // SPARK_GRAFT_BENCH_ONLY=q142,q145 — comma-separated name prefixes
    // for focused local iteration; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val samples = (1 to runs).map { _ =>
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Median over SUCCESSFUL runs when at least one run succeeds, so a
    // flaky query's reported time isn't a failure-path wall time; the
    // failure entry carries the failed/total run count either way.
    val results = names.indices.map { i =>
      val perRun = samples.map(_(i))
      val ok = perRun.collect { case (_, t, None) => t }
      val med = median(if (ok.nonEmpty) ok else perRun.map(_._2))
      val err = perRun.flatMap(_._3).headOption.map { e =>
        val nFail = perRun.count(_._3.isDefined)
        s"$e ($nFail/$runs runs failed)"
      }
      (perRun.head._1, med, err)
    }
    // full JSON string escape (incl. every control char): a tab or CR in
    // a Spark error message must not make the whole line unparseable
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def fmt(v: Double, dp: Int): String =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).sum
    // deliberate-heavy subtotal (train/verify/decode gates): lets any
    // reader split "the suite got slower" from "more gates landed"
    val gateSec = results.collect {
      case (k, v, _) if DeliberateHeavies.contains(k) => v
    }.sum
    // sentinel AFTER the timed runs: a competing process that appeared
    // mid-bench shows up in at least one of the two readings
    val loadEnd = load1()
    val jvmsEnd = otherJvms()
    def render(short: Boolean, dp: Int): String = {
      // The launcher keeps only a bounded tail of stdout and greps it for
      // this line, so the line must stay short: rounded seconds, and (as
      // a last resort) numbered query names abbreviated q62_dup_cc ->
      // q62. Full precision + full names always go to BENCH_LAST.json.
      //
      // Round 12 (reporting only — timing untouched): the map renders in
      // ASCENDING time order, so when the launcher's 2000-char tail
      // truncates the line's FRONT, what it loses are the sub-second
      // floor queries and what stays visible are the expensive ones —
      // the queries any round-over-round attribution actually needs.
      def key(k: String): String =
        if (short) "q(\\d+)_.*".r.replaceAllIn(k, m => "q" + m.group(1)) else k
      val qs = results.sortBy(_._2).map { case (k, v, _) =>
        jstr(key(k)) + ":" + (if (dp < 0) v.toString else fmt(v, dp))
      }.mkString("{", ",", "}")
      // "failures" is always present, even empty — the launcher has parsed
      // that key since round 2 and format drift is how BENCH_r01/r03 died
      val fails = results.collect { case (k, _, Some(e)) => jstr(key(k)) + ":" + jstr(e) }
      val failsPart = ",\"failures\":" + fails.mkString("{", ",", "}")
      val tv = if (dp < 0) total.toString else fmt(total, dp)
      val sfv = if (dp < 0) sfDir else new java.io.File(sfDir).getName
      val sentinel = s""","load1":[${fmt(loadStart, 2)},${fmt(loadEnd, 2)}],"other_jvms":[$jvmsStart,$jvmsEnd]"""
      // full-precision lines also carry the per-query gate tags
      val gates = if (dp >= 0) "" else ","+"\"gates\":" + DeliberateHeavies
        .filter { case (k, _) => results.exists(_._1 == k) }
        .toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$tv,"unit":"sec","runs":$runs,"gate_sec":${fmt(gateSec, 3)},"queries":$qs$failsPart,"sf":"$sfv"$sentinel$gates}"""
    }
    val full = render(short = false, dp = -1)
    // prefer full names at reduced precision over abbreviated names: the
    // per-query keys are what a human reads in the launcher's record.
    // Budget 1700, not 1900: the summary line below must also fit the
    // launcher's 2000-char tail alongside whatever survives of this one.
    // last resort is 10 ms resolution (was 0.1 s): the r11 verdict's
    // per-query tail quantized real sub-0.3s deltas into noise; one
    // extra char per query costs ~20 floor queries of tail visibility,
    // which the ascending order above already made the right queries
    // to lose
    val line = LazyList(
      () => render(short = false, dp = 3),
      () => render(short = false, dp = 2),
      () => render(short = true, dp = 3))
      .map(_.apply()).find(_.length <= 1700)
      .getOrElse(render(short = true, dp = 2))
    println(line)
    // ALWAYS print a final summary-only line — total/runs/failures, no
    // per-query map — as the LAST stdout line. Round 8's per-query line
    // outgrew the launcher's 2000-char tail at 179 queries and cut
    // `"metric":"total"` off the front, so the driver recorded no total
    // (BENCH_r08.json parsed:null). This line is ~180 chars and sits at
    // the very end of stdout, so the tail can never lose it; the full
    // per-query record lives in BENCH_LAST.json either way.
    val failsShort = results.collect { case (k, _, Some(e)) =>
      jstr("q(\\d+)_.*".r.replaceAllIn(k, m => "q" + m.group(1))) + ":" +
        jstr(e.take(60))
    }
    val summary =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","runs":$runs,""" +
      s""""n_queries":${results.size},"gate_sec":${fmt(gateSec, 3)},""" +
      s""""failures":${failsShort.mkString("{", ",", "}")},""" +
      s""""sf":"${new java.io.File(sfDir).getName}",""" +
      s""""load1":[${fmt(loadStart, 2)},${fmt(loadEnd, 2)}],"other_jvms":[$jvmsStart,$jvmsEnd]}"""
    println(summary)
    // Belt-and-braces for log-wrapping launchers: also drop the FULL
    // (unabbreviated, full-precision) line in a well-known file.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LAST.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
