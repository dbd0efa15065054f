package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Query-scale checkpoint: runs the per-family heavy queries at sf0.1
  * and at a `factor`x generated analogue (the sf1.0 stand-in) and
  * prints per-query scaling factors as a markdown table for SCALE.md.
  *
  * The ScaleProbe gates MAINTENANCE I/O at two corpus scales; this is
  * the same two-point discipline for the QUERY side, which until round
  * 9 had never executed above sf0.1. A corpus-linear operator on a
  * fixed 32-core box should scale at most ~`factor`x in wall time
  * (usually much less while fixed overhead dominates); anything
  * clearly super-linear in `factor` is a named scale bug.
  *
  * Data generation (deterministic, no RNG):
  * - `documents`: `factor` copies; copy i > 0 suffixes every token
  *   with `x<i>` so cross-copy shingles/tokens NEVER collide — the
  *   near-dup/dup-pair population scales linearly (10 exact replicas
  *   would instead make every doc a 10-way dup and quadratically
  *   inflate pair counts by construction of the DATA, not the plan).
  *   `n_chars` is recomputed; doc_id offset 10M per copy.
  * - `embeddings`: copy i rotates the 64-dim vector left by i — norms
  *   preserved, directions distinct, so top-k/IVF candidate structure
  *   scales instead of degenerating into exact ties.
  * - TPC-H tables: copy i offsets every join-key column by 10M·i —
  *   each copy is a disjoint key universe, so all joins scale their
  *   row counts by exactly `factor` with unchanged selectivity.
  *
  * Usage: runMain graft.tools.ScaleBench [baseSfDir] [factor] [outDir]
  */
object ScaleBench {

  private val KeyStride = 10000000L

  /** Per-family heavies (VERDICT r8 item 4). q117/q126's all-pairs
    * twins are row-bound-guarded by design and refuse at 10x — their
    * scale paths (knnJoinIvf / hardNegativesIvf) are timed directly in
    * the extras section below instead.
    */
  private val Subset = Seq(
    "q1_agg", "q55_tpch_q17", "q83_tpch_q19", "q101_tpch_q8",
    "q27_minhash_neardups", "q28_simhash_neardups",
    "q62_dup_cc", "q68_dedup_apply", "q104_dedup_apply_lsh",
    "q106_cc_chain",
    "q109_bm25", "q123_pack",
    "q142_winnowing", "q144_winnow_pairs",
    "q147_quality_classifier",
    "q124_semdedup",
    "q_ivf_topk", "q71_pq", "q_topk_cosine",
    "q170_line_dedup", "q173_line_freq_filter", "q175_top_ngrams",
    "q172_more_like_this",
    "q181_span_mask", "q183_event_sequences", "q184_norm_outliers",
    "q186_source_overlap", "q188_ngram_novelty",
    "q189_time_decay_sample", "q190_pagerank",
    "q193_ppl_bands", "q194_pref_pairs", "q195_chat_paths",
    "q196_ngram_diversity", "q199_multiclass", "q200_group_split",
    "q202_unigram_vocab", "q203_unigram_doc_lp")

  /** Scale-path operators whose fixture queries are deliberately exact
    * verification twins: timed here through the distributed path.
    */
  private def extras(spark: SparkSession): Seq[(String, String => DataFrame)] = Seq(
    "knnJoinIvf(k=10)" -> ((d: String) =>
      graft.search.Ann.knnJoinIvf(Tables.embeddings(spark, d),
        "vec_id", "embedding", k = 10)),
    "hardNegativesIvf(k=3)" -> ((d: String) =>
      graft.search.Ann.hardNegativesIvf(Tables.embeddings(spark, d),
        "vec_id", "embedding", "label", k = 3)),
    // q201's scale path (the exact twin is row-bound-guarded)
    "mineBitextIvf(k=4)" -> ((d: String) =>
      graft.search.Ann.mineBitextIvf(
        Tables.embeddings(spark, d).join(
          Tables.documents(spark, d)
            .select(col("doc_id").as("vec_id"), col("lang")), Seq("vec_id")),
        "vec_id", "embedding", "lang", k = 4)),
    // q30's scale path: corpus-sized LSH bit width (bits=0 auto) keeps
    // bucket occupancy constant where the fixture's pinned bits=6 goes
    // quadratic (12.9x measured at 10x before autoBits)
    "embeddingNearDups(bits=auto)" -> ((d: String) =>
      graft.dedup.Dedup.embeddingNearDups(Tables.embeddings(spark, d),
        "vec_id", "embedding", threshold = 0.5, bits = 0)))

  private def offsetKeys(df: DataFrame, keyCols: Seq[String], i: Int): DataFrame =
    keyCols.foldLeft(df)((d, k) =>
      d.withColumn(k, col(k) + lit(KeyStride * i)))

  private def writeCopies(spark: SparkSession, out: String, name: String,
                          factor: Int)(mk: Int => DataFrame): Unit = {
    val dst = s"$out/$name.parquet"
    (0 until factor).map(mk).reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(dst)
  }

  def generate(spark: SparkSession, base: String, factor: Int, out: String): Unit = {
    writeCopies(spark, out, "documents", factor) { i =>
      val d = offsetKeys(Tables.documents(spark, base), Seq("doc_id"), i)
      val t = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1x" + i)
      d.withColumn("text", t).withColumn("n_chars", length(col("text")).cast("long"))
    }
    writeCopies(spark, out, "embeddings", factor) { i =>
      val d = offsetKeys(Tables.embeddings(spark, base), Seq("vec_id"), i)
      // rotate by i mod dim — factors above the 64-dim width wrap
      // (copies 64 apart share vectors, harmless for timing runs; a
      // plain `64 - i` slice length goes NEGATIVE past factor 64)
      val r = i % 64
      if (r == 0) d
      else d.withColumn("embedding",
        concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r)).cast("array<float>"))
    }
    writeCopies(spark, out, "lineitem", factor)(i =>
      offsetKeys(Tables.lineitem(spark, base),
        Seq("l_orderkey", "l_partkey", "l_suppkey"), i))
    writeCopies(spark, out, "orders", factor)(i =>
      offsetKeys(Tables.orders(spark, base), Seq("o_orderkey", "o_custkey"), i))
    writeCopies(spark, out, "customer", factor)(i =>
      offsetKeys(Tables.customer(spark, base), Seq("c_custkey"), i))
    writeCopies(spark, out, "part", factor)(i =>
      offsetKeys(Tables.part(spark, base), Seq("p_partkey"), i))
    writeCopies(spark, out, "supplier", factor)(i =>
      offsetKeys(Tables.supplier(spark, base), Seq("s_suppkey"), i))
    // events: 10x USERS (offset user_id), not 10x-deeper histories —
    // per-user session state must stay constant as the corpus grows
    writeCopies(spark, out, "events", factor)(i =>
      offsetKeys(Tables.events(spark, base), Seq("event_id", "user_id"), i))
    // fixed dimensions: identical at every scale (the TPC-H contract)
    Seq("nation", "region").foreach { t =>
      Tables.table(spark, base, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
  }

  private def time(fn: => Long, runs: Int): Double =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val out = args.lift(2).getOrElse("target/scale/sf1.0")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      println(s"# generating ${factor}x analogue of $base -> $out")
      generate(spark, base, factor, out)
    }
    // warmup both directories (reader init, codegen)
    Seq(base, out).foreach { d =>
      Tables.documents(spark, d).count()
      Tables.embeddings(spark, d).select(size(col("embedding"))).count()
      Tables.lineitem(spark, d).count()
    }
    println(s"| query | sf0.1 s | ${factor}x s | ratio | rows ${factor}x |")
    println("|---|---|---|---|---|")
    def row(name: String, fn: String => DataFrame): Unit =
      try {
        val tBase = time(fn(base).count(), runs)
        var rowsScaled = 0L
        val tScaled = time({ rowsScaled = fn(out).count(); rowsScaled }, runs)
        val ratio = tScaled / tBase
        println(f"| $name | $tBase%.2f | $tScaled%.2f | $ratio%.2f | $rowsScaled |")
      } catch { case e: Throwable =>
        println(s"| $name | - | - | - | ERROR ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(90)} |")
      }
    // SPARK_GRAFT_SCALE_ONLY=q62,q109 — comma-separated name prefixes
    // for focused runs (e.g. the 100x three-point checkpoint, where the
    // full subset would run for hours); filters the extras too
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def wanted(n: String): Boolean = only.forall(_.exists(n.startsWith))
    Subset.filter(wanted)
      .foreach(name => row(name, d => SparkEntry.queries(name)(spark, d)))
    extras(spark).collect { case (name, fn) if wanted(name) => row(name, fn) }
    spark.stop()
  }
}
