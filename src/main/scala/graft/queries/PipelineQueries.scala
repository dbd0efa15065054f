package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.dedup.{ConnectedComponents, Dedup}
import graft.functions.TextFunctions
import graft.operators.Sampling

/** Round-4 training-pipeline operators: dup-group formation (connected
  * components), corpus mixing (stratified sampling), LM-style quality
  * scoring (unigram cross-entropy), repeated-span detection, distribution
  * stats (exact quantiles), and the TPC-H Q21 EXISTS/NOT-EXISTS shape.
  *
  * Oracle-parity notes follow the house rules: integer sums CAST to
  * BIGINT, float outputs rounded identically on both sides, and every
  * sequential f64 reduction expressed as an idx-ordered fold on BOTH
  * sides (Spark `aggregate` over a sorted array == DuckDB `list_reduce`
  * over `list(... ORDER BY ...)`).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Near-dup PAIRS -> dup GROUPS: connected components over the exact
    // jaccard >= 0.8 edge list. comp_id = min doc_id in the component.
    // The pair generator is the inverted-index equi-join (never all
    // pairs); the CC loop is one shuffle per round, diameter-bounded.
    "q62_dup_cc" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), "text", "doc_id",
        blockCol = None, threshold = 0.8, shingleSize = 3)
      ConnectedComponents.components(pairs, "key_a", "key_b")
        .orderBy(col("comp_id"))
    }),

    // TPC-H Q21 shape (EXISTS + NOT EXISTS, both correlated): suppliers
    // who were the ONLY late supplier on a multi-supplier order. Written
    // as the SQL a migrating user ships; Catalyst decorrelates both
    // subqueries into semi/anti joins on l_orderkey (equality-correlated
    // on purpose: the late-cutoff comparison re-derives o_orderdate via
    // an inner join instead of referencing the outer table, which Spark's
    // decorrelation rejects in non-equality predicates).
    "q63_tpch_q21" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("g63_lineitem")
      orders(s, d).createOrReplaceTempView("g63_orders")
      supplier(s, d).createOrReplaceTempView("g63_supplier")
      s.sql(
        """SELECT s.s_name, count(*) AS numwait
          |FROM g63_supplier s
          | JOIN g63_lineitem l1 ON s.s_suppkey = l1.l_suppkey
          | JOIN g63_orders o ON o.o_orderkey = l1.l_orderkey
          |WHERE o.o_orderstatus = 'F'
          |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM g63_lineitem l2
          |       WHERE l2.l_orderkey = l1.l_orderkey
          |         AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM g63_lineitem l3
          |       JOIN g63_orders o2 ON l3.l_orderkey = o2.o_orderkey
          |       WHERE l3.l_orderkey = l1.l_orderkey
          |         AND l3.l_suppkey <> l1.l_suppkey
          |         AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s.s_name
          |LIMIT 10""".stripMargin)
    }),

    // TPC-H Q18 shape (large-volume customers): semi-join against an
    // AGGREGATED subquery (IN over GROUP BY ... HAVING) — Catalyst
    // rewrites the IN to a left-semi join on the aggregate, so the big
    // lineitem table is aggregated once and the fact join shuffles on
    // the same orderkey; nothing correlates row-at-a-time.
    "q72_q18" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("g72_lineitem")
      orders(s, d).createOrReplaceTempView("g72_orders")
      customer(s, d).createOrReplaceTempView("g72_customer")
      s.sql(
        """SELECT c.c_name, o.o_orderkey, o.o_orderdate,
          | round(o.o_totalprice, 2) AS totalprice,
          | round(sum(l.l_quantity), 2) AS sum_qty
          |FROM g72_customer c
          | JOIN g72_orders o ON c.c_custkey = o.o_custkey
          | JOIN g72_lineitem l ON o.o_orderkey = l.l_orderkey
          |WHERE o.o_orderkey IN (
          |  SELECT l_orderkey FROM g72_lineitem
          |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
          |GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
          |ORDER BY o.o_totalprice DESC, o.o_orderkey
          |LIMIT 10""".stripMargin)
    }),

    // Funnel conversion (view -> click -> purchase, each step within 6
    // hours of the previous step's FIRST occurrence): the standard
    // product-analytics shape. Three per-user aggregates chained by
    // equi-joins on user_id — stage outputs shrink monotonically, every
    // shuffle is on the same key, nothing is per-event quadratic.
    "q73_funnel" -> ((s, d) => {
      val ev = events(s, d)
      // each stage output is tiny (<= one row per user) and reused by
      // both the next stage and its own count — localCheckpoint cuts the
      // lineage so the counts read the materialized stage instead of
      // re-running the whole upstream pipeline per crossJoin branch
      // (without it Spark recomputes v 3x and events scans ~7x)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        .localCheckpoint(true)
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 6 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        .localCheckpoint(true)
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 6 HOURS"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("_n"))
        .localCheckpoint(true)
      ev.select(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(v.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased")))
    }),

    // Deterministic stratified sampling by language (corpus mixing).
    // Reproducible across engines/runs: membership is md5(doc_id)-bucket
    // < per-lang rate, a pure map-side filter.
    "q64_sample" -> ((s, d) =>
      Sampling.stratified(documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", "lang",
          rates = Map("en" -> 25, "de" -> 50, "es" -> 75, "fr" -> 100),
          defaultRate = 10)
        .select(col("doc_id"), col("lang"), col("bucket").cast("long").as("bucket"))
        .orderBy(col("doc_id"))),

    // Unigram cross-entropy under the corpus's own LM: per-doc mean
    // -ln p(token), the classic cheap LM-quality filter. The corpus
    // unigram table is one agg; per-doc scores need only a token-keyed
    // join (sort-merge at scale; no all-pairs anywhere). The f64 sum is
    // folded in sorted-token order on both sides so accumulation order
    // cannot flip the hash.
    "q65_xent" -> ((s, d) => {
      // array_remove drops the empty tokens split() leaves at the edges of
      // tab/newline-padded text (Spark trim strips only spaces) — the
      // oracle's list_filter(t <> '') twin; fixture docs never hit it but
      // the operator must not depend on that
      val toks = documents(s, d).select(col("doc_id"),
        explode(array_remove(TextFunctions.tokens(lower(col("text"))), ""))
          .as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
      val tot = vocab.agg(sum(col("cnt")).as("total"))
      val contrib = tf.join(vocab, "tok").crossJoin(broadcast(tot))
        .withColumn("c",
          col("tf") * log(col("cnt").cast("double") / col("total")))
      val agg = contrib.groupBy(col("doc_id")).agg(
        aggregate(sort_array(collect_list(struct(col("tok"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("sumc"),
        sum(col("tf")).as("n"))
      documents(s, d).select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          round(coalesce(-col("sumc") / col("n"), lit(0.0)), 6).as("xent"))
        .orderBy(col("doc_id"))
    }),

    // Repeated-span detection: docs sharing any verbatim 8-token span
    // with another doc (the doc-level form of exact-substring dedup,
    // Lee et al. 2021). Inverted index on the span — corpus-LINEAR:
    // unlike pair generation there is no self-join, just df >= 2 on the
    // posting list, so this scales further than any pairwise method.
    // Spans shuffle as 64-bit FNV hashes, not ~50-char strings (same
    // trade as ngramJaccardPairs: 6x less shuffle payload, long-equality
    // grouping; a cross-doc collision — ~(distinct spans)^2/2^65 — could
    // perturb one count by 1). The oracle keeps literal strings, so a
    // collision would surface as a gate mismatch rather than hide.
    "q66_spans" -> ((s, d) => {
      val spanHashes = udf { (text: String) =>
        val toks = Option(text).getOrElse("")
          .toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        if (toks.length < 8) Array.empty[Long]
        else {
          // hash each token once, then FNV-fold the 8 per-token hashes per
          // window — O(tokens) long ops, no per-span string allocation
          // (building+hashing ~50-char span strings was 2x the query cost)
          val th = toks.map(graft.functions.StableHash.fnv64)
          val out = new Array[Long](th.length - 7)
          var i = 0
          while (i <= th.length - 8) {
            var h = -3750763034362895579L // FNV-1a offset basis
            var j = i
            while (j < i + 8) { h = (h ^ th(j)) * 1099511628211L; j += 1 }
            out(i) = h
            i += 1
          }
          out.distinct
        }
      }
      val spans = documents(s, d).select(col("doc_id"),
        explode(spanHashes(col("text"))).as("span"))
      val shared = spans.groupBy(col("span"))
        .agg(count(lit(1)).as("df")).filter(col("df") >= 2)
        .select(col("span"))
      spans.join(shared, Seq("span"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // The dedup APPLIED: survivors = corpus minus non-minimum component
    // members. Per-language kept/dropped counts prove the whole chain
    // (pair gen -> components -> anti-join) end to end. MinHash pairs
    // would plug in identically; the exact pairs keep the oracle exact.
    "q68_dedup_apply" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        blockCol = None, threshold = 0.8, shingleSize = 3)
      val kept = ConnectedComponents.dropDuplicates(docs, "doc_id", pairs)
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy(col("lang")).agg(count(lit(1)).as("n_kept")),
          Seq("lang"))
        .withColumn("n_dropped", col("n_total") - col("n_kept"))
        .orderBy(col("lang"))
    }),

    // The PRODUCTION dedup path end-to-end: the SAME apply chain as q68
    // but fed MinHash-LSH pairs instead of exact pairs — pair gen is the
    // banded equi-join (the only shape that scales to 100 TB), components
    // and the anti-join are byte-identical to q68's. Graded against the
    // exact recursive-CTE oracle: the gate fails unless LSH recall is 1.0
    // on the fixture, proving "any pair source plugs in identically" with
    // the source a real pipeline actually ships.
    "q104_dedup_apply_lsh" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.8)
      val kept = ConnectedComponents.dropDuplicates(docs, "doc_id", pairs)
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy(col("lang")).agg(count(lit(1)).as("n_kept")),
          Seq("lang"))
        .withColumn("n_dropped", col("n_total") - col("n_kept"))
        .orderBy(col("lang"))
    }),

    // Adversarial CC convergence MEASURED at bench scale: a corpus-sized
    // path graph (every doc_id linked to its successor — diameter ~n,
    // the worst case for label propagation) through the same
    // ConnectedComponents loop the dedup pipeline runs. Pointer jumping
    // closes diameter d in ~log2(d) rounds (sf0.1: 5000-chain -> ~13
    // rounds inside the default maxIter 20), so this bench row is the
    // O(log d) claim as a number, not just a spec. The oracle derives
    // the components structurally (gaps-and-islands over consecutive
    // ids), independent of the iterative algorithm.
    "q106_cc_chain" -> ((s, d) => {
      val ids = documents(s, d).select(col("doc_id"))
      val edges = ids
        .select(col("doc_id").as("key_a"), (col("doc_id") + 1).as("key_b"))
        .join(ids.withColumnRenamed("doc_id", "key_b"), Seq("key_b"), "left_semi")
      ConnectedComponents.components(edges, "key_a", "key_b")
        .orderBy(col("comp_id"))
    }),

    // Incremental GROUP maintenance: two successive pair batches folded
    // into a standing label table via mergeLabels — O(batch + touched
    // components) per fold, the standing table broadcast-filtered and
    // never shuffled — graded against the SAME full-recompute
    // recursive-CTE oracle as q62. Any label the merge gets wrong (a
    // missed cross-batch merge, a stale untouched row, a batch-local
    // minimum adopted as comp id) fails the hash gate. Pairs are
    // assigned to the batch of their NEWEST endpoint — exactly what
    // incremental pair generation emits per crawl (new-vs-corpus and
    // new-vs-new pairs land in the newest batch).
    "q107_cc_incr" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), "text", "doc_id",
        blockCol = None, threshold = 0.8, shingleSize = 3)
        .localCheckpoint(true)
      val newest = greatest(col("key_a"), col("key_b"))
      val standing0 = ConnectedComponents.labels(
        pairs.filter(newest < 200), "key_a", "key_b")
      val standing1 = ConnectedComponents.mergeLabels(
        standing0, pairs.filter(newest >= 200 && newest < 350))
      val standing2 = ConnectedComponents.mergeLabels(
        standing1, pairs.filter(newest >= 350))
      standing2.groupBy(col("comp").as("comp_id"))
        .agg(count(lit(1)).as("n_docs"), min(col("node")).as("first_doc"),
          max(col("node")).as("last_doc"))
        .orderBy(col("comp_id"))
    }),

    // Quality-aware survivor selection: each dup group keeps its BEST
    // member — here the longest text, the "keep the fullest version"
    // policy real pipelines ship — instead of the arbitrary min key.
    // Ties fall back to min key so the result stays deterministic. The
    // oracle re-derives components via the recursive CTE and picks the
    // survivor with a length-desc window, so a wrong max, a broken tie
    // break, or a survivor chosen among absent members all fail the gate.
    "q111_dedup_keep_best" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        blockCol = None, threshold = 0.8, shingleSize = 3)
      ConnectedComponents.survivorsBy(docs, "doc_id", pairs,
          length(col("text")))
        .orderBy(col("comp_id"))
    }),

    // Deterministic global shuffle: the reproducible random order a
    // training set is written in (spreads correlated/adjacent docs).
    // Order is (md5(doc_id), doc_id); the dense rank is assigned by
    // range-repartition on the hash + local sort + zipWithIndex — no
    // single-task global window anywhere (the oracle's row_number()
    // IS that single-task sort, which is exactly what this operator
    // exists to avoid at scale).
    "q108_shuffle" -> ((s, d) =>
      graft.operators.Shuffle.deterministicShuffle(
          documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
        .orderBy(col("pos"))),

    // Training-shard export manifest: fixed-size shards in the
    // deterministic shuffle order, per-shard counts + position ranges +
    // an order-binding BIGINT checksum (key * (in-shard pos + 1)) the
    // oracle re-derives exactly — a swapped, dropped or reordered row
    // fails the hash gate.
    "q119_export_shards" -> ((s, d) =>
      graft.operators.Export.shardPlan(
          documents(s, d).select(col("doc_id"), col("lang")), "doc_id", 64)
        ._2.orderBy(col("shard"))),

    // WebDataset export lifecycle gate (the q120/q164 family): REAL tar
    // shards written to a temp dir every run — binary payload + text
    // caption per sample in deterministic order — and the graded report
    // binds membership (checksum) AND the container itself (tar_bytes =
    // Σ 512-padded member sizes + end blocks, re-derived in SQL), so a
    // header, padding, ordering, or member-size defect fails the hash.
    "q177_webdataset" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_wds").toString
      val docs = documents(s, d).select(col("doc_id"),
        encode(substring(col("text"), 1, 100), "UTF-8").as("content"),
        concat(lit("caption for doc "), col("doc_id")).as("caption"))
      graft.operators.Export.writeWebDataset(docs, "doc_id", tmp,
        rowsPerShard = 64,
        members = Seq("content" -> "bin", "caption" -> "txt"))
    }),

    // Sequence packing (concat-and-chunk): documents concatenate in the
    // deterministic shuffle order and the token stream cuts every 128
    // tokens; the graded manifest binds membership AND order per
    // sequence (checksum = sum key * tokens-contributed). The global
    // running token offset comes from the distributed two-pass prefix
    // sum — the oracle's `sum() OVER (ORDER BY ...)` is the single-task
    // plan this operator exists to avoid at 100 TB.
    "q123_pack" -> ((s, d) =>
      graft.operators.Pack.packPlan(
          documents(s, d).select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tok")),
          "doc_id", "n_tok", seqLen = 128)
        .orderBy(col("seq_id"))),

    // Exact per-domain cap (C4/RefinedWeb host capping): at most 10 docs
    // per source, survivors = the group's (md5, key)-order head. The
    // operator's two-phase shape (under-cap groups pass through with no
    // ranking; only over-cap groups window) is invisible here — every
    // fixture source is over cap — and is spec'd in OperatorsSpec.
    "q127_domain_cap" -> ((s, d) =>
      graft.operators.Sampling.capPerGroup(
          documents(s, d).select(col("doc_id"), col("source")),
          "source", "doc_id", 10)
        .orderBy(col("doc_id"))),

    // Bigram LM cross-entropy (CCNet-shape perplexity quality filter):
    // the corpus trains its own add-1 smoothed bigram model and every
    // doc scores -(1/N) sum ln p(w2|w1). One model order above q65's
    // unigram; same fold discipline (sorted-gram f64 accumulation both
    // sides), corpus-linear training, natural-key joins for scoring.
    "q131_bigram_xent" -> ((s, d) =>
      graft.functions.NgramLm.bigramCrossEntropy(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", addK = 1.0)
        .orderBy(col("doc_id"))),

    // Priority sampling (Duffield-Lund-Thorup): exactly-n weighted
    // sampling without replacement, priority = w / u with u the exact
    // md5 fraction — ONE IEEE division, bit-identical in DuckDB, so the
    // kept SET and its priority order are both engine-checkable. The
    // graded rank binds the order; the floats stay out of the output.
    "q132_priority_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.operators.Sampling.prioritySample(
          documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id", col("n_chars"), n = 50)
        // 50-row page: the unpartitioned window is the rrfFuse precedent
        .withColumn("rank", row_number().over(
          Window.orderBy(col("priority").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rank"))
        .orderBy(col("doc_id"))
    }),

    // Gopher repetition filters: top-2-gram character share and
    // duplicated-3-gram coverage, per doc. Self-repetition signals next
    // to the cross-doc dedup family; every join is doc_id-keyed.
    "q133_repetition" -> ((s, d) =>
      graft.functions.Repetition.signals(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Mixture plan over the dataset card: temperature-flattened token
    // allocation with a 2-epoch up-sampling cap. Budget 100k makes the
    // cap BIND at sf0.001 (shortfall > 0) and stay slack at sf0.01 —
    // the two SFs gate both regimes.
    "q139_mixture_plan" -> ((s, d) =>
      graft.operators.Mixture.plan(
          graft.operators.DatasetCard.perSource(
            documents(s, d), "doc_id", "text", "source"),
          "source", "n_tokens", budget = 100000L, alpha = 0.5,
          maxEpochs = 2.0)
        .select(col("source"), col("avail"), col("weight"), col("take"),
          col("epochs"), col("shortfall"))
        .orderBy(col("source"))),

    // T5 span corruption: denoising-objective examples (input with
    // numbered sentinels, target with the masked spans). Deterministic
    // md5 masking, per-doc windows only (partitioned by doc_id — no
    // global window), adjacent masks merge into one span.
    "q138_span_corruption" -> ((s, d) =>
      graft.operators.SpanCorruption.corrupt(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", rate = 0.15)
        .orderBy(col("doc_id"))),

    // Dataset card: per-source release stats with a CORPUS-WIDE dup
    // counter (a source that copies another source shows the overlap
    // even with no internal dups). One fp-count aggregate + one fp
    // equi-join + one per-source aggregate; ratios are single IEEE
    // divisions of exact integer sums.
    "q137_dataset_card" -> ((s, d) =>
      graft.operators.DatasetCard.perSource(
          documents(s, d), "doc_id", "text", "source")
        .orderBy(col("source"))),

    // Curriculum staging: dense rank by (difficulty, key) via the
    // distributed rankBy engine (range partition + local sort +
    // zipWithIndex — the oracle's single-task window is exactly what
    // the operator avoids), stages cut by integer DIV of the rank.
    // Difficulty here = n_chars (shortest-first, the classic length
    // curriculum).
    "q136_curriculum" -> ((s, d) =>
      graft.operators.Curriculum.stages(
          documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id", col("n_chars"), stageRows = 50)
        .select(col("doc_id"), col("pos"), col("stage"))
        .orderBy(col("doc_id"))),

    // DSIR importance weights (Xie et al. 2023): hashed-bigram
    // log-likelihood ratio of "looks like the en subset" vs the whole
    // corpus. One corpus-linear model pass (target folds in via a when
    // guard), KB-sized model broadcast into scoring, sorted-slot fold.
    "q134_dsir" -> ((s, d) =>
      graft.operators.Dsir.importanceWeights(
          documents(s, d).select(col("doc_id"), col("text"), col("lang")),
          "doc_id", "text", col("lang") === "en", buckets = 1024)
        .orderBy(col("doc_id"))),

    // DSIR resampling: Gumbel-top-n over the weights — sampling without
    // replacement proportional to softmax(lwt), deterministic because
    // the Gumbel noise derives from the key's md5 fraction. The kept
    // SET and each survivor's weight are graded; the noisy sort key
    // stays out of the output.
    "q135_dsir_resample" -> ((s, d) =>
      graft.operators.Dsir.resample(
          documents(s, d).select(col("doc_id"), col("text"), col("lang")),
          "doc_id", "text", col("lang") === "en", n = 50, buckets = 1024)
        .select(col("doc_id"), col("lang"), col("lwt"))
        .orderBy(col("doc_id"))),

    // Backup/restore lifecycle graded end-to-end: import (key-clustered)
    // -> full backup -> contiguous-range erase -> incremental backup ->
    // restore BOTH generations and read them back. Generation 1 must
    // reproduce the pre-delete corpus (time travel), generation 2 the
    // post-delete one; the incremental step copies only the files the
    // erase touched (asserted byte-level in BackupSpec — here the graded
    // contract is that restores are exact).
    "q120_backup_restore" -> ((s, d) => {
      import graft.core.{Backup, Catalog, CollectionConfig, Keys}
      val work = java.nio.file.Files.createTempDirectory("graft_q120").toString
      val cat = new Catalog(s, s"$work/cat")
      val c = cat.create(CollectionConfig(name = "docs"))
      c.importDf(documents(s, d)
        .select(col("doc_id").as(Keys.KeyCol), col("lang"), col("n_chars"))
        .repartitionByRange(8, col(Keys.KeyCol))
        .sortWithinPartitions(Keys.KeyCol))
      val dest = s"$work/backups"
      c.backup(dest)
      c.deleteKeys(10L to 20L)
      c.backup(dest)
      def readGen(gen: Int): DataFrame = {
        val t = s"$work/restore$gen"
        Backup.restore(s, dest, t, gen)
        s.read.parquet(s"$t/data")
          .select(lit(gen).cast("int").as("gen"),
            col(Keys.KeyCol).as("doc_id"), col("lang"), col("n_chars"))
      }
      readGen(1).unionByName(readGen(2)).orderBy(col("gen"), col("doc_id"))
    }),

    // Incremental near-dedup: the nightly-crawl shape — new batch
    // (doc_id >= 250) deduped AGAINST the standing corpus (doc_id < 250)
    // via the band join, never corpus x corpus. Graded against the exact
    // cross-Jaccard oracle, so LSH recall must be 1.0 on the fixture.
    "q69_incr" -> ((s, d) => {
      val docs = documents(s, d)
      Dedup.incrementalNearDups(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
        "text", "doc_id", threshold = 0.8)
        .orderBy(col("corpus_key"), col("new_key"))
    }),

    // Per-language token budgeting ("sample 20k tokens per domain"): a
    // GROUPED running total in doc order, kept while the doc starts
    // inside its language's budget. The grouped two-pass prefix sum
    // replaces sum() OVER (PARTITION BY lang ORDER BY doc_id) — a plain
    // window sorts each whole language inside ONE task, which at 100 TB
    // means a 40 TB English slice in a single sort buffer.
    "q70_mix" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.approxBpeCount(col("text")).as("tok"))
      graft.operators.PrefixSum.runningTotalBy(
        docs, Seq("lang"), Seq(col("doc_id").asc), col("tok"), "cum")
        .filter(col("cum") - col("tok") < 20000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
        .orderBy(col("lang"))
    }),

    // Exact length quantiles per language (length-clipping thresholds).
    // Spark `percentile` == DuckDB `quantile_cont`: both interpolate at
    // rank p*(n-1).
    "q67_quantiles" -> ((s, d) =>
      documents(s, d).groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 6).as("p90"),
        round(expr("percentile(n_chars, 0.99)"), 6).as("p99"))
        .orderBy(col("lang"))),

    // Exact-substring dedup APPLIED at chunk granularity (Lee et al.
    // 2021, shard-friendly form): segment every doc into 10-token
    // chunks, keep only the globally FIRST occurrence of each distinct
    // chunk (min (doc_id, chunk_idx)), and rewrite each doc from its
    // surviving chunks. Two shuffles total — groupBy chunk (uniform:
    // chunk strings are near-unique) and regroup by doc — where a true
    // suffix-array dedup needs a global sort; chunk granularity is what
    // actually shards at 100 TB. q66 COUNTS shared spans; this rewrites
    // the corpus.
    "q86_chunk_dedup" -> ((s, d) => {
      val chunks = documents(s, d)
        .select(col("doc_id"),
          array_remove(split(col("text"), "\\s+"), "").as("toks"))
        .select(col("doc_id"),
          when(size(col("toks")) > 0,
            expr("transform(sequence(0, cast(ceil(size(toks)/10.0) as int) - 1," +
              " 1), i -> array_join(slice(toks, i*10+1, 10), ' '))"))
            .otherwise(expr("array()")).as("chunks"))
        .select(col("doc_id"),
          posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
      val w = Window.partitionBy(col("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
      chunks.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(chunk_idx, chunk)))," +
              " x -> x.chunk)"), " ").as("text_dedup"))
        .orderBy(col("doc_id"))
    }),

    // Copy-on-write upsert (MERGE): every 50th doc re-crawled (text
    // prefixed), five brand-new docs appended — one full-outer join on
    // the key, per-column COALESCE merge. The result is the next
    // immutable corpus snapshot; at scale the base side rides a bucketed
    // layout so only the update side shuffles.
    "q90_upsert" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val recrawled = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"),
          concat(lit("re-crawl: "), col("text")).as("text"), col("lang"))
      val fresh = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 100001).as("doc_id"),
          col("text"), lit("new").as("lang"))
      graft.operators.Upsert(docs, recrawled.unionByName(fresh), "doc_id")
        .select(col("doc_id"), substring(col("text"), 1, 24).as("head"),
          col("lang"), length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Importance-weighted sampling: keep each doc with probability
    // proportional to its length (min(1, n_chars/2000)) — the continuous
    // sibling of q64's stratified rates. Membership is a pure function
    // of doc_id (md5 fraction vs the weight), so the exact kept set is
    // reproducible and SQL-checkable; the hash fraction is a 32-bit
    // integer over 2^32 — exact in f64 on both engines.
    "q80_weighted_sample" -> ((s, d) =>
      graft.operators.Sampling.weighted(
          documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id",
          least(lit(1.0), col("n_chars").cast("double") / lit(2000.0)))
        .orderBy(col("doc_id"))),

    // Temperature-flattened language mix (alpha = 0.5): per-language
    // keep rate sqrt(n_min/n_lang), so the post-sample share is
    // proportional to sqrt(n_lang) — the standard multilingual
    // reweighting. Rates derive from the data (no hand-tuned table),
    // sqrt keeps the rate doubles bit-identical in DuckDB, and the md5
    // threshold makes the exact kept SET the graded output, not just
    // its size.
    "q112_temperature_mix" -> ((s, d) =>
      graft.operators.Sampling.temperatureMix(
          documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", "lang", alpha = 0.5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Deterministic train/val/test split: hash-range assignment
    // (90/5/5), a pure function of doc_id — reproducible, append-stable
    // (a row never migrates as the corpus grows), and shared-key tables
    // land on the same side for free. Map-side CASE, no shuffle; the
    // graded output is the FULL assignment, not just counts.
    "q141_hash_split" -> ((s, d) =>
      Sampling.hashSplit(
          documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id"))),

    // Winnowing fingerprints (MOSS, SIGMOD 2003): per-doc selected
    // (pos, fp) over char 8-grams with window 8 — every shared
    // substring of length >= w+k-1 = 15 surfaces as a shared fp (the
    // coverage guarantee MinHash can't give). All doc-local; the exact
    // selected SET is the graded output.
    "q142_winnowing" -> ((s, d) =>
      graft.functions.Winnowing.fingerprints(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k = 8, w = 8)
        .orderBy(col("doc_id"), col("pos"))),

    // BPE merge learning, round 1: corpus-wide adjacent character-pair
    // counts over the word-frequency table (the one corpus-linear pass;
    // every later merge round is vocab-sized — see functions/Bpe.scala),
    // top-20 merges by (count DESC, pair ASC). Exact integer counts,
    // total rank order — engine-checkable; the iterative loop is spec'd
    // against a driver-side model (BpeSpec).
    "q143_bpe_round1" -> ((s, d) => {
      val pc = graft.functions.Bpe.pairCounts(
        graft.functions.Bpe.withSymbols(
          graft.functions.Bpe.wordFreqs(documents(s, d), "text")))
      // orderBy+limit -> TakeOrderedAndProject (the Bpe.learn
      // discipline, functions/Bpe.scala:90): the pair-count table is
      // vocab-sized (millions of rows at corpus scale), so an
      // unpartitioned window over it would single-task; rank is derived
      // AFTER the 20-row cut, where the window input is a bounded page.
      pc.orderBy(col("cnt").desc, col("sym_a"), col("sym_b")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("sym_a"), col("sym_b")))
          .cast("long"))
        .select(col("sym_a"), col("sym_b"), col("cnt"), col("rank"))
        .orderBy(col("rank"))
    }),

    // Winnowed overlap pairs: docs sharing >= 20 selected fingerprints
    // (the shared-count histogram separates cleanly: template near-dups
    // share 20+, vocabulary-noise pairs < 15),
    // via the fp-bucketed equi-join (capped postings, the LSH-bands
    // candidate shape) — verbatim-overlap detection as a first-class
    // pair source next to MinHash/SimHash/embedding near-dups.
    "q144_winnow_pairs" -> ((s, d) =>
      graft.functions.Winnowing.sharedFingerprintPairs(
          graft.functions.Winnowing.fingerprints(
            documents(s, d).select(col("doc_id"), col("text")),
            "doc_id", "text", k = 8, w = 8),
          "doc_id", minShared = 20, maxPostings = 100)
        .orderBy(col("key_a"), col("key_b"))),

    // Split-leakage audit (the check every hash-split release needs):
    // near-identical docs landing on DIFFERENT sides of the train/val/
    // test split — exactly the leakage that inflates eval numbers.
    // Pure composition of shipped operators: winnowed overlap pairs
    // (verbatim-overlap recall guarantee) x hashSplit assignment,
    // keeping only cross-split pairs. At scale this is the q144 pair
    // join plus one broadcast-sized split map — no new shuffle shape.
    "q153_split_leakage" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val pairs = graft.functions.Winnowing.sharedFingerprintPairs(
        graft.functions.Winnowing.fingerprints(docs, "doc_id", "text",
          k = 8, w = 8),
        "doc_id", minShared = 20, maxPostings = 100)
      val splits = Sampling.hashSplit(docs.select(col("doc_id")),
          "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("split"))
      pairs
        .join(splits.select(col("doc_id").as("key_a"),
          col("split").as("split_a")), Seq("key_a"))
        .join(splits.select(col("doc_id").as("key_b"),
          col("split").as("split_b")), Seq("key_b"))
        .filter(col("split_a") =!= col("split_b"))
        .select(col("key_a"), col("key_b"), col("shared"),
          col("split_a"), col("split_b"))
        .orderBy(col("key_a"), col("key_b"))
    }),

    // Verbatim-overlap decontamination: screen the corpus against the
    // src0 docs as a stand-in eval set — any doc quoting >= w+k-1 = 27
    // consecutive normalized chars of an eval item is GUARANTEED to
    // flag (the winnowing theorem); k = 20 makes vocabulary noise
    // vanish (true copies share ~100 fps, unrelated docs < 2). The
    // benchmark fp set is broadcast-sized; screening is one fp
    // equi-join + a doc-keyed count.
    "q145_winnow_decontam" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"),
        col("source"))
      val bench = graft.functions.Winnowing.fingerprints(
        docs.filter(col("source") === "src0"), "doc_id", "text",
        k = 20, w = 8)
      graft.functions.Winnowing.contaminationScreen(
          docs.filter(col("source") =!= "src0"), "doc_id", "text",
          bench, k = 20, w = 8, minShared = 2)
        .orderBy(col("doc_id"))
    }),

    // Retrieval-quality eval harness: recall@10 / MRR / binary nDCG@10
    // of a ranked candidate page against a gold set. The fixture is
    // hash-deterministic (gold = doc_id%50==qid, candidates =
    // doc_id%25==qid ranked by md5 — so every query has partial,
    // varying overlap including rank-order effects); the graded surface
    // is the METRIC math: the join, the zero-hit query, the rank-ordered
    // DCG folds and the single-division discipline.
    "q146_retrieval_eval" -> ((s, d) => {
      val ids = documents(s, d).select(col("doc_id"))
      val gold = ids.withColumn("query_id", col("doc_id") % 50)
        .filter(col("query_id") < 10)
      val results = ids.withColumn("query_id", col("doc_id") % 25)
        .filter(col("query_id") < 10)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(
            md5(concat(col("query_id").cast("string"), lit("|"),
              col("doc_id").cast("string"))), col("doc_id")))
          .cast("long"))
        .filter(col("rank") <= 10)
      graft.operators.Eval.retrievalMetrics(results, gold, k = 10)
        .orderBy(col("query_id"))
    }),

    // Trained quality classifier (fastText/CCNet-shape learned filter):
    // logistic regression on 32 hashed token-count buckets + bias, 3
    // full-batch GD steps, labels = "is a src0 doc". The graded surface
    // is the ENTIRE training computation — hashed features, sorted-j
    // margin folds, fixed-point (integer micro-unit) gradient sums, the
    // IEEE weight-update expression — unrolled iteration-by-iteration in
    // the SQL twin, so a drift anywhere in 3 rounds of distributed GD
    // fails the hash. Scale: gradient state is 33 integers; margins are
    // one key-keyed aggregate per iteration; nothing is all-pairs.
    "q147_quality_classifier" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"),
        when(col("source") === "src0", 1.0).otherwise(0.0).as("y"))
      graft.operators.Classifier.trainScore(docs, "doc_id", "text", "y",
          dim = 32, iters = 3, lr = 1e-5)
        .orderBy(col("doc_id"))
    }),

    // SFT example assembly: render (prompt, response) into the chat
    // template with the LOSS SPAN as 1-based inclusive char offsets —
    // substring(text, loss_start, len) == response by construction
    // (spec'd), so the mask survives any later tokenizer. Row-local
    // concat + length arithmetic; the fixture derives pairs from the
    // documents text so offsets vary per row.
    "q154_sft_render" -> ((s, d) => {
      val pairs = documents(s, d).select(col("doc_id"),
        substring(col("text"), 1, 80).as("prompt"),
        substring(col("text"), 81, 160).as("response"))
      graft.operators.Sft.renderPairs(pairs, "doc_id", "prompt", "response",
          systemPrompt = Some("You are a helpful assistant."))
        .orderBy(col("doc_id"))
    }),

    // Preference-pair (DPO) assembly: each (prompt, chosen, rejected)
    // renders as two rows sharing the pair key — both sides through the
    // IDENTICAL template + span arithmetic, so a pair's rows differ
    // only in the response span's content. The fixture derives chosen/
    // rejected from disjoint slices of the document text.
    "q157_dpo_render" -> ((s, d) => {
      val triples = documents(s, d).select(col("doc_id"),
        substring(col("text"), 1, 60).as("prompt"),
        substring(col("text"), 61, 80).as("chosen"),
        substring(col("text"), 141, 80).as("rejected"))
      graft.operators.Sft.renderPreferencePairs(triples, "doc_id",
          "prompt", "chosen", "rejected")
        .orderBy(col("doc_id"), col("side"))
    }),

    // Length-bucketed batching with padding accounting: batches filled
    // in (len DESC, key) order via the distributed rank (range partition
    // + zipWithIndex — no single-task sort), per-batch padding =
    // n*max - sum, all integers. The graded output carries BOTH
    // strategies' per-batch stats (length-sorted vs the salted-md5
    // random baseline) so the padding saved is itself oracle-checked.
    "q155_length_batching" -> ((s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"), col("n_chars"))
      val byLen = graft.operators.Batching.paddingStats(
        graft.operators.Batching.lengthBatches(docs, "doc_id", "n_chars", 32),
        "n_chars").withColumn("strategy", lit("length"))
      val rand = graft.operators.Batching.paddingStats(
        graft.operators.Batching.shuffledBatches(docs, "doc_id", "n_chars", 32),
        "n_chars").withColumn("strategy", lit("shuffle"))
      byLen.unionByName(rand)
        .select(col("strategy"), col("batch_id"), col("n"), col("max_len"),
          col("sum_len"), col("padding"))
        .orderBy(col("strategy"), col("batch_id"))
    }),

    // Paired bootstrap significance (the eval-harness capstone): is
    // system A really better than B, or is the mean per-query delta
    // luck of the query draw? Resampling is hash-deterministic (draw
    // (b, i) -> query ranked md5(b:i) % n), so the p-value is an exact,
    // engine-checkable function of the inputs — the q64/q132 sampling
    // discipline applied to evaluation. The fixture gives 40 queries
    // md5-fraction metrics under two salts; the graded surface is the
    // ENTIRE test: pairing, the draw grid, per-resample sorted-fold
    // means, and the single-division p-value.
    "q152_eval_bootstrap" -> ((s, d) => {
      def frac(salt: String) =
        conv(substring(md5(concat(col("query_id").cast("string"),
          lit(salt))), 1, 8), 16, 10).cast("double") / lit(4294967296.0)
      val q = documents(s, d).filter(col("doc_id") < 40)
        .select(col("doc_id").as("query_id"))
      val mA = q.withColumn("recall", frac("A"))
      val mB = q.withColumn("recall", frac("B"))
      graft.operators.Eval.pairedBootstrap(mA, mB, "recall", nBoot = 200)
    }),

    // The interval form of q152: a nearest-rank 95% percentile CI on
    // the mean delta over the SAME deterministic resamples — exact
    // integer order statistics (ranks floor/ceil of (nB-1)·α), no
    // interpolation, so the interval is bit-checkable. An interval
    // excluding 0 is the two-sided significance read.
    "q156_eval_bootstrap_ci" -> ((s, d) => {
      def frac(salt: String) =
        conv(substring(md5(concat(col("query_id").cast("string"),
          lit(salt))), 1, 8), 16, 10).cast("double") / lit(4294967296.0)
      val q = documents(s, d).filter(col("doc_id") < 40)
        .select(col("doc_id").as("query_id"))
      val mA = q.withColumn("recall", frac("A"))
      val mB = q.withColumn("recall", frac("B"))
      graft.operators.Eval.bootstrapCi(mA, mB, "recall", nBoot = 200)
    }),

    // Data-contract expectations: the whole assertion battery (null/
    // empty rates, key uniqueness, language coverage, length bounds)
    // evaluated in ONE corpus pass — every rule is an aggregate
    // expression folded into one agg, map-side combined; N rules cost
    // one scan, not N. Rates derive from exact integer counts with one
    // final division (avg() over doubles is summation-order dependent
    // and would flake the gate); passed compares the unrounded actual.
    "q163_expectations" -> ((s, d) => {
      import graft.operators.Expect
      import graft.operators.Expect.Rule
      Expect.report(documents(s, d), Seq(
        Rule("null_text_rate", Expect.rate(col("text").isNull), "<=", 0.01),
        Rule("empty_text_rate",
          Expect.rate(coalesce(trim(col("text")), lit("x")) === ""), "<=", 0.05),
        Rule("dup_doc_id",
          (count(lit(1)) - countDistinct(col("doc_id"))).cast("double"), "==", 0.0),
        Rule("known_lang_rate",
          Expect.rate(col("lang").isin("en", "es", "zh", "de", "fr")), ">=", 0.99),
        Rule("min_chars", min(col("n_chars")).cast("double"), ">=", 1.0),
        Rule("max_chars", max(col("n_chars")).cast("double"), "<=", 100000.0)
      )).orderBy(col("check"))
    }),

    // Embedding-column sanity screen: every vector flagged by where its
    // L2 norm sits against the corpus distribution (mean +/- 2 sigma on
    // 6dp-rounded values, so a boundary row cannot flip on summation-
    // order noise). One partial-agg'd stats pass + a broadcast 1-row
    // crossJoin — the cheap pre-index-build check that catches
    // degenerate (empty-input) and unnormalized (mixed-model) vectors
    // BEFORE they surface as silent ranking drift.
    "q184_norm_outliers" -> ((s, d) =>
      graft.operators.EmbeddingStats.normOutliers(
          embeddings(s, d), "vec_id", "embedding", sigma = 2.0)
        .orderBy(col("vec_id"))),

    // ASYMMETRIC overlap — containment, the score Jaccard-family dedup
    // misses: a short doc quoted wholesale inside a long one has tiny
    // Jaccard but containment ~1. Plants doc B's 150-char head inside
    // doc A for doc_id % 50 == 0 (a self-join — cross-doc quoting can't
    // be planted row-locally); the winnowing guarantee surfaces every
    // such pair, and containment = shared / min(|fp|) reported per
    // pair. minShared 12 < the ~30 fps a 150-char verbatim span
    // selects, > the vocabulary-noise floor.
    "q185_containment" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("__nxt"))
      val dirty = docs.join(nxt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(50)) === 0 && col("__nxt").isNotNull,
            concat(substring(col("text"), 1, 120), lit(" "),
              substring(col("__nxt"), 1, 150)))
          .otherwise(col("text")).as("text"))
      graft.functions.Winnowing.containmentPairs(
          graft.functions.Winnowing.fingerprints(dirty, "doc_id", "text",
            k = 8, w = 8),
          "doc_id", minShared = 12, maxPostings = 100)
        .orderBy(col("key_a"), col("key_b"))
    }),

    // Cross-source contamination MATRIX: q144's winnowed overlap pairs
    // rolled up to (source, source) cells — the corpus-governance view
    // ("which feeds duplicate each other") that decides dedup order and
    // mixture weights. The rollup adds one broadcast-sized source map
    // join and a 20x20-bounded aggregate on top of the pair join — no
    // new shuffle shape.
    "q186_source_overlap" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val pairs = graft.functions.Winnowing.sharedFingerprintPairs(
        graft.functions.Winnowing.fingerprints(docs, "doc_id", "text",
          k = 8, w = 8),
        "doc_id", minShared = 20, maxPostings = 100)
      val src = documents(s, d).select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("key_a"), col("source").as("__sa")),
          Seq("key_a"))
        .join(src.select(col("doc_id").as("key_b"), col("source").as("__sb")),
          Seq("key_b"))
        .groupBy(least(col("__sa"), col("__sb")).as("src_lo"),
          greatest(col("__sa"), col("__sb")).as("src_hi"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("shared")).as("total_shared"))
        .orderBy(col("src_lo"), col("src_hi"))
    }),

    // Recency-biased sampling: keep probability 0.5^(age/halfLife)
    // anchored at an EXPLICIT asOf (2024-02-01; the fixture spans
    // January 2024, so survival rates run ~0.04 at day 1 to ~0.82 at
    // day 30). Same md5-fraction determinism as q80 — pure function of
    // (event_id, ts), map-side filter, engine-checkable.
    "q189_time_decay_sample" -> ((s, d) =>
      Sampling.timeDecay(
          events(s, d).select(col("event_id"), col("ts"), col("user_id")),
          "event_id", "ts", halfLifeDays = 7.0, asOfEpoch = 1706745600.0)
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))),

    // Graph centrality for corpus curation: 5 damped PageRank
    // iterations over a planted ring+chord graph on the doc_id set
    // (deterministic in-degree spread, no dangling nodes — the
    // operator's dangling redistribution is spec-gated separately).
    // Per iteration: one src-keyed equi-join + one partial-agg'd sum
    // per dst; ranks localCheckpoint per round so the plan stays flat.
    // The oracle unrolls the same five iterations in SQL.
    "q190_pagerank" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"))
      val cnt = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 1, lit(cnt)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 3, lit(cnt)).as("dst")))
      graft.operators.PageRank.pageRank(edges, docs, iters = 5)
        .orderBy(col("node"))
    }),

    // Centrality survivor policy end-to-end: planted 5-node stars
    // (hub = every 10th doc, leaves hub+1..hub+4) run through labels +
    // PageRank + per-component argmax; the star contract pins the
    // answer (the hub is both min label and max rank), so a defect in
    // the label fixpoint, the rank iteration, or the tie-broken argmax
    // all break the hash (the q180 fixture-contract discipline).
    "q191_centrality_survivors" -> ((s, d) => {
      val hubs = documents(s, d).select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(10)) === 0)
      val pairs = hubs.select(col("doc_id").as("key_a"),
        explode(sequence(col("doc_id") + 1, col("doc_id") + 4)).as("key_b"))
      ConnectedComponents.survivorsByCentrality(pairs)
        .orderBy(col("comp_id"))
    }),

    // CCNet perplexity banding: head/middle/tail per LANGUAGE, cut at
    // the group's mean / mean+sigma of the q131 bigram cross-entropy.
    // One aggregation pass over integer micro-units (exact under any
    // row order), broadcast stats join, no window — the quantile-free
    // scale shape of Wenzek et al.'s per-language buckets.
    "q193_ppl_bands" -> ((s, d) =>
      graft.functions.NgramLm.perplexityBands(
          documents(s, d).select(col("doc_id"), col("text"), col("lang")),
          "doc_id", "text", "lang")
        .orderBy(col("doc_id"))),

    // Conversation-tree flattening: a planted message forest (16-node
    // binary trees over doc_id: root every 16th id, parent of local L
    // is (L-1) div 2) flattened to root-to-leaf paths — one equi-join
    // per tree LEVEL (depth <= 5 here by construction), leaves by
    // anti-join against the parent set. The oracle walks the same
    // forest with a recursive CTE.
    "q195_chat_paths" -> ((s, d) => {
      val msgs = documents(s, d).select(col("doc_id"),
        expr("""CASE WHEN doc_id % 16 = 0 THEN CAST(NULL AS BIGINT)
               |ELSE (doc_id DIV 16) * 16 + ((doc_id % 16 - 1) DIV 2)
               |END""".stripMargin).as("parent"))
      graft.operators.Conversations.chatPaths(msgs, "doc_id", "parent",
          maxDepth = 8)
        .orderBy(col("leaf_id"))
    }),

    // Per-source trigram diversity: type-token ratio + fixed-point
    // Shannon entropy — "does this source repeat itself?" before any
    // dedup runs. Two hash aggregations, no window, no collected lists.
    "q196_ngram_diversity" -> ((s, d) =>
      graft.functions.TextStats.ngramDiversity(
          documents(s, d).select(col("source"), col("text")),
          "text", "source", n = 3)
        .orderBy(col("source"))),

    // CSV interchange round-trip: documents -> RFC-4180 CSV (quoted
    // embedded newlines, doubled-quote escapes) -> read back with the
    // inferred schema -> per-lang rollup. The oracle computes the same
    // rollup from the parquet directly, so any row lost, split, or
    // mangled by the quoting breaks counts or sums.
    "q197_csv_roundtrip" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q197").toString
      graft.sources.Ingest.writeCsv(documents(s, d), s"$tmp/docs_csv")
      graft.sources.Ingest.readCsv(s, s"$tmp/docs_csv")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_len"))
        .orderBy(col("lang"))
    }),

    // One-vs-rest multiclass source classifier: 5 binary fixed-point GD
    // fits over ONE shared hashed-feature table, served as a single
    // argmax pass (array accumulator — the feature table shuffles once,
    // not once per class). The oracle re-trains at Verify time and
    // embeds the weights as literals, so training must be
    // bit-deterministic across two independent runs for the margins —
    // and every argmax — to hash-match.
    "q199_multiclass" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"),
        col("source"))
      val models = graft.operators.Classifier.trainMulticlass(
        docs, "doc_id", "text", "source", dim = 32, iters = 2)
      graft.operators.Classifier.classifyMulticlass(
          docs, "doc_id", "text", models)
        .join(docs.select(col("doc_id"), col("source").as("label")),
          Seq("doc_id"))
        .select(col("doc_id"), col("label"), col("pred"), col("margin"))
        .orderBy(col("doc_id"))
    }),

    // Leakage-safe split: planted near-dup chains (ids 10k..10k+3) must
    // move into train/val/test ATOMICALLY — the split hashes the
    // component label, not the row key. The closed-form oracle knows
    // each chain's min-label (10k) and singleton labels, so a wrong
    // component, a group straddling splits, or a drifted md5 bucket all
    // break the (split, n_groups, n_docs) rollup.
    "q200_group_split" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("lang"))
      val ids = docs.select(col("doc_id"))
      val pairs = ids.filter(pmod(col("doc_id"), lit(10)) < 3)
        .select(col("doc_id").as("key_a"), (col("doc_id") + 1).as("key_b"))
        .join(ids.select(col("doc_id").as("key_b")), Seq("key_b"),
          "left_semi")
      Sampling.groupAwareSplit(docs, "doc_id", pairs, "key_a", "key_b",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("split"))
        .agg(count_distinct(col("group")).as("n_groups"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("split"))
    }),

    // Unigram-LM (SentencePiece-flavored) seed vocabulary: word-internal
    // substrings (2..4 chars) counted corpus-wide, top-20 by compression
    // gain cnt·(len−1) — candidate extraction is row-local transforms,
    // selection is TakeOrderedAndProject + rank on the 20-row page (the
    // q143 BPE discipline, third tokenizer family). Viterbi segmentation
    // under this vocab is spec-gated (Session4TokenizerSpec).
    "q202_unigram_vocab" -> ((s, d) =>
      graft.functions.UnigramLm.vocabSelect(
          graft.functions.UnigramLm.candidates(
            documents(s, d).select(col("text")), "text", maxLen = 4),
          n = 20)
        .orderBy(col("rank"))),

    // Per-doc unigram-LM log-likelihood under the q202 vocabulary: each
    // word's VITERBI score (best-segmentation log-prob), micro-unit
    // fixed point per word, exact integer sum per doc. The oracle is a
    // Verify-time dynamic twin that UNROLLS the DP to the corpus's max
    // word length against the re-derived vocab literals — the deepest
    // engine-parity gate in the tokenizer family: a drift in candidate
    // counts, vocab selection, log-probs, the DP recurrence, or the
    // fallback penalty all break the hash.
    "q203_unigram_doc_lp" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val vocab = graft.functions.UnigramLm.vocabSelect(
        graft.functions.UnigramLm.candidates(docs, "text", maxLen = 4),
        n = 20)
      graft.functions.UnigramLm.docScores(docs, "text", vocab)
        .select(col("doc_id"), col("n_words"), col("total_lp"))
        .orderBy(col("doc_id"))
    }),

    // The multiclass confusion matrix: (label, pred, n) over the q199
    // classifier — the eval artifact a classifier owner reads before
    // trusting clean-by-prediction. Same re-trained dynamic oracle,
    // rolled up (shared CTE builder, so q199 and q209 cannot drift).
    "q209_multiclass_confusion" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"),
        col("source"))
      val models = graft.operators.Classifier.trainMulticlass(
        docs, "doc_id", "text", "source", dim = 32, iters = 2)
      graft.operators.Classifier.classifyMulticlass(
          docs, "doc_id", "text", models)
        .join(docs.select(col("doc_id"), col("source").as("label")),
          Seq("doc_id"))
        .groupBy(col("label"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("pred"))
    }),

    // RLHF data assembly END TO END: the q194 mined extremes rendered
    // as DPO training rows — two rows per kept prompt (chosen/rejected
    // through the identical template) with 1-based inclusive loss
    // spans. Mining (q194) and rendering (q157) are gated separately;
    // this hashes their COMPOSITION, so a drift in either's contract
    // breaks the pipeline gate too.
    "q207_dpo_assembly" -> ((s, d) => {
      val pairs = graft.operators.Sft.minePreferencePairs(
        events(s, d).select(col("user_id"), col("event_id"), col("value")),
        "user_id", "event_id", "value", minMargin = 1.0)
      val texted = pairs
        .withColumn("prompt",
          concat(lit("prompt "), col("user_id").cast("string")))
        .withColumn("chosen",
          concat(lit("resp "), col("chosen_id").cast("string")))
        .withColumn("rejected",
          concat(lit("resp "), col("rejected_id").cast("string")))
      graft.operators.Sft.renderPreferencePairs(texted, "user_id",
          "prompt", "chosen", "rejected")
        .orderBy(col("user_id"), col("side"))
    }),

    // CCNet band keep-policy rollup: per (lang, band) doc counts plus
    // the keep decision (head+middle in, tail out) — the table a
    // mixture owner signs off on before the filter runs. Composes the
    // q193 banding; the oracle shares its CTE chain (BandCtes) so the
    // two cannot drift.
    "q208_band_policy" -> ((s, d) =>
      graft.functions.NgramLm.perplexityBands(
          documents(s, d).select(col("doc_id"), col("text"), col("lang")),
          "doc_id", "text", "lang")
        .groupBy(col("lang"), col("band"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("kept", col("band") =!= "tail")
        .orderBy(col("lang"), col("band"))),

    // ORC interchange round-trip (the q197 CSV discipline on the other
    // columnar container): documents -> ORC -> read back -> per-SOURCE
    // rollup; the oracle computes the same rollup from the parquet, so
    // any type or row damage in the ORC path breaks the hash.
    "q206_orc_roundtrip" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q206").toString
      graft.sources.Ingest.writeOrc(documents(s, d), s"$tmp/docs_orc")
      graft.sources.Ingest.readOrc(s, s"$tmp/docs_orc")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_len"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    }),

    // Conversation forest -> SFT examples END TO END: the q195 planted
    // trees flattened with ancestor-context accumulation, every leaf
    // rendered through the loss-span template (context as the prompt,
    // leaf text as the response). The oracle re-walks the forest with a
    // context-carrying recursive CTE and re-derives the span arithmetic
    // — tree walk, context order, template, and offsets all in one hash.
    "q204_chat_sft" -> ((s, d) => {
      val msgs = documents(s, d).select(col("doc_id"),
        expr("""CASE WHEN doc_id % 16 = 0 THEN CAST(NULL AS BIGINT)
               |ELSE (doc_id DIV 16) * 16 + ((doc_id % 16 - 1) DIV 2)
               |END""".stripMargin).as("parent"),
        substring(coalesce(col("text"), lit("")), 1, 40).as("txt"))
      val ex = graft.operators.Conversations.chatExamples(
        msgs, "doc_id", "parent", "txt", maxDepth = 8)
      graft.operators.Sft.renderPairs(ex, "leaf_id", "context", "response")
        .join(ex.select(col("leaf_id"), col("depth")), Seq("leaf_id"))
        .select(col("leaf_id"), col("depth"), col("text"),
          col("loss_start"), col("loss_end"))
        .orderBy(col("leaf_id"))
    })
  )

  /** q203's twin, built by `SparkEntry.dynamicOracleSql` with a live
    * session: the q202 vocabulary re-derived (exact integer counts ->
    * log-prob literals via the shortest-round-trip double repr) and the
    * Viterbi DP unrolled to the corpus's max word length as chained
    * CTEs — dp_k = greatest over piece lengths of dp_{k-l} + lp(piece),
    * missing multi-char pieces at the -1e18 sentinel and unknown single
    * chars at the -20 fallback, exactly `UnigramLm.viterbiScore`'s
    * recurrence. Word scores round to micro-units (HALF_UP both
    * engines) and sum exactly per doc.
    */
  def unigramScoreOracle(s: SparkSession, sfDir: String): String = {
    val docs = documents(s, sfDir).select(col("doc_id"), col("text"))
    val vocab = graft.functions.UnigramLm.vocabSelect(
        graft.functions.UnigramLm.candidates(docs, "text", maxLen = 4),
        n = 20)
      .select(col("token"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)) // bounded: 20-row vocab
    val total = vocab.map(_._2).sum.toDouble.max(1.0)
    val maxW = docs
      .select(explode(array_remove(
        TextFunctions.tokens(trim(lower(col("text")))), "")).as("w"))
      .agg(max(length(col("w")))).head().getInt(0)
    require(maxW >= 1 && maxW <= 48,
      s"unigram oracle unrolls per char; corpus max word length $maxW out of range")
    def esc(t: String) = t.replace("'", "''")
    def lpCase(arg: String): String =
      vocab.map { case (t, c) =>
        s"WHEN '${esc(t)}' THEN CAST(${math.log(c / total)} AS DOUBLE)"
      }.mkString(s"(CASE $arg ", " ", " END)")
    def arm(k: Int, l: Int): String = {
      val sub = s"substr(w, ${k - l + 1}, $l)"
      if (l == 1) s"d${k - 1} + coalesce(${lpCase(sub)}, CAST(-20.0 AS DOUBLE))"
      else s"d${k - l} + coalesce(${lpCase(sub)}, CAST(-1e18 AS DOUBLE))"
    }
    val dpCtes = (1 to maxW).map { k =>
      val arms = (1 to math.min(4, k)).map(l => arm(k, l))
      val expr = if (arms.size == 1) arms.head
                 else arms.mkString("greatest(", ",\n    ", ")")
      s"dp$k AS (SELECT *, $expr AS d$k FROM dp${k - 1})"
    }.mkString(",\n ")
    val pick = (1 to maxW).map(k => s"WHEN $k THEN d$k")
      .mkString("CASE length(w) ", " ", s" ELSE d$maxW END")
    s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
       | dp0 AS (SELECT doc_id, unnest(toks) AS w, CAST(0.0 AS DOUBLE) AS d0
       |   FROM t),
       | $dpCtes,
       | sc AS (SELECT doc_id, $pick AS score FROM dp$maxW),
       | m AS (SELECT doc_id,
       |   CAST(round(score * 1000000.0) AS BIGINT) AS mm FROM sc),
       | ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |   CAST(sum(mm) AS BIGINT) AS s FROM m GROUP BY 1)
       |SELECT d.doc_id, coalesce(ag.n_words, 0) AS n_words,
       |  round(coalesce(CAST(ag.s AS DOUBLE), 0.0) / 1000000.0, 6)
       |    AS total_lp
       |FROM documents d LEFT JOIN ag USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private val Toks = "string_split_regex(trim(lower(text)), '\\s+')"

  /** First 8 hex chars of an md5 hex string -> BIGINT (matches
    * `Sampling.hashBucket`'s `conv(substring(md5(..), 1, 8), 16, 10)`).
    */
  private val Hex8 =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |   list_transform(range(1, 9),
      |     i -> CAST(strpos('0123456789abcdef', substr(hx, CAST(i AS INT), 1)) - 1 AS BIGINT))),
      |   (a, b) -> a * 16 + b)""".stripMargin

  /** Shared per-language perplexity-banding CTE chain (ends in
    * `banded(doc_id, lang, xent2, band)`): the q131 bigram-xent chain,
    * micro-unit group stats, and the head/middle/tail cuts — used by
    * q193 (per-doc bands) and q208 (the band keep-policy rollup) so the
    * two oracles cannot drift apart.
    */
  private lazy val BandCtes: String =
    s"""t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
       | bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
       |        unnest(toks[2:len(toks)]) AS w2
       |   FROM t WHERE len(toks) >= 2),
       | tf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
       |   FROM bi GROUP BY 1, 2, 3),
       | c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2
       |   FROM tf GROUP BY 1, 2),
       | c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
       | v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
       |   FROM (SELECT unnest(toks) AS tok FROM t)),
       | contrib AS (SELECT tf.doc_id, tf.w1, tf.w2, tf.tf,
       |     tf.tf * ln((CAST(c2.c2 AS DOUBLE) + 1.0)
       |       / (CAST(c1.c1 AS DOUBLE) + 1.0 * (SELECT v FROM v))) AS c
       |   FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
       | agg AS (SELECT doc_id,
       |     list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |       list(c ORDER BY w1, w2)), (x, y) -> x + y) AS sumc,
       |     CAST(sum(tf) AS BIGINT) AS n
       |   FROM contrib GROUP BY doc_id),
       | xe AS (SELECT d.doc_id, d.lang,
       |     round(coalesce(-a.sumc / a.n, 0.0), 6) AS xent2
       |   FROM documents d LEFT JOIN agg a USING (doc_id)),
       | mi AS (SELECT doc_id, lang, xent2,
       |     CAST(round(xent2 * 1000000.0) AS BIGINT) AS m FROM xe),
       | st AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
       |     CAST(sum(m) AS DOUBLE) AS s1,
       |     CAST(sum(m * m) AS DOUBLE) AS s2
       |   FROM mi GROUP BY 1),
       | banded AS (SELECT mi.doc_id, mi.lang, mi.xent2,
       |  CASE WHEN CAST(mi.m AS DOUBLE) < st.s1 / st.n THEN 'head'
       |       WHEN CAST(mi.m AS DOUBLE) <= st.s1 / st.n
       |         + sqrt(greatest(st.s2 / st.n
       |             - (st.s1 / st.n) * (st.s1 / st.n), 0.0)) THEN 'middle'
       |       ELSE 'tail' END AS band
       |  FROM mi JOIN st ON mi.lang IS NOT DISTINCT FROM st.lang)""".stripMargin

  /** Exact-pair dedup-apply oracle (recursive-CTE components over the
    * exact Jaccard >= 0.8 edge list, per-lang kept/dropped counts) —
    * shared by q68 (exact pairs) and q104 (MinHash-LSH pairs): the apply
    * chain is pair-source-agnostic, so both must hash-match the same SQL.
    */
  private lazy val DedupApplyOracle: String =
    s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
       | s AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 3 THEN list_distinct(toks)
       |   ELSE list_distinct(list_transform(range(1, len(toks) - 1),
       |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
       |  FROM t),
       | pairs AS (
       |  SELECT a.doc_id AS ka, b.doc_id AS kb
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
       | edges AS (SELECT ka AS src, kb AS dst FROM pairs
       |           UNION ALL SELECT kb, ka FROM pairs),
       | nodes AS (SELECT DISTINCT src AS node FROM edges),
       | reach(node, label) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
       | gone AS (SELECT node FROM reach GROUP BY node
       |          HAVING min(label) <> node),
       | tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total
       |         FROM documents GROUP BY lang),
       | kept AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
       |          FROM documents WHERE doc_id NOT IN (SELECT node FROM gone)
       |          GROUP BY lang)
       |SELECT lang, n_total, n_kept, n_total - n_kept AS n_dropped
       |FROM tot JOIN kept USING (lang) ORDER BY lang""".stripMargin

  /** Full-recompute component summary over the exact Jaccard >= 0.8 edge
    * list — shared by q62 (one-shot CC) and q107 (two-batch incremental
    * mergeLabels): the incremental result must hash-match the full
    * recompute or the merge is wrong.
    */
  private lazy val CcComponentsOracle: String =
    s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | s AS (SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN list_distinct(toks)
         |   ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
         |  FROM t),
         | pairs AS (
         |  SELECT a.doc_id AS ka, b.doc_id AS kb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
         | edges AS (SELECT ka AS src, kb AS dst FROM pairs
         |           UNION ALL SELECT kb, ka FROM pairs),
         | nodes AS (SELECT DISTINCT src AS node FROM edges),
         | reach(node, label) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
         | lab AS (SELECT node, min(label) AS comp FROM reach GROUP BY node)
         |SELECT comp AS comp_id, CAST(count(*) AS BIGINT) AS n_docs,
         | min(node) AS first_doc, max(node) AS last_doc
         |FROM lab GROUP BY comp ORDER BY comp_id""".stripMargin

  /** CcComponentsOracle's component derivation + a length-desc window to
    * pick each group's survivor — the independent check for q111's
    * max-score / min-key-tie-break selection.
    */
  private lazy val KeepBestOracle: String =
    s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | s AS (SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN list_distinct(toks)
         |   ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
         |  FROM t),
         | pairs AS (
         |  SELECT a.doc_id AS ka, b.doc_id AS kb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
         | edges AS (SELECT ka AS src, kb AS dst FROM pairs
         |           UNION ALL SELECT kb, ka FROM pairs),
         | nodes AS (SELECT DISTINCT src AS node FROM edges),
         | reach(node, label) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
         | lab AS (SELECT node, min(label) AS comp FROM reach GROUP BY node),
         | scored AS (SELECT l.comp, l.node, length(d.text) AS len
         |  FROM lab l JOIN documents d ON d.doc_id = l.node),
         | r AS (SELECT comp, node,
         |  row_number() OVER (PARTITION BY comp ORDER BY len DESC, node) AS rn
         |  FROM scored),
         | surv AS (SELECT comp, node AS survivor FROM r WHERE rn = 1),
         | cnt AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_docs
         |         FROM lab GROUP BY comp)
         |SELECT comp AS comp_id, survivor, n_docs
         |FROM surv JOIN cnt USING (comp) ORDER BY comp_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q62_dup_cc" -> CcComponentsOracle,
    // incremental mergeLabels graded against the identical full recompute
    "q107_cc_incr" -> CcComponentsOracle,
    "q111_dedup_keep_best" -> KeepBestOracle,

    "q63_tpch_q21" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier s
        | JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        | JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |       WHERE l2.l_orderkey = l1.l_orderkey
        |         AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |       JOIN orders o2 ON l3.l_orderkey = o2.o_orderkey
        |       WHERE l3.l_orderkey = l1.l_orderkey
        |         AND l3.l_suppkey <> l1.l_suppkey
        |         AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 10""".stripMargin,

    "q64_sample" ->
      s"""WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hx
         |  FROM documents),
         | b AS (SELECT doc_id, lang, $Hex8 % 100 AS bucket FROM h),
         | r AS (SELECT *, CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 50
         |   WHEN 'es' THEN 75 WHEN 'fr' THEN 100 ELSE 10 END AS rate FROM b)
         |SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket FROM r
         |WHERE bucket < rate ORDER BY doc_id""".stripMargin,
    "q112_temperature_mix" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         | m AS (SELECT min(n) AS nmin FROM c),
         | r AS (SELECT lang, sqrt(CAST(nmin AS DOUBLE) / n) AS rate FROM c, m),
         | h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hx
         |   FROM documents),
         | f AS (SELECT doc_id, lang,
         |   CAST($Hex8 AS DOUBLE) / 4294967296.0 AS frac FROM h)
         |SELECT f.doc_id, f.lang FROM f JOIN r USING (lang)
         |WHERE frac < rate ORDER BY doc_id""".stripMargin,

    "q86_chunk_dedup" ->
      """WITH t AS (SELECT doc_id,
        |   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        | e AS (SELECT doc_id, toks,
        |   unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS chunk_idx
        |  FROM t WHERE len(toks) > 0),
        | c AS (SELECT doc_id, chunk_idx,
        |   array_to_string(
        |     toks[CAST(chunk_idx*10+1 AS INT):CAST(chunk_idx*10+10 AS INT)],
        |     ' ') AS chunk
        |  FROM e),
        | k AS (SELECT doc_id, chunk_idx, chunk,
        |   row_number() OVER (PARTITION BY chunk
        |     ORDER BY doc_id, chunk_idx) AS rn FROM c)
        |SELECT doc_id, count(*) AS n_kept,
        | string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup
        |FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q90_upsert" ->
      """WITH base AS (SELECT doc_id, text, lang FROM documents),
        | upd AS (
        |  SELECT doc_id, 're-crawl: ' || text AS text, lang FROM documents
        |  WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 100001, text, 'new' FROM documents WHERE doc_id < 5),
        | m AS (
        |  SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
        |   coalesce(u.text, b.text) AS text,
        |   coalesce(u.lang, b.lang) AS lang
        |  FROM base b FULL OUTER JOIN upd u ON b.doc_id = u.doc_id)
        |SELECT doc_id, substring(text, 1, 24) AS head, lang,
        | length(text) AS n_chars
        |FROM m ORDER BY doc_id""".stripMargin,

    "q80_weighted_sample" ->
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
         |   md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
         | f AS (SELECT doc_id, lang, n_chars,
         |   CAST($Hex8 AS DOUBLE) / 4294967296.0 AS frac FROM h)
         |SELECT doc_id, lang, n_chars FROM f
         |WHERE frac < least(1.0, CAST(n_chars AS DOUBLE) / 2000.0)
         |ORDER BY doc_id""".stripMargin,

    "q65_xent" ->
      s"""WITH toks AS (SELECT doc_id,
         |   unnest(list_filter($Toks, t -> t <> '')) AS tok FROM documents),
         | tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |   FROM toks GROUP BY 1, 2),
         | vocab AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt
         |   FROM tf GROUP BY tok),
         | tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         | contrib AS (SELECT t.doc_id, t.tok, t.tf,
         |     t.tf * ln(CAST(v.cnt AS DOUBLE) / (SELECT total FROM tot)) AS c
         |   FROM tf t JOIN vocab v USING (tok)),
         | agg AS (SELECT doc_id,
         |     list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |       list(c ORDER BY tok)), (x, y) -> x + y) AS sumc,
         |     CAST(sum(tf) AS BIGINT) AS n
         |   FROM contrib GROUP BY doc_id)
         |SELECT d.doc_id, round(coalesce(-a.sumc / a.n, 0.0), 6) AS xent
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q66_spans" ->
      s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks
         |  FROM documents),
         | s AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |     range(1, len(toks) - 6),
         |     i -> list_aggregate(toks[i:i+7], 'string_agg', ' ')))) AS span
         |   FROM t WHERE len(toks) >= 8),
         | shared AS (SELECT span FROM s GROUP BY span HAVING count(*) >= 2)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM s JOIN shared USING (span) GROUP BY s.doc_id
         |ORDER BY doc_id""".stripMargin,

    // structural (non-iterative) derivation: consecutive-id islands of
    // size >= 2 are exactly the chain's components; isolated ids appear
    // in no edge and so carry no label
    "q106_cc_chain" ->
      """WITH n AS (SELECT DISTINCT doc_id FROM documents),
        | g AS (SELECT doc_id,
        |   doc_id - row_number() OVER (ORDER BY doc_id) AS grp FROM n)
        |SELECT min(doc_id) AS comp_id, CAST(count(*) AS BIGINT) AS n_docs,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM g GROUP BY grp HAVING count(*) >= 2 ORDER BY comp_id""".stripMargin,

    "q108_shuffle" ->
      """SELECT doc_id, lang,
        | CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |   AS BIGINT) AS pos
        |FROM documents ORDER BY pos""".stripMargin,

    // // (floor) division: DuckDB's / on integers yields DOUBLE and CAST
    // rounds-to-nearest, so the shard id needs the // floor-div operator
    "q119_export_shards" ->
      """WITH p AS (SELECT doc_id,
        |   CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |     AS BIGINT) AS pos
        |  FROM documents)
        |SELECT CAST(pos // 64 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(pos) AS pos_min, max(pos) AS pos_max,
        |  CAST(sum(doc_id * (pos % 64 + 1)) AS BIGINT) AS checksum
        |FROM p GROUP BY 1 ORDER BY shard""".stripMargin,

    // q119's manifest + the ustar size law: each member costs a 512-byte
    // header plus data padded to 512; each archive ends with two zero
    // blocks
    "q177_webdataset" ->
      """WITH p AS (SELECT doc_id,
        |   octet_length(encode(substr(text, 1, 100))) AS clen,
        |   octet_length(encode('caption for doc ' || doc_id)) AS caplen,
        |   CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |     AS BIGINT) AS pos
        |  FROM documents)
        |SELECT CAST(pos // 64 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(pos) AS pos_min, max(pos) AS pos_max,
        |  CAST(sum(doc_id * (pos % 64 + 1)) AS BIGINT) AS checksum,
        |  CAST(sum(512 + (clen + 511) // 512 * 512
        |         + 512 + (caplen + 511) // 512 * 512) + 1024 AS BIGINT)
        |    AS tar_bytes
        |FROM p GROUP BY 1 ORDER BY shard""".stripMargin,

    // tokenization parity with TextFunctions.tokenCount (trim + \s+
    // split; blank text -> 0); the cum window is total-ordered
    // (doc_id tie-break) so ROWS == RANGE; empty docs pack nowhere
    "q123_pack" ->
      """WITH t AS (SELECT doc_id,
        |   CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
        |  FROM documents),
        | p AS (SELECT doc_id, n_tok,
        |   sum(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |                    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        | d AS (SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS s,
        |       CAST(cum AS BIGINT) AS e FROM p WHERE n_tok > 0),
        | x AS (SELECT doc_id, s, e,
        |   unnest(range(s // 128, (e-1) // 128 + 1)) AS seq FROM d)
        |SELECT CAST(seq AS BIGINT) AS seq_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(e, (seq+1)*128) - greatest(s, seq*128)) AS BIGINT)
        |    AS n_tokens,
        |  CAST(sum(doc_id * (least(e, (seq+1)*128) - greatest(s, seq*128)))
        |    AS BIGINT) AS checksum
        |FROM x GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "q127_domain_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 10
        | ORDER BY doc_id""".stripMargin,

    // add-1 smoothed bigram LM trained on the corpus itself; the per-doc
    // f64 log-prob sum folds in (w1, w2) order on both engines and the
    // smoothed probability is one IEEE division of exact integers
    "q131_bigram_xent" ->
      s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
         |        unnest(toks[2:len(toks)]) AS w2
         |   FROM t WHERE len(toks) >= 2),
         | tf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
         |   FROM bi GROUP BY 1, 2, 3),
         | c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2
         |   FROM tf GROUP BY 1, 2),
         | c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         | v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
         |   FROM (SELECT unnest(toks) AS tok FROM t)),
         | contrib AS (SELECT tf.doc_id, tf.w1, tf.w2, tf.tf,
         |     tf.tf * ln((CAST(c2.c2 AS DOUBLE) + 1.0)
         |       / (CAST(c1.c1 AS DOUBLE) + 1.0 * (SELECT v FROM v))) AS c
         |   FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
         | agg AS (SELECT doc_id,
         |     list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |       list(c ORDER BY w1, w2)), (x, y) -> x + y) AS sumc,
         |     CAST(sum(tf) AS BIGINT) AS n
         |   FROM contrib GROUP BY doc_id)
         |SELECT d.doc_id, round(coalesce(-a.sumc / a.n, 0.0), 6) AS xent2
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // priority = w / u, u = (first-8-hex-of-md5 + 1) / 2^32 — exact on
    // both engines, so kept set AND rank order match bit-for-bit
    "q132_priority_sample" ->
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
         |   md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
         | f AS (SELECT doc_id, lang, n_chars,
         |   CAST(n_chars AS DOUBLE)
         |     / ((CAST($Hex8 AS DOUBLE) + 1.0) / 4294967296.0) AS priority
         |   FROM h),
         | r AS (SELECT doc_id, lang, n_chars,
         |   CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
         |     AS BIGINT) AS rank FROM f)
         |SELECT doc_id, lang, n_chars, rank FROM r WHERE rank <= 50
         |ORDER BY doc_id""".stripMargin,

    // positional coverage: token p is covered iff some duplicated
    // 3-gram occurrence spans it; overlap counted once via DISTINCT
    "q133_repetition" ->
      s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | pos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p,
         |         unnest(toks) AS tok FROM t),
         | totals AS (SELECT doc_id, CAST(sum(length(tok)) AS BIGINT)
         |     AS total_chars FROM pos GROUP BY 1),
         | bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
         |        unnest(toks[2:len(toks)]) AS w2
         |   FROM t WHERE len(toks) >= 2),
         | bic AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
         |   FROM bi GROUP BY 1, 2, 3),
         | top2 AS (SELECT doc_id, cnt * (length(w1) + length(w2)) AS top_chars
         |   FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |       ORDER BY cnt DESC, w1, w2) AS rn FROM bic) WHERE rn = 1),
         | tri AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i,
         |     unnest(toks[1:len(toks)-2]) AS w1,
         |     unnest(toks[2:len(toks)-1]) AS w2,
         |     unnest(toks[3:len(toks)]) AS w3
         |   FROM t WHERE len(toks) >= 3),
         | dup AS (SELECT doc_id, w1, w2, w3 FROM tri
         |   GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2),
         | cov AS (SELECT DISTINCT doc_id, p FROM (
         |   SELECT tri.doc_id, unnest([tri.i, tri.i + 1, tri.i + 2]) AS p
         |   FROM tri JOIN dup USING (doc_id, w1, w2, w3))),
         | dchars AS (SELECT pos.doc_id, CAST(sum(length(pos.tok)) AS BIGINT)
         |     AS dup_chars
         |   FROM cov JOIN pos ON cov.doc_id = pos.doc_id AND cov.p = pos.p
         |   GROUP BY 1)
         |SELECT d.doc_id,
         |  round(coalesce(CAST(t2.top_chars AS DOUBLE) / totals.total_chars,
         |    0.0), 6) AS top2_frac,
         |  round(coalesce(CAST(dc.dup_chars AS DOUBLE) / totals.total_chars,
         |    0.0), 6) AS dup3_frac
         |FROM documents d
         | LEFT JOIN totals USING (doc_id)
         | LEFT JOIN top2 t2 USING (doc_id)
         | LEFT JOIN dchars dc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // weights = power(avail, .5) normalized by the source-ordered fold;
    // take = min(floor(avail*2), round(weight*budget)); shortfall =
    // unplaced budget (identical scalar on every row)
    "q139_mixture_plan" ->
      """WITH f AS (SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
        |  FROM documents),
        | card AS (SELECT source, CAST(sum(toks) AS BIGINT) AS avail
        |   FROM f GROUP BY 1),
        | tot AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |     list(power(CAST(avail AS DOUBLE), 0.5) ORDER BY source)),
        |     (x, y) -> x + y) AS wsum FROM card),
        | p AS (SELECT source, avail,
        |   round(power(CAST(avail AS DOUBLE), 0.5)
        |     / (SELECT wsum FROM tot), 6) AS weight FROM card),
        | q AS (SELECT source, avail, weight,
        |   least(CAST(floor(CAST(avail AS DOUBLE) * 2.0) AS BIGINT),
        |         CAST(round(weight * 100000, 0) AS BIGINT)) AS take FROM p),
        | r AS (SELECT *, CASE WHEN avail = 0 THEN 0.0
        |     ELSE round(CAST(take AS DOUBLE) / avail, 6) END AS epochs FROM q),
        | sh AS (SELECT greatest(100000 - CAST(sum(take) AS BIGINT),
        |     CAST(0 AS BIGINT)) AS shortfall FROM r)
        |SELECT source, avail, weight, take, epochs,
        |  (SELECT shortfall FROM sh) AS shortfall
        |FROM r ORDER BY source""".stripMargin,

    // mask iff md5(':doc:pos') fraction <= rate; spans via lag +
    // running sum, strings via ORDER BY p aggregation — all windows
    // doc-partitioned
    "q138_span_corruption" ->
      s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | pos AS (SELECT doc_id, unnest(range(0, len(toks))) AS p,
         |         unnest(toks) AS tok FROM t),
         | h AS (SELECT doc_id, p, tok,
         |   md5(':' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)) AS hx
         |   FROM pos),
         | f AS (SELECT doc_id, p, tok,
         |   ((CAST($Hex8 AS DOUBLE) + 1.0) / 4294967296.0) <= 0.15 AS m FROM h),
         | g AS (SELECT *, m AND NOT coalesce(
         |     lag(m) OVER (PARTITION BY doc_id ORDER BY p), false) AS is_start
         |   FROM f),
         | s AS (SELECT *, sum(CASE WHEN is_start THEN 1 ELSE 0 END)
         |     OVER (PARTITION BY doc_id ORDER BY p) - 1 AS span_id FROM g),
         | ip AS (SELECT doc_id, p,
         |   CASE WHEN NOT m THEN tok WHEN is_start
         |     THEN '<extra_id_' || CAST(span_id AS VARCHAR) || '>' END AS piece
         |   FROM s),
         | inp AS (SELECT doc_id, string_agg(piece, ' ' ORDER BY p) AS input
         |   FROM ip WHERE piece IS NOT NULL GROUP BY 1),
         | tp AS (SELECT doc_id, p, span_id,
         |   CASE WHEN is_start
         |     THEN '<extra_id_' || CAST(span_id AS VARCHAR) || '> ' || tok
         |     ELSE tok END AS piece
         |   FROM s WHERE m),
         | tgt AS (SELECT doc_id, string_agg(piece, ' ' ORDER BY p) AS target,
         |     CAST(max(span_id) + 1 AS BIGINT) AS n_spans FROM tp GROUP BY 1)
         |SELECT d.doc_id, coalesce(inp.input, '') AS input,
         |  coalesce(tgt.target, '') AS target,
         |  coalesce(tgt.n_spans, 0) AS n_spans
         |FROM documents d LEFT JOIN inp USING (doc_id)
         | LEFT JOIN tgt USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // corpus-wide fingerprint counts joined back per doc, then
    // per-source sums; avg as sum/count (one division), not avg()
    "q137_dataset_card" ->
      """WITH f AS (SELECT source, doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
        |    length(text) AS chars
        |  FROM documents),
        | fc AS (SELECT fp, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1)
        |SELECT f.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(f.toks) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(f.chars) AS DOUBLE) / count(*), 2) AS avg_chars,
        |  CAST(sum(CASE WHEN fc.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
        |  round(CAST(sum(CASE WHEN fc.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_frac
        |FROM f JOIN fc USING (fp)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // dense rank by (n_chars, doc_id) asc, stage = rank DIV 50
    "q136_curriculum" ->
      """SELECT doc_id, CAST(rn - 1 AS BIGINT) AS pos,
        |  CAST((rn - 1) // 50 AS BIGINT) AS stage
        |FROM (SELECT doc_id,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // hashed-bigram log-likelihood ratio: target = lang 'en', raw = the
    // whole corpus; slot hash and smoothed divisions are exact on both
    // engines, the per-doc sum folds in slot order
    "q134_dsir" ->
      s"""WITH t AS (SELECT doc_id, lang, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | bi AS (SELECT doc_id, lang, unnest(toks[1:len(toks)-1]) AS w1,
         |        unnest(toks[2:len(toks)]) AS w2
         |   FROM t WHERE len(toks) >= 2),
         | sl AS (SELECT doc_id, lang, ($Hex8) % 1024 AS slot
         |   FROM (SELECT doc_id, lang, md5(w1 || ' ' || w2) AS hx FROM bi)),
         | tf AS (SELECT doc_id, lang, slot, CAST(count(*) AS BIGINT) AS tf
         |   FROM sl GROUP BY 1, 2, 3),
         | model AS (SELECT slot, CAST(sum(tf) AS BIGINT) AS r,
         |     CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS tt
         |   FROM tf GROUP BY 1),
         | tot AS (SELECT CAST(sum(r) AS BIGINT) AS rtot,
         |     CAST(sum(tt) AS BIGINT) AS ttot FROM model),
         | lr AS (SELECT slot,
         |     ln((CAST(tt AS DOUBLE) + 1.0)
         |       / (CAST((SELECT ttot FROM tot) AS DOUBLE) + 1024.0))
         |   - ln((CAST(r AS DOUBLE) + 1.0)
         |       / (CAST((SELECT rtot FROM tot) AS DOUBLE) + 1024.0)) AS lr
         |   FROM model),
         | contrib AS (SELECT tf.doc_id, tf.slot, tf.tf * lr.lr AS c
         |   FROM tf JOIN lr USING (slot)),
         | agg AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |     list(c ORDER BY slot)), (x, y) -> x + y) AS sumc
         |   FROM contrib GROUP BY doc_id)
         |SELECT d.doc_id, round(coalesce(a.sumc, 0.0), 6) AS lwt
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Gumbel-top-50 over the rounded weights; the noise is
    // -ln(-ln(u)) of the key's exact md5 fraction, so the kept set is
    // deterministic on both engines
    "q135_dsir_resample" ->
      s"""WITH t AS (SELECT doc_id, lang, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | bi AS (SELECT doc_id, lang, unnest(toks[1:len(toks)-1]) AS w1,
         |        unnest(toks[2:len(toks)]) AS w2
         |   FROM t WHERE len(toks) >= 2),
         | sl AS (SELECT doc_id, lang, ($Hex8) % 1024 AS slot
         |   FROM (SELECT doc_id, lang, md5(w1 || ' ' || w2) AS hx FROM bi)),
         | tf AS (SELECT doc_id, lang, slot, CAST(count(*) AS BIGINT) AS tf
         |   FROM sl GROUP BY 1, 2, 3),
         | model AS (SELECT slot, CAST(sum(tf) AS BIGINT) AS r,
         |     CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS tt
         |   FROM tf GROUP BY 1),
         | tot AS (SELECT CAST(sum(r) AS BIGINT) AS rtot,
         |     CAST(sum(tt) AS BIGINT) AS ttot FROM model),
         | lr AS (SELECT slot,
         |     ln((CAST(tt AS DOUBLE) + 1.0)
         |       / (CAST((SELECT ttot FROM tot) AS DOUBLE) + 1024.0))
         |   - ln((CAST(r AS DOUBLE) + 1.0)
         |       / (CAST((SELECT rtot FROM tot) AS DOUBLE) + 1024.0)) AS lr
         |   FROM model),
         | contrib AS (SELECT tf.doc_id, tf.slot, tf.tf * lr.lr AS c
         |   FROM tf JOIN lr USING (slot)),
         | agg AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |     list(c ORDER BY slot)), (x, y) -> x + y) AS sumc
         |   FROM contrib GROUP BY doc_id),
         | w AS (SELECT d.doc_id, d.lang, round(coalesce(a.sumc, 0.0), 6) AS lwt
         |   FROM documents d LEFT JOIN agg a USING (doc_id)),
         | g AS (SELECT doc_id, lang, lwt,
         |     lwt - ln(-ln((CAST($Hex8 AS DOUBLE) + 1.0) / 4294967296.0)) AS gkey
         |   FROM (SELECT doc_id, lang, lwt,
         |     md5(CAST(doc_id AS VARCHAR)) AS hx FROM w)),
         | r AS (SELECT doc_id, lang, lwt,
         |     row_number() OVER (ORDER BY gkey DESC, doc_id) AS rn FROM g)
         |SELECT doc_id, lang, lwt FROM r WHERE rn <= 50
         |ORDER BY doc_id""".stripMargin,

    // generation 1 = the full corpus at backup time; generation 2 = the
    // corpus after the keys 10..20 erase
    "q120_backup_restore" ->
      """SELECT 1 AS gen, doc_id, lang, n_chars FROM documents
        |UNION ALL
        |SELECT 2 AS gen, doc_id, lang, n_chars FROM documents
        | WHERE doc_id NOT BETWEEN 10 AND 20
        |ORDER BY gen, doc_id""".stripMargin,

    "q68_dedup_apply" -> DedupApplyOracle,
    // q104 is the LSH-pair production path graded against the SAME exact
    // oracle — recall < 1.0 on the fixture fails the hash gate
    "q104_dedup_apply_lsh" -> DedupApplyOracle,

    // the empty-token filter mirrors shingleSet's nonEmpty: a blank doc
    // must yield an EMPTY shingle set (null jaccard, pair dropped), not
    // the [''] set string_split_regex leaves behind
    "q69_incr" ->
      s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | s AS (SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN list_distinct(toks)
         |   ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
         |  FROM t)
         |SELECT a.doc_id AS corpus_key, b.doc_id AS new_key,
         | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         | FROM s a JOIN s b ON a.doc_id < 250 AND b.doc_id >= 250
         | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
         | ORDER BY corpus_key, new_key""".stripMargin,

    "q73_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |   WHERE event_type = 'view' GROUP BY user_id),
        | c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |   JOIN v ON e.user_id = v.user_id
        |   WHERE e.event_type = 'click' AND e.ts > v.t1
        |     AND e.ts <= v.t1 + INTERVAL 6 HOUR GROUP BY e.user_id),
        | p AS (SELECT e.user_id FROM events e JOIN c ON e.user_id = c.user_id
        |   WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |     AND e.ts <= c.t2 + INTERVAL 6 HOUR GROUP BY e.user_id)
        |SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
        | CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
        | CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
        | CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased""".stripMargin,

    "q72_q18" ->
      """SELECT c.c_name, o.o_orderkey, o.o_orderdate,
        | round(o.o_totalprice, 2) AS totalprice,
        | round(sum(l.l_quantity), 2) AS sum_qty
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,

    "q70_mix" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  CAST(ceil((CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END) * 1.3) AS BIGINT) AS tok
        | FROM documents),
        |c AS (
        | SELECT doc_id, lang, tok,
        |  CAST(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
        | FROM t)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(tok) AS BIGINT) AS tokens
        | FROM c WHERE cum - tok < 20000
        | GROUP BY lang ORDER BY lang""".stripMargin,

    "q67_quantiles" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        | round(quantile_cont(n_chars, 0.5), 6) AS p50,
        | round(quantile_cont(n_chars, 0.9), 6) AS p90,
        | round(quantile_cont(n_chars, 0.99), 6) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // hash-range split: bucket = first-8-hex of md5(doc_id) mod 100,
    // consecutive ranges 0-89 / 90-94 / 95-99 in declaration order
    "q141_hash_split" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |   md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
         | b AS (SELECT doc_id, lang, $Hex8 % 100 AS bucket FROM h)
         |SELECT doc_id, lang,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "q142_winnowing" ->
      s"""$WinnowSel
         |SELECT DISTINCT doc_id, pos, fp FROM sel WHERE rn = 1
         |ORDER BY doc_id, pos""".stripMargin,

    "q143_bpe_round1" ->
      s"""WITH t AS (SELECT list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | w AS (SELECT unnest(toks) AS word FROM t),
         | wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w GROUP BY 1),
         | p AS (SELECT substr(word, CAST(i AS INT), 1) AS sym_a,
         |        substr(word, CAST(i AS INT) + 1, 1) AS sym_b, freq
         |   FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
         |         FROM wf WHERE length(word) >= 2)),
         | pc AS (SELECT sym_a, sym_b, CAST(sum(freq) AS BIGINT) AS cnt
         |   FROM p GROUP BY 1, 2),
         | r AS (SELECT sym_a, sym_b, cnt,
         |   CAST(row_number() OVER (ORDER BY cnt DESC, sym_a, sym_b)
         |     AS BIGINT) AS rank FROM pc)
         |SELECT sym_a, sym_b, cnt, rank FROM r WHERE rank <= 20
         |ORDER BY rank""".stripMargin,

    "q146_retrieval_eval" ->
      """WITH d AS (SELECT doc_id FROM documents),
        | gold AS (SELECT doc_id % 50 AS query_id, doc_id FROM d
        |   WHERE doc_id % 50 < 10),
        | cand AS (SELECT doc_id % 25 AS query_id, doc_id FROM d
        |   WHERE doc_id % 25 < 10),
        | res AS (SELECT query_id, doc_id,
        |   CAST(row_number() OVER (PARTITION BY query_id
        |     ORDER BY md5(CAST(query_id AS VARCHAR) || '|' ||
        |       CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rank
        |   FROM cand),
        | ng AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_gold
        |   FROM gold GROUP BY 1),
        | h AS (SELECT r.query_id, r.rank FROM res r
        |   JOIN gold g ON r.query_id = g.query_id AND r.doc_id = g.doc_id
        |   WHERE r.rank <= 10),
        | agg AS (SELECT query_id, CAST(count(*) AS BIGINT) AS hits,
        |   min(rank) AS first_rank,
        |   list(rank ORDER BY rank) AS hit_ranks FROM h GROUP BY 1),
        | m AS (SELECT ng.query_id, ng.n_gold,
        |   coalesce(agg.hits, 0) AS hits,
        |   CAST(coalesce(agg.hits, 0) AS DOUBLE) / ng.n_gold AS recall,
        |   CASE WHEN agg.first_rank IS NULL THEN 0.0
        |        ELSE 1.0 / agg.first_rank END AS mrr,
        |   coalesce(list_reduce(
        |     list_prepend(CAST(0.0 AS DOUBLE), list_transform(agg.hit_ranks,
        |       r -> 0.6931471805599453 / ln(CAST(r AS DOUBLE) + 1.0))),
        |     (a, b) -> a + b), 0.0) AS dcg,
        |   list_reduce(
        |     list_prepend(CAST(0.0 AS DOUBLE), list_transform(
        |       range(1, least(10, ng.n_gold) + 1),
        |       i -> 0.6931471805599453 / ln(CAST(i AS DOUBLE) + 1.0))),
        |     (a, b) -> a + b) AS idcg
        |   FROM ng LEFT JOIN agg USING (query_id))
        |SELECT query_id, n_gold, hits, round(recall, 6) AS recall,
        |  round(mrr, 6) AS mrr, round(dcg / idcg, 6) AS ndcg
        |FROM m ORDER BY query_id""".stripMargin,

    "q147_quality_classifier" -> classifierOracle(dim = 32, iters = 3),

    "q154_sft_render" ->
      """WITH p AS (SELECT doc_id,
        |   coalesce(substr(text, 1, 80), '') AS prompt,
        |   coalesce(substr(text, 81, 160), '') AS response
        |   FROM documents),
        | r AS (SELECT doc_id,
        |   '<|system|>' || chr(10) || 'You are a helpful assistant.'
        |     || chr(10) || '<|user|>' || chr(10) || prompt || chr(10)
        |     || '<|assistant|>' || chr(10) AS prefix,
        |   response FROM p)
        |SELECT doc_id, prefix || response || '<|end|>' AS text,
        |  CAST(length(prefix) + 1 AS BIGINT) AS loss_start,
        |  CAST(length(prefix) + length(response) AS BIGINT) AS loss_end
        |FROM r ORDER BY doc_id""".stripMargin,

    "q157_dpo_render" ->
      """WITH p AS (SELECT doc_id,
        |   coalesce(substr(text, 1, 60), '') AS prompt,
        |   coalesce(substr(text, 61, 80), '') AS chosen,
        |   coalesce(substr(text, 141, 80), '') AS rejected
        |   FROM documents),
        | r AS (SELECT doc_id,
        |   '<|user|>' || chr(10) || prompt || chr(10)
        |     || '<|assistant|>' || chr(10) AS prefix,
        |   chosen, rejected FROM p),
        | u AS (
        |   SELECT doc_id, 'chosen' AS side,
        |     prefix || chosen || '<|end|>' AS text,
        |     CAST(length(prefix) + 1 AS BIGINT) AS loss_start,
        |     CAST(length(prefix) + length(chosen) AS BIGINT) AS loss_end
        |   FROM r
        |   UNION ALL
        |   SELECT doc_id, 'rejected' AS side,
        |     prefix || rejected || '<|end|>' AS text,
        |     CAST(length(prefix) + 1 AS BIGINT) AS loss_start,
        |     CAST(length(prefix) + length(rejected) AS BIGINT) AS loss_end
        |   FROM r)
        |SELECT doc_id, side, text, loss_start, loss_end FROM u
        |ORDER BY doc_id, side""".stripMargin,

    "q155_length_batching" ->
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |   FROM documents),
         | bl AS (SELECT doc_id, n_chars,
         |   (CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
         |     AS BIGINT) - 1) // 32 AS batch_id FROM d),
         | br AS (SELECT doc_id, n_chars,
         |   (CAST(row_number() OVER (ORDER BY
         |     md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) - 1) // 32
         |     AS batch_id FROM d),
         | s1 AS (SELECT 'length' AS strategy, batch_id,
         |   CAST(count(*) AS BIGINT) AS n, max(n_chars) AS max_len,
         |   CAST(sum(n_chars) AS BIGINT) AS sum_len FROM bl GROUP BY 2),
         | s2 AS (SELECT 'shuffle' AS strategy, batch_id,
         |   CAST(count(*) AS BIGINT) AS n, max(n_chars) AS max_len,
         |   CAST(sum(n_chars) AS BIGINT) AS sum_len FROM br GROUP BY 2),
         | u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
         |SELECT strategy, batch_id, n, max_len, sum_len,
         |  n * max_len - sum_len AS padding
         |FROM u ORDER BY strategy, batch_id""".stripMargin,

    "q152_eval_bootstrap" ->
      s"""WITH $BootstrapCtes
         |SELECT ov.n_queries, round(ov.mean_delta, 6) AS mean_delta,
         |  round(CAST((SELECT count(*) FROM pb WHERE mean_delta <= 0.0)
         |    AS DOUBLE) / (SELECT count(*) FROM pb), 6) AS p_value
         |FROM ov""".stripMargin,

    // nearest-rank percentile indexes for nBoot = 200, alpha = 0.025:
    // 0-based floor(199 * 0.025) = 4 and ceil(199 * 0.975) = 195 ->
    // 1-based row_number ranks 5 and 196
    "q156_eval_bootstrap_ci" ->
      s"""WITH $BootstrapCtes,
         | rk AS (SELECT mean_delta,
         |   CAST(row_number() OVER (ORDER BY mean_delta, b) AS BIGINT)
         |     AS rn FROM pb)
         |SELECT ov.n_queries, round(ov.mean_delta, 6) AS mean_delta,
         |  round((SELECT mean_delta FROM rk WHERE rn = 5), 6) AS ci_lo,
         |  round((SELECT mean_delta FROM rk WHERE rn = 196), 6) AS ci_hi
         |FROM ov""".stripMargin,

    // the battery's actuals re-derived from exact integer aggregates
    // with one final division; passed compares the unrounded actual
    "q163_expectations" ->
      """WITH a AS (SELECT
        |   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |     / CAST(count(*) AS DOUBLE) AS null_text_rate,
        |   CAST(sum(CASE WHEN coalesce(trim(text), 'x') = '' THEN 1 ELSE 0 END) AS DOUBLE)
        |     / CAST(count(*) AS DOUBLE) AS empty_text_rate,
        |   CAST(count(*) - count(DISTINCT doc_id) AS DOUBLE) AS dup_doc_id,
        |   CAST(sum(CASE WHEN lang IN ('en','es','zh','de','fr') THEN 1 ELSE 0 END) AS DOUBLE)
        |     / CAST(count(*) AS DOUBLE) AS known_lang_rate,
        |   CAST(min(n_chars) AS DOUBLE) AS min_chars,
        |   CAST(max(n_chars) AS DOUBLE) AS max_chars
        |  FROM documents)
        |SELECT * FROM (
        | SELECT 'null_text_rate' AS "check", round(null_text_rate, 6) AS actual,
        |   '<=' AS op, CAST(0.01 AS DOUBLE) AS threshold,
        |   null_text_rate <= 0.01 AS passed FROM a
        | UNION ALL
        | SELECT 'empty_text_rate', round(empty_text_rate, 6), '<=',
        |   CAST(0.05 AS DOUBLE), empty_text_rate <= 0.05 FROM a
        | UNION ALL
        | SELECT 'dup_doc_id', round(dup_doc_id, 6), '==',
        |   CAST(0.0 AS DOUBLE), dup_doc_id = 0.0 FROM a
        | UNION ALL
        | SELECT 'known_lang_rate', round(known_lang_rate, 6), '>=',
        |   CAST(0.99 AS DOUBLE), known_lang_rate >= 0.99 FROM a
        | UNION ALL
        | SELECT 'min_chars', round(min_chars, 6), '>=',
        |   CAST(1.0 AS DOUBLE), min_chars >= 1.0 FROM a
        | UNION ALL
        | SELECT 'max_chars', round(max_chars, 6), '<=',
        |   CAST(100000.0 AS DOUBLE), max_chars <= 100000.0 FROM a
        |) ORDER BY 1""".stripMargin,

    "q145_winnow_decontam" ->
      s"""${winnowSelCte(20, 8)},
         | fps AS (SELECT DISTINCT s.doc_id, s.fp, d.source
         |   FROM sel s JOIN documents d USING (doc_id) WHERE rn = 1),
         | bench AS (SELECT DISTINCT fp FROM fps WHERE source = 'src0')
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS shared
         |FROM (SELECT DISTINCT f.doc_id, f.fp FROM fps f
         |      JOIN bench b USING (fp) WHERE f.source <> 'src0')
         |GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY doc_id""".stripMargin,

    "q144_winnow_pairs" ->
      s"""$WinnowSel,
         | fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE rn = 1),
         | kept AS (SELECT fp FROM fps GROUP BY fp
         |   HAVING count(*) > 1 AND count(*) <= 100),
         | pairs AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b, a.fp
         |   FROM fps a JOIN fps b USING (fp) JOIN kept USING (fp)
         |   WHERE a.doc_id < b.doc_id)
         |SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS shared
         |FROM pairs GROUP BY 1, 2 HAVING count(*) >= 20
         |ORDER BY key_a, key_b""".stripMargin,

    "q153_split_leakage" ->
      s"""$WinnowSel,
         | fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE rn = 1),
         | kept AS (SELECT fp FROM fps GROUP BY fp
         |   HAVING count(*) > 1 AND count(*) <= 100),
         | pairs AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b, a.fp
         |   FROM fps a JOIN fps b USING (fp) JOIN kept USING (fp)
         |   WHERE a.doc_id < b.doc_id),
         | sh AS (SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS shared
         |   FROM pairs GROUP BY 1, 2 HAVING count(*) >= 20),
         | sp AS (SELECT doc_id,
         |   CASE WHEN bucket < 90 THEN 'train'
         |        WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |   FROM (SELECT doc_id, $Hex8 % 100 AS bucket FROM
         |     (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
         |      FROM documents)))
         |SELECT sh.key_a, sh.key_b, sh.shared,
         |  sa.split AS split_a, sb.split AS split_b
         |FROM sh JOIN sp sa ON sh.key_a = sa.doc_id
         |  JOIN sp sb ON sh.key_b = sb.doc_id
         |WHERE sa.split <> sb.split
         |ORDER BY key_a, key_b""".stripMargin,

    // the identical f64 norm fold (sequential, rounded 6) + 6dp-rounded
    // moment stats; comparisons run on the rounded values both sides
    "q184_norm_outliers" ->
      """WITH n AS (SELECT vec_id,
        |   round(sqrt(list_sum(list_transform(
        |     CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS norm
        |  FROM embeddings),
        | st AS (SELECT round(avg(norm), 6) AS mu,
        |   round(stddev_samp(norm), 6) AS sd FROM n)
        |SELECT vec_id, norm,
        |  CASE WHEN norm < mu - 2.0 * sd THEN 'low'
        |       WHEN norm > mu + 2.0 * sd THEN 'high'
        |       ELSE 'ok' END AS flag
        |FROM n, st ORDER BY vec_id""".stripMargin,

    // quote planting (self-join), winnowing selection over the dirty
    // text, capped-postings pair join, containment = shared / min(|fp|)
    "q185_containment" ->
      s"""${winnowSelCte(8, 8, "dirty",
            """dirty AS (SELECT a.doc_id,
              |   CASE WHEN a.doc_id % 50 = 0 AND b.doc_id IS NOT NULL
              |    THEN substr(a.text, 1, 120) || ' ' || substr(b.text, 1, 150)
              |    ELSE a.text END AS text
              |   FROM documents a LEFT JOIN documents b
              |     ON b.doc_id = a.doc_id + 1), """.stripMargin)},
         | fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE rn = 1),
         | kept AS (SELECT fp FROM fps GROUP BY fp
         |   HAVING count(*) > 1 AND count(*) <= 100),
         | pairs AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b, a.fp
         |   FROM fps a JOIN fps b USING (fp) JOIN kept USING (fp)
         |   WHERE a.doc_id < b.doc_id),
         | sh AS (SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS shared
         |   FROM pairs GROUP BY 1, 2 HAVING count(*) >= 12),
         | sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
         |   FROM fps GROUP BY 1)
         |SELECT sh.key_a, sh.key_b, sh.shared,
         |  sa.n_fp AS n_a, sb.n_fp AS n_b,
         |  round(CAST(sh.shared AS DOUBLE)
         |    / CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE), 6) AS containment
         |FROM sh JOIN sz sa ON sh.key_a = sa.doc_id
         |  JOIN sz sb ON sh.key_b = sb.doc_id
         |ORDER BY key_a, key_b""".stripMargin,

    // q144's pair chain rolled up to unordered source cells
    "q186_source_overlap" ->
      s"""$WinnowSel,
         | fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE rn = 1),
         | kept AS (SELECT fp FROM fps GROUP BY fp
         |   HAVING count(*) > 1 AND count(*) <= 100),
         | pairs AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b, a.fp
         |   FROM fps a JOIN fps b USING (fp) JOIN kept USING (fp)
         |   WHERE a.doc_id < b.doc_id),
         | sh AS (SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS shared
         |   FROM pairs GROUP BY 1, 2 HAVING count(*) >= 20),
         | lab AS (SELECT sh.key_a, sh.key_b, sh.shared,
         |   least(da.source, db.source) AS src_lo,
         |   greatest(da.source, db.source) AS src_hi
         |  FROM sh JOIN documents da ON sh.key_a = da.doc_id
         |   JOIN documents db ON sh.key_b = db.doc_id)
         |SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(shared) AS BIGINT) AS total_shared
         |FROM lab GROUP BY 1, 2 ORDER BY src_lo, src_hi""".stripMargin,

    // the q80 md5-fraction filter with the decay probability re-derived
    // from the same explicit asOf anchor
    "q189_time_decay_sample" ->
      s"""WITH h AS (SELECT event_id, user_id, epoch(ts) AS es,
         |   md5(CAST(event_id AS VARCHAR)) AS hx FROM events),
         | f AS (SELECT event_id, user_id, es,
         |   CAST($Hex8 AS DOUBLE) / 4294967296.0 AS frac FROM h)
         |SELECT event_id, user_id FROM f
         |WHERE frac < least(1.0,
         |  pow(0.5, ((1706745600.0 - es) / 86400.0) / 7.0))
         |ORDER BY event_id""".stripMargin,

    // the same ring+chord planting and five unrolled damped iterations
    "q190_pagerank" ->
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         | e0 AS (SELECT doc_id AS src,
         |     (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
         |   UNION ALL
         |   SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
         |   FROM documents),
         | e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         | deg AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e
         |   GROUP BY 1),
         | r0 AS (SELECT doc_id AS node, 1.0 / (SELECT n FROM nn) AS rank
         |   FROM documents),
         |${(1 to 5).map(k =>
            s""" r$k AS (SELECT d.doc_id AS node,
               |   (1.0 - 0.85) / (SELECT n FROM nn)
               |     + 0.85 * coalesce(c.s, 0.0) AS rank
               |   FROM documents d LEFT JOIN (
               |     SELECT e.dst AS node, sum(r.rank / deg.od) AS s
               |     FROM e JOIN deg USING (src)
               |       JOIN r${k - 1} r ON r.node = e.src
               |     GROUP BY 1) c ON c.node = d.doc_id)""").mkString(",\n")}
         |SELECT node, round(rank, 6) AS "rank" FROM r5
         |ORDER BY node""".stripMargin,

    // the star contract: hub = component label = centrality survivor
    "q191_centrality_survivors" ->
      """SELECT doc_id AS comp_id, doc_id AS survivor,
        |  CAST(5 AS BIGINT) AS n_docs
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY comp_id""".stripMargin,

    // q131's xent chain + mean/sigma banding over integer micro-units
    // (the shared BandCtes below): HUGEINT sums are exact like Spark's
    // DECIMAL(38,0), and the band thresholds derive from those exact
    // integers through the same IEEE expression tree
    "q193_ppl_bands" ->
      s"""WITH $BandCtes
         |SELECT doc_id, lang, xent2, band FROM banded
         |ORDER BY doc_id""".stripMargin,

    // the same planted 16-node binary forest walked by a recursive CTE;
    // leaves are ids that parent nothing
    "q195_chat_paths" ->
      """WITH RECURSIVE m AS (SELECT doc_id AS id,
        |   CASE WHEN doc_id % 16 = 0 THEN CAST(NULL AS BIGINT)
        |        ELSE (doc_id // 16) * 16 + ((doc_id % 16 - 1) // 2)
        |   END AS parent
        |  FROM documents),
        | r AS (SELECT id, CAST(id AS VARCHAR) AS path,
        |     CAST(1 AS BIGINT) AS depth
        |   FROM m WHERE parent IS NULL
        |  UNION ALL
        |  SELECT c.id, r.path || '/' || CAST(c.id AS VARCHAR), r.depth + 1
        |  FROM m c JOIN r ON c.parent = r.id)
        |SELECT r.id AS leaf_id, r.depth, r.path
        |FROM r
        |WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.parent = r.id)
        |ORDER BY leaf_id""".stripMargin,

    // trigram diversity per source: exact integer gram counts; the
    // entropy is a fixed-point micro-unit sum (order-free), divisions
    // and ln through one shared expression tree
    "q196_ngram_diversity" ->
      s"""WITH t AS (SELECT source, list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | g AS (SELECT source, unnest(list_transform(range(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
         |   FROM t WHERE len(toks) >= 3),
         | c AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS c
         |   FROM g GROUP BY 1, 2),
         | tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS total,
         |     CAST(count(*) AS BIGINT) AS dn FROM c GROUP BY 1),
         | ent AS (SELECT c.source,
         |     sum(CAST(round(CAST(c.c AS DOUBLE)
         |       * ln(CAST(c.c AS DOUBLE) / CAST(tot.total AS DOUBLE))
         |       * 1000000.0) AS BIGINT)) AS e
         |   FROM c JOIN tot USING (source) GROUP BY 1),
         | nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |   FROM documents GROUP BY 1)
         |SELECT nd.source, nd.n_docs,
         |  coalesce(tot.total, 0) AS total_ngrams,
         |  coalesce(tot.dn, 0) AS distinct_ngrams,
         |  round(coalesce(CAST(tot.dn AS DOUBLE) / tot.total, 0.0), 6) AS ttr,
         |  round(coalesce(-CAST(ent.e AS DOUBLE) / 1000000.0 / tot.total,
         |    0.0), 6) AS entropy
         |FROM nd LEFT JOIN tot USING (source) LEFT JOIN ent USING (source)
         |ORDER BY nd.source""".stripMargin,

    // the round-trip's target rollup, computed from the parquet the CSV
    // was written from — equality proves no row/field damage in flight
    "q197_csv_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    // chains {10k..10k+3} have closed-form min-label 10k, singletons
    // label themselves; the split is the house md5 percent bucket of
    // the label string. PINNED ASSUMPTION: this closed form equals the
    // Spark side's connected-components min-label only because the
    // fixture doc_id space is contiguous from 0 (every planted chain's
    // base id 10k exists); a sparse or 1-based id space would need the
    // oracle re-derived with a recursive CTE over the planted edge list
    // semi-joined to the ids that actually exist.
    "q200_group_split" ->
      s"""WITH g AS (SELECT doc_id,
         |   CASE WHEN doc_id % 10 <= 3 THEN doc_id - (doc_id % 10)
         |        ELSE doc_id END AS grp
         |  FROM documents),
         | h AS (SELECT doc_id, grp, md5(CAST(grp AS VARCHAR)) AS hx FROM g),
         | b AS (SELECT doc_id, grp, ($Hex8) % 100 AS bucket FROM h),
         | sp AS (SELECT doc_id, grp,
         |   CASE WHEN bucket < 80 THEN 'train'
         |        WHEN bucket < 90 THEN 'val'
         |        ELSE 'test' END AS split
         |  FROM b)
         |SELECT split, CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM sp GROUP BY 1 ORDER BY split""".stripMargin,

    // the same nested position x length substring extraction, exact
    // integer counts and gains, the same (score DESC, token) page
    "q202_unigram_vocab" ->
      s"""WITH t AS (SELECT list_filter($Toks, x -> x <> '') AS toks FROM documents),
         | w AS (SELECT unnest(toks) AS w FROM t),
         | subs AS (SELECT flatten(list_transform(range(1, length(w) + 1),
         |    i -> list_transform(range(1, least(4, length(w) - i + 1) + 1),
         |      l -> substr(w, CAST(i AS INT), CAST(l AS INT))))) AS ss
         |   FROM w),
         | tok AS (SELECT unnest(ss) AS token FROM subs),
         | c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok
         |   WHERE length(token) >= 2 GROUP BY 1),
         | page AS (SELECT token, cnt,
         |   CAST(cnt * (length(token) - 1) AS BIGINT) AS score
         |  FROM c ORDER BY score DESC, token LIMIT 20)
         |SELECT token, cnt, score,
         |  CAST(row_number() OVER (ORDER BY score DESC, token) AS BIGINT)
         |    AS rank
         |FROM page ORDER BY rank""".stripMargin,

    // q194's window extremes + the Sft template per side, spans by
    // length arithmetic (the q204 discipline applied to DPO rows)
    "q207_dpo_assembly" ->
      """WITH s AS (SELECT user_id, event_id, value FROM events
        |   WHERE value IS NOT NULL),
        | r AS (SELECT user_id, event_id, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY value DESC, event_id) AS rb,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY value ASC, event_id) AS rw
        |  FROM s),
        | c AS (SELECT user_id, event_id AS chosen_id, value AS cs
        |   FROM r WHERE rb = 1),
        | w AS (SELECT user_id, event_id AS rejected_id, value AS ws
        |   FROM r WHERE rw = 1),
        | pairs AS (SELECT c.user_id, c.chosen_id, w.rejected_id
        |  FROM c JOIN w USING (user_id)
        |  WHERE c.chosen_id <> w.rejected_id
        |    AND round(c.cs - w.ws, 6) >= 1.0),
        | sides AS (
        |  SELECT user_id, 'chosen' AS side,
        |    'resp ' || chosen_id AS resp FROM pairs
        |  UNION ALL
        |  SELECT user_id, 'rejected', 'resp ' || rejected_id FROM pairs),
        | ren AS (SELECT user_id, side,
        |   '<|user|>' || chr(10) || 'prompt ' || user_id || chr(10)
        |     || '<|assistant|>' || chr(10) AS prefix,
        |   resp FROM sides)
        |SELECT user_id, side, prefix || resp || '<|end|>' AS text,
        |  CAST(length(prefix) + 1 AS BIGINT) AS loss_start,
        |  CAST(length(prefix) + length(resp) AS BIGINT) AS loss_end
        |FROM ren ORDER BY user_id, side""".stripMargin,

    // the shared banding chain rolled up to the keep table
    "q208_band_policy" ->
      s"""WITH $BandCtes
         |SELECT lang, band, CAST(count(*) AS BIGINT) AS n_docs,
         |  band <> 'tail' AS kept
         |FROM banded GROUP BY 1, 2 ORDER BY lang, band""".stripMargin,

    // the round-trip's target rollup straight from the parquet
    "q206_orc_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |  max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    // the q195 forest re-walked with a context-carrying recursive CTE,
    // then the Sft template + 1-based inclusive span arithmetic
    "q204_chat_sft" ->
      """WITH RECURSIVE m AS (SELECT doc_id AS id,
        |   CASE WHEN doc_id % 16 = 0 THEN CAST(NULL AS BIGINT)
        |        ELSE (doc_id // 16) * 16 + ((doc_id % 16 - 1) // 2)
        |   END AS parent,
        |   substr(coalesce(text, ''), 1, 40) AS txt
        |  FROM documents),
        | r AS (SELECT id, txt, CAST('' AS VARCHAR) AS ctx,
        |     CAST(1 AS BIGINT) AS depth
        |   FROM m WHERE parent IS NULL
        |  UNION ALL
        |  SELECT c.id, c.txt,
        |   CASE WHEN r.ctx = '' THEN r.txt
        |        ELSE r.ctx || chr(10) || r.txt END,
        |   r.depth + 1
        |  FROM m c JOIN r ON c.parent = r.id),
        | leaf AS (SELECT r.id, r.txt, r.ctx, r.depth FROM r
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.parent = r.id)),
        | ren AS (SELECT id AS leaf_id, depth,
        |   '<|user|>' || chr(10) || ctx || chr(10) || '<|assistant|>'
        |     || chr(10) AS prefix,
        |   txt FROM leaf)
        |SELECT leaf_id, depth, prefix || txt || '<|end|>' AS text,
        |  CAST(length(prefix) + 1 AS BIGINT) AS loss_start,
        |  CAST(length(prefix) + length(txt) AS BIGINT) AS loss_end
        |FROM ren ORDER BY leaf_id""".stripMargin
  )

  /** Winnowing selection CTE chain, parameterized on (k, w): char
    * k-gram hashes over the canonical normalized text, windows of w
    * consecutive grams (single short window when a doc has fewer), per-
    * window min hash with rightmost-position tie-break. `$Hex8` runs on
    * the gram md5 aliased `hx`, matching `Winnowing.gramHash`.
    */
  private def winnowSelCte(k: Int, w: Int, src: String = "documents",
                           pre: String = ""): String =
    s"""WITH ${pre}n AS (SELECT doc_id,
       |   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |   FROM $src),
       | g0 AS (SELECT doc_id, norm,
       |   CAST(length(norm) - ${k - 1} AS BIGINT) AS ng
       |   FROM n WHERE length(norm) >= $k),
       | grams AS (SELECT doc_id, ng,
       |   greatest(ng - ${w - 1}, CAST(1 AS BIGINT)) AS wn,
       |   CAST(i AS BIGINT) AS pos,
       |   md5(substr(norm, CAST(i AS INT), $k)) AS hx
       |   FROM (SELECT doc_id, norm, ng, unnest(range(1, ng + 1)) AS i
       |         FROM g0)),
       | hg AS (SELECT doc_id, wn, pos, $Hex8 AS fp FROM grams),
       | e AS (SELECT doc_id, pos, fp,
       |   unnest(range(greatest(pos - ${w - 1}, CAST(1 AS BIGINT)),
       |     least(pos, wn) + 1)) AS win FROM hg),
       | sel AS (SELECT doc_id, win, fp, pos,
       |   row_number() OVER (PARTITION BY doc_id, win
       |     ORDER BY fp ASC, pos DESC) AS rn FROM e)"""

  /** q142/q144's instance (k = 8, w = 8). */
  private lazy val WinnowSel: String = winnowSelCte(8, 8).stripMargin

  /** q152/q156's shared resample CTEs: the 40-query md5-fraction metric
    * fixture, paired deltas ranked by query id, the 200 x n
    * hash-deterministic draw grid, per-resample sorted-fold means (pb)
    * and the overall mean (ov) — `Eval.bootstrapMeans` re-derived in
    * SQL once, consumed by both the p-value and the CI twin.
    */
  private lazy val BootstrapCtes: String =
    s"""q AS (SELECT doc_id AS query_id FROM documents
       |   WHERE doc_id < 40),
       | m AS (SELECT query_id,
       |   (SELECT $Hex8 FROM (SELECT md5(CAST(query_id AS VARCHAR) || 'A') AS hx))
       |     / 4294967296.0
       |   - (SELECT $Hex8 FROM (SELECT md5(CAST(query_id AS VARCHAR) || 'B') AS hx))
       |     / 4294967296.0 AS delta
       |   FROM q),
       | r AS (SELECT query_id, delta,
       |   CAST(row_number() OVER (ORDER BY query_id) AS BIGINT) AS rr
       |   FROM m),
       | n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
       | g AS (SELECT b.b, i.i FROM
       |   (SELECT unnest(range(1, 201)) AS b) b,
       |   (SELECT unnest(range(1, (SELECT n FROM n) + 1)) AS i) i),
       | d AS (SELECT b,
       |   (SELECT $Hex8 FROM (SELECT md5(CAST(b AS VARCHAR) || ':' ||
       |      CAST(i AS VARCHAR)) AS hx)) % (SELECT n FROM n) + 1 AS rr
       |   FROM g),
       | pb AS (SELECT d.b,
       |   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |     list(r.delta ORDER BY r.delta)), (a, x) -> a + x)
       |   / CAST(count(*) AS BIGINT) AS mean_delta
       |   FROM d JOIN r USING (rr) GROUP BY d.b),
       | ov AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |     list(delta ORDER BY delta)), (a, x) -> a + x)
       |   / CAST(count(*) AS BIGINT) AS mean_delta FROM m)""".stripMargin

  /** q199's twin (called from `SparkEntry.dynamicOracleSql` with the
    * Verify-time RE-TRAINED one-vs-rest weights): serving-only SQL over
    * the weight literals — training determinism is what the gate buys,
    * since two independent `trainMulticlass` runs must produce bit-equal
    * weights or every margin drifts. Per class, the margin folds
    * w_ℓ[j]·x in sorted-j order (the q147 fold discipline), and the
    * argmax is a first-wins CASE chain over exact doubles —
    * `array_position`'s first-occurrence semantics on the Spark side.
    */
  def multiclassOracle(models: Seq[(String, Array[Double])],
                       dim: Int): String = {
    val (margins, pred, mlist) = multiclassParts(models)
    s"""WITH ${multiclassCtes(margins, pred, mlist, dim)}
       |SELECT doc_id, label, pred, margin FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** q209's twin: the same serving CTEs rolled up to the confusion
    * matrix — (label, pred, n) over the re-trained weight literals.
    */
  def multiclassConfusionOracle(models: Seq[(String, Array[Double])],
                                dim: Int): String = {
    val (margins, pred, mlist) = multiclassParts(models)
    s"""WITH ${multiclassCtes(margins, pred, mlist, dim)}
       |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
       |FROM scored GROUP BY 1, 2
       |ORDER BY label, pred""".stripMargin
  }

  /** The per-class margin expressions, first-wins argmax CASE, and
    * margin list shared by the two multiclass oracles.
    */
  private def multiclassParts(models: Seq[(String, Array[Double])])
      : (String, String, String) = {
    def wlit(w: Array[Double]): String =
      w.mkString("CAST([", ", ", "] AS DOUBLE[])")
    val margins = models.zipWithIndex.map { case ((_, w), i) =>
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |   list((${wlit(w)})[CAST(f.j + 1 AS INT)] * CAST(f.x AS DOUBLE)
         |     ORDER BY f.j)),
         |   (a, b) -> a + b) AS m$i""".stripMargin
    }.mkString(",\n  ")
    val mlist = models.indices.map(i => s"m$i").mkString(", ")
    val pred = models.zipWithIndex
      .map { case ((lab, _), i) => s"WHEN m$i = greatest($mlist) THEN '$lab'" }
      .mkString("CASE ", " ", " END")
    (margins, pred, mlist)
  }

  /** Hashed features + margins + argmax, ending in
    * `scored(doc_id, label, pred, margin)`.
    */
  private def multiclassCtes(margins: String, pred: String, mlist: String,
                             dim: Int): String =
    s"""t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks
       |   FROM documents),
       | tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       | htok AS (SELECT doc_id, md5(tk) AS hx FROM tok),
       | f0 AS (SELECT doc_id, ($Hex8) % $dim AS j,
       |   CAST(count(*) AS BIGINT) AS x FROM htok GROUP BY 1, 2),
       | feats AS (SELECT doc_id, j, x FROM f0
       |   UNION ALL SELECT doc_id, CAST($dim AS BIGINT) AS j,
       |     CAST(1 AS BIGINT) AS x FROM documents),
       | m AS (SELECT f.doc_id,
       |  $margins
       |  FROM feats f GROUP BY f.doc_id),
       | scored AS (SELECT m.doc_id, d.source AS label, $pred AS pred,
       |   round(greatest($mlist), 6) AS margin
       |  FROM m JOIN documents d USING (doc_id))""".stripMargin

  /** q147's twin: `Classifier.trainScore` unrolled iteration-by-iteration.
    * Each iteration is three CTEs — margins (sorted-j `list_reduce` fold,
    * matching Spark's `aggregate` over `sort_array`), the fixed-point
    * gradient (per-row terms rounded to integer micro-units, summed as
    * BIGINT — exact under any row order), and the weight update (the
    * identical IEEE expression tree `w - lr * (CAST(g AS DOUBLE)/1e6)`).
    * Weights are therefore bit-equal to the Scala side's, and with them
    * the final margins.
    */
  private def classifierOracle(dim: Int, iters: Int): String = {
    def marginCte(t: Int): String =
      s"""m$t AS (SELECT f.doc_id,
         |   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |     list(w${t - 1}.w * CAST(f.x AS DOUBLE) ORDER BY f.j)),
         |     (a, b) -> a + b) AS m
         |  FROM feats f JOIN w${t - 1} ON f.j = w${t - 1}.j
         |  GROUP BY f.doc_id)""".stripMargin
    def gradCte(t: Int): String =
      s"""g$t AS (SELECT f.j,
         |   CAST(sum(CAST(round((1.0/(1.0 + exp(-m$t.m)) - lab.y)
         |     * CAST(f.x AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS g
         |  FROM feats f JOIN m$t USING (doc_id) JOIN lab USING (doc_id)
         |  GROUP BY f.j)""".stripMargin
    def wCte(t: Int): String =
      s"""w$t AS (SELECT w.j,
         |   w.w - 0.00001 * (CAST(coalesce(g.g, 0) AS DOUBLE) / 1000000.0) AS w
         |  FROM w${t - 1} w LEFT JOIN g$t g ON w.j = g.j)""".stripMargin
    val steps = (1 to iters)
      .map(t => s"${marginCte(t)},\n ${gradCte(t)},\n ${wCte(t)}")
      .mkString(",\n ")
    s"""WITH t AS (SELECT doc_id, list_filter($Toks, x -> x <> '') AS toks
       |   FROM documents),
       | lab AS (SELECT doc_id,
       |   CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
       |   FROM documents),
       | tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       | htok AS (SELECT doc_id, md5(tk) AS hx FROM tok),
       | f0 AS (SELECT doc_id, ($Hex8) % $dim AS j,
       |   CAST(count(*) AS BIGINT) AS x FROM htok GROUP BY 1, 2),
       | feats AS (SELECT doc_id, j, x FROM f0
       |   UNION ALL SELECT doc_id, CAST($dim AS BIGINT) AS j,
       |     CAST(1 AS BIGINT) AS x FROM documents),
       | w0 AS (SELECT CAST(unnest(range(0, ${dim + 1})) AS BIGINT) AS j,
       |   CAST(0.0 AS DOUBLE) AS w),
       | $steps,
       | ${marginCte(iters + 1)}
       |SELECT m.doc_id, CAST(lab.y AS BIGINT) AS label,
       |  round(m.m, 6) AS score
       |FROM m${iters + 1} m JOIN lab USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}
