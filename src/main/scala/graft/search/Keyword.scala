package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword (BM25) search and keyword+vector hybrid rank fusion.
  *
  * The reference engine is vector-only (src/collection/vector_index.rs);
  * a training-data / retrieval pipeline at corpus scale also needs the
  * sparse side: BM25 over an inverted index, and reciprocal-rank fusion
  * to combine keyword and dense rankings into one result page. Both are
  * expressed as declarative Spark plans so Catalyst keeps the scan
  * pruned and the aggregates map-side-combined.
  *
  * Scale shape:
  *   - scoring touches ONLY postings of the query's terms — the corpus
  *     text is never re-scanned at query time once an index is built;
  *   - the persistent index is parquet `partitionBy(bucket)` where
  *     `bucket = md5(token) % nBuckets`, so a query reads just the
  *     directories its terms hash to (partition pruning, proven from
  *     the executed plan in KeywordSpec — same layout discipline as
  *     `Ann.writeIndex`);
  *   - per-document score assembly folds at most |queryTerms| entries,
  *     in token order (a deterministic f64 reduction, the q65 pattern),
  *     so executor state per key is O(|query|), never O(corpus);
  *   - document length norms and corpus stats are computed once at
  *     index-build time and stored; the query-time stats side is one
  *     broadcast row.
  */
object Keyword {

  val DefaultK1 = 1.2
  val DefaultB = 0.75
  /** Standard RRF dampening constant (Cormack et al., SIGIR'09). */
  val DefaultRrfC = 60

  /** One `(key, tok)` row per token, blank-safe. The default analyzer
    * is the lowercased whitespace split shared with TextFunctions
    * (oracle parity depends on both sides splitting identically);
    * alternatives come from [[Analyzer]].
    */
  private def explodedTokens(docs: DataFrame, idCol: String, textCol: String,
                             analyzer: Analyzer): DataFrame =
    docs.select(col(idCol).as("key"),
      explode(analyzer.tokensCol(col(textCol))).as("tok"))

  /** Driver-side twin of the corpus tokenization, for query strings. */
  def queryTerms(query: String): Seq[String] =
    Option(query).getOrElse("").trim.toLowerCase
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** BM25 contribution of one (term, doc) posting. Literal constants are
    * written as decimal literals (not Scala-side arithmetic like `k1 + 1`)
    * when defaults are in play so the DuckDB oracle parses the identical
    * double — `double(1.2) + 1 != double(2.2)` in the last ulp.
    */
  private def bm25Contrib(tf: Column, df: Column, dl: Column,
                          nDocs: Column, avgdl: Column,
                          k1: Double, b: Double): Column = {
    val idf = log((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1))
    idf * (tf * lit(k1 + 1)) /
      (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / avgdl))
  }

  /** (postings, doclen, stats) from a raw document table in one pass over
    * the exploded tokens: postings (tok, key, tf), doclen (key, dl) and a
    * single-row stats frame (n_docs, avgdl). `n_docs`/`avgdl` are defined
    * over documents with >= 1 token (token-less docs can never match a
    * term, so they are excluded from the norm on both the operator and
    * the oracle side — one definition, no drift).
    */
  def corpusTables(docs: DataFrame, idCol: String, textCol: String,
                   analyzer: Analyzer = Analyzer.Whitespace)
      : (DataFrame, DataFrame, DataFrame) = {
    val t = explodedTokens(docs, idCol, textCol, analyzer)
    val postings = t.groupBy(col("tok"), col("key"))
      .agg(count(lit(1)).as("tf"))
    val doclen = t.groupBy(col("key")).agg(count(lit(1)).as("dl"))
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    (postings, doclen, stats)
  }

  /** Score postings restricted to `queryTerms` and return the top-k
    * `(key, score)` page, ordered by raw score (rounding, if the caller
    * wants it, applies to survivors only — the q_topk_cosine discipline).
    *
    * The per-key sum folds contributions in token order via the
    * sort_array/aggregate idiom so the f64 total is run-deterministic.
    *
    * `requireAll = true` selects conjunctive (AND) semantics: only
    * documents matching EVERY query term survive to the page. The
    * membership test rides the same per-key aggregate (postings are
    * unique per (tok, key), so the group's row count IS its distinct
    * matched-term count) — query cost stays O(query-term postings),
    * the filter adds no extra pass or shuffle.
    */
  /** Keyset (search_after) cursor: keep only rows strictly after
    * `(score, key)` in the page order `(score DESC, key ASC)`. Scores
    * compare RAW (the ordered-fold f64 is deterministic, so the cursor
    * is exact and stateless — no server-side scroll context, any page
    * re-derivable from its predecessor's last row). Deep paging
    * re-scores matches and skips (every search engine's search_after
    * cost); it never OFFSETs through collected rows.
    */
  private def afterFilter(after: Option[(Double, Long)], scoreCol: Column,
                          keyCol: Column): Column =
    after.fold(lit(true)) { case (s, key) =>
      scoreCol < s || (scoreCol === s && keyCol > key)
    }

  def bm25FromTables(postings: DataFrame, doclen: DataFrame, stats: DataFrame,
                     queryTerms: Seq[String], k: Int,
                     k1: Double = DefaultK1, b: Double = DefaultB,
                     requireAll: Boolean = false,
                     after: Option[(Double, Long)] = None,
                     mustNot: Seq[String] = Nil): DataFrame = {
    val qt = queryTerms.map(_.toLowerCase).distinct
    require(qt.nonEmpty, "bm25 requires at least one query term")
    val neg = mustNot.map(_.toLowerCase).distinct
    require(qt.intersect(neg).isEmpty,
      s"terms ${qt.intersect(neg).mkString(", ")} are both required and excluded")
    val tf = postings.filter(col("tok").isin(qt: _*))
    // df over the matched postings only — corpus-wide df per query term
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "tok")
      .join(doclen, "key")
      .crossJoin(broadcast(stats))
      .withColumn("c", bm25Contrib(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b))
    val agg = scored.groupBy(col("key")).agg(
      aggregate(sort_array(collect_list(struct(col("tok"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("score"),
      count(lit(1)).as("__nt"))
    val kept = if (requireAll) agg.filter(col("__nt") === qt.size) else agg
    // boolean NOT: drop documents carrying ANY excluded term. An
    // anti-join against the excluded terms' postings — cost is
    // O(mustNot-term postings), the same pruning discipline as the
    // positive terms; nothing rescans the corpus.
    val negFiltered =
      if (neg.isEmpty) kept
      else kept.join(
        postings.filter(col("tok").isin(neg: _*)).select(col("key")),
        Seq("key"), "left_anti")
    negFiltered
      .select(col("key"), col("score"))
      .filter(afterFilter(after, col("score"), col("key")))
      .orderBy(desc("score"), col("key"))
      .limit(k)
  }

  /** One-shot BM25 over a raw document table (index-free path; the
    * corpus is scanned once for postings + norms). `analyzer` must match
    * the tokenization of `queryTerms` (use `analyzer.queryTokens`).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = DefaultK1, b: Double = DefaultB,
               analyzer: Analyzer = Analyzer.Whitespace,
               requireAll: Boolean = false,
               after: Option[(Double, Long)] = None,
               mustNot: Seq[String] = Nil): DataFrame = {
    val (postings, doclen, stats) = corpusTables(docs, idCol, textCol, analyzer)
    bm25FromTables(postings, doclen, stats, queryTerms, k, k1, b, requireAll,
      after, mustNot)
  }

  /** Query-time synonym expansion: the query's terms plus every synonym
    * the dictionary maps them to, deduplicated and sorted (deterministic
    * page order downstream). The dictionary is a `(term, synonym)`
    * DataFrame — a maintained table, not code — and the lookup filters it
    * to the query's handful of terms BEFORE the bounded collect, so the
    * driver sees only `query terms x synonyms-per-term` rows no matter
    * how large the dictionary grows (on a stored dictionary the isin
    * filter pushes to the scan). Expansion is OR-semantics (the expanded
    * list feeds [[bm25TopK]] unchanged): a synonym hit scores with its
    * own term statistics, the df-weighting already discounting synonyms
    * that turn out to be ubiquitous.
    */
  def expandSynonyms(queryTerms: Seq[String], dict: DataFrame,
                     termCol: String = "term",
                     synCol: String = "synonym"): Seq[String] = {
    val qs = queryTerms.map(_.toLowerCase).distinct
    require(qs.nonEmpty, "expandSynonyms: empty query")
    val syns = dict
      .filter(lower(col(termCol)).isin(qs: _*))
      .select(lower(col(synCol)).as("s"))
      .distinct()
      .collect().map(_.getString(0)).toSeq
    (qs ++ syns).distinct.sorted
  }

  /** Exact-phrase occurrences `(key, pos)` — one row per start position
    * of the consecutive token sequence `phrase` (the quoted-query
    * operator; also the precise half of decontamination checks, where
    * winnowing is the recall half). Matching is a chain of
    * position-ALIGNED semi-joins over positional postings: term i's
    * occurrences shift to `pos - i`, so every join is a plain (key, pos)
    * equi-join — sort-merge/hash at scale, never a per-doc regex scan or
    * an all-positions window. Postings prune to the phrase's terms
    * first, so cost is O(phrase-term postings), the [[bm25FromTables]]
    * discipline.
    */
  def phraseMatches(docs: DataFrame, phrase: Seq[String],
                    idCol: String = "doc_id", textCol: String = "text",
                    analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    val terms = phrase.map(_.toLowerCase)
    require(terms.nonEmpty && terms.forall(_.nonEmpty),
      "phrase must have at least one non-empty term")
    val toks = docs.select(col(idCol).as("key"),
        posexplode(analyzer.tokensCol(col(textCol)))
          .as(Seq("pos", "tok")))
      .filter(col("tok").isin(terms.distinct: _*))
    var cur = toks.filter(col("tok") === terms.head)
      .select(col("key"), col("pos"))
    for (i <- 1 until terms.length)
      cur = cur.join(
        toks.filter(col("tok") === terms(i))
          .select(col("key"), (col("pos") - i).as("pos")),
        Seq("key", "pos"), "left_semi")
    cur
  }

  /** Top-k documents by exact-phrase frequency: `(key, n_matches)`,
    * ties on the lower key. Counts are exact integers — the page is
    * engine-checkable with no float discipline at all.
    */
  def phraseTopK(docs: DataFrame, phrase: Seq[String], k: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    phraseMatches(docs, phrase, idCol, textCol, analyzer)
      .groupBy(col("key")).agg(count(lit(1)).as("n_matches"))
      .orderBy(desc("n_matches"), col("key"))
      .limit(k)
  }

  // --- persistent bucketed inverted index --------------------------------

  /** md5-derived token bucket — computable identically on the driver
    * (for pruning-filter literals) and in DuckDB (md5 is bit-identical
    * everywhere; Spark's murmur `hash()` is not portable off-cluster).
    */
  def tokenBucket(tok: String, nBuckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .take(3).map(b => f"$b%02x").mkString
    (Integer.parseInt(hex, 16) % nBuckets + nBuckets) % nBuckets
  }

  private def tokenBucketCol(tok: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 6), 16, 10).cast("int"), lit(nBuckets))

  /** Build the persistent index: postings partitioned by token bucket
    * (query-time reads prune to the buckets of the query terms), plus
    * doclen and the one-row stats table. One corpus scan.
    *
    * Stats are stored as EXACT integers (`n_docs`, `sum_dl`) rather than
    * a float `avgdl` so `appendToIndex` can fold a batch's deltas in
    * without re-reading the corpus; `avgdl` is derived at query time.
    * sum-as-exact-long then one double division equals Spark's `avg`
    * over longs bit-for-bit while the token count stays below 2^53 —
    * the inline `corpusTables` path and the indexed path agree
    * (equivalence spec'd in KeywordSpec).
    *
    * The stored tables are LOG-STRUCTURED: postings and doclen are
    * delta logs that [[repairIndex]] extends with tombstones (negative
    * `tf`/`dl`, `cnt = -1`) when an upsert rewrites text under an
    * existing key; readers aggregate to the net view ([[netPostings]] /
    * [[liveDoclen]]). A freshly built index is simply the log with no
    * tombstones. doclen rows carry `fp = md5(text)` (the
    * `reembedChanged` staleness marker) and `cnt = 1`; token-less docs
    * get a `dl = 0` row so their fp is tracked too — stats' `n_docs`
    * counts only `dl > 0` rows, keeping the norm contract.
    */
  def buildIndex(docs: DataFrame, dir: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 nBuckets: Int = 64,
                 analyzer: Analyzer = Analyzer.Whitespace): Unit = {
    val spark = docs.sparkSession
    // ONE tokenize pass (round 11): doclen and stats used to recompute
    // the tokenize+aggregate subtree per output table (3 corpus passes
    // per build); dl per key is exactly sum(tf) over the key's postings,
    // so both derive from the WRITTEN parquet instead — columnar
    // re-reads of longs, never a re-tokenize. The tokenize itself is
    // spread first (plan-driven no-op at real split counts): a
    // one-split corpus would tokenize on a single core.
    val src = graft.operators.Layout.spreadForCompute(
      docs.select(col(idCol), col(textCol)))
    val (postings, _, _) = corpusTables(src, idCol, textCol, analyzer)
    postings
      .withColumn("bucket", tokenBucketCol(col("tok"), nBuckets))
      // cluster by bucket before the partitioned write: without this,
      // every aggregate task writes a sliver into every bucket dir
      // (tasks x buckets files — the small-file tax lands on every
      // later pruned read); with it each bucket is one file
      .repartition(nBuckets, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings")
    // empty/token-less corpus: the partitioned write leaves no data
    // files, so the read-back cannot infer a schema — every doc then
    // takes the dl = 0 coalesce branch below, as before
    val doclen0 =
      try spark.read.parquet(s"$dir/postings")
        .groupBy(col("key")).agg(sum(col("tf")).as("dl"))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        docs.select(col(idCol).as("key")).limit(0)
          .withColumn("dl", lit(0L))
      }
    val doclen = docFps(docs, idCol, textCol)
      .join(doclen0, Seq("key"), "left_outer")
      .select(col("key"), coalesce(col("dl"), lit(0L)).as("dl"),
        col("fp"), lit(1).as("cnt"))
    doclen.write.mode("overwrite").parquet(s"$dir/doclen")
    writeStats(spark, dir, spark.read.parquet(s"$dir/doclen"), nBuckets,
      analyzer.id)
  }

  /** `(key, fp)` for every document — md5 over the NULL-flattened text,
    * the same fingerprint convention the vector index stores.
    */
  private def docFps(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("key"),
      md5(coalesce(col(textCol).cast("string"), lit(""))).as("fp"))

  /** Exact integer stats recomputed from a doclen LOG frame (any mix of
    * live rows and tombstones): `n_docs` counts live token-bearing docs.
    */
  private def writeStats(spark: SparkSession, dir: String,
                         doclenLog: DataFrame, nBuckets: Int,
                         analyzerId: String): Unit = {
    val live = liveDoclenOf(doclenLog)
    live.agg(
        count(when(col("dl") > 0, 1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .withColumn("n_buckets", lit(nBuckets))
      .withColumn("analyzer", lit(analyzerId))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** (n_buckets, analyzer id) from a stored index's stats; indexes
    * predating the analyzer column read as whitespace.
    */
  private[graft] def storedMeta(spark: SparkSession, dir: String): (Int, String) = {
    val p = spark.read.option("mergeSchema", "true").parquet(s"$dir/stats")
    val r = p.head()
    val az =
      if (!p.schema.fieldNames.contains("analyzer")) "ws"
      else Option(r.getAs[String]("analyzer")).getOrElse("ws")
    (r.getAs[Int]("n_buckets"), az)
  }

  /** The analyzer a stored index was built with — every later search /
    * refresh / repair path derives tokenization from HERE, never from a
    * caller argument, so an index can never be read and written under
    * different token rules.
    */
  def analyzerOf(spark: SparkSession, dir: String): Analyzer =
    // pure read — NO recovery here: a lock-free query racing a live
    // writer's staged append must never delete its staging dirs (heal
    // runs at every WRITE entry point, under the collection write lock)
    Analyzer.fromId(storedMeta(spark, dir)._2)

  /** Net view of the postings log: per-(tok, key) summed `tf`, dropped
    * when the tombstones cancel it. Pure aggregation — exact integers,
    * order-free.
    */
  private def netPostingsOf(log: DataFrame): DataFrame =
    log.groupBy(log.columns.filter(_ != "tf").map(col).toIndexedSeq: _*)
      .agg(sum(col("tf")).as("tf")).filter(col("tf") > 0)

  /** Live rows of the doclen log: per-key net `dl` and row count; a key
    * survives while its live-row count is positive (a `dl = 0`
    * token-less doc stays visible through `cnt`, which `dl` alone
    * cannot express). Legacy pre-log rows read `cnt` as null -> 1.
    */
  private def liveDoclenOf(log: DataFrame): DataFrame = {
    val cnt = coalesce(col("cnt"), lit(1)).as("c")
    log.select(col("key"), col("dl"), cnt)
      .groupBy(col("key"))
      .agg(sum(col("dl")).as("dl"), sum(col("c")).as("cnt"))
      .filter(col("cnt") > 0)
  }

  /** Live `(key, fp)` pairs from the doclen log — the repair pass's
    * staleness baseline. A tombstone carries its row's original fp, so
    * grouping by (key, fp) cancels replaced fingerprints exactly.
    */
  private def liveFpsOf(log: DataFrame): DataFrame = {
    val fp = if (log.schema.fieldNames.contains("fp")) col("fp")
             else lit(null).cast("string").as("fp")
    val cnt = coalesce(col("cnt"), lit(1)).as("c")
    log.select(col("key"), fp.as("fp"), cnt)
      .groupBy(col("key"), col("fp"))
      .agg(sum(col("c")).as("cnt")).filter(col("cnt") > 0)
      .select(col("key"), col("fp"))
  }

  /** Log-churn metric for the maintenance planner: fraction of doclen log
    * rows that are dead weight (tombstones + the rows they cancel). 0 on
    * a freshly built/compacted index; grows with every repair/delete
    * until [[compactIndexTo]] folds the log. Counting only.
    */
  def deadFraction(spark: SparkSession, dir: String): Double = {
    val log = spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen")
    val gross = log.count()
    if (gross == 0L) 0.0
    else {
      val live = liveDoclenOf(log).agg(coalesce(sum(col("cnt")), lit(0L)))
        .head().getLong(0)
      1.0 - live.toDouble / gross
    }
  }

  // --- crash-safe append protocol ----------------------------------------
  //
  // appendToIndex must land postings AND doclen together. A plain
  // `mode("append")` pair has a fatal window: a crash after the postings
  // append but before the doclen append leaves fresh postings for keys
  // the doclen watermark has not advanced past, so the next refresh
  // re-selects those keys and appends their postings AGAIN — the net
  // view then reports doubled `tf` and BM25 silently over-scores them.
  // The append therefore stages both tables' files beside the index and
  // commits with a journal marker:
  //
  //   1. batch postings -> `postings_staging/` (bucket-partitioned),
  //      batch doclen rows -> `doclen_staging/`;
  //   2. create `_appendjournal` — the commit point;
  //   3. move the staged files in (parquet part names embed a job UUID,
  //      so moves are collision-free and idempotent), write stats,
  //      delete the journal, drop the staging dirs.
  //
  // [[recoverAppend]] runs before every WRITE to the index (all the
  // mutating entry points call it, under the collection write lock):
  // journal present -> roll forward (finish the moves, recompute stats
  // exactly from the doclen log); staging dirs without a journal ->
  // uncommitted append, discarded. The doclen watermark consequently
  // sees either the WHOLE batch (committed) or none of it (discarded) —
  // no half-state survives a crash. READS never recover: a lock-free
  // query racing a live writer must not delete its staging dirs or
  // fight its moves, and a crash-interrupted append is invisible to
  // readers anyway (stats advance only at commit completion).

  private def appendJournal(dir: String) = new org.apache.hadoop.fs.Path(
    s"$dir/_appendjournal")

  private def hadoopFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Move every staged parquet leaf into `target`, preserving partition
    * subdirectories (`bucket=N/`). Idempotent: a leaf already present at
    * the destination means an earlier attempt moved it — drop the
    * staged copy.
    */
  private def moveStagedIn(fs: org.apache.hadoop.fs.FileSystem,
                           stage: org.apache.hadoop.fs.Path,
                           target: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(stage)) return
    fs.mkdirs(target)
    fs.listStatus(stage).foreach { s =>
      if (s.isDirectory)
        moveStagedIn(fs, s.getPath, new org.apache.hadoop.fs.Path(target, s.getPath.getName))
      else if (s.getPath.getName.endsWith(".parquet")) {
        val dst = new org.apache.hadoop.fs.Path(target, s.getPath.getName)
        if (fs.exists(dst)) fs.delete(s.getPath, false)
        else if (!fs.rename(s.getPath, dst))
          throw new java.io.IOException(s"append commit: could not move ${s.getPath} to $dst")
      }
    }
  }

  /** Heal a crashed [[appendToIndex]] — run before every index read or
    * write (all the public entry points of this object call it, as does
    * the refresh watermark read). Journal present: the append committed;
    * finish the file moves and recompute stats exactly from the doclen
    * log. Staging dirs without a journal: the append never committed;
    * discard them (the watermark never advanced, so the batch re-runs
    * in full).
    */
  def recoverAppend(spark: SparkSession, dir: String): Unit = {
    val fs = hadoopFs(spark, dir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) return
    val j = appendJournal(dir)
    val stageP = new org.apache.hadoop.fs.Path(s"$dir/postings_staging")
    val stageD = new org.apache.hadoop.fs.Path(s"$dir/doclen_staging")
    if (fs.exists(j)) {
      moveStagedIn(fs, stageP, new org.apache.hadoop.fs.Path(s"$dir/postings"))
      moveStagedIn(fs, stageD, new org.apache.hadoop.fs.Path(s"$dir/doclen"))
      fs.delete(stageP, true)
      fs.delete(stageD, true)
      val (nBuckets, az) = storedMeta(spark, dir)
      writeStats(spark, dir,
        spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen"),
        nBuckets, az)
      fs.delete(j, false)
    } else {
      if (fs.exists(stageP)) fs.delete(stageP, true)
      if (fs.exists(stageD)) fs.delete(stageD, true)
    }
  }

  /** Stage a batch append and write the commit journal; returns the
    * advanced exact stats for [[commitAppend]]. Package-visible so the
    * crash spec can kill the append between the commit point and the
    * file moves.
    */
  private[graft] case class StagedAppend(nDocs: Long, sumDl: Long, nBuckets: Int,
                                         analyzerId: String)

  private[graft] def stageAppend(newDocs: DataFrame, dir: String,
                                 idCol: String, textCol: String): StagedAppend = {
    val spark = newDocs.sparkSession
    recoverAppend(spark, dir)
    val old = spark.read.parquet(s"$dir/stats").head()
    val (nBuckets, az) = storedMeta(spark, dir)
    val (postings, doclen0, _) =
      corpusTables(newDocs, idCol, textCol, Analyzer.fromId(az))
    postings
      .withColumn("bucket", tokenBucketCol(col("tok"), nBuckets))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings_staging")
    docFps(newDocs, idCol, textCol)
      .join(doclen0, Seq("key"), "left_outer")
      .select(col("key"), coalesce(col("dl"), lit(0L)).as("dl"),
        col("fp"), lit(1).as("cnt"))
      .write.mode("overwrite").parquet(s"$dir/doclen_staging")
    // exact integer deltas, read back from the staged files themselves
    val delta = spark.read.parquet(s"$dir/doclen_staging")
      .agg(count(when(col("dl") > 0, 1)), sum(col("dl"))).head()
    val st = StagedAppend(
      old.getAs[Long]("n_docs") + delta.getLong(0),
      old.getAs[Long]("sum_dl") + (if (delta.isNullAt(1)) 0L else delta.getLong(1)),
      nBuckets, az)
    hadoopFs(spark, dir).create(appendJournal(dir), true).close()  // commit point
    st
  }

  private[graft] def commitAppend(spark: SparkSession, dir: String,
                                  st: StagedAppend): Unit = {
    val fs = hadoopFs(spark, dir)
    moveStagedIn(fs, new org.apache.hadoop.fs.Path(s"$dir/postings_staging"),
      new org.apache.hadoop.fs.Path(s"$dir/postings"))
    moveStagedIn(fs, new org.apache.hadoop.fs.Path(s"$dir/doclen_staging"),
      new org.apache.hadoop.fs.Path(s"$dir/doclen"))
    import spark.implicits._
    Seq((st.nDocs, st.sumDl, st.nBuckets, st.analyzerId))
      .toDF("n_docs", "sum_dl", "n_buckets", "analyzer")
      .write.mode("overwrite").parquet(s"$dir/stats")
    fs.delete(appendJournal(dir), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/postings_staging"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/doclen_staging"), true)
  }

  /** Fold a batch of NEW documents into an existing index in O(batch):
    * the batch's postings/doclen append to the stored tables (same
    * bucket layout, so query-time pruning is unaffected) and the exact
    * integer stats advance by the batch deltas — the corpus is never
    * re-read. Keys must be new (the `AppendJsonl` max+1 discipline);
    * re-adding an indexed key would double-count its postings.
    *
    * Crash-safe via the staged commit protocol above: postings and
    * doclen land atomically-as-a-pair, so the refresh watermark can
    * never re-append a half-landed batch. Coordinate with the
    * collection write lock as `embedColumn` does.
    */
  def appendToIndex(newDocs: DataFrame, dir: String,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val st = stageAppend(newDocs, dir, idCol, textCol)
    commitAppend(newDocs.sparkSession, dir, st)
  }

  /** Repair the index after an UPSERT rewrote text under existing keys —
    * the keyword twin of the vector index's `reembedChanged`, closing
    * the same staleness trap: postings/doclen describe the text at
    * indexing time, and neither watermark catch-up nor appends can see
    * an in-place rewrite. Exact by construction: the stored `fp`
    * (md5 of the indexed text) is compared against md5 of the CURRENT
    * text; changed keys — plus keys the index has never seen, covering
    * upserts that introduce new keys below any watermark — are
    * re-indexed. Legacy fp-less rows conservatively re-index.
    *
    * Scale shape — append-only, no postings rewrite: the bucket-
    * partitioned postings log cannot be pruned by KEY (it is laid out
    * by token), so instead of rewriting it the repair APPENDS
    * tombstones (the changed keys' net postings, negated) plus the
    * fresh postings of the new text; readers aggregate to the net view.
    * Cost: one key-semi-join scan of the postings log (reading, not
    * rewriting — no write amplification, no swap window) + O(changed)
    * appends. Stats are recomputed from the doclen log every call, so
    * re-running a repair after a crash heals everything; re-running on
    * a clean index is a no-op (returns 0). Compact the log periodically
    * via `Collection.compactKeywordIndex` — tombstones accumulate until
    * then. Returns the number of documents re-indexed.
    */
  def repairIndex(docs: DataFrame, dir: String,
                  idCol: String = "doc_id", textCol: String = "text"): Long = {
    val spark = docs.sparkSession
    recoverAppend(spark, dir)
    val (nBuckets, az) = storedMeta(spark, dir)
    val analyzer = Analyzer.fromId(az)
    val doclenLog = spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen")
    val cur = docs.select(col(idCol).as("key"),
      coalesce(col(textCol).cast("string"), lit("")).as("__txt"))
      .withColumn("__fp", md5(col("__txt")))
    val upd = cur.join(liveFpsOf(doclenLog), Seq("key"), "left_outer")
      .filter(col("fp").isNull || col("fp") =!= col("__fp"))
      .select(col("key"), col("__txt"), col("__fp"))
      .localCheckpoint(true)
    val nUpd = upd.count()
    if (nUpd > 0) {
      val updKeys = upd.select(col("key")).localCheckpoint(true)
      // key range first (min/max row-group pruning when the log is
      // key-clustered), then the exact semi-join
      val range = updKeys.agg(min(col("key")), max(col("key"))).head()
      val stored = spark.read.parquet(s"$dir/postings")
        .filter(col("key").between(range.get(0), range.get(1)))
        .join(updKeys, Seq("key"), "left_semi")
      val tomb = netPostingsOf(stored)
        .select(col("tok"), col("key"), (-col("tf")).as("tf"), col("bucket"))
      val updDocs = upd.select(col("key"), col("__txt").as(textCol))
      val (fresh, freshLen, _) = corpusTables(updDocs, "key", textCol, analyzer)
      tomb.unionByName(
          fresh.withColumn("bucket", tokenBucketCol(col("tok"), nBuckets)))
        .write.partitionBy("bucket").mode("append").parquet(s"$dir/postings")
      // doclen deltas: tombstone every live row of an updated key (its
      // own fp rides along so (key, fp) grouping cancels it), then the
      // fresh row with the new fp — dl = 0 when the new text is empty
      val oldLive = liveDoclenOf(doclenLog)
        .join(broadcast(updKeys), Seq("key"), "left_semi")
        .join(liveFpsOf(doclenLog), Seq("key"), "left_outer")
        .select(col("key"), (-col("dl")).as("dl"), col("fp"),
          (-col("cnt")).cast("int").as("cnt"))
      val freshRows = upd.select(col("key"), col("__fp").as("fp"))
        .join(freshLen, Seq("key"), "left_outer")
        .select(col("key"), coalesce(col("dl"), lit(0L)).as("dl"),
          col("fp"), lit(1).as("cnt"))
      oldLive.unionByName(freshRows).write.mode("append").parquet(s"$dir/doclen")
    }
    // stats from the (re-read) doclen log — ALWAYS, so a crashed repair
    // heals on re-run even when nUpd is then 0
    writeStats(spark, dir,
      spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen"),
      nBuckets, az)
    nUpd
  }

  /** Live `(key, fp)` view of a stored index's doclen log — the
    * consistency-check surface (`Collection.indexStatus` compares it
    * against the collection's current fingerprints).
    */
  def liveFps(spark: SparkSession, dir: String): DataFrame =
    // pure read — see [[analyzerOf]] for why recovery must not run here
    liveFpsOf(spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen"))

  /** Live `(tok, key, tf)` postings of a stored index, net of tombstones
    * — the vocabulary source for fuzzy suggestion
    * ([[Fuzzy.vocabFromPostings]]): reading (tok, key) off the postings
    * log beats re-tokenizing the corpus by the corpus/vocabulary size
    * ratio. Reads every bucket (vocabulary-wide by definition).
    */
  def livePostings(spark: SparkSession, dir: String): DataFrame =
    netPostingsOf(spark.read.parquet(s"$dir/postings"))
      .select(col("tok"), col("key"), col("tf"))

  /** Delete documents from the index — the tombstone-append twin of
    * [[repairIndex]] with no fresh side: each deleted key's net postings
    * are negated into the log, its doclen rows are tombstoned, and stats
    * recompute from the doclen log (so a crashed delete heals on re-run,
    * and re-running with the same keys is a no-op). Cost: one key-pruned
    * postings read + O(deleted) appends — the postings log is never
    * rewritten. Returns the number of live documents removed.
    */
  def deleteFromIndex(keys: DataFrame, dir: String): Long = {
    val spark = keys.sparkSession
    recoverAppend(spark, dir)
    val (nBuckets, az) = storedMeta(spark, dir)
    val doclenLog = spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen")
    val delKeys = liveDoclenOf(doclenLog)
      .join(keys.select(col(keys.columns.head).as("key")), Seq("key"), "left_semi")
      .select(col("key")).localCheckpoint(true)
    val n = delKeys.count()
    if (n > 0) {
      val range = delKeys.agg(min(col("key")), max(col("key"))).head()
      val stored = spark.read.parquet(s"$dir/postings")
        .filter(col("key").between(range.get(0), range.get(1)))
        .join(delKeys, Seq("key"), "left_semi")
      netPostingsOf(stored)
        .select(col("tok"), col("key"), (-col("tf")).as("tf"), col("bucket"))
        .write.partitionBy("bucket").mode("append").parquet(s"$dir/postings")
      liveDoclenOf(doclenLog)
        .join(broadcast(delKeys), Seq("key"), "left_semi")
        .join(liveFpsOf(doclenLog), Seq("key"), "left_outer")
        .select(col("key"), (-col("dl")).as("dl"), col("fp"),
          (-col("cnt")).cast("int").as("cnt"))
        .write.mode("append").parquet(s"$dir/doclen")
    }
    writeStats(spark, dir,
      spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen"),
      nBuckets, az)
    n
  }

  /** Write the NET view of an index at `srcDir` as a fresh tombstone-free
    * index at `dstDir` — the compaction body (the caller owns locking and
    * the staged swap). No re-tokenization: postings fold by aggregation,
    * doclen keeps one live row per key with its current fp, stats
    * recompute from the folded doclen.
    */
  def compactIndexTo(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    recoverAppend(spark, srcDir)
    val (nBuckets, az) = storedMeta(spark, srcDir)
    netPostingsOf(spark.read.parquet(s"$srcDir/postings"))
      .select(col("tok"), col("key"), col("tf"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dstDir/postings")
    val log = spark.read.option("mergeSchema", "true").parquet(s"$srcDir/doclen")
    val folded = liveDoclenOf(log)
      .join(liveFpsOf(log), Seq("key"), "left_outer")
      .select(col("key"), col("dl"), col("fp"), lit(1).as("cnt"))
    folded.write.mode("overwrite").parquet(s"$dstDir/doclen")
    writeStats(spark, dstDir, folded, nBuckets, az)
  }

  /** Query the persistent index. The postings read carries a `bucket`
    * partition filter derived driver-side from the query terms, so only
    * |distinct term buckets| directories are listed and scanned. Both
    * logs aggregate to their net view AFTER the pruning filters, so the
    * tombstone folding touches only the matched buckets' rows.
    *
    * Pure read — queries never run recovery: a lock-free search racing
    * a live writer's staged append must not delete its staging dirs or
    * fight its file moves. An UNCOMMITTED crashed append (no journal)
    * is fully invisible. A crash mid-commit can leave SOME of the
    * batch's moved files visible with pre-batch stats until the next
    * WRITE entry point rolls the journal forward; the skew is bounded —
    * half-landed docs without a doclen row drop out of scoring entirely
    * (the per-key join below is inner), so at worst df/n_docs/avgdl are
    * briefly stale, the same class of staleness a live commit's
    * in-flight moves already expose. A read-only serving deployment
    * should run `repairIndex`/refresh on a schedule (or after any
    * writer crash) to heal rather than rely on query-path recovery.
    */
  def searchIndex(spark: SparkSession, dir: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = DefaultK1, b: Double = DefaultB,
                  requireAll: Boolean = false,
                  after: Option[(Double, Long)] = None,
                  mustNot: Seq[String] = Nil,
                  nBuckets: Option[Int] = None): DataFrame = {
    val stored = spark.read.parquet(s"$dir/stats")
    // a caller that already read the one-row stats table (storedMeta —
    // the analyzer lives there too) passes the bucket count in; a bare
    // call pays the head() job itself
    val nB = nBuckets.getOrElse(stored.select(col("n_buckets")).head().getInt(0))
    // nullif guards the fully-erased index (n_docs = 0): no postings
    // survive to score anyway, but ANSI mode would fail the plan first
    val stats = stored.select(col("n_docs"),
      (col("sum_dl").cast("double") / nullif(col("n_docs"), lit(0))).as("avgdl"))
    val qt = queryTerms.map(_.toLowerCase).distinct
    val neg = mustNot.map(_.toLowerCase).distinct
    // excluded terms' postings live in their own buckets — read those
    // too (still O(query+mustNot buckets), never the whole postings log)
    val buckets = (qt ++ neg).map(tokenBucket(_, nB)).distinct
    val postings = netPostingsOf(
        spark.read.parquet(s"$dir/postings")
          .filter(col("bucket").isin(buckets: _*)))
      .select(col("tok"), col("key"), col("tf"))
    val doclen = liveDoclenOf(
        spark.read.option("mergeSchema", "true").parquet(s"$dir/doclen"))
      .select(col("key"), col("dl"))
    bm25FromTables(postings, doclen, stats, qt, k, k1, b, requireAll, after,
      neg)
  }

  // --- facets ----------------------------------------------------------------

  /** Facet counts over the query's FULL match set (not just the top-k
    * page): how many matching documents fall in each value of
    * `facetCol` — the sidebar every search UI grows ("lang: en (212),
    * de (31), ..."). `requireAll = true` counts conjunctive matches.
    *
    * Scale shape: match keys come from the token postings (pruned to
    * the query terms — O(query-term postings), the [[bm25FromTables]]
    * discipline), then ONE semi-joined aggregate over the metadata
    * column. Returns `(facet, n_docs)` ordered by (count desc, facet).
    */
  def facets(docs: DataFrame, queryTerms: Seq[String], facetCol: String,
             idCol: String = "doc_id", textCol: String = "text",
             requireAll: Boolean = false,
             analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    val qt = queryTerms.map(_.toLowerCase).distinct
    require(qt.nonEmpty, "facets require at least one query term")
    val matchedToks = explodedTokens(docs, idCol, textCol, analyzer)
      .filter(col("tok").isin(qt: _*))
    val matched =
      if (requireAll)
        matchedToks.groupBy(col("key"))
          .agg(countDistinct(col("tok")).as("__nt"))
          .filter(col("__nt") === qt.size).select(col("key"))
      else matchedToks.select(col("key")).distinct()
    docs.select(col(idCol).as("key"), col(facetCol).as("facet"))
      .join(matched, Seq("key"), "left_semi")
      .groupBy(col("facet")).agg(count(lit(1)).as("n_docs"))
      .orderBy(desc("n_docs"), col("facet"))
  }

  // --- snippets ------------------------------------------------------------

  /** 1-based position of the EARLIEST occurrence of any query term in
    * `text` (terms compared lowercase; `Int.MaxValue` when none occur).
    * The "a matched page always contains a term" assumption holds only
    * for LITERAL-TOKEN analyzers (whitespace/stopworded), where a
    * matched token is by construction a substring of the raw text;
    * under a normalizing analyzer (BPE pieces, stemming) a page can
    * match on tokens that never appear verbatim, and callers see the
    * sentinel — [[snippet]] falls back to the text head in that case.
    * Row-local `locate`/`least` — whole-stage codegen, no UDF.
    */
  def matchPos(text: Column, terms: Seq[String]): Column = {
    val lowered = lower(text)
    val ps = terms.map(_.toLowerCase).distinct.map { t =>
      val p = locate(t, lowered)
      when(p > 0, p).otherwise(lit(Int.MaxValue))
    }
    if (ps.length == 1) ps.head else least(ps: _*)
  }

  /** Display snippet: `width` chars of `text` starting `before` chars
    * ahead of the earliest term match (clamped to the string head). The
    * standard search-results excerpt, computed where the rows already
    * are — row-local string ops on the k-row hits page after the
    * broadcast content join, so snippets cost nothing at corpus scale.
    * When NO term occurs verbatim ([[matchPos]]'s sentinel — possible
    * under a normalizing analyzer), the excerpt falls back to the text
    * head rather than an empty string.
    */
  def snippet(text: Column, terms: Seq[String],
              before: Int = 30, width: Int = 80): Column = {
    val pos = matchPos(text, terms)
    text.substr(
      when(pos === Int.MaxValue, lit(1))
        .otherwise(greatest(lit(1), pos - before)),
      lit(width))
  }

  // --- reciprocal-rank fusion --------------------------------------------

  /** Fuse ranked lists by RRF: score(d) = sum over lists of
    * 1 / (c + rank_list(d)), missing entries contributing 0. Each input
    * is a ranked page `(keyCol, score)` ordered by (score desc, key) —
    * the shape `bm25TopK` / `Search.topK` return; ranks are re-derived
    * from that order so fusion never trusts row order across a shuffle.
    *
    * Inputs are top-k pages (driver-bounded, k <= ~100), so the
    * rank window and the fold-up run on k-sized frames — the single
    * partition window is deliberate and cheap here, not a scale hazard.
    * The per-key sum folds in list-index order (deterministic f64).
    */
  /** Reverse search (percolation): match a batch of documents against a
    * standing table of saved keyword queries — the alerting/routing shape
    * (Elasticsearch calls it the percolator): "which saved searches does
    * this new document satisfy?". The classic index is inverted — the
    * QUERIES are indexed, documents stream through — and the Spark-native
    * expression is the same idea as a plan: tokenize the stored queries
    * once, broadcast them (the saved-query table is small next to a
    * document batch), tokenize the batch once, and count distinct term
    * matches per (document, query) with a map-side-combined aggregate.
    *
    * `requireAll = true` (the default) keeps conjunctive matches only —
    * a document must contain EVERY term of the query; `false` returns
    * any-term matches with their matched/total counts so the caller can
    * apply a minimum-should-match threshold.
    *
    * Scale shape: cost is O(batch tokens) + one broadcast — the corpus
    * is never touched, no shuffle grows with the stored-query count, and
    * a continuous pipeline runs this per micro-batch against the same
    * broadcast queries. Returns (key, query_id, matched_terms, n_terms).
    */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, queryIdCol: String = "query_id",
                queryTextCol: String = "query",
                requireAll: Boolean = true,
                analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(analyzer.tokensCol(col(queryTextCol)))).as("tok"))
      .localCheckpoint(true) // tiny; evaluated twice (terms + counts)
    val qn = qt.groupBy(col("query_id")).agg(count(lit(1)).as("n_terms"))
    // per-ROW distinct tokens (array_distinct before the explode): a term
    // repeated in a document counts once, without the global distinct
    // shuffle a `.distinct()` over (key, tok) would cost
    val dt = docs.select(col(idCol).as("key"),
      explode(array_distinct(analyzer.tokensCol(col(textCol)))).as("tok"))
    val matched = dt.join(broadcast(qt), "tok")
      .groupBy(col("key"), col("query_id"))
      .agg(count(lit(1)).as("matched_terms"))
      .join(broadcast(qn), "query_id")
    val hits =
      if (requireAll) matched.filter(col("matched_terms") === col("n_terms"))
      else matched
    hits.select(col("key"), col("query_id"), col("matched_terms"), col("n_terms"))
  }

  /** Row-wise percolation twin: same results as [[percolate]], built
    * without ANY shuffle — each document row intersects its distinct
    * token array against every broadcast query's term array. Cost is
    * O(docs x queries) array intersects instead of a token join + two
    * aggregates, which wins while the saved-query table is small-to-
    * moderate (the common case), and — because the plan is completely
    * STATELESS — it applies verbatim to a STREAMING document source:
    * append mode, no watermark, no state store; the stream-static cross
    * join broadcasts the static query side once. Use [[percolate]] when
    * the query table is huge (the inverted token join scales with total
    * postings, not docs x queries).
    */
  def percolateRowwise(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, queryIdCol: String = "query_id",
                       queryTextCol: String = "query",
                       requireAll: Boolean = true,
                       analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      array_distinct(analyzer.tokensCol(col(queryTextCol))).as("__q_toks"))
    val scored = docs
      .select(col(idCol).as("key"),
        array_distinct(analyzer.tokensCol(col(textCol))).as("__d_toks"))
      .crossJoin(broadcast(q))
      .select(col("key"), col("query_id"),
        size(array_intersect(col("__d_toks"), col("__q_toks")))
          .cast("long").as("matched_terms"),
        size(col("__q_toks")).cast("long").as("n_terms"))
    if (requireAll)
      scored.filter(col("matched_terms") === col("n_terms") && col("n_terms") > 0)
    else scored.filter(col("matched_terms") > 0)
  }

  /** Phrase percolation: which saved queries occur in each document as
    * an exact CONSECUTIVE token sequence — the alerting shape for quoted
    * queries (term percolation fires on "hash ... join" anywhere;
    * this only on "hash join" adjacent). Row-local like
    * [[percolateRowwise]]: both sides normalize to a space-joined token
    * string with sentinel spaces, and the phrase test is one substring
    * probe per (doc, query) — space-delimited tokens make the token-
    * boundary guarantee exact, no positions table and no shuffle, so
    * the identical plan runs on a stream. Output `(key, query_id)`.
    */
  def percolatePhrases(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, queryIdCol: String = "query_id",
                       queryTextCol: String = "query",
                       analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    def joined(c: Column): Column =
      concat(lit(" "), array_join(analyzer.tokensCol(c), " "), lit(" "))
    val q = queries.select(col(queryIdCol).as("query_id"),
        joined(col(queryTextCol)).as("__q_norm"))
      // an empty phrase would match everything — drop it, same as a
      // no-token query matching nothing under requireAll percolation
      .filter(col("__q_norm") =!= "  ")
    docs
      .select(col(idCol).as("key"), joined(col(textCol)).as("__d_norm"))
      .crossJoin(broadcast(q))
      .filter(instr(col("__d_norm"), col("__q_norm")) > 0)
      .select(col("key"), col("query_id"))
  }

  def rrfFuse(lists: Seq[DataFrame], keyCol: String, k: Int,
              c: Int = DefaultRrfC): DataFrame = {
    require(lists.nonEmpty, "rrfFuse requires at least one ranked list")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), col(keyCol))
    val ranked = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(keyCol), col("score"))
        .withColumn("r", row_number().over(w))
        .select(col(keyCol), lit(i).as("li"),
          (lit(1.0) / (lit(c) + col("r"))).as("contrib"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col(keyCol)).agg(
        aggregate(sort_array(collect_list(struct(col("li"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("score"))
      .orderBy(desc("score"), col(keyCol))
      .limit(k)
  }

  /** Weighted score fusion with per-list MIN-MAX normalization — the
    * other standard hybrid besides [[rrfFuse]]: each page's scores
    * rescale to [0, 1] ((s - min)/(max - min); a constant page reads
    * 1.0 so its presence still votes), then fuse as a weighted sum with
    * absent entries contributing 0. Rank-free, so it preserves score
    * GAPS that RRF flattens — the right fusion when one retriever's
    * margins are meaningful. Same page-sized cost envelope as RRF
    * (k <= ~100-row inputs; the single-partition window is deliberate);
    * the per-key sum folds in list-index order (deterministic f64).
    */
  def fuseWeighted(lists: Seq[(DataFrame, Double)], keyCol: String,
                   k: Int): DataFrame = {
    require(lists.nonEmpty, "fuseWeighted requires at least one ranked list")
    require(lists.forall(_._2 >= 0), "list weights must be >= 0")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val parts = lists.zipWithIndex.map { case ((l, weight), i) =>
      val lo = min(col("score")).over(w)
      val hi = max(col("score")).over(w)
      l.select(col(keyCol), col("score"))
        .withColumn("n", when(hi === lo, lit(1.0))
          .otherwise((col("score") - lo) / (hi - lo)))
        .select(col(keyCol), lit(i).as("li"),
          (col("n") * weight).as("contrib"))
    }
    parts.reduce(_ unionByName _)
      .groupBy(col(keyCol)).agg(
        aggregate(sort_array(collect_list(struct(col("li"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("score"))
      .orderBy(desc("score"), col(keyCol))
      .limit(k)
  }

  /** All matching `(key, score)` BM25 rows for `queryTerms` — the
    * page-free form of [[bm25TopK]] for consumers that rank WITHIN
    * groups afterwards ([[facetTopK]]). Same scoring, no global cut.
    */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String],
                 idCol: String = "doc_id", textCol: String = "text",
                 k1: Double = DefaultK1, b: Double = DefaultB,
                 analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    val (postings, doclen, stats) = corpusTables(docs, idCol, textCol, analyzer)
    val qt = queryTerms.map(_.toLowerCase).distinct
    require(qt.nonEmpty, "bm25 requires at least one query term")
    val tf = postings.filter(col("tok").isin(qt: _*))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(doclen, "key")
      .crossJoin(broadcast(stats))
      .withColumn("c", bm25Contrib(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b))
      .groupBy(col("key")).agg(
        aggregate(sort_array(collect_list(struct(col("tok"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))
  }

  /** Diversified results: the top `kPerFacet` matches WITHIN each value
    * of `facetCol` — "best 2 per language", the grouped page every
    * search UI's diversity knob needs. Ranks the FULL match set (term-
    * pruned postings, the [[facets]] discipline) through the
    * bounded-state grouped top-k
    * ([[graft.operators.TopKPerGroup]] — a plain per-facet window
    * would sort a HOT facet's entire match set in one task); the
    * shuffle carries only per-partition survivors, never the match
    * set. Returns `(facet, key, score, rank)`.
    */
  def facetTopK(docs: DataFrame, queryTerms: Seq[String], facetCol: String,
                kPerFacet: Int, idCol: String = "doc_id",
                textCol: String = "text",
                analyzer: Analyzer = Analyzer.Whitespace): DataFrame = {
    require(kPerFacet >= 1, s"kPerFacet must be >= 1, got $kPerFacet")
    val scores = bm25Scores(docs, queryTerms, idCol, textCol,
      analyzer = analyzer)
    val joined = docs.select(col(idCol).as("key"), col(facetCol).as("facet"))
      .join(scores, Seq("key"))
    graft.operators.TopKPerGroup.topK(joined, Seq("facet"), "score",
        kPerFacet, tieCols = Seq("key"))
      .withColumn("rank", col("rank").cast("long"))
      .select(col("facet"), col("key"), col("score"), col("rank"))
      .orderBy(col("facet"), col("rank"))
  }
}
