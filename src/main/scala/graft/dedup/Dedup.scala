package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{StableHash, TextFunctions}

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the whole point at 100 TB):
  *  - exact dedup is one hash-partitioned `groupBy(fingerprint)` — the
  *    md5 key is uniform, so no skew; map-side partial aggregation halves
  *    the shuffle.
  *  - near-dup candidate generation NEVER compares all pairs: LSH bands
  *    (MinHash) / bit blocks (SimHash) / hyperplane buckets (embeddings)
  *    turn O(n²) into a bucket-grouped self-join where only same-bucket
  *    rows meet. Bucket keys are hashes — uniformly distributed — and
  *    pathological buckets (e.g. empty-text clones) can be capped with
  *    `maxBucket`.
  *  - verification (exact Jaccard / cosine) runs only on candidate pairs.
  */
object Dedup {

  // ---- exact ----------------------------------------------------------

  /** Groups of byte-identical (normalized) texts: fingerprint, group size,
    * representative (min) key. Pure Catalyst — oracle-checkable.
    */
  def exactDupGroups(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n"), min(col(keyCol)).as("min_key"))
      .filter(col("n") > 1)

  /** Keep the lowest-key row per distinct normalized text. Implemented as
    * min-key-per-group + semi-join rather than a row_number window: the
    * aggregate gets map-side combine and avoids materializing a sort per
    * group — measurably cheaper at scale, same result.
    */
  def dedupExact(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val keep = df
      .groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(keyCol)).as(keyCol))
      .select(keyCol)
    df.join(keep, Seq(keyCol), "left_semi")
  }

  // ---- MinHash + LSH --------------------------------------------------

  /** @param numHashes   signature length (k independent min-hashes)
    * @param bands       LSH bands; rows per band = numHashes / bands.
    *                    Candidate threshold ≈ (1/bands)^(rows/numHashes).
    * @param shingleSize word-shingle width
    * @param seed        hash-family seed
    */
  final case class MinHashParams(
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3, seed: Long = 42L) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  private[dedup] def shingleSet(text: String, n: Int): Set[String] = {
    val toks = Option(text).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) toks.toSet // short docs: unigram fallback keeps them comparable
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** MinHash signature of a text (k 64-bit min-hashes over word shingles). */
  /** Line-level exact dedup — repeated-passage removal at line
    * granularity (the C4/RefinedWeb/MassiveText cleaning step; Lee et
    * al. 2022 measure exactly this class of repetition hurting LMs): a
    * line that occurs verbatim anywhere else in the corpus survives
    * only at its FIRST occurrence in `(key, position)` order; later
    * occurrences drop, and each document's text is reassembled from its
    * surviving lines. Boilerplate (cookie banners, nav text, license
    * blocks) dies corpus-wide while unique content stays — the
    * intra-document complement of [[dedupExact]]'s whole-document pass.
    *
    * Lines shorter than `minLen` chars are kept in place
    * unconditionally (deduping blank/short lines would eat legitimate
    * structure — separators, list bullets).
    *
    * Scale shape: one posexplode (corpus-linear in lines), one
    * `groupBy(md5(line))` with a lexicographic `min(struct(key, pos))`
    * — map-side partial, the [[dedupExact]] keep-first discipline — one
    * equi-join back on `(fp, key, pos)`, and one per-document
    * reassembly (`sort_array(collect_list)` over that document's OWN
    * lines, bounded by document size — never a corpus window). A
    * mega-duplicated line is one hot fingerprint GROUP (count+min, no
    * collected bucket), so boilerplate skew cannot OOM an executor.
    *
    * Returns `(keyCol, clean_text, n_kept, n_dropped)` — one row per
    * input document (a fully-boilerplate doc comes back with an empty
    * `clean_text`, not a missing row: the caller decides whether empty
    * survivors get filtered, the operator never loses keys).
    */
  def lineDedup(df: DataFrame, textCol: String, keyCol: String,
                minLen: Int = 1): DataFrame = {
    val lines = df
      .select(col(keyCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("__fp", md5(col("line")))
    val dedupable = length(col("line")) >= minLen
    val first = lines.filter(dedupable)
      .groupBy(col("__fp"))
      .agg(min(struct(col(keyCol), col("pos"))).as("__first"))
      .select(col("__fp"), col("__first").getField(keyCol).as(keyCol),
        col("__first").getField("pos").as("pos"))
    val survivors = lines.filter(dedupable)
      .join(first, Seq("__fp", keyCol, "pos"), "left_semi")
      .unionByName(lines.filter(!dedupable))
    reassembleLines(lines, survivors, keyCol)
  }

  /** Line-FREQUENCY boilerplate removal (the RefinedWeb/CCNet rule next
    * to [[lineDedup]]'s C4 keep-first): every occurrence of a line that
    * appears in MORE than `maxDocs` distinct documents is dropped —
    * including the first. Keep-first preserves one copy of genuine
    * content that happens to repeat; the frequency rule targets
    * boilerplate (nav bars, cookie banners, footers), where the right
    * number of surviving copies is zero. Lines shorter than `minLen`
    * pass through untouched (blank separators are structure, not
    * boilerplate). Plan: one posexplode, a partial-agg'd distinct-doc
    * count per line hash (16-byte keys, uniform — no skew), an anti-join
    * of the over-threshold hash set, per-doc reassembly. No window, no
    * all-pairs; the over-threshold set is corpus-boilerplate-sized and
    * usually broadcastable, but the anti-join stays a plain join so a
    * pathological corpus (everything boilerplate) spills instead of
    * OOMing the driver.
    */
  def lineFrequencyFilter(df: DataFrame, textCol: String, keyCol: String,
                          maxDocs: Int, minLen: Int = 1): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val lines = df
      .select(col(keyCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("__fp", md5(col("line")))
    val filterable = length(col("line")) >= minLen
    val boiler = lines.filter(filterable)
      .groupBy(col("__fp"))
      .agg(countDistinct(col(keyCol)).as("__df"))
      .filter(col("__df") > maxDocs)
      .select(col("__fp"))
    val survivors = lines.filter(filterable)
      .join(boiler, Seq("__fp"), "left_anti")
      .unionByName(lines.filter(!filterable))
    reassembleLines(lines, survivors, keyCol)
  }

  /** Shared tail of the line-granular cleaners: rebuild each doc from
    * its surviving (pos, line) rows in original order and report
    * kept/dropped counts; docs whose every line died come back as empty
    * strings (the caller decides whether empties then drop). The fold is
    * per-doc `sort_array(collect_list)` — bounded by a single document's
    * line count, never corpus-scale state.
    */
  private def reassembleLines(lines: DataFrame, survivors: DataFrame,
                              keyCol: String): DataFrame = {
    val total = lines.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val reassembled = survivors
      .groupBy(col(keyCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    total
      .join(reassembled, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Cross-document repeated n-gram SPAN masking — boilerplate-passage
    * removal at WORD granularity, the finer-grained sibling of
    * [[lineFrequencyFilter]] for corpora whose boilerplate is not
    * line-structured (inline license sentences, navigation phrases,
    * templated disclaimers spliced mid-paragraph). Every word position
    * covered by ANY occurrence of a word n-gram that appears in more
    * than `maxDocs` distinct documents is masked out; each document is
    * reassembled from its surviving words (single-space separated —
    * whitespace is normalized by the tokenization, the q179/"normalized
    * text" discipline). Overlapping hot n-grams merge naturally: a
    * 9-word boilerplate sentence is covered by its five interior
    * 5-grams, so the whole sentence dies while the unique words
    * adjacent to the splice survive (their boundary n-grams mix
    * document-specific words and are not corpus-frequent).
    *
    * Scale shape: one n-gram explode (corpus-linear — `size - n + 1`
    * rows per doc, built from ONE split via array slicing, no w-times
    * blowup), a partial-agg'd distinct-doc count on 16-byte gram
    * hashes, a semi-join of the over-threshold gram set back onto the
    * occurrence rows (hot-gram postings only), a bounded n-times
    * position expansion of those hits, and a per-doc reassembly
    * (`sort_array(collect_list)` over that document's OWN words). No
    * window, no all-pairs; a mega-hot gram is one count GROUP, never a
    * collected bucket.
    *
    * Returns `(keyCol, clean_text, n_kept, n_dropped)` — one row per
    * input document (a fully-boilerplate doc comes back with empty
    * `clean_text`; a zero-word doc with `0, 0`).
    */
  /** Positioned word n-grams `(keyCol, start, __fp)` over the
    * single-space tokenization shared by [[ngramSpanMask]] and
    * [[ngramNovelty]] — one split per row, grams via array slicing (no
    * w-times explode blowup), 16-byte md5 identities. `words` must be
    * the `(keyCol, __words)` frame produced by the caller's split.
    */
  private def wordNgrams(words: DataFrame, keyCol: String, n: Int): DataFrame =
    words.select(col(keyCol),
      explode(when(size(col("__words")) >= n,
        transform(sequence(lit(0), size(col("__words")) - n),
          i => struct(i.as("start"),
            array_join(slice(col("__words"), i + 1, lit(n)), " ").as("gram"))))
        .otherwise(array().cast("array<struct<start:int,gram:string>>")))
        .as("g"))
      .select(col(keyCol), col("g.start").as("start"),
        md5(col("g.gram")).as("__fp"))

  /** The `(keyCol, __words)` split both word-granular cleaners share. */
  private def wordsOf(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.select(col(keyCol),
      filter(split(col(textCol), " "), w => w =!= "").as("__words"))

  def ngramSpanMask(df: DataFrame, textCol: String, keyCol: String,
                    n: Int, maxDocs: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val words = wordsOf(df, textCol, keyCol)
    val grams = wordNgrams(words, keyCol, n)
    val hot = grams.groupBy(col("__fp"))
      .agg(countDistinct(col(keyCol)).as("__df"))
      .filter(col("__df") > maxDocs)
      .select(col("__fp"))
    val masked = grams.join(hot, Seq("__fp"), "left_semi")
      .select(col(keyCol),
        explode(sequence(col("start"), col("start") + (n - 1))).as("pos"))
      .distinct()
    val wordRows = words.select(col(keyCol),
      posexplode(col("__words")).as(Seq("pos", "word")))
    val survivors = wordRows.join(masked, Seq(keyCol, "pos"), "left_anti")
    val total = words.select(col(keyCol),
      size(col("__words")).cast("long").as("__n"))
    val reassembled = survivors
      .groupBy(col(keyCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    total
      .join(reassembled, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Per-document n-gram NOVELTY — the fraction of a document's
    * distinct word n-grams whose corpus-wide FIRST occurrence (minimum
    * key) is this document. A curriculum/selection signal: late
    * near-copies score ~0, genuinely new material ~1, and ordering a
    * training mix by decreasing novelty is the cheap data-scheduling
    * heuristic that needs no model in the loop (the dedup-adjacent
    * complement of DSIR's distribution matching — novelty measures
    * WITHIN-corpus redundancy against ingestion order).
    *
    * Returns `(keyCol, n_grams, n_novel, novelty)` — one row per
    * document with at least one n-gram (novelty = n_novel / n_grams,
    * rounded to 6); documents shorter than `n` words have no grams and
    * no row.
    *
    * Scale shape: one gram pass ([[wordNgrams]]), a distinct on
    * `(key, fp)`, a partial-agg'd `min(key)` per 16-byte fp, one
    * fp-keyed equi-join back, one per-doc aggregate. No window (a
    * first-occurrence window over the corpus would single-task on hot
    * grams); the min-owner join is the [[lineDedup]] keep-first
    * discipline at gram granularity.
    */
  def ngramNovelty(df: DataFrame, textCol: String, keyCol: String,
                   n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = wordNgrams(wordsOf(df, textCol, keyCol), keyCol, n)
      .select(col(keyCol), col("__fp")).distinct()
    val owner = grams.groupBy(col("__fp"))
      .agg(min(col(keyCol)).as("__owner"))
    grams.join(owner, Seq("__fp"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__owner") === col(keyCol), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(keyCol), col("n_grams"), col("n_novel"),
        round(col("n_novel") / col("n_grams"), 6).as("novelty"))
  }

  /** Distinct word n-gram fingerprints `(keyCol, fp)` — the persistable
    * complement of [[ngramNovelty]]: store these once for the corpus,
    * then score incoming batches with [[ngramNoveltyAgainst]] without
    * re-reading the corpus.
    */
  def ngramFingerprints(df: DataFrame, textCol: String, keyCol: String,
                        n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    wordNgrams(wordsOf(df, textCol, keyCol), keyCol, n)
      .select(col(keyCol), col("__fp").as("fp")).distinct()
  }

  /** Incremental novelty — [[ngramNovelty]]'s batch-vs-store form (the
    * [[hammingNearDupsAgainst]] pattern): each batch document scored by
    * the fraction of its distinct n-grams that are new against BOTH the
    * stored corpus fingerprints (`storedFps`, one `fp` column — produce
    * with [[ngramFingerprints]]) and earlier batch documents (min-key
    * owner within the batch), so intra-batch copies score 0 exactly as
    * they would have in a full recompute. Cost is O(batch grams): one
    * anti-join against the store (fp-keyed equi-join) + the batch-local
    * owner join — never a corpus re-read.
    */
  def ngramNoveltyAgainst(batch: DataFrame, textCol: String, keyCol: String,
                          n: Int, storedFps: DataFrame): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = wordNgrams(wordsOf(batch, textCol, keyCol), keyCol, n)
      .select(col(keyCol), col("__fp")).distinct()
    val fresh = grams.join(
      storedFps.select(col("fp").as("__fp")).distinct(), Seq("__fp"),
      "left_anti")
    val owner = fresh.groupBy(col("__fp"))
      .agg(min(col(keyCol)).as("__owner"))
    val novelCounts = fresh.join(owner, Seq("__fp"))
      .filter(col("__owner") === col(keyCol))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_novel"))
    grams.groupBy(col(keyCol)).agg(count(lit(1)).as("n_grams"))
      .join(novelCounts, Seq(keyCol), "left")
      .na.fill(0L, Seq("n_novel"))
      .select(col(keyCol), col("n_grams"), col("n_novel"),
        round(col("n_novel") / col("n_grams"), 6).as("novelty"))
  }

  def minhashSignature(text: String, p: MinHashParams): Array[Long] = {
    val shingles = shingleSet(text, p.shingleSize).map(StableHash.fnv64)
    Array.tabulate(p.numHashes) { i =>
      if (shingles.isEmpty) StableHash.family(0L, i, p.seed)
      else shingles.iterator.map(StableHash.family(_, i, p.seed)).min
    }
  }

  /** Exact word-shingle Jaccard similarity of two texts. NOTE the
    * deliberate divergence from [[jaccardCol]] on the both-empty case:
    * this scalar returns 1.0 (two blank docs are identical), while the
    * column twin yields SQL's 0/0 = null so blank pairs drop out of
    * `>=` filters exactly like the DuckDB oracle's — blank-vs-blank
    * identity is the exact-dedup pass's job, not the similarity join's.
    */
  def jaccard(a: String, b: String, shingleSize: Int): Double = {
    val sa = shingleSet(a, shingleSize)
    val sb = shingleSet(b, shingleSize)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else if (sa.isEmpty || sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  /** Per-band LSH hashes of one text (band index = position) — the scalar
    * shared by [[minhashBands]] and the streaming twin
    * ([[graft.streaming.Streams.nearDedupStream]]) so batch and stream
    * can never band differently.
    */
  def bandHashes(text: String, p: MinHashParams): Seq[Long] = {
    val sig = minhashSignature(text, p)
    (0 until p.bands).map { b =>
      val slice = sig.slice(b * p.rowsPerBand, (b + 1) * p.rowsPerBand)
      slice.foldLeft(StableHash.mix64(b.toLong))((acc, v) => StableHash.mix64(acc ^ v))
    }
  }

  /** `(key, band, band_hash)` — one row per band per document; equal
    * `(band, band_hash)` means the band's signature slice matched exactly.
    */
  def minhashBands(df: DataFrame, textCol: String, keyCol: String,
                   p: MinHashParams): DataFrame = {
    // NOT spread here: the Catalog's persistent band/fps sidecars rely
    // on appends staying key-clustered (footer-range pruning), so the
    // index paths must keep the input's partitioning; the aggregation-
    // bound candidate/verify paths spread at their call sites instead
    val bandsUdf = udf((text: String) => bandHashes(text, p))
    df.select(col(keyCol), posexplode(bandsUdf(col(textCol))).as(Seq("band", "band_hash")))
  }

  /** Candidate pairs (a < b) sharing at least one LSH band bucket.
    * `maxBucket` drops degenerate buckets (identical boilerplate exploding
    * quadratically) — the standard skew guard; dropped buckets are exact
    * dups anyway, which [[dedupExact]] already handles.
    *
    * Plan shape (measured; see the spec's plan assertions): the bands
    * table is computed ONCE (the per-document minhash UDF is the
    * expensive part) and shuffled ONCE into its buckets; each bucket's
    * keys are collected and pairs emitted directly by a generator. No
    * self-join at all — a join formulation evaluates the minhash UDF once
    * per join side and shuffles the bands table per side, measured ~2x
    * slower end-to-end. The per-bucket key array is safe to materialize
    * ONLY because `maxBucket` bounds it; the join form remains the right
    * shape for uncapped bucketings (see [[simhashNearDups]]).
    */
  def minhashCandidates(df: DataFrame, textCol: String, keyCol: String,
                        p: MinHashParams = MinHashParams(),
                        maxBucket: Int = 1000): DataFrame = {
    // spread before the signature UDF (numHashes x shingle hashes per
    // row — the expensive stage): a one-split input would compute every
    // signature on one core; a no-op at real split counts, and safe
    // here because everything downstream is aggregation
    val bands = minhashBands(graft.operators.Layout.spreadForCompute(
      df.select(col(keyCol), col(textCol))), textCol, keyCol, p)
    val pairsUdf = udf { (keys: Seq[Long]) =>
      val s = keys.sorted
      for { i <- s.indices; j <- (i + 1) until s.length } yield (s(i), s(j))
    }
    bands.groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col(keyCol)).as("keys"))
      .filter(size(col("keys")) > 1 && size(col("keys")) <= maxBucket)
      .select(explode(pairsUdf(col("keys"))).as("pair"))
      .select(col("pair._1").as("key_a"), col("pair._2").as("key_b"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with exact shingle
    * Jaccard >= `threshold`. Returns `(key_a, key_b, jaccard)`.
    */
  def minhashNearDups(df: DataFrame, textCol: String, keyCol: String,
                      threshold: Double = 0.8,
                      p: MinHashParams = MinHashParams()): DataFrame = {
    val cand = minhashCandidates(df, textCol, keyCol, p)
    // shingleArray re-hashes the text per verification side; spread it
    // like the band pass (one-split inputs would run it on one core)
    val sh = graft.operators.Layout.spreadForCompute(
        df.select(col(keyCol), col(textCol)))
      .select(col(keyCol),
        shingleArray(col(textCol), p.shingleSize).as("sh"))
    cand
      .join(sh.withColumnRenamed(keyCol, "key_a").withColumnRenamed("sh", "sh_a"), "key_a")
      .join(sh.withColumnRenamed(keyCol, "key_b").withColumnRenamed("sh", "sh_b"), "key_b")
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Incremental near-dedup: near-dup pairs BETWEEN a new batch and an
    * existing corpus — "dedup tonight's crawl against the archive", the
    * shape an append-only training pipeline actually runs (re-pairing the
    * whole corpus per batch would be O(corpus) every night; this is
    * O(batch) plus a band join).
    *
    * The corpus side's bands are exactly [[minhashBands]] output, so in
    * production they are computed once, stored next to the data, and only
    * the batch side hashes text per run — pass them via `corpusBands`.
    * The band join is an equi-join on (band, band_hash); `maxBucket`
    * drops degenerate corpus buckets (boilerplate that would explode the
    * candidate set — those are exact dups, [[dedupExact]] territory).
    * Candidates carry keys only; texts rejoin for the exact-Jaccard
    * verify. Returns `(corpus_key, new_key, jaccard)`.
    */
  def incrementalNearDups(newDf: DataFrame, corpusDf: DataFrame,
                          textCol: String, keyCol: String,
                          threshold: Double = 0.8,
                          p: MinHashParams = MinHashParams(),
                          maxBucket: Int = 1000): DataFrame = {
    val corpusBands = minhashBands(corpusDf, textCol, keyCol, p)
    incrementalNearDupsFromBands(newDf, corpusBands, corpusDf, textCol,
      keyCol, threshold, p, maxBucket)
  }

  def incrementalNearDupsFromBands(newDf: DataFrame, corpusBands: DataFrame,
                                   corpusDf: DataFrame,
                                   textCol: String, keyCol: String,
                                   threshold: Double, p: MinHashParams,
                                   maxBucket: Int): DataFrame = {
    val newBands = minhashBands(newDf, textCol, keyCol, p)
      .withColumnRenamed(keyCol, "new_key")
    // ONE pass over the corpus bands (the per-document minhash UDF is
    // the expensive part — a separate bucket-count aggregate would
    // evaluate it over the whole corpus a second time, Catalyst does
    // not CSE across join inputs): aggregate each bucket's corpus keys,
    // cap degenerate buckets by the aggregated size, and explode
    // against the matching batch-side bands. Same collect_list shape as
    // minhashCandidates — safe ONLY because maxBucket bounds the array.
    val corpusBuckets = corpusBands
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col(keyCol)).as("ckeys"))
      .filter(size(col("ckeys")) <= maxBucket)
    val cand = corpusBuckets
      .join(newBands, Seq("band", "band_hash"))
      .select(explode(col("ckeys")).as("corpus_key"), col("new_key"))
      .distinct()
    val shC = corpusDf.select(col(keyCol).as("corpus_key"),
      shingleArray(col(textCol), p.shingleSize).as("sh_a"))
    val shN = newDf.select(col(keyCol).as("new_key"),
      shingleArray(col(textCol), p.shingleSize).as("sh_b"))
    cand.join(shC, "corpus_key").join(shN, "new_key")
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_key"), col("new_key"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- n-gram Jaccard (exact) -----------------------------------------

  /** Distinct lowercase word-`n`-gram shingle set as an array column —
    * the column twin of [[shingleSet]] (same unigram fallback for short
    * docs).
    *
    * Deliberately a compact Scala UDF, not the equivalent
    * `transform(sequence(...), slice...)` Catalyst composition: that form
    * expands to a ~40-node tree that the optimizer duplicates into every
    * join side/projection, and janino spends multiple seconds compiling
    * it — measured slower end-to-end than the one-call UDF by 5-10x on
    * the similarity-join queries. (Element order is unspecified; all
    * consumers are set operations.)
    */
  def shingleArray(text: Column, n: Int): Column = {
    val f = udf((s: String) => shingleSet(s, n).toSeq)
    f(text)
  }

  /** Jaccard of two distinct-element array columns via codegen'd
    * `array_intersect`/`array_union` (both-empty pairs yield null and drop
    * out of >= filters, matching SQL semantics).
    */
  def jaccardCol(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact n-gram Jaccard pairs >= `threshold` — the non-probabilistic
    * cross-check for MinHash, via an '''inverted-index join''':
    * explode each document's distinct shingles, equi-join on the shingle,
    * count co-occurrences per pair (= |A ∩ B|), then
    * `jaccard = inter / (|A| + |B| - inter)`.
    *
    * Pairs sharing zero shingles never materialize, so the cost is driven
    * by shingle co-occurrence, not n² — and everything is equi-join +
    * partial-agg, the shapes that scale. (A broadcast nested-loop
    * formulation was 100x slower: BNLJ evaluates its condition interpreted
    * on every combination.) `blockCol` optionally adds a blocking key to
    * the join for further pruning. Skew guard: a shingle occurring in k
    * docs contributes k² join rows; `maxShingleDf` drops shingles with
    * document frequency above it (boilerplate n-grams) — `None` keeps the
    * result exact.
    *
    * The exact (`maxShingleDf = None`) form is Σdf²-cost by construction
    * and exists for verification fixtures and the oracle gate; it REFUSES
    * inputs above `maxExactRows` (limit-bounded probe, same guard shape
    * as q29's all-pairs twin — the scan stops at the threshold instead of
    * counting the table) so a user cannot point it at a real corpus by
    * accident. At scale: pass `maxShingleDf` (drops only boilerplate
    * shingles that exact dedup already owns) or use [[minhashNearDups]].
    * The guard also protects the q62/q68 compositions built on this pair
    * source.
    */
  /** Inputs that already passed the exact-mode size probe, keyed by
    * canonicalized-plan semantic hash: compositions that call
    * [[ngramJaccardPairs]] repeatedly on the same input (q62/q68/q107
    * chains, bench loops) pay the bounded scan once per plan, not once
    * per call. The guard is advisory (catch "pointed the verification
    * twin at a corpus"), so the one staleness window — the same plan
    * re-read after its underlying files grew past the bound — weakens an
    * error message, never an answer. Bounded; cleared wholesale on
    * overflow.
    */
  private val exactProbePassed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()

  def ngramJaccardPairs(df: DataFrame, textCol: String, keyCol: String,
                        blockCol: Option[String], threshold: Double,
                        shingleSize: Int = 3,
                        maxShingleDf: Option[Int] = None,
                        maxExactRows: Int = 100000): DataFrame = {
    if (maxShingleDf.isEmpty) {
      val planKey = (df.queryExecution.analyzed.semanticHash(), maxExactRows)
      if (!exactProbePassed.contains(planKey)) {
        val n = df.limit(maxExactRows + 1).count()
        require(n <= maxExactRows,
          s"ngramJaccardPairs without maxShingleDf is an all-pairs-cost " +
            s"verification twin (at least $n rows > $maxExactRows); use " +
            "minhashNearDups or set maxShingleDf at scale")
        if (exactProbePassed.size > 1024) exactProbePassed.clear()
        exactProbePassed.add(planKey)
      }
    }
    val blockCols = blockCol.toSeq.map(col)
    // shingles are joined on their 64-bit stable hash, not the string:
    // halves the shuffle payload and turns the join compare into a long
    // equality. FNV-64 collisions across a corpus's distinct shingles are
    // ~(n_distinct)^2 / 2^65 — vanishing, and a collision only perturbs one
    // intersection count by 1.
    val hashedShingles = udf { (s: String) =>
      shingleSet(s, shingleSize).toArray.map(StableHash.fnv64)
    }
    // spread the narrow (key, text) projection before the shingle UDF:
    // a one-split fixture input would otherwise hash on a single core
    // (both join sides pay the UDF; parallel beats serial-twice)
    val src = graft.operators.Layout.spreadForCompute(
      df.select(col(keyCol) +: col(textCol) +: blockCols: _*))
    val sized = src.select(
      col(keyCol) +: hashedShingles(col(textCol)).as("sh") +: blockCols: _*)
      .withColumn("n_sh", size(col("sh")))
    val exploded0 = sized.select(
      col(keyCol) +: col("n_sh") +: explode(col("sh")).as("shingle") +: blockCols: _*)
    val exploded = maxShingleDf match {
      case Some(cap) =>
        val rare = exploded0.groupBy(col("shingle").as("sh_key"))
          .agg(count(lit(1)).as("df_count")).filter(col("df_count") <= cap)
          .select(col("sh_key"))
        exploded0.join(rare, exploded0("shingle") === rare("sh_key"), "left_semi")
      case None => exploded0
    }
    val joinCond = col("a.shingle") === col("b.shingle") &&
      col(s"a.$keyCol") < col(s"b.$keyCol") &&
      blockCol.map(b => col(s"a.$b") === col(s"b.$b")).getOrElse(lit(true))
    // Join strategy is pinned, not left to the planner: size estimation
    // under an exploded-UDF column is garbage, and the planner's pick
    // here was a BROADCAST of the entire exploded posting table — a
    // single-threaded driver collect + build (measured ~35% of q26).
    //   exact mode (row-guarded <= maxExactRows): postings are bounded,
    //   so materialize them ONCE (the self-join's sides get no
    //   ReusedExchange under AQE, so the scan + shingle UDF + explode
    //   chain would run per side) and shuffled-hash join — per-partition
    //   parallel builds over a few MB of longs.
    //   capped scale mode (maxShingleDf): postings are corpus-linear —
    //   never materialized; SORT-MERGE pinned so a mis-estimated
    //   broadcast can never melt the driver at 10^10 rows, and spills
    //   stay graceful (AQE skew-split applies either way).
    val (exA, exB) =
      if (maxShingleDf.isEmpty) {
        val ex = exploded.localCheckpoint(true)
        (ex, ex.hint("shuffle_hash"))
      } else (exploded, exploded.hint("merge"))
    exA.as("a").join(exB.as("b"), joinCond)
      .groupBy(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash over word unigrams: per-token hash, bitwise vote,
    * sign -> bit. Hamming distance approximates cosine over the token
    * multiset.
    *
    * The per-token hash is the first 8 bytes (big-endian) of
    * `md5("<seed>|<token>")` — deliberately, because md5 is bit-identical
    * in DuckDB, which makes the whole simhash pipeline SQL-expressible and
    * lets the driver oracle hash-match `q28_simhash_neardups` instead of a
    * rows-only check.
    */
  def simhash64(text: String, seed: Long = 42L): Long = {
    val toks = Option(text).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return 0L
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefix = seed.toString + "|"
    toks.foreach { t =>
      md.reset()
      val d = md.digest((prefix + t).getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1; j += 1 }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def simhashUdf(seed: Long = 42L): Column => Column = {
    val f = udf((s: String) => simhash64(s, seed))
    c => f(c)
  }

  /** Near-dup pairs by SimHash: block on 16-bit quarters (a pair within
    * Hamming distance 3 must agree exactly on at least one of 4 blocks —
    * pigeonhole), verify `Long.bitCount(xor) <= maxHamming` on candidates.
    *
    * Same grouped-bucket generation as [[minhashCandidates]]: the simhash
    * table is computed once, shuffled once into its (block, block_val)
    * buckets, and verified pairs are emitted straight from each bucket's
    * collected (key, simhash) list — the Hamming filter runs INSIDE the
    * generator, so the pair-dedup shuffle carries only survivors, not
    * every same-bucket pair. `maxBucket` bounds the collected array (and
    * tames a hot block value, e.g. a popular all-zero quarter); a
    * capped-out bucket can only lose a pair that shares no other
    * under-cap block, so the default is deliberately high.
    */
  def simhashNearDups(df: DataFrame, textCol: String, keyCol: String,
                      maxHamming: Int = 3, seed: Long = 42L,
                      maxBucket: Int = 100000): DataFrame =
    hammingNearDups(
      df.select(col(keyCol), simhashUdf(seed)(col(textCol)).as("simhash")),
      keyCol, "simhash", maxHamming, maxBucket)

  /** Buckets at or below this member count pair inside the generator
    * UDF (<= ~12 MB of materialized pair structs per task); bigger ones
    * route through the streaming self-join below. The round-11 heap
    * probe put the suite's OOM cliff exactly here: a planted dup group
    * collapses thousands of identical sketches into ONE bucket, and the
    * UDF materialized that bucket's ENTIRE quadratic pair output as a
    * single in-heap Seq (hundreds of MB x 32 concurrent tasks).
    */
  private val UdfBucketMax = 1024

  /** Near-dup pairs over any precomputed 64-bit sketch column (SimHash,
    * image perceptual hash, binary sign sketch word): 16-bit block
    * equality generates candidates (pigeonhole-EXACT for Hamming <=
    * 3 — a pair within distance 3 differs in at most 3 of 4 blocks, so
    * at least one block matches), `bit_count(xor)` verifies. The shared
    * tail of every Hamming-sketch dedup family member.
    *
    * Memory shape: buckets <= [[UdfBucketMax]] pair in the collected-
    * list UDF (one shuffle, survivors only); DEGENERATE buckets (a hot
    * block value — planted dup groups, all-zero quarters) instead
    * self-join on their (block, block_val), where candidate pairs
    * STREAM through the codegen'd bit_count filter without ever
    * materializing a bucket's quadratic output in heap. Identical
    * pairs either way (both emit key_a < key_b, Hamming-verified).
    *
    * CANONICAL emission (round 11): a near-identical pair agrees on
    * several blocks — up to all 4 in a planted dup group — and emitting
    * it from every agreeing bucket then `distinct()`-ing shuffled ~4x
    * the surviving pair volume (measured: the bulk of the q178 video
    * gate). Each pair is now emitted ONLY from its FIRST agreeing
    * block, which makes emissions globally unique and drops the
    * distinct exchange outright. Trade (documented, was previously
    * "any surviving bucket finds the pair"): a pair whose first
    * agreeing bucket is dropped by `maxBucket` is no longer rescued by
    * a later agreeing block — acceptable because an over-`maxBucket`
    * bucket means >100k mutually-near sketches, which is exact-dup /
    * degenerate territory the caps exist to refuse, and the default is
    * deliberately far above any real bucket.
    *
    * VALUE-COLLAPSED enumeration (round 12): within each kept bucket,
    * the pair scan runs over DISTINCT sketch values, not rows —
    * qualifying value pairs then expand to their key pairs, which is
    * output-sized work. Near-dup mass is exactly what inflates a
    * bucket's row count while its value count stays small (a planted
    * dup group is ONE value with thousands of members; q178's worst
    * bucket held all 20k sketches but ~2k values — the row-quadratic
    * self-join streamed 400M candidates where the value scan does
    * ~4M), so the quadratic term now scales with distinct values.
    * Bucket membership, the `maxBucket` filter and the small/big
    * routing all stay ROW-counted — the emitted pair set is identical
    * for every input (spec'd against the round-11 row-pair form).
    */
  def hammingNearDups(sketches: DataFrame, keyCol: String,
                      sketchCol: String, maxHamming: Int = 3,
                      maxBucket: Int = 100000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-block pigeonhole is exact only for maxHamming <= 3, got $maxHamming")
    val sim = sketches.select(col(keyCol), col(sketchCol).as("simhash"))
    val blocks = sim.select(col(keyCol), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block", "block_val")))
    // first block (0..3) on which the two sketches agree — the pair's
    // unique canonical emission slot
    def firstAgree(xor: Long): Int = {
      var i = 0
      while (i < 4 && ((xor >>> (i * 16)) & 0xFFFFL) != 0L) i += 1
      i // 4 = "none" (cannot happen for emitted pairs: bucket equality)
    }
    val pairsUdf = udf { (block: Int, rows: Seq[Row]) =>
      // collapse the bucket to distinct values -> sorted member keys
      val byVal = new scala.collection.mutable.HashMap[
        Long, scala.collection.mutable.ArrayBuffer[Long]]()
      rows.foreach { r =>
        byVal.getOrElseUpdate(r.getLong(1),
          new scala.collection.mutable.ArrayBuffer[Long]()) += r.getLong(0)
      }
      val values = byVal.keysIterator.toArray
      java.util.Arrays.sort(values)
      val keysOf = values.map { v =>
        val ks = byVal(v).toArray; java.util.Arrays.sort(ks); ks
      }
      val out = Seq.newBuilder[(Long, Long, Long)]
      var i = 0
      while (i < values.length) {
        val ki = keysOf(i)
        // identical-value pairs: xor = 0, firstAgree = 0 — the block-0
        // bucket owns the diagonal
        if (block == 0 && ki.length > 1) {
          var a = 0
          while (a < ki.length) {
            var b = a + 1
            while (b < ki.length) { out += ((ki(a), ki(b), 0L)); b += 1 }
            a += 1
          }
        }
        var j = i + 1
        while (j < values.length) {
          val x = values(i) ^ values(j)
          val h = java.lang.Long.bitCount(x)
          if (h <= maxHamming && firstAgree(x) == block) {
            val kj = keysOf(j)
            var a = 0
            while (a < ki.length) {
              var b = 0
              while (b < kj.length) {
                val p = ki(a); val q = kj(b)
                out += (if (p < q) (p, q, h.toLong) else (q, p, h.toLong))
                b += 1
              }
              a += 1
            }
          }
          j += 1
        }
        i += 1
      }
      out.result()
    }
    val grouped = blocks.groupBy(col("block"), col("block_val"))
      .agg(collect_list(struct(col(keyCol), col("simhash"))).as("members"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1 && col("__n") <= maxBucket)
    val small = grouped.filter(col("__n") <= UdfBucketMax)
      .select(explode(pairsUdf(col("block"), col("members"))).as("p"))
      .select(col("p._1").as("key_a"), col("p._2").as("key_b"),
        col("p._3").as("hamming"))
    // a handful of degenerate (block, block_val) buckets: re-explode the
    // ALREADY-collected members (the big path shares the small path's
    // aggregation exchange — ReusedExchange, no source rescan or
    // re-hash), collapse each bucket to its distinct values, and run
    // the value-pair join; qualifying value pairs explode to key pairs
    // AFTER the Hamming/canonical filters, so the streamed join is
    // value-quadratic and the expansion is output-sized
    val bigVals = grouped.filter(col("__n") > UdfBucketMax)
      .select(col("block"), col("block_val"), explode(col("members")).as("m"))
      .select(col("block"), col("block_val"),
        col("m").getField(keyCol).as("__k"),
        col("m").getField("simhash").as("__h"))
      .groupBy(col("block"), col("block_val"), col("__h"))
      .agg(collect_list(col("__k")).as("__ks"))
    // canonical-slot filter, codegen form: CASE over the xor's blocks
    // picks the first agreeing index, matched against this bucket's
    // block — the exact twin of the UDF's firstAgree
    def firstAgreeCol(xor: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 4).foldRight(lit(4): org.apache.spark.sql.Column) { (i, rest) =>
        when(shiftright(xor, i * 16).bitwiseAND(lit(0xFFFFL)) === 0L, lit(i))
          .otherwise(rest)
      }
    // ONE value join covers cross-value pairs AND the identical-value
    // diagonal (`__ha <= __hb`): an equal-value row has xor = 0, so the
    // canonical filter admits it only in its block-0 bucket, and the
    // post-expansion `__ka < __kb` guard keeps each same-value key pair
    // once (cross-value combos all survive it via least/greatest).
    // Same-value keys stream through the join — never a materialized
    // C(m,2) list.
    // join strategy pinned (the q26 lesson): size estimates under the
    // collected-members subtree are garbage and the planner's pick here
    // was a BROADCAST of the whole (value, keys[]) table — bounded per
    // bucket but not in bucket COUNT, so a degenerate corpus could melt
    // the driver; sort-merge spills gracefully and AQE skew-split still
    // applies.
    val big = bigVals.select(col("block"), col("block_val"),
        col("__h").as("__ha"), col("__ks").as("__ksa"))
      .join(bigVals.select(col("block"), col("block_val"),
          col("__h").as("__hb"), col("__ks").as("__ksb")).hint("merge"),
        Seq("block", "block_val"))
      .filter(col("__ha") <= col("__hb"))
      .withColumn("__x", col("__ha").bitwiseXOR(col("__hb")))
      .withColumn("__hm", bitCountCol(col("__x")))
      .filter(col("__hm") <= maxHamming &&
        firstAgreeCol(col("__x")) === col("block"))
      .select(col("__ha"), col("__hb"), col("__hm"),
        explode(col("__ksa")).as("__ka"), col("__ksb"))
      .select(col("__ha"), col("__hb"), col("__hm"), col("__ka"),
        explode(col("__ksb")).as("__kb"))
      .filter(col("__ha") < col("__hb") || col("__ka") < col("__kb"))
      .select(least(col("__ka"), col("__kb")).as("key_a"),
        greatest(col("__ka"), col("__kb")).as("key_b"),
        col("__hm").as("hamming"))
    // canonical emission makes pair rows globally unique — no distinct
    small.unionByName(big)
  }

  /** Incremental form of [[hammingNearDups]] — the nightly-batch /
    * stream-trigger shape: each BATCH row is checked against the stored
    * corpus sketches AND the rest of its batch without ever re-pairing
    * corpus x corpus. Returns `(key, match_key, hamming)` — one row per
    * (batch row, near neighbor) with keys distinct; batch-batch matches
    * appear in both directions (each batch row reports its own
    * neighbors), corpus rows only ever appear as `match_key`. Cost is
    * O(batch blocks x matching corpus blocks) — an equi-join on 16-bit
    * block values that spills rather than collecting buckets, the
    * documented trade for the uncapped side ([[embeddingNearDups]]'s
    * join-form note). Callers persist `(key, sketch)` beside the data
    * (the dedup-band-index discipline) and append the batch's sketches
    * after the check.
    */
  def hammingNearDupsAgainst(corpus: DataFrame, batch: DataFrame,
                             keyCol: String, sketchCol: String,
                             maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-block pigeonhole is exact only for maxHamming <= 3, got $maxHamming")
    def blocksOf(df: DataFrame) = df
      .select(col(keyCol).as("k"), col(sketchCol).as("h"))
      .select(col("k"), col("h"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("h"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("block", "block_val")))
    val bb = blocksOf(batch)
    val all = blocksOf(corpus).unionByName(bb)
    bb.as("b").join(all.as("c"),
        col("b.block") === col("c.block") &&
        col("b.block_val") === col("c.block_val") &&
        col("b.k") =!= col("c.k"))
      .select(col("b.k").as("key"), col("c.k").as("match_key"),
        bitCountCol(col("b.h").bitwiseXOR(col("c.h"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** `bit_count` as a Column (codegen'd). */
  private def bitCountCol(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.bit_count(c).cast("long")

  // ---- decontamination -------------------------------------------------

  /** Benchmark decontamination: find corpus documents containing any of
    * the `probes` as a token-aligned phrase — the standard n-gram overlap
    * check run before training to drop eval-set leakage.
    *
    * Scale shape: each probe contributes ONE shingle (its own n tokens,
    * hashed); documents explode to their n-token shingle hashes and
    * equi-join the (broadcast, tiny) probe set — cost is corpus-linear,
    * never corpus × probes. A document matching k probes reports k.
    * Returns `(key, n_hits)` for contaminated docs only.
    */
  def contaminatedDocs(df: DataFrame, textCol: String, keyCol: String,
                       probes: Seq[String]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe phrase")
    val n = probes.head.trim.split("\\s+").length
    require(probes.forall(_.trim.split("\\s+").length == n),
      "all probes must have the same token count")
    val probeHashes = probes.map(p =>
      StableHash.fnv64(p.trim.toLowerCase.split("\\s+").mkString(" ")))
    val spark = df.sparkSession
    import spark.implicits._
    // distinct probe shingles per doc: one doc matching one probe twice
    // counts once per probe (set semantics, like the SQL contains check)
    val docShingles = udf { (text: String) =>
      val toks = Option(text).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Array.empty[Long]
      else toks.sliding(n).map(w => StableHash.fnv64(w.mkString(" "))).toArray.distinct
    }
    val probeDf = probeHashes.toDF("probe_hash").distinct()
    graft.operators.Layout.spreadForCompute(
        df.select(col(keyCol), col(textCol)))
      .select(col(keyCol), explode(docShingles(col(textCol))).as("probe_hash"))
      .join(broadcast(probeDf), "probe_hash")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_hits"))
  }

  // ---- embedding near-dup ---------------------------------------------

  /** Near-dup pairs by embedding cosine >= `threshold`, found via
    * multi-table random-hyperplane LSH: `tables` independent sign-hash
    * tables of `bits` bits each; a pair is a candidate when it collides in
    * ANY table (OR-amplification), then exact cosine verifies.
    *
    * Recall per pair at angle θ is `1 - (1 - p^bits)^tables` with
    * `p = 1 - θ/π`; defaults give ~0.99+ for cosine >= 0.9 — the
    * near-duplicate regime this operator targets. Near-orthogonal
    * thresholds are a different problem: at cosine ≈ 0.5, p ≈ 0.67, so
    * the defaults recall ~50% (measured: 7 of the 14 exact pairs at
    * sf0.1) and driving recall to 0.999 would take ~70 tables — at that
    * point run the exact twin (`q29_cosine_pairs`) on a sample instead.
    * The exact twin is always the ground truth for grading.
    */
  /** `bits = 0` sizes the LSH tables to the corpus: bucket count 2^bits
    * grows with n so EXPECTED OCCUPANCY stays constant (~32 vectors),
    * keeping candidate pairs linear in n — a FIXED bit width turns the
    * within-bucket pair join quadratic exactly like a fixed IVF list
    * count (measured: bits=6 at 10x data ran 12.9x — bucket occupancy
    * grew 10x, pairs 100x). The fixture queries pin an explicit width
    * so their oracles stay closed-form; scale callers take the auto.
    */
  def autoBits(n: Long): Int =
    math.min(24, math.max(4,
      math.ceil(math.log(math.max(1.0, n / 32.0)) / math.log(2.0)).toInt))

  def embeddingNearDups(embDf: DataFrame, keyCol: String, embCol: String,
                        threshold: Double, bits: Int = 4, tables: Int = 8,
                        seed: Long = 42L): DataFrame = {
    val spark = embDf.sparkSession
    if (embDf.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key_a",
            embDf.schema(keyCol).dataType),
          org.apache.spark.sql.types.StructField("key_b",
            embDf.schema(keyCol).dataType),
          org.apache.spark.sql.types.StructField("cosine",
            org.apache.spark.sql.types.DoubleType))))
    val dim = embDf.select(size(col(embCol))).head().getInt(0)
    val nBits = if (bits > 0) bits else autoBits(embDf.count())
    val allPlanes = (0 until tables).map(t =>
      graft.search.Ann.hyperplanes(dim, nBits, seed + 1000L * t))
    val bucketUdf = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      allPlanes.zipWithIndex.map { case (planes, t) =>
        // table id in the high bits so buckets of different tables never join
        (t.toLong << 32) | graft.search.Ann.bucketOf(arr, planes).toLong
      }
    }
    // Candidate generation and dedup carry ONLY (key, bucket) — the
    // distinct's shuffle moves two longs per candidate, not 2×dim floats.
    // Vectors are joined back afterwards for the (much smaller) verified
    // candidate set.
    val bucketed = embDf
      .select(col(keyCol), explode(bucketUdf(col(embCol))).as("bucket"))
    val candidates = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"))
      .distinct()
    val vecs = embDf.select(col(keyCol), col(embCol))
    candidates
      .join(vecs.withColumnRenamed(keyCol, "key_a").withColumnRenamed(embCol, "emb_a"), "key_a")
      .join(vecs.withColumnRenamed(keyCol, "key_b").withColumnRenamed(embCol, "emb_b"), "key_b")
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("cosine"), 6).as("cosine"))
  }
}
