package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003) — the MOSS algorithm. Selects a small, position-stable subset
  * of a document's character k-gram hashes such that any shared
  * substring of length >= w + k - 1 between two documents is GUARANTEED
  * to surface as a shared selected fingerprint (the winnowing coverage
  * theorem). That guarantee is what MinHash cannot give: MinHash bounds
  * the *probability* of catching near-dups; winnowing catches every
  * sufficiently long verbatim overlap — the right tool for
  * quote/boilerplate/plagiarism detection inside a training corpus.
  *
  * Selection rule (the paper's, with its robust tie-break): slide a
  * window of `w` consecutive k-gram hashes; in each window select the
  * minimum hash, breaking ties by the RIGHTMOST position; record each
  * selected (position, hash) once. Hashes are the first 8 hex chars of
  * md5 of the gram — bit-identical in DuckDB, so the exact selected set
  * is SQL-checkable.
  *
  * Scale shape: everything is doc-local — grams, windows and selection
  * never cross a document boundary, so the whole fingerprint pass is one
  * narrow map over the corpus (the explode is a bounded w-times blowup of
  * gram rows, all inside the row's partition; no shuffle until the
  * per-doc `groupBy`, which is doc-keyed and uniform). The cross-doc step
  * ([[sharedFingerprintPairs]]) is a fingerprint-bucketed equi-join —
  * the same capped-bucket candidate shape as MinHash-LSH bands
  * (dedup/Dedup.scala), never an all-pairs product.
  */
object Winnowing {

  /** Whitespace-collapsed lowercase text — the paper's "irrelevant
    * features" normalization; [[TextFunctions.normalized]], the corpus'
    * canonical fingerprinting form, so winnowed overlap and exact-dup
    * fingerprints agree on what a document "is".
    */
  private def normalize(text: Column): Column =
    TextFunctions.normalized(text)

  /** 32-bit gram hash from md5, bit-identical across engines. */
  private def gramHash(gram: Column): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long")

  /** Selected fingerprints per document: `(key, pos, fp)` where `pos` is
    * the 1-based gram position in the normalized text and `fp` the gram's
    * hash. Documents shorter than `k` normalized chars yield no rows;
    * documents with fewer than `w` grams are winnowed as a single
    * (short) window, so every non-empty document keeps at least one
    * fingerprint.
    *
    * Execution is ROW-LOCAL ([[winnowLocal]]'s monotonic-deque scan —
    * O(grams), zero shuffles): winnowing never crosses a document
    * boundary, so there is nothing for a shuffle to do. The earlier
    * declarative form (gram explode × w window explode + a (key, win)
    * min-aggregate) computed the identical selection — WinnowingSpec
    * pins the deque against the same independent naive model — but
    * pushed w× the gram rows through an exchange; at sf0.1 the swap cut
    * the q142/q144/q145 family roughly in half. `keyCol` must be
    * integral (every fingerprint consumer keys by `_key`/`doc_id`).
    */
  def fingerprints(df: DataFrame, keyCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val spark = df.sparkSession
    import spark.implicits._
    // spread before the row-local deque scan: a one-split input would
    // winnow the whole corpus on a single core (no-op at real splits)
    graft.operators.Layout.spreadForCompute(
        df.select(col(keyCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (key, text) =>
        winnowLocal(text, k, w).iterator
          .map { case (pos, fp) => (key, pos.toLong, fp) }
      }
      .toDF(keyCol, "pos", "fp")
  }

  /** Precompiled `\s+` — `String.replaceAll` recompiles its pattern on
    * every call, which at corpus scale is a per-document regex compile.
    */
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** Executor-local twin of [[fingerprints]] — one document, same
    * hashes, same selection rule — for the row-local paths (the
    * streaming contamination screen, where a distributed groupBy would
    * make the query stateful). Sliding-window minimum via a monotonic
    * deque: O(grams), not O(grams * w). Spec'd equal to the distributed
    * form and to an independent naive model (WinnowingSpec).
    *
    * Hot-path notes (this UDF is the measured cost of the winnowing
    * family — md5 per char-gram): ASCII documents are UTF-8-encoded
    * ONCE and each gram hashed as a slice of that one buffer (identical
    * bytes to the per-gram `substring(...).getBytes` — 1 byte per char
    * below 0x80); non-ASCII documents keep the per-gram encode, where
    * slicing a shared buffer could split a surrogate pair differently.
    * The digest lands in one reused 16-byte buffer, the deque is a
    * primitive int array (each gram index is pushed at most once), and
    * a position selected by consecutive windows is recorded once at
    * selection time (a position's selection windows are contiguous:
    * the deque evicts an index permanently, so re-selection after a gap
    * is impossible — same set, fewer tuple allocations).
    */
  def winnowLocal(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    if (text == null) return Set.empty
    val norm = WsRun.matcher(text.toLowerCase).replaceAll(" ").trim
    if (norm.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val nGrams = norm.length - k + 1
    val hashes = new Array[Long](nGrams)
    var ascii = true
    var ci = 0
    while (ascii && ci < norm.length) {
      if (norm.charAt(ci) >= 0x80) ascii = false
      ci += 1
    }
    if (ascii) {
      val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < nGrams) {
        md.update(bytes, i, k)
        md.digest(dig, 0, 16)
        // first 8 hex chars == top 4 bytes, unsigned
        hashes(i) = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        i += 1
      }
    } else {
      var i = 0
      while (i < nGrams) {
        md.update(norm.substring(i, i + k)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.digest(dig, 0, 16)
        hashes(i) = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        i += 1
      }
    }
    val out = scala.collection.mutable.Set.empty[(Int, Long)]
    // monotonic deque of indices; back = candidate minimum. `<=` when
    // pushing keeps the RIGHTMOST index among equal hashes — the paper's
    // robust tie-break. Primitive ring-free deque: indices arrive in
    // increasing order and are pushed at most once, so an nGrams-long
    // array with head/tail cursors is a full deque.
    val dq = new Array[Int](nGrams)
    var dqLo = 0 // first live slot
    var dqHi = 0 // one past last live slot
    val lastWindow = math.max(nGrams - w, 0)
    var lastSel = -1
    var p = 0
    while (p < nGrams) {
      while (dqLo < dqHi && hashes(dq(dqHi - 1)) >= hashes(p)) dqHi -= 1
      dq(dqHi) = p
      dqHi += 1
      val winStart = p - w + 1
      if (dq(dqLo) < winStart) dqLo += 1
      // a window completes at p >= w-1; short docs have one window at
      // the final position
      if (p >= w - 1 || p == nGrams - 1) {
        if (p - w + 1 <= lastWindow) {
          val sel = dq(dqLo)
          if (sel != lastSel) {
            out += ((sel + 1, hashes(sel)))
            lastSel = sel
          }
        }
      }
      p += 1
    }
    out.toSet
  }

  /** Batch contamination screen: documents sharing at least `minShared`
    * winnowed fingerprints with a benchmark fp set (the verbatim-overlap
    * form of decontamination — a training doc quoting >= w+k-1
    * consecutive chars of an eval item is GUARANTEED to surface).
    * Returns `(key, shared)`.
    */
  def contaminationScreen(docs: DataFrame, keyCol: String, textCol: String,
                          benchFps: DataFrame, k: Int = 8, w: Int = 8,
                          minShared: Int = 2): DataFrame = {
    val fps = fingerprints(docs, keyCol, textCol, k, w)
      .select(col(keyCol), col("fp")).distinct()
    fps.join(broadcast(benchFps.select(col("fp")).distinct()), Seq("fp"))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Candidate overlap pairs `(key_a, key_b, shared)` — documents sharing
    * at least `minShared` distinct selected fingerprint hashes, with the
    * shared count. The join is bucketed by fingerprint value;
    * `maxPostings` drops fingerprints selected by more than that many
    * documents (ubiquitous boilerplate grams — the winnowing analogue of
    * LSH's degenerate buckets; at web scale a stop-gram's posting list
    * would otherwise explode quadratically).
    */
  def sharedFingerprintPairs(fps: DataFrame, keyCol: String,
                             minShared: Int = 2,
                             maxPostings: Int = 1000): DataFrame =
    pairsFromPostings(fps.select(col(keyCol), col("fp")).distinct(),
      keyCol, minShared, maxPostings)

  /** [[sharedFingerprintPairs]] over ALREADY-distinct postings — lets a
    * caller that also needs the postings for other work (containment's
    * per-doc sizes) compute them once.
    */
  private def pairsFromPostings(postings: DataFrame, keyCol: String,
                                minShared: Int,
                                maxPostings: Int): DataFrame = {
    require(minShared >= 1 && maxPostings >= 2,
      s"minShared >= 1 and maxPostings >= 2 required, got $minShared/$maxPostings")
    val kept = postings.groupBy(col("fp"))
      .agg(collect_list(col(keyCol)).as("keys"))
      .filter(size(col("keys")) > 1 && size(col("keys")) <= maxPostings)
    val pairsUdf = udf { (keys: Seq[Long]) =>
      val s = keys.sorted
      for { i <- s.indices; j <- (i + 1) until s.length } yield (s(i), s(j))
    }
    kept.select(explode(pairsUdf(col("keys"))).as("pair"))
      .groupBy(col("pair._1").as("key_a"), col("pair._2").as("key_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** ASYMMETRIC overlap — [[sharedFingerprintPairs]] plus per-document
    * fingerprint-set sizes and a containment score
    * `shared / min(|fp(a)|, |fp(b)|)`: how much of the SMALLER
    * document's fingerprint set lies in the overlap. Jaccard-family
    * symmetric scores miss exactly this case — a short document quoted
    * wholesale inside a long one has tiny Jaccard but containment ~1 —
    * and quote/excerpt inclusion is the dominant duplication mode
    * between long-form web text and the short eval items or press
    * snippets embedded in it. Returns
    * `(key_a, key_b, shared, n_a, n_b, containment)` with containment
    * rounded to 6 decimals.
    *
    * Scale shape: the pair join is [[sharedFingerprintPairs]]'
    * capped-postings bucket join; the size table is one doc-keyed
    * aggregate joined twice on the pair keys (pair-count-sized inputs,
    * never corpus x corpus).
    */
  def containmentPairs(fps: DataFrame, keyCol: String,
                       minShared: Int = 2,
                       maxPostings: Int = 1000): DataFrame = {
    // postings feed BOTH the pair join and the per-doc sizes; without
    // the cut the whole fingerprint pass (md5 per char-gram) re-ran per
    // consumer. Bounded: one row per distinct (doc, selected fp).
    val postings = fps.select(col(keyCol), col("fp")).distinct()
      .localCheckpoint(true)
    val pairs = pairsFromPostings(postings, keyCol, minShared, maxPostings)
    val sizes = postings
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_fp"))
    pairs
      .join(sizes.select(col(keyCol).as("key_a"), col("n_fp").as("n_a")),
        Seq("key_a"))
      .join(sizes.select(col(keyCol).as("key_b"), col("n_fp").as("n_b")),
        Seq("key_b"))
      .select(col("key_a"), col("key_b"), col("shared"),
        col("n_a"), col("n_b"),
        round(col("shared") / least(col("n_a"), col("n_b")), 6)
          .as("containment"))
  }
}
