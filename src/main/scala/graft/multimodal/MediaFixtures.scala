package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk cache for the deterministic synthesized media fixtures
  * (PNG/WAV/AVI payloads derived from doc ids).
  *
  * The media queries synthesize their payloads from the documents table
  * on every run; the synthesis is deterministic, so re-running it per
  * bench iteration only re-measures the generator, not the decode+dedup
  * operators under test (it was the bulk of the bench's `gate_sec`).
  * This cache persists each `(id, content)` frame once per
  * (generator version, source tree, kind) and serves subsequent runs
  * from parquet — same bytes, so every oracle hash is unchanged.
  *
  * Keying: the source tree is identified by its path PLUS a fingerprint
  * of the documents.parquet file listing (names + lengths), so a
  * regenerated tree at the same path (e.g. a rebuilt scale replica)
  * misses the cache instead of serving stale payloads. `Version` must
  * be bumped whenever any Synthetic* generator changes.
  *
  * Concurrency: built under a temp name, then atomically renamed into
  * place; a lost race (or an un-renameable filesystem) falls back to
  * the uncached build — always correct, merely unmemoized.
  */
object MediaFixtures {

  /** Bump when any SyntheticImage/SyntheticAudio/SyntheticVideo
    * generator changes — stale caches must miss, not serve old bytes.
    */
  val Version = 1

  private def cacheRoot: String =
    sys.props.get("graft.media.cache")
      .orElse(sys.env.get("GRAFT_MEDIA_CACHE"))
      .getOrElse("target/media_cache")

  private def sanitize(p: String): String =
    p.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Driver-side fingerprint of the source documents table: sorted
    * (name, length, mtime) triples hashed. O(files) stat calls, no data
    * read. The mtime closes the corner where a regenerated tree lands
    * byte-identical-length files under identical names (impossible for
    * Spark writes — part names carry UUIDs — but cheap to rule out for
    * any other writer).
    */
  private def sourceFingerprint(sfDir: String): String = {
    val docs = new java.io.File(sfDir, "documents.parquet")
    def stat(f: java.io.File) = (f.getName, f.length(), f.lastModified())
    val listing: Seq[(String, Long, Long)] =
      if (docs.isDirectory)
        Option(docs.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(_.isFile).map(stat).toSeq.sorted
      else if (docs.isFile) Seq(stat(docs))
      else Seq.empty
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.seqHash(listing).toLong & 0xffffffffL)
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete(): Unit
  }

  /** Serve `build`'s (id, content) frame for `kind` over the `sfDir`
    * tree from the cache, building and persisting it on first use.
    * Callers should re-establish decode parallelism AFTER this call
    * (a small cached parquet can come back as one input split).
    */
  def cachedContent(spark: SparkSession, sfDir: String, kind: String)
                   (build: => DataFrame): DataFrame = {
    val dir = new java.io.File(
      s"$cacheRoot/v$Version/${sanitize(sfDir)}-${sourceFingerprint(sfDir)}/$kind")
    def ready = new java.io.File(dir, "_SUCCESS").exists()
    if (!ready) {
      // sweep tmp dirs abandoned by a crashed builder (>2h old — a live
      // concurrent builder's fresh tmp is left alone; if we ever did
      // delete one, its rename simply fails and it falls back to the
      // uncached build)
      Option(dir.getParentFile.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(s".${dir.getName}.tmp-") &&
          f.lastModified() < System.currentTimeMillis() - 2L * 3600 * 1000)
        .foreach(deleteRec)
      val tmp = new java.io.File(dir.getParentFile,
        s".${dir.getName}.tmp-${ProcessHandle.current().pid()}")
      build.write.mode("overwrite").parquet(tmp.getPath)
      dir.getParentFile.mkdirs()
      if (!tmp.renameTo(dir)) deleteRec(tmp) // raced or refused: fall back
      else {
        // prune STALE GENERATIONS: the same source path under an old
        // fingerprint (each testdata regeneration rotates the key, and
        // the sf1.0 generation is ~380 MB — unbounded growth otherwise).
        // A concurrent process still serving a pruned generation merely
        // falls back to its uncached build.
        val vRoot = dir.getParentFile.getParentFile
        val current = dir.getParentFile.getName
        // exact-shape match (prefix + hex fingerprint) so a SIBLING tree
        // whose name happens to extend this one with "-..." never prunes
        val stale = (java.util.regex.Pattern.quote(sanitize(sfDir)) +
          "-[0-9a-f]{1,8}").r
        Option(vRoot.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName != current &&
            stale.matches(f.getName))
          .foreach(deleteRec)
      }
    }
    if (ready) spark.read.parquet(dir.getPath) else build
  }
}
