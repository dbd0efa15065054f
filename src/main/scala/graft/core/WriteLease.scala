package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Cross-process write lease for a collection directory, layered on the
  * per-instance JVM lock.
  *
  * The round-6 surface invites multi-process operation — a serving JVM
  * with a live embed stream plus a batch repair/compaction job from the
  * CLI — and the old in-JVM `ReentrantLock` could not see the other
  * process. The reference serializes all writes through one actor
  * mailbox (collection_actor.rs:595-598); the distributed analogue is a
  * lease file: `<collection>/_lease` holds `"<owner> <expiryMillis>"`,
  * claimed by an atomic rename (HDFS/local rename fails when the
  * destination exists, so exactly one claimant wins a race).
  *
  * Policy is REFUSE LOUDLY, not queue: a writer finding a live foreign
  * lease throws [[WriteLease.HeldElsewhereException]] immediately — the
  * caller retries or coordinates; silent waiting across processes
  * invites the lost-update it exists to prevent. A crashed holder's
  * lease expires (`graft.lease.ms`, default 30 min) and the next writer
  * breaks it. Expiry makes fencing necessary: an operation that
  * outlives a broken lease must not commit over the usurper's work, so
  * the commit points ([[Collection]]'s journal rename and directory
  * swap) call [[checkHeld]] and abort when ownership was lost.
  *
  * `lock()`/`unlock()` keep the `ReentrantLock` call-site contract;
  * the lease is claimed at hold-count 0→1 and released at 1→0, so
  * nested locking within one instance stays cheap and correct.
  */
private[graft] final class WriteLease(
    fsProvider: () => FileSystem,
    val leaseFile: Path,
    collectionName: String
) {
  import WriteLease._

  private val jvm = new java.util.concurrent.locks.ReentrantLock

  /** Unique per Collection INSTANCE (not per JVM): two instances in one
    * process arbitrate through the file exactly like two processes do.
    */
  private[graft] val owner: String =
    java.util.UUID.randomUUID().toString.take(8) +
      "@pid" + ProcessHandle.current().pid()

  private def leaseMs: Long =
    sys.props.get(LeaseMsProp).map(_.toLong).getOrElse(DefaultLeaseMs)

  def lock(): Unit = {
    jvm.lock()
    if (jvm.getHoldCount == 1) {
      try acquire()
      catch { case t: Throwable => jvm.unlock(); throw t }
    }
  }

  def unlock(): Unit = {
    if (jvm.getHoldCount == 1) {
      try release() catch { case _: Exception => () }
    }
    jvm.unlock()
  }

  /** Fencing check for commit points: still the lease holder? An
    * operation that ran past its expiry while another writer broke the
    * lease must abort rather than commit over the usurper's writes.
    * (Our own EXPIRED-but-unbroken lease is fine — nobody else wrote.)
    */
  def checkHeld(): Unit = read(fsProvider()) match {
    case Some((o, _)) if o == owner => ()
    case other =>
      throw new java.io.IOException(
        s"write lease for collection '$collectionName' lost mid-operation " +
          s"(file now: ${other.fold("absent")(t => s"held by ${t._1}")}) — " +
          "aborting before commit; the operation exceeded the lease and " +
          "another writer took over. Re-run it.")
  }

  private def acquire(): Unit = {
    val fs = fsProvider()
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      read(fs) match {
        case Some((o, exp)) if o != owner && exp >= System.currentTimeMillis() =>
          throw new HeldElsewhereException(
            s"collection '$collectionName' is write-locked by $o " +
              s"(lease expires in ${exp - System.currentTimeMillis()} ms). " +
              "Another process is writing — retry after it finishes, or " +
              "after the lease expires if it crashed.")
        case Some(_) =>
          // expired (crashed holder) or our own stale file: break it
          fs.delete(leaseFile, false)
        case None => ()
      }
      val tmp = new Path(leaseFile.getParent,
        s"_lease_claim_${owner.takeWhile(_ != '@')}")
      val out = fs.create(tmp, true)
      try out.write(s"$owner ${System.currentTimeMillis() + leaseMs}"
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, leaseFile)) return // atomic claim: rename fails if present
      fs.delete(tmp, false) // raced and lost; loop re-reads the winner
    }
    throw new HeldElsewhereException(
      s"could not claim the write lease for collection '$collectionName' " +
        "after repeated races — another writer is active.")
  }

  private def release(): Unit = {
    val fs = fsProvider()
    read(fs) match {
      case Some((o, _)) if o == owner => fs.delete(leaseFile, false)
      case _ => () // broken/taken while we ran: never delete another's lease
    }
  }

  private def read(fs: FileSystem): Option[(String, Long)] = {
    if (!fs.exists(leaseFile)) return None
    try {
      val in = fs.open(leaseFile)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val parts = txt.split(' ')
      Some((parts(0), parts(1).toLong))
    } catch {
      // unreadable/corrupt (e.g. a claimant died inside its own create):
      // treat as absent — breakable by the next claim
      case _: Exception => None
    }
  }
}

private[graft] object WriteLease {
  /** Override (millis) for tests / short-lived batch jobs. */
  val LeaseMsProp = "graft.lease.ms"
  val DefaultLeaseMs: Long = 30L * 60 * 1000

  /** A live foreign lease exists: refuse loudly, never queue. */
  final class HeldElsewhereException(msg: String)
    extends IllegalStateException(msg)
}
