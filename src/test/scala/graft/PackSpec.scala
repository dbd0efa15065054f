package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack

/** Sequence-packing invariants: token conservation, sequence fill,
  * straddle handling, determinism, and the no-global-window plan shape.
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, 10L), (2L, 3L), (3L, 0L), (4L, 25L), (5L, 7L),
    (6L, 16L), (7L, 1L), (8L, 64L), (9L, 2L), (10L, 5L)
  ).toDF("doc_id", "n_tok")

  test("packPlan conserves tokens, fills every sequence but the last") {
    val L = 16L
    val plan = Pack.packPlan(docs, "doc_id", "n_tok", L).orderBy("seq_id").collect()
    val totalTok = 10 + 3 + 25 + 7 + 16 + 1 + 64 + 2 + 5 // doc 3 empty
    assert(plan.map(_.getAs[Long]("n_tokens")).sum == totalTok)
    // seq ids are dense 0..ceil(total/L)-1
    assert(plan.map(_.getAs[Long]("seq_id")).toSeq ==
      (0L until (totalTok + L - 1) / L).toSeq)
    // all but the last sequence carry exactly L tokens
    assert(plan.dropRight(1).forall(_.getAs[Long]("n_tokens") == L))
    assert(plan.last.getAs[Long]("n_tokens") == totalTok % L)
  }

  test("placements tile the stream; straddling docs span the right sequences") {
    val L = 16L
    val p = Pack.placements(docs, "doc_id", "n_tok", L)
      .orderBy("tok_start").collect()
    // empty doc 3 dropped; the rest tile [0, total) with no gaps/overlaps
    assert(p.length == 9)
    assert(p.head.getAs[Long]("tok_start") == 0L)
    p.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("tok_end") == w(1).getAs[Long]("tok_start"))
    }
    p.foreach { r =>
      val (s, e) = (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"))
      assert(r.getAs[Long]("seq_first") == s / L)
      assert(r.getAs[Long]("seq_last") == (e - 1) / L)
      assert(e - s == r.getAs[Long]("n_tok"))
    }
    // the 64-token doc spans ceil(64/16)=4 or 5 sequences depending on
    // alignment; either way last-first+1 == number of overlapped windows
    val big = p.find(_.getAs[Long]("doc_id") == 8L).get
    val span = big.getAs[Long]("seq_last") - big.getAs[Long]("seq_first") + 1
    assert(span == 4L || span == 5L)
  }

  test("re-runs reproduce byte-identical plans; salt re-deals order but conserves totals") {
    val a = Pack.packPlan(docs, "doc_id", "n_tok", 16).orderBy("seq_id").collect()
    val b = Pack.packPlan(docs, "doc_id", "n_tok", 16).orderBy("seq_id").collect()
    assert(a.toSeq == b.toSeq)
    val salted = Pack.packPlan(docs, "doc_id", "n_tok", 16, salt = "s1")
      .orderBy("seq_id").collect()
    assert(salted.map(_.getAs[Long]("n_tokens")).sum ==
      a.map(_.getAs[Long]("n_tokens")).sum)
    // a different permutation moves at least one checksum
    assert(salted.map(_.getAs[Long]("checksum")).toSeq !=
      a.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("plan has no single-task global window") {
    val plan = Pack.packPlan(docs, "doc_id", "n_tok", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected WindowExec in:\n$plan")
  }

  test("packPlan against a driver-side model on the sf fixture") {
    val L = 128L
    val d = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n_tok"))
    val got = Pack.packPlan(d, "doc_id", "n_tok", L).orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // model: md5-order concat, cut every L
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = d.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy { case (k, _) => (hex(k.toString), k) }
    var cum = 0L
    val acc = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    rows.foreach { case (k, n) =>
      val (s, e) = (cum, cum + n); cum = e
      (s / L to (e - 1) / L).foreach { seq =>
        val contrib = math.min(e, (seq + 1) * L) - math.max(s, seq * L)
        val (nd, nt, cs) = acc.getOrElse(seq, (0L, 0L, 0L))
        acc(seq) = (nd + 1, nt + contrib, cs + k * contrib)
      }
    }
    val want = acc.toSeq.sortBy(_._1).map { case (q, (nd, nt, cs)) => (q, nd, nt, cs) }
    assert(got.toSeq == want)
  }
}
