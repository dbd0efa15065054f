package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** The trained quality classifier: learning behavior on a separable
  * fixture, bit-determinism of the trained weights (vs a driver-side
  * reference GD and across partitionings), and the bias-only scoring of
  * empty/null text. Engine-vs-engine parity of the full unrolled
  * computation is graded by q147's oracle.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  // 30 positives sharing a marker token, 30 negatives sharing another;
  // filler tokens overlap. Clearly separable by the marker buckets.
  private def fixture = (0 until 60).map { i =>
    val y = if (i < 30) 1.0 else 0.0
    val marker = if (y == 1.0) "excellent" else "spamspam"
    (i.toLong, s"$marker common filler tokens $marker doc$i", y)
  }.toDF("doc_id", "text", "y")

  /** Pure-Scala reference GD: identical tokenization, bucketing, sorted-j
    * margin folds, micro-unit integer gradients, and the same IEEE
    * weight-update expression — the spec's independent model of what the
    * distributed version must compute bit-for-bit.
    */
  private def referenceWeights(rows: Seq[(Long, String, Double)],
                               dim: Int, iters: Int,
                               lr: Double): Array[Double] = {
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    val feats: Seq[(Long, Seq[(Int, Long)], Double)] = rows.map {
      case (id, text, y) =>
        val toks = Option(text).map(_.toLowerCase.trim).getOrElse("")
          .split("\\s+").filter(_.nonEmpty)
        val counts = toks.groupBy(bucket).map { case (j, ts) =>
          (j, ts.length.toLong)
        }
        val withBias = (counts.toSeq :+ (dim, 1L)).sortBy(_._1)
        (id, withBias, y)
    }
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to iters) {
      val grad = new java.util.TreeMap[Int, Long]()
      feats.foreach { case (_, fs, y) =>
        var m = 0.0
        fs.foreach { case (j, x) => m = m + w(j) * x.toDouble }
        val p = 1.0 / (1.0 + math.exp(-m))
        fs.foreach { case (j, x) =>
          val v = (p - y) * x.toDouble * 1000000.0
          // Spark round() is HALF_UP = ties away from zero (math.round
          // would pull negative ties toward +inf instead)
          val term =
            (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
          grad.merge(j, term, (a, b) => a + b)
        }
      }
      grad.forEach { (j, g) => w(j) = w(j) - lr * (g.toDouble / 1000000.0) }
    }
    w
  }

  test("trained weights match the driver-side reference bit-for-bit") {
    val rows = (0 until 60).map { i =>
      val y = if (i < 30) 1.0 else 0.0
      val marker = if (y == 1.0) "excellent" else "spamspam"
      (i.toLong, s"$marker common filler tokens $marker doc$i", y)
    }
    val feats = Classifier.hashedFeatures(fixture, "doc_id", "text", dim)
    val w = Classifier.train(feats, fixture.select($"doc_id", $"y"),
      "doc_id", dim, iters = 3, lr = 1e-4)
    val ref = referenceWeights(rows, dim, iters = 3, lr = 1e-4)
    assert(w.toSeq === ref.toSeq)
  }

  test("separable fixture separates: every positive outscores every negative") {
    val scored = Classifier.trainScore(fixture, "doc_id", "text", "y",
        dim, iters = 5, lr = 1e-3)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val minPos = scored.filter(_._1 == 1L).map(_._2).min
    val maxNeg = scored.filter(_._1 == 0L).map(_._2).max
    assert(minPos > maxNeg,
      s"positives (min $minPos) should outscore negatives (max $maxNeg)")
  }

  test("scores are identical under repartitioning") {
    val base = Classifier.trainScore(fixture, "doc_id", "text", "y",
      dim, iters = 3, lr = 1e-4).orderBy("doc_id").collect()
    val shuffled = Classifier.trainScore(fixture.repartition(7),
      "doc_id", "text", "y", dim, iters = 3, lr = 1e-4)
      .orderBy("doc_id").collect()
    assert(base === shuffled)
  }

  test("empty and null text score through the bias feature only") {
    val docs = Seq((1L, "good tokens here", 1.0), (2L, "", 0.0),
      (3L, null.asInstanceOf[String], 0.0)).toDF("doc_id", "text", "y")
    val feats = Classifier.hashedFeatures(docs, "doc_id", "text", dim)
    // rows 2 and 3 contribute exactly one feature row each: the bias
    assert(feats.filter($"doc_id" === 2L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((dim.toLong, 1L)))
    assert(feats.filter($"doc_id" === 3L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((dim.toLong, 1L)))
    val scored = Classifier.trainScore(docs, "doc_id", "text", "y",
      dim, iters = 2, lr = 1e-4).orderBy("doc_id").collect()
    assert(scored.length === 3)
    // bias-only rows share one score: w_bias * 1
    assert(scored(1).getDouble(2) === scored(2).getDouble(2))
  }

  test("zero iterations rejected; k >= 1 enforced on features") {
    intercept[IllegalArgumentException] {
      Classifier.train(fixture, fixture, "doc_id", dim, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.hashedFeatures(fixture, "doc_id", "text", 0)
    }
  }
}
