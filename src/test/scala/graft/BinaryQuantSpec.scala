package graft

import org.apache.spark.sql.functions._

import graft.search.BinaryQuant

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private def randomVectors(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 4f)))
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0) 0.0 else dot / den
  }

  private def hammingRef(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("signWords column == packSign driver-side, across dims incl. non-multiples of 32") {
    for (dim <- Seq(7, 32, 64, 100)) {
      val vecs = randomVectors(50, dim, seed = dim)
      val df = vecs.toDF("id", "v")
      val got = df.select(col("id"), BinaryQuant.signWords(col("v"), dim).as("w"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      vecs.foreach { case (id, v) =>
        assert(got(id).toSeq == BinaryQuant.packSign(v).toSeq, s"dim=$dim id=$id")
      }
    }
  }

  test("hamming column == reference popcount-xor") {
    val dim = 64
    val vecs = randomVectors(80, dim, seed = 1)
    val q = vecs.head._2
    val qw = BinaryQuant.packSign(q)
    val df = vecs.toDF("id", "v")
      .select(col("id"), BinaryQuant.signWords(col("v"), dim).as("w"))
    val got = df.select(col("id"), BinaryQuant.hamming(col("w"), qw).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == hammingRef(BinaryQuant.packSign(v), qw), s"id=$id")
    }
  }

  test("topKRerank == brute-force two-stage model (hamming cut, cosine rerank)") {
    val dim = 64
    val vecs = randomVectors(200, dim, seed = 7)
    val q = vecs(3)._2
    val df = vecs.toDF("vec_id", "embedding")
    val got = BinaryQuant.topKRerank(df, q, k = 10, fetchK = 30,
        keyCol = "vec_id", embCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

    val qw = BinaryQuant.packSign(q)
    val cand = vecs.map { case (id, v) => (id, hammingRef(BinaryQuant.packSign(v), qw)) }
      .sortBy { case (id, h) => (h, id) }.take(30)
    val byId = vecs.toMap
    val want = cand.map { case (id, h) => (id, h, cosine(byId(id), q)) }
      .sortBy { case (id, _, s) => (-s, id) }.take(10)
    assert(got.map(t => (t._1, t._2)).toSeq == want.map(t => (t._1, t._2)).toSeq)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-12) }
  }

  test("fetchK >= n degrades to exact cosine top-k; prepacked == inline") {
    val dim = 64
    val vecs = randomVectors(120, dim, seed = 11)
    val q = vecs.head._2
    val df = vecs.toDF("vec_id", "embedding")
    val exact = vecs.map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val got = BinaryQuant.topKRerank(df, q, k = 10, fetchK = 1000,
        keyCol = "vec_id", embCol = "embedding")
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)

    val words = df.select(col("vec_id"),
      BinaryQuant.signWords(col("embedding"), dim).as("words"))
    val pre = BinaryQuant.topKRerankPrepacked(words, df, q, k = 10, fetchK = 25,
        keyCol = "vec_id", embCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val inline = BinaryQuant.topKRerank(df, q, k = 10, fetchK = 25,
        keyCol = "vec_id", embCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pre == inline)
  }

  test("stage-1 plan is TakeOrderedAndProject over the words (no global sort)") {
    val dim = 64
    val df = randomVectors(50, dim, seed = 3).toDF("vec_id", "embedding")
    val words = df.select(col("vec_id"),
      BinaryQuant.signWords(col("embedding"), dim).as("w"))
    val cand = words.select(col("vec_id"),
        BinaryQuant.hamming(col("w"), BinaryQuant.packSign(randomVectors(1, dim, 5).head._2))
          .as("hamming"))
      .orderBy(col("hamming"), col("vec_id")).limit(40)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
