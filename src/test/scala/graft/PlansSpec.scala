package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The native codegen expressions must be bit-identical to the declarative
  * higher-order-function forms they replace (same f64 index-order math).
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("codegen cosine == HOF cosine on the embeddings fixture, bit for bit") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val both = e.select(
      VectorFunctions.cosine(col("embedding"), typedLit(q.map(_.toDouble))).as("a"),
      VectorFunctions.cosineHof(col("embedding"), typedLit(q.map(_.toDouble))).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("codegen cosine handles zero vectors and dimension mismatch") {
    val df = Seq(
      (Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f), Seq(1f, 0f, 5f)), // extra trailing element ignored
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("interpreted eval path (codegen fallback) agrees too") {
    // force the interpreted path by eval'ing the expression directly
    val expr = graft.plans.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0, 2.0, 1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val got = expr.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Double]
    val want = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - want) < 1e-15)
  }

  test("SQL registration via GraftExtensions function injection") {
    // register on the shared session's function registry directly
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      exprs => graft.plans.CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    val got = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c""")
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-15)
  }
}

class TopKAggregatorSpec extends SparkSpec {
  import graft.plans.{ScoredKey, TopKAggregator}

  test("reduce/merge keep order, bound, and tie-break determinism") {
    val agg = new TopKAggregator(3)
    val items = Seq(
      ScoredKey(1.0, 5), ScoredKey(3.0, 2), ScoredKey(2.0, 9),
      ScoredKey(3.0, 1), ScoredKey(0.5, 7))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(buf == List(ScoredKey(3.0, 1), ScoredKey(3.0, 2), ScoredKey(2.0, 9)))
    // merge of two disjoint buffers equals reduce over the union
    val (a, b) = items.splitAt(2)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    assert(merged == buf)
    // k = 1 keeps only the max, lowest key on ties
    val agg1 = new TopKAggregator(1)
    assert(items.foldLeft(agg1.zero)(agg1.reduce) == List(ScoredKey(3.0, 1)))
    // merge with empty is identity
    assert(agg.merge(buf, agg.zero) == buf && agg.merge(agg.zero, buf) == buf)
  }
}
