package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("backward as-of picks the latest right row at or before left time") {
    val left = Seq(
      (1L, ts(10), "e1"), (1L, ts(25), "e2"), (1L, ts(5), "e0"),
      (2L, ts(50), "e3"), (3L, ts(7), "e4")) // key 3 has no right rows
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts(10), 100L), // tie with e1: inclusive, should match
      (1L, ts(20), 200L),
      (2L, ts(60), 300L)) // after e3: no match
      .toDF("k", "rt", "v")
    val got = AsOfJoin.backward(left, right,
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
      rightPayload = Seq("v"))
      .select("ev", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map("e0" -> -1L, "e1" -> 100L, "e2" -> 200L,
      "e3" -> -1L, "e4" -> -1L))
  }

  test("forward as-of picks the earliest right row at or after left time") {
    val left = Seq(
      (1L, ts(10), "e1"), (1L, ts(25), "e2"), (1L, ts(5), "e0"),
      (2L, ts(50), "e3"), (3L, ts(7), "e4")) // key 3 has no right rows
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts(10), 100L), // tie with e1: inclusive, should match
      (1L, ts(20), 200L),
      (2L, ts(40), 300L)) // before e3: no match
      .toDF("k", "rt", "v")
    val got = AsOfJoin.forward(left, right,
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
      rightPayload = Seq("v"))
      .select("ev", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map("e0" -> 100L, "e1" -> 100L, "e2" -> -1L,
      "e3" -> -1L, "e4" -> -1L))
  }

  test("right duplicates at same (key, time) resolve deterministically to max") {
    val left = Seq((1L, ts(10), "e")).toDF("k", "t", "ev")
    val right = Seq((1L, ts(5), 7L), (1L, ts(5), 9L)).toDF("k", "rt", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("v").as[Long].head()
    assert(got == 9L)
  }

  test("physical AsOfJoinExec agrees with the union+window form, both directions") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ords = Tables.orders(spark, sf0001).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    for (fwd <- Seq(false, true)) {
      val viaWindow =
        (if (fwd) AsOfJoin.forward _ else AsOfJoin.backward _)
          .apply(ev, ords, Seq("user_id"), "ts", "o_orderdate", Seq("o_orderkey"))
          .select("event_id", "o_orderkey").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      val viaExec =
        (if (fwd) graft.plans.AsOfJoinPlan.forward _ else graft.plans.AsOfJoinPlan.backward _)
          .apply(ev, ords, Seq("user_id"), "ts", "o_orderdate", Seq("o_orderkey"))
          .select("event_id", "o_orderkey").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      assert(viaExec == viaWindow, s"forward=$fwd mismatch")
    }
  }

  test("AsOfJoinExec plan: custom operator, no window, no union") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ords = Tables.orders(spark, sf0001).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val plan = graft.plans.AsOfJoinPlan
      .backward(ev, ords, Seq("user_id"), "ts", "o_orderdate", Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix -> the operator prints as
    // "AsOfJoin" in the tree
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"expected the merge-walk plan, not the union+window fallback:\n$plan")
  }

  test("PruneAsOfJoin: payload-unused count collapses to the left child") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ords = Tables.orders(spark, sf0001).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val asof = graft.plans.AsOfJoinPlan
      .backward(ev, ords, Seq("user_id"), "ts", "o_orderdate", Seq("o_orderkey"))
    // count references no payload column -> the row-preserving node must
    // vanish from the optimized plan (same freebie the union+window form
    // gets from constant folding)
    val counted = asof.groupBy().count()
    val optimized = counted.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("AsOfJoin"),
      s"payload-unused as-of should prune to its left child:\n$optimized")
    assert(counted.head().getLong(0) == ev.count())
    // but a payload-referencing query keeps the operator
    val kept = asof.select("o_orderkey").queryExecution.optimizedPlan.toString
    assert(kept.contains("AsOfJoin"), s"payload in use, node must stay:\n$kept")
  }

  test("PruneAsOfJoin: left-only filter pushes below the as-of node") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ords = Tables.orders(spark, sf0001).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val asof = graft.plans.AsOfJoinPlan
      .backward(ev, ords, Seq("user_id"), "ts", "o_orderdate", Seq("o_orderkey"))
    val filtered = asof.filter(col("event_id") < 100L)
    val optimized = filtered.queryExecution.optimizedPlan
    // the Filter must sit BELOW AsOfJoinNode (on its left child), not above
    val nodeIdx = optimized.collect {
      case n: graft.plans.AsOfJoinNode => n
    }
    assert(nodeIdx.nonEmpty, "as-of node missing entirely")
    val leftHasFilter = nodeIdx.head.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("event_id") => f
    }.nonEmpty
    assert(leftHasFilter,
      s"left-only predicate should commute below the as-of join:\n$optimized")
    // and results agree with filtering after the window form
    val expect = AsOfJoin.backward(ev, ords, Seq("user_id"), "ts",
      "o_orderdate", Seq("o_orderkey")).filter(col("event_id") < 100L)
      .select("event_id", "o_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val got = filtered.select("event_id", "o_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got == expect)
  }

  test("multi-column payload dedup keeps one REAL row, never mixes columns") {
    val left = Seq((1L, ts(10), "e")).toDF("k", "t", "ev")
    // greatest-by-first-payload row is (5, "A"); per-column max would
    // fabricate (5, "Z")
    val right = Seq((1L, ts(5), 5L, "A"), (1L, ts(5), 3L, "Z"))
      .toDF("k", "rt", "v", "status")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      Seq("v", "status")).select("v", "status").head()
    assert((got.getLong(0), got.getString(1)) == ((5L, "A")))
  }
}

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("salted inner join equals plain join on skewed data") {
    // one hot key (90% of rows) + tail
    val large = ((1 to 900).map(_ => (1L, "hot")) ++
      (2 to 101).map(i => (i.toLong, s"cold$i"))).toDF("k", "v").repartition(8)
    val small = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = large.join(small, "k").groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = graft.operators.SaltedJoin.inner(large, small, "k", factor = 4)
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted(1L) == 900L)
  }

  test("two-stage count equals plain count") {
    val df = ((1 to 500).map(_ => 7L) ++ (1 to 50).map(_.toLong)).toDF("k")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = graft.operators.SaltedJoin.twoStageCount(df, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == plain)
  }

  test("salted left-outer preserves null-extension exactly once per unmatched row") {
    // hot key 1 matches; keys 200+ have NO small-side row
    val large = ((1 to 900).map(_ => (1L, "hot")) ++
      (200 to 299).map(i => (i.toLong, s"miss$i"))).toDF("k", "v").repartition(8)
    val small = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "left_outer")
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(when(col("name").isNull, 1).otherwise(0)).as("nulls"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = graft.operators.SaltedJoin.leftOuter(large, small, "k", factor = 4)
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(when(col("name").isNull, 1).otherwise(0)).as("nulls"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
    assert(salted(250L) == ((1L, 1L)), "unmatched row must null-extend exactly once")
    assert(salted(1L) == ((900L, 0L)))
  }

  test("salting spreads the hot key across factor partitions") {
    import org.apache.spark.sql.functions._
    val large = (1 to 2000).map(_ => (1L, "hot")).toDF("k", "v").repartition(8)
    val small = Seq((1L, "dim")).toDF("k", "name")
    // observe the partition each joined row of the hot key lands in AFTER
    // the salted join's (key, salt) shuffle
    val parts = graft.operators.SaltedJoin.inner(large, small, "k", factor = 8)
      .select(spark_partition_id().as("pid"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(parts.size > 1,
      s"hot key stayed on ${parts.size} partition(s) — salting was a no-op")
    // and the distinct-set variant spreads stage-1 partials the same way
    val stage1 = large
      .withColumn("_salt", pmod(spark_partition_id(), lit(8)))
      .groupBy(col("k"), col("_salt")).count()
    assert(stage1.count() > 1, "stage-1 must hold multiple partials for the hot key")
    val ds = graft.operators.SaltedJoin.twoStageDistinctSet(
      large.withColumn("o", pmod(monotonically_increasing_id(), lit(97))), "k", "o")
      .head()
    assert(ds.getLong(1) == 97L, "distinct merge must dedup across partials")
  }
}

class BucketingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.operators.Bucketing

  test("co-located bucketed join and aggregation plan without shuffles") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_b", "l_orderkey", 4)
    try {
      val a = Bucketing.read(spark, "li_b")
      val b = Bucketing.read(spark, "ord_b")
      // equi-join on the bucket key: no exchange on either side
      val joined = a.join(b, "l_orderkey")
      assert(!Bucketing.hasShuffle(joined),
        s"expected shuffle-free bucketed join:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == li.join(ord,
        col("l_orderkey") === col("o_orderkey")).count())
      // aggregation on the bucket key: also exchange-free
      val agg = a.groupBy("l_orderkey").agg(sum("l_quantity"))
      assert(!Bucketing.hasShuffle(agg))
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
