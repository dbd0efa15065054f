package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Relational operator coverage (SURVEY §2.7): the categories the reference
  * delegates entirely to DuckDB — joins, aggregation, windows, set ops,
  * scalar function library — expressed as Catalyst plans with DuckDB oracle
  * twins.
  *
  * Scale notes are per-query in comments: broadcast the dimension side,
  * partial-agg before shuffle, window partitioning must be user-key (never
  * global), top-k via TakeOrderedAndProject.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def r2(c: org.apache.spark.sql.Column) = round(c, 2)

  /** Columns profiled by q91 (exact) and q105 (sketch) — one list so the
    * twins can never drift apart.
    */
  val ProfileCols: Seq[String] =
    Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")

  /** The sketch table profile — the plan to run at 100 TB: one scan,
    * per-column null counts / HLL++ distinct sketches (rsd 2%) / min /
    * max, ALL as ordinary partial-aggregating functions. No Expand, no
    * row replication: the shuffle carries one fixed-size sketch row per
    * partition (contrast q91's exact multi-distinct, which expands every
    * fact row x(cols+1)). Returns the single wide row; q105 unpivots it
    * and grades the sketches against their exact twins.
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nnull"),
      approx_count_distinct(col(c), rsd = 0.02).as(s"${c}__adist"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: map-side partial agg, 2-key shuffle, tiny result.
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Fact-fact-dim join: lineitem |><| orders shuffle on the join key,
    // customer broadcast (dim). Revenue per market segment.
    "q2_join_agg" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"))),

    // 4-way join, both dims broadcast — only one fact-fact shuffle.
    "q3_multi_join" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("n_name"))),

    // Window top-n per group (rank cut, deterministic tie-break by key).
    "q4_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long")) // DuckDB row_number is BIGINT
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          r2(col("o_totalprice")).as("totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Running sum per supplier — partitioned cumulative window; the frame
    // is ROWS UNBOUNDED PRECEDING. The ordering must be TOTAL over the
    // summed value too: the synthetic data contains full duplicate
    // (suppkey, orderkey, linenumber) rows at sf0.1, and without
    // l_quantity in the sort, the two engines could interleave them
    // differently and diverge on the intermediate running values.
    "q5_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          r2(sum(col("l_quantity")).over(w)).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    "q6_distinct" -> ((s, d) =>
      lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"))
        .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))),

    // ROLLUP grouping sets (subtotals + grand total).
    "q7_rollup" -> ((s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Anti join: customers that never ordered.
    "q8_anti_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy(col("c_custkey"))),

    // Global top-k: TakeOrderedAndProject (heap per partition, k rows to
    // the driver) — never a full sort.
    "q9_topn" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("totalprice"))
        .orderBy(desc("totalprice"), col("o_orderkey"))
        .limit(10)),

    // Scalar string/math function library sampler (all codegen'd built-ins).
    "q10_scalar_funcs" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_brand")).cast("long").as("brand_len"), // DuckDB length is BIGINT
        r2(col("p_retailprice") * lit(1.1)).as("price_up"),
        (col("p_size") % 7).as("size_mod"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))),

    // Date/time function sampler.
    "q11_date_funcs" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_98"))
        .orderBy(col("o_orderkey"))),

    // Semi join + conditional aggregation.
    "q12_semi_agg" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          r2(avg(col("c_acctbal"))).as("avg_bal"))
        .orderBy(col("c_mktsegment"))),

    // Ordered string aggregation (sort_array(collect_list) is the
    // deterministic Spark spelling).
    "q13_collect" -> ((s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
        .orderBy(col("r_name"))),

    // Conditional aggregation (hand pivot).
    "q14_case_agg" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
          sum(when(col("o_orderpriority") =!= "1-URGENT", 1).otherwise(0)).as("n_other"),
          r2(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))
            .otherwise(0.0))).as("urgent_value"))
        .orderBy(col("o_orderstatus"))),

    // CUBE grouping sets (all 4 combinations).
    "q37_cube" -> ((s, d) =>
      lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(r2(sum(col("l_extendedprice"))).as("sum_price"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Custom typed Aggregator: bounded top-k per group — the buffer holds
    // <= k entries so the shuffle carries O(k·groups) rows, vs a window
    // row_number sorting every partition group. Oracle twin is the window
    // formulation.
    "q40_group_topk" -> ((s, d) => {
      import s.implicits._
      val topk = new graft.plans.TopKAggregator(2)
      part(s, d)
        .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => graft.plans.ScoredKey(t._2, t._3))
        .agg(topk.toColumn)
        .flatMap { case (brand, hits) =>
          hits.zipWithIndex.map { case (h, i) => (brand, h.key, h.score, (i + 1).toLong) }
        }
        .toDF("p_brand", "p_partkey", "price", "rk")
        .withColumn("price", r2(col("price")))
        .orderBy(col("p_brand"), col("rk"))
    }),

    // Statistical aggregates: correlation / covariance / exact percentiles.
    "q38_stats" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("price_qty_corr"),
          r2(covar_samp(col("l_extendedprice"), col("l_quantity"))).as("price_qty_covar"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))),

    // Set operations: segment-A customers INTERSECT urgent-order customers,
    // and EXCEPT for the complement.
    "q39_setops" -> ((s, d) => {
      val segA = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      segA.intersect(urgent).withColumn("op", lit("both"))
        .union(segA.except(urgent).withColumn("op", lit("seg_only")))
        .orderBy(col("op"), col("c_custkey"))
    }),

    // Join against a grouped-HAVING subquery: orders with > 4 line items.
    "q15_having_join" -> ((s, d) => {
      val big = lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items")).filter(col("n_items") > 4)
      orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("n_items"), r2(col("o_totalprice")).as("totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Skew-proof fact-fact join via deterministic salting: the salted
    // plan must produce exactly the plain-join aggregate (the oracle is
    // the unsalted SQL join) while spreading any hot orderkey over 8
    // salt buckets.
    "q46_salted_join" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey").as("okey"), col("l_extendedprice"))
      val ord = orders(s, d).select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.SaltedJoin.inner(li, ord, "okey", factor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_extendedprice"))).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Salted LEFT-OUTER join: null-extension must survive salting (the
    // exploded small side carries every key at every salt, so unmatched
    // large rows null-extend exactly once). Lineitems against one brand's
    // parts — 96% of rows exercise the null-extension path.
    "q57_salted_left" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_partkey").as("pkey"), col("l_quantity"))
      val brand = part(s, d).filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey").as("pkey"), col("p_brand"))
      graft.operators.SaltedJoin.leftOuter(li, brand, "pkey", factor = 8)
        .groupBy(coalesce(col("p_brand"), lit("(none)")).as("brand"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("brand"))
    }),

    // Salted high-cardinality DISTINCT-SET aggregation: the collect-like
    // buffer case twoStageCount's doc names — partial sets per
    // (key, salt) shrink the hot key's state before the final merge.
    // Output flattened to a string so the oracle compares exactly.
    "q58_salted_distinct" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      graft.operators.SaltedJoin.twoStageDistinctSet(li, "l_suppkey", "l_orderkey")
        .select(col("l_suppkey"), col("n_distinct"),
          concat_ws(",", col("vals")).as("orderkeys"))
        .orderBy(col("l_suppkey"))
        .limit(50)
    }),

    // TPC-H Q3 (shipping priority): BUILDING customers' orders placed
    // before the cutoff with line items shipped after it, top 10 by
    // revenue. Small side (filtered customers) broadcast; top-k selected
    // by the RAW revenue then rounded.
    "q52_tpch_q3" -> ((s, d) => {
      val cust = customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01"))
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("rev")).as("rev_raw"))
        .orderBy(desc("rev_raw"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          r2(col("rev_raw")).as("revenue"))
    }),

    // TPC-H Q5 (local supplier volume): revenue by nation for orders in
    // one year where the supplier and customer share the nation, ASIA
    // region. Dims (region, nation, supplier, filtered customers)
    // broadcast; only the lineitem-orders fact join shuffles.
    "q53_tpch_q5" -> ((s, d) => {
      val asia = region(s, d).filter(col("r_name") === "ASIA")
      val nat = nation(s, d)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val ord = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(r2(sum(col("rev"))).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q17 shape (correlated scalar aggregate): small-order revenue
    // for one brand — lineitems whose quantity is below 20% of their
    // part's average quantity. Decorrelated the way the plan should look
    // at 100 TB: the brand filter is per-part, so it commutes INTO the
    // correlated aggregate — broadcast the filtered part dim first and
    // 25 of 26 brands never leave the scan; the per-part average then
    // rides a window over the single (l_partkey) shuffle instead of a
    // second aggregate-join pass over the fact.
    "q55_tpch_q17" -> ((s, d) => {
      val brandParts = part(s, d)
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
      val li = lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      li.withColumn("avg_qty", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(r2(sum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape (order priority of late orders): EXISTS with a
    // non-equi correlated condition (lateness vs the OUTER order date).
    // Spark's decorrelation rejects non-equality correlations, so the
    // plan is written as the semi-join it should become: the lateness
    // comparison re-joins the (date-filtered, tiny) order slice on the
    // equality key and filters INSIDE the subquery — same q63 move.
    "q97_tpch_q4" -> ((s, d) => {
      val ord = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01") &&
          col("o_orderdate") < lit("1997-10-01"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val late = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .select(col("l_orderkey"))
      ord.join(late, ord("o_orderkey") === late("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q10 shape (returned-item revenue): top 20 customers by
    // revenue lost to returns in a quarter. Dims broadcast; top-k
    // selected on the RAW revenue then rounded (house pattern).
    "q98_tpch_q10" -> ((s, d) => {
      val ord = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("rev")).as("rev_raw"))
        .orderBy(desc("rev_raw"), col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          r2(col("rev_raw")).as("revenue"))
    }),

    // TPC-H Q14 shape (promo revenue share): conditional sum over a
    // broadcast-dim attribute, one fact pass, ratio of the two sums.
    "q99_tpch_q14" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("promo_revenue_pct"),
          count(lit(1)).as("n"))),

    // TPC-H Q15 shape (top supplier via scalar-max subquery): quarterly
    // revenue per supplier, keep the max. The revenue table is computed
    // ONCE (tiny: one row per supplier) and probed twice — the
    // scalar max is a one-row broadcast, never a re-aggregation of the
    // fact.
    "q100_tpch_q15" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
        .localCheckpoint(true)
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      supplier(s, d).select(col("s_suppkey"), col("s_name"))
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          r2(col("total_revenue")).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q8 shape (market share): one nation's share of a customer
    // region's import volume per year — two aliases of the nation dim
    // (supplier side inside the share numerator, customer side as the
    // region filter), conditional-sum ratio per year.
    "q101_tpch_q8" -> ((s, d) => {
      val custAsia = customer(s, d)
        .join(broadcast(nation(s, d)
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppNat = supplier(s, d)
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0.0)) /
            sum(col("volume")), 6).as("mkt_share"),
          count(lit(1)).as("n"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q6 (forecast revenue change): pure scan + conjunctive
    // range predicates + ungrouped aggregate — every filter reaches the
    // parquet reader as a pushed-down predicate; no shuffle at all
    // (partial sums reduce to the driver).
    "q102_tpch_q6" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.02, 0.04) &&
          col("l_quantity") < 24)
        .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q16 shape: NOT IN with a subquery — the null-aware anti-join
    // (different semantics from NOT EXISTS when the subquery can yield
    // NULL; here s_suppkey is non-null so Catalyst plans the efficient
    // anti join) — plus a multi-key count-distinct aggregation.
    "q94_tpch_q16" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("g94_lineitem")
      part(s, d).createOrReplaceTempView("g94_part")
      supplier(s, d).createOrReplaceTempView("g94_supplier")
      s.sql(
        """SELECT p_brand, p_type, p_size,
          | count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM g94_lineitem JOIN g94_part ON l_partkey = p_partkey
          |WHERE p_brand <> 'Brand#23' AND p_size IN (1, 5, 9, 13)
          |  AND l_suppkey NOT IN
          |    (SELECT s_suppkey FROM g94_supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    }),

    // TPC-H Q20 shape (nested IN + correlated HAVING threshold):
    // suppliers who shipped > 30% of a 'large' part's 1997 volume.
    // Decorrelated the way the 100 TB plan should look: one filtered
    // fact pass grouped by (supplier, part), the per-part total as a
    // window over the SAME aggregate (no second fact scan), threshold
    // exact because quantities are integral in f64. The oracle keeps
    // the correlated HAVING-subquery spelling.
    "q95_tpch_q20" -> ((s, d) => {
      val largeParts = part(s, d).filter(col("p_name").startsWith("large"))
        .select(col("p_partkey"))
      val li97 = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_suppkey"), col("l_partkey"), col("l_quantity"))
      val perSupp = li97
        .join(broadcast(largeParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val w = Window.partitionBy(col("l_partkey"))
      val qualified = perSupp
        .withColumn("part_total", sum(col("qty")).over(w))
        .filter(col("qty") > lit(0.3) * col("part_total"))
        .select(col("l_suppkey")).distinct()
      supplier(s, d)
        .join(qualified, col("s_suppkey") === col("l_suppkey"))
        .select(col("s_name"), col("s_suppkey"))
        .orderBy(col("s_name"))
    }),

    // TPC-H Q7 shape (volume shipping between two nations): the
    // OR-of-nation-pairs condition rides the two broadcast nation dims;
    // the fact side shuffles once on the lineitem-orders key. Yearly
    // revenue per direction.
    "q96_tpch_q7" -> ((s, d) => {
      val n1 = nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(r2(sum(col("volume"))).as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Data-profiling in ONE pass: per-column null counts, distinct
    // counts, and min/max over orders — every column's aggregates in a
    // single agg (Spark plans the multi-distinct via one Expand pass,
    // never one scan per column), then stack() unpivots the single
    // result row to a row per column. The data-quality step that gates
    // real ingest pipelines.
    //
    // EXPAND COST, deliberate: 4 exact countDistinct in one aggregate
    // make Spark replicate every fact row x5 into the shuffle (one
    // Expand branch per distinct column + one for the plain aggs). That
    // is the right *exact* plan — one scan beats four — but at 100 TB a
    // profile should run q105's sketch form instead: HLL++ partials
    // aggregate map-side with NO Expand and a fixed-size shuffle. This
    // exact form stays as q105's grading twin and for fixture-scale use.
    "q91_table_profile" -> ((s, d) => {
      val cols = ProfileCols
      val aggs = cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
      }
      val stackArgs = cols.map(c =>
        s"'$c', ${c}__nnull, ${c}__ndist, ${c}__min, ${c}__max").mkString(", ")
      val allAggs = count(lit(1)).as("n_rows") +: aggs
      orders(s, d)
        .agg(allAggs.head, allAggs.tail: _*)
        .select(col("n_rows"), expr(
          s"stack(${cols.length}, $stackArgs) AS " +
            "(column_name, n_null, n_distinct, min_val, max_val)"))
        .select(col("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
        .orderBy(col("column_name"))
    }),

    // The 100 TB profiling plan, graded q103-style: the sketch profile
    // (approxProfile — ONE scan, HLL++ partial aggregation, NO Expand,
    // fixed-size shuffle) cross-joined with the exact multi-distinct row
    // purely to PIN the sketch contract — the output carries the exact
    // n_distinct plus a within-tolerance boolean, so HLL drift beyond
    // 5% fails the hash gate while the approx value itself (engine-
    // specific) never reaches the compare.
    "q105_table_profile_approx" -> ((s, d) => {
      val cols = ProfileCols
      val ord = orders(s, d)
      val approx = approxProfile(ord, cols)
      val exactAggs = cols.map(c => countDistinct(col(c)).as(s"${c}__ndist"))
      val exact = ord.agg(exactAggs.head, exactAggs.tail: _*)
      val stackArgs = cols.map(c =>
        s"'$c', ${c}__nnull, ${c}__ndist, " +
          s"abs(cast(${c}__adist as double) - ${c}__ndist) / ${c}__ndist <= 0.05, " +
          s"${c}__min, ${c}__max").mkString(", ")
      approx.crossJoin(exact)
        .select(col("n_rows"), expr(
          s"stack(${cols.length}, $stackArgs) AS " +
            "(column_name, n_null, n_distinct, dist_within_rsd, min_val, max_val)"))
        .select(col("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("dist_within_rsd"), col("min_val"),
          col("max_val"))
        .orderBy(col("column_name"))
    }),

    // Per-user outlier detection: events whose value deviates from the
    // user's own mean by >= 2.5 standard deviations. The filter boundary
    // must be IDENTICAL in both engines, and windowed f64 avg/stddev is
    // not (summation order differs) — so the moments come from EXACT
    // decimal sums (values are 2-decimal; v and v² are exact in
    // DECIMAL), and mu/sd/z derive from those exact sums through the
    // same double expression on both sides: bit-identical decisions.
    "q92_outliers" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val dv = col("value").cast("decimal(18,2)")
      events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          sum(dv).over(w).as("s1"),
          sum(dv * dv).over(w).as("s2"),
          count(lit(1)).over(w).as("n"))
        .filter(col("n") >= 20)
        .withColumn("mu", col("s1").cast("double") / col("n"))
        .withColumn("vr",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n")) /
            (col("n") - 1))
        .filter(col("vr") > 0)
        .withColumn("z", abs(col("value") - col("mu")) / sqrt(col("vr")))
        .filter(col("z") >= 2.5)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("value"), round(col("z"), 4).as("z"))
        .orderBy(col("event_id"))
    }),

    // Key-skew diagnostics (measure before you join): one-row frequency
    // profiles of two join keys — the facts that decide broadcast vs
    // shuffle vs salted vs bloom. One aggregation per key; the profile
    // reduce is a single row.
    "q87_skew_profile" -> ((s, d) => {
      val li = lineitem(s, d)
      graft.operators.SkewStats.profile(li, "l_orderkey")
        .withColumn("key_name", lit("l_orderkey"))
        .unionByName(graft.operators.SkewStats.profile(li, "l_suppkey")
          .withColumn("key_name", lit("l_suppkey")))
        .select(col("key_name"), col("n_keys"), col("max_n"), col("avg_n"),
          col("p50_n"), col("p99_n"), col("skew_ratio"))
        .orderBy(col("key_name"))
    }),

    // Hot-key-aware salted join: only above-average-frequency suppkeys
    // take the salted path (bounded driver-side hot list), the rest join
    // plain — the split that confines the small-side explosion to
    // |hot| x factor rows instead of |small| x factor. Oracle = the
    // plain join, proving the two paths partition the key space exactly.
    // The hot threshold is MEASURED (avg frequency + 1 from the skew
    // profile — "measure before you join"), not a constant tuned to one
    // scale factor: at every sf roughly the above-average half of the
    // keys clears it (capped at 100), so the salted path is always
    // exercised.
    "q88_hot_salted" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_suppkey").as("skey"), col("l_quantity"))
      val sup = supplier(s, d).select(col("s_suppkey").as("skey"), col("s_nationkey"))
      val minCount = math.ceil(graft.operators.SkewStats.profile(li, "skey")
        .head().getAs[Double]("avg_n")).toLong + 1
      val hot = graft.operators.SkewStats.hotKeys(li, "skey",
        minCount = minCount, maxKeys = 100)
      graft.operators.SaltedJoin.innerHotAware(li, sup, "skey", hot, factor = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("s_nationkey"))
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join so zero-order customers survive, count(col) ignoring the
    // null-extended rows, then a second tiny aggregation over the count
    // domain. The first shuffle is on the join/group key (custkey — AQE
    // reuses the join partitioning for the agg); the second groups tens
    // of distinct counts, a broadcast-scale reduce.
    "q81_tpch_q13" -> ((s, d) => {
      val ord = orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      customer(s, d).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q22 shape (global-average scalar subquery + NOT EXISTS):
    // wealthy customers with no URGENT order, per nation (plain no-order
    // customers don't exist in the synthetic data). Written declaratively —
    // Catalyst turns the uncorrelated scalar into a one-row broadcast
    // and the NOT EXISTS into a left-anti join; customer is scanned
    // twice but the second scan is the filtered average (tiny result),
    // never a per-row subquery execution.
    "q82_tpch_q22" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("g82_customer")
      orders(s, d).createOrReplaceTempView("g82_orders")
      s.sql(
        """SELECT c_nationkey, count(*) AS numcust,
          | round(sum(c_acctbal), 2) AS totacctbal
          |FROM g82_customer
          |WHERE c_nationkey IN (1, 3, 5, 7, 9)
          |  AND c_acctbal > (SELECT avg(c_acctbal) FROM g82_customer
          |                   WHERE c_acctbal > 0.0
          |                     AND c_nationkey IN (1, 3, 5, 7, 9))
          |  AND NOT EXISTS (SELECT 1 FROM g82_orders
          |                  WHERE o_custkey = c_custkey
          |                    AND o_orderpriority = '1-URGENT')
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),

    // TPC-H Q19 shape (disjunction of conjunctive clauses): the OR does
    // not defeat pushdown — the brand/size envelope (brand IN (...) AND
    // size <= 15) commutes out of the disjunction and prunes the part
    // dim BEFORE the broadcast, so the fact join only sees the 3 brands'
    // parts; the residual per-brand quantity windows evaluate post-join.
    "q83_tpch_q19" -> ((s, d) => {
      val p = part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
          col("p_size").between(1, 15))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // per-returnflag and per-linestatus marginals plus the grand total in
    // ONE pass — Spark expands the sets and aggregates with partial
    // aggregation per set, never rescanning the fact per set.
    // grouping_id() disambiguates which set produced a row (bit i set =
    // column i aggregated away), same bit order as DuckDB's GROUPING().
    "q74_grouping_sets" -> ((s, d) =>
      lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("sum_qty"), col("n"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Pivot (long -> wide): per-cell aggregates become columns. Spark's
    // .pivot with an EXPLICIT value list — never the value-discovery
    // variant, which runs a distinct() job over the fact before planning.
    // An absent cell is NULL on both engines (sum over empty set).
    "q75_pivot" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(r2(sum(col("l_quantity"))))
        .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
        .orderBy(col("l_returnflag"))),

    // Ranking/navigation window battery: ntile, percent_rank, cume_dist,
    // lag, lead in one partitioned pass. The window ordering is TOTAL
    // (totalprice, then orderkey) so rank-derived values are
    // deterministic; one shuffle on the partition key serves all five
    // functions.
    "q76_window_fns" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d).select(
        col("o_orderpriority"), col("o_orderkey"),
        ntile(8).over(w).cast("long").as("bucket8"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // Bloom-prefiltered fact⋈dim join: the urgent-orders dim (1 in 5
    // keys) is condensed to a broadcast Bloom filter that drops
    // non-matching lineitems BEFORE the join shuffle. Result is
    // bit-identical to the plain join (no false negatives; false
    // positives die in the real join) — the oracle IS the plain join.
    "q79_bloom_join" -> ((s, d) => {
      val li = lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.operators.BloomJoin.prefilterInner(
          li, urgent, "l_orderkey", "o_orderkey", expectedKeys = 20000)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("ym"))
    }),

    // TPC-H Q2 shape (correlated scalar subquery): the cheapest supplier
    // per nation, written AS the correlated SQL and left to Catalyst's
    // RewriteCorrelatedScalarSubquery to decorrelate into the
    // aggregate-join — the declarative path a user migrating SQL takes.
    // The decorrelated plan aggregates the supplier dim (tiny) and
    // broadcasts; nothing fact-sized shuffles.
    "q56_tpch_q2" -> ((s, d) => {
      supplier(s, d).createOrReplaceTempView("g56_supplier")
      nation(s, d).createOrReplaceTempView("g56_nation")
      s.sql(
        """SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS acctbal
          |FROM g56_supplier s JOIN g56_nation n ON s.s_nationkey = n.n_nationkey
          |WHERE s.s_acctbal = (SELECT min(s2.s_acctbal)
          |                     FROM g56_supplier s2
          |                     WHERE s2.s_nationkey = s.s_nationkey)
          |ORDER BY n.n_name, s.s_name""".stripMargin)
    }),

    // TPC-H Q9 (product-type profit): the heaviest join tree in the
    // suite — fact x part x supplier x nation x partsupp x orders.
    // Dims broadcast; the derived partsupp is corpus-keyed here so it
    // equi-joins on (partkey, suppkey) — at 100 TB partsupp is the
    // bucketed dimension co-partitioned with lineitem on l_partkey,
    // and the orders join rides the l_orderkey shuffle AQE plans.
    // Profit terms are micro-unit fixed point (the q190 discipline):
    // both engines compute the identical f64 expression tree per row,
    // round once to integers, and the sum is order-free DECIMAL.
    "q210_tpch_q9" -> ((s, d) => {
      val widgetParts = part(s, d).filter(col("p_name").contains("widget"))
        .select(col("p_partkey"))
      val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
      val ord = orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      lineitem(s, d)
        .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(partsupp(s, d),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("micro",
          round(((col("l_extendedprice") * (lit(1) - col("l_discount")))
            - (col("ps_supplycost") * col("l_quantity"))) * 10000.0)
            .cast("long"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(
          r2(sum(col("micro").cast("decimal(38,0)")).cast("double") / 10000.0)
            .as("sum_profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), desc("o_year"))
    }),

    // TPC-H Q11 (important stock): partsupp value for one nation's
    // suppliers vs a global-total threshold — the classic
    // aggregate-vs-scalar-total shape. The scalar total broadcasts
    // through a crossJoin (one row); per-part values are exact 2dp
    // fixed point so the threshold compare is engine-identical.
    // NATION_3 is the one nation with suppliers at EVERY sf (sf0.001
    // ships only 10 suppliers over nations {3,8,12,13,15,18-21,24}).
    "q211_tpch_q11" -> ((s, d) => {
      val natSup = supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val pv = partsupp(s, d)
        .join(broadcast(natSup), col("ps_suppkey") === col("s_suppkey"))
        .withColumn("cmicro",
          round(col("ps_supplycost") * col("ps_availqty") * 100.0)
            .cast("long"))
        .groupBy(col("ps_partkey"))
        .agg(sum(col("cmicro").cast("decimal(38,0)")).as("vmicro"))
      val tot = pv.agg(sum(col("vmicro")).as("t"))
      pv.crossJoin(broadcast(tot))
        .filter(col("vmicro").cast("double") > lit(0.001) * col("t").cast("double"))
        .select(col("ps_partkey"),
          r2(col("vmicro").cast("double") / 100.0).as("value"))
        .orderBy(desc("value"), col("ps_partkey"))
    }),

    // TPC-H Q12 (shipmode lateness): the ship/commit/receipt date
    // columns the synthetic lineitem omits are derived as pure key
    // arithmetic (deterministic, oracle re-derivable); filters reduce
    // the fact to a few hundred rows BEFORE the orders join, which AQE
    // then broadcasts. Counts only — no float discipline needed.
    "q212_tpch_q12" -> ((s, d) => {
      val modes = array(lit("MAIL"), lit("SHIP"), lit("AIR"), lit("TRUCK"),
        lit("RAIL"), lit("REG AIR"), lit("FOB"))
      val li = lineitem(s, d).select(col("l_orderkey"),
        element_at(modes,
          ((col("l_orderkey") * 3 + col("l_linenumber") * 13) % 7)
            .cast("int") + 1).as("l_shipmode"),
        to_date(col("l_shipdate")).as("sd"),
        date_add(to_date(col("l_shipdate")),
          ((col("l_orderkey") * 3 + col("l_linenumber") * 17) % 61 - 30)
            .cast("int")).as("cd"),
        date_add(to_date(col("l_shipdate")),
          ((col("l_orderkey") * 11 + col("l_linenumber") * 5) % 30 + 1)
            .cast("int")).as("rd"))
      val ord = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("cd") < col("rd") && col("sd") < col("cd") &&
          col("rd") >= lit("1997-01-01") && col("rd") < lit("1998-01-01"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_shipmode"))
        .agg(
          sum(when(hi, 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).cast("long").as("low_line_count"))
        .orderBy(col("l_shipmode"))
    })
  )

  /** Derived partsupp — the one TPC-H table the synthetic schema omits:
    * exactly the DISTINCT (l_partkey, l_suppkey) pairs lineitem carries
    * (the real TPC-H invariant runs the other way — every lineitem pair
    * exists in partsupp — so the derived table satisfies it by
    * construction), with availqty/supplycost as pure integer arithmetic
    * of the keys. Both engines re-derive the identical table: integer
    * `%`, then a /100 that lands on exact 2-decimal doubles.
    */
  private def partsupp(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        (col("ps_partkey") * 7 + col("ps_suppkey") * 13) % 9999 + 1)
      .withColumn("ps_supplycost",
        ((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 100000)
          .cast("double") / 100.0 + 1.0)

  /** The oracle's partsupp twin — one CTE string shared by the Q9/Q11
    * oracles so the two can never drift from each other (they drift
    * from [[partsupp]] only if someone edits one side; the hash gate
    * catches that immediately).
    */
  private val PartsuppCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    (l_partkey * 7 + l_suppkey * 13) % 9999 + 1 AS ps_availqty,
      |    CAST((l_partkey * 31 + l_suppkey * 17) % 100000 AS DOUBLE)
      |      / 100.0 + 1.0 AS ps_supplycost
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      """SELECT c_mktsegment,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q3_multi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_window_topn" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q5_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        | FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q6_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q7_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | ORDER BY c_custkey""".stripMargin,
    "q9_topn" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice FROM orders
        | ORDER BY round(o_totalprice, 2) DESC, o_orderkey LIMIT 10""".stripMargin,
    "q10_scalar_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        | substring(p_type, 1, 5) AS type_prefix, length(p_brand) AS brand_len,
        | round(p_retailprice * 1.1, 2) AS price_up,
        | p_size % 7 AS size_mod,
        | concat_ws('|', p_brand, p_type) AS brand_type
        | FROM part ORDER BY p_partkey""".stripMargin,
    "q11_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        | dayofmonth(o_orderdate) AS dom, strftime(o_orderdate, '%Y-%m') AS ym,
        | datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    "q12_semi_agg" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal), 2) AS avg_bal
        | FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_collect" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        | FROM nation JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q14_case_agg" ->
      """SELECT o_orderstatus,
        | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        | CAST(sum(CASE WHEN o_orderpriority != '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
        | round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2) AS urgent_value
        | FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q37_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price,
        | count(*) AS n
        | FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q40_group_topk" ->
      """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rk FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC, p_partkey) AS rk
        | FROM part) WHERE rk <= 2 ORDER BY p_brand, rk""".stripMargin,
    "q38_stats" ->
      """SELECT l_returnflag,
        | round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
        | round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q39_setops" ->
      """WITH segA AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
        | urgent AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT c_custkey, 'both' AS op FROM (SELECT * FROM segA INTERSECT SELECT * FROM urgent)
        |UNION ALL
        |SELECT c_custkey, 'seg_only' AS op FROM (SELECT * FROM segA EXCEPT SELECT * FROM urgent)
        |ORDER BY op, c_custkey""".stripMargin,
    "q15_having_join" ->
      """SELECT o_orderkey, n_items, round(o_totalprice, 2) AS totalprice
        | FROM orders JOIN (
        |  SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |  GROUP BY l_orderkey HAVING count(*) > 4) b
        | ON o_orderkey = b.l_orderkey ORDER BY o_orderkey""".stripMargin,
    "q46_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS sum_price
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q57_salted_left" ->
      """SELECT coalesce(p_brand, '(none)') AS brand, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        | FROM lineitem LEFT JOIN
        |  (SELECT p_partkey, p_brand FROM part WHERE p_brand = 'Brand#23') p
        |  ON l_partkey = p_partkey
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q58_salted_distinct" ->
      """SELECT l_suppkey,
        | CAST(len(list_distinct(list(l_orderkey))) AS BIGINT) AS n_distinct,
        | array_to_string(list_sort(list_distinct(list(l_orderkey))), ',') AS orderkeys
        | FROM lineitem GROUP BY 1 ORDER BY 1 LIMIT 50""".stripMargin,
    "q52_tpch_q3" ->
      """WITH top AS (
        | SELECT l_orderkey, o_orderdate,
        |  sum(l_extendedprice * (1 - l_discount)) AS rev_raw
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        | GROUP BY 1, 2
        | ORDER BY rev_raw DESC, l_orderkey LIMIT 10)
        |SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | round(rev_raw, 2) AS revenue
        | FROM top ORDER BY rev_raw DESC, l_orderkey""".stripMargin,
    "q53_tpch_q5" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        | GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q102_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin,
    "q97_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q98_tpch_q10" ->
      """WITH top AS (
        | SELECT c_custkey, c_name, n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS rev_raw
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        | WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        | GROUP BY c_custkey, c_name, n_name
        | ORDER BY rev_raw DESC, c_custkey LIMIT 20)
        |SELECT c_custkey, c_name, n_name, round(rev_raw, 2) AS revenue
        |FROM top ORDER BY rev_raw DESC, c_custkey""".stripMargin,
    "q99_tpch_q14" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
        |  sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin,
    "q100_tpch_q15" ->
      """WITH revenue AS (
        | SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q101_tpch_q8" ->
      """SELECT o_year,
        | round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END)
        |   / sum(volume), 6) AS mkt_share,
        | count(*) AS n
        |FROM (
        | SELECT year(o_orderdate) AS o_year,
        |  l_extendedprice * (1 - l_discount) AS volume,
        |  n1.n_name AS supp_nation
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q94_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#23' AND p_size IN (1, 5, 9, 13)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q95_tpch_q20" ->
      """SELECT s_name, s_suppkey FROM supplier WHERE s_suppkey IN (
        | SELECT l_suppkey
        | FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
        | WHERE p_name LIKE 'large%'
        |  AND l1.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l1.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        | GROUP BY l_suppkey, l1.l_partkey
        | HAVING sum(l1.l_quantity) > 0.3 * (
        |   SELECT sum(l2.l_quantity) FROM lineitem l2
        |   WHERE l2.l_partkey = l1.l_partkey
        |    AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        |ORDER BY s_name""".stripMargin,
    "q96_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        | round(sum(volume), 2) AS revenue, count(*) AS n
        |FROM (
        | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  l_extendedprice * (1 - l_discount) AS volume
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        | WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q91_table_profile" ->
      """WITH p AS (
        | SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_val,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_val FROM orders
        | UNION ALL
        | SELECT 'o_orderkey', count(*),
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderkey),
        |  CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
        | FROM orders
        | UNION ALL
        | SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority) FROM orders
        | UNION ALL
        | SELECT 'o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  min(o_orderstatus), max(o_orderstatus) FROM orders)
        |SELECT column_name, n_rows, n_null, n_distinct, min_val, max_val
        |FROM p ORDER BY column_name""".stripMargin,
    // q91's exact profile plus the pinned sketch contract: the HLL++
    // estimate must sit within 5% of the exact count (q103's grading
    // scheme) — the approx value itself never reaches the compare
    "q105_table_profile_approx" ->
      """WITH p AS (
        | SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_val,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_val FROM orders
        | UNION ALL
        | SELECT 'o_orderkey', count(*),
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderkey),
        |  CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
        | FROM orders
        | UNION ALL
        | SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority) FROM orders
        | UNION ALL
        | SELECT 'o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  min(o_orderstatus), max(o_orderstatus) FROM orders)
        |SELECT column_name, n_rows, n_null, n_distinct,
        | true AS dist_within_rsd, min_val, max_val
        |FROM p ORDER BY column_name""".stripMargin,
    "q92_outliers" ->
      """WITH s AS (
        | SELECT event_id, user_id, value,
        |  sum(CAST(value AS DECIMAL(18,2))) OVER w AS s1,
        |  sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS s2,
        |  count(*) OVER w AS n
        | FROM events
        | WINDOW w AS (PARTITION BY user_id)),
        |d AS (
        | SELECT event_id, user_id, value,
        |  CAST(s1 AS DOUBLE) / n AS mu,
        |  (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
        |    / (n - 1) AS vr
        | FROM s WHERE n >= 20),
        |z AS (
        | SELECT event_id, user_id, value, abs(value - mu) / sqrt(vr) AS z
        | FROM d WHERE vr > 0)
        |SELECT event_id, user_id, round(value, 4) AS value, round(z, 4) AS z
        |FROM z WHERE z >= 2.5 ORDER BY event_id""".stripMargin,
    "q87_skew_profile" ->
      """WITH ok AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
        | sk AS (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
        | p AS (
        |  SELECT 'l_orderkey' AS key_name, count(*) AS n_keys, max(n) AS max_n,
        |   round(avg(n), 4) AS avg_n, round(quantile_cont(n, 0.5), 4) AS p50_n,
        |   round(quantile_cont(n, 0.99), 4) AS p99_n FROM ok
        |  UNION ALL
        |  SELECT 'l_suppkey', count(*), max(n), round(avg(n), 4),
        |   round(quantile_cont(n, 0.5), 4), round(quantile_cont(n, 0.99), 4) FROM sk)
        |SELECT key_name, n_keys, max_n, avg_n, p50_n, p99_n,
        | round(max_n / avg_n, 4) AS skew_ratio
        |FROM p ORDER BY key_name""".stripMargin,
    "q88_hot_salted" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q81_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q82_tpch_q22" ->
      """SELECT c_nationkey, count(*) AS numcust,
        | round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0
        |                     AND c_nationkey IN (1, 3, 5, 7, 9))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q83_tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q74_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        | FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        | ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q75_pivot" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
        | round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q76_window_fns" ->
      """SELECT o_orderpriority, o_orderkey,
        | ntile(8) OVER w AS bucket8,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist,
        | lag(o_orderkey, 1) OVER w AS prev_key,
        | lead(o_orderkey, 1) OVER w AS next_key
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        | ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q79_bloom_join" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderpriority = '1-URGENT'
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    // the correlated form verbatim — DuckDB decorrelates it on its side
    "q55_tpch_q17" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        | count(*) AS n_items
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q56_tpch_q2" ->
      """SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS acctbal
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_acctbal = (SELECT min(s2.s_acctbal)
        |                     FROM supplier s2
        |                     WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY n.n_name, s.s_name""".stripMargin,

    // the same derived-partsupp CTE + the identical per-row f64
    // expression tree, micro-unit rounded before the (order-free) sum
    "q210_tpch_q9" ->
      s"""WITH $PartsuppCte,
         | amt AS (SELECT n_name AS nation,
         |   CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |   CAST(round(((l_extendedprice * (1 - l_discount))
         |     - (ps_supplycost * l_quantity)) * 10000.0) AS BIGINT) AS micro
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  WHERE p_name LIKE '%widget%')
         |SELECT nation, o_year,
         |  round(CAST(sum(CAST(micro AS HUGEINT)) AS DOUBLE) / 10000.0, 2)
         |    AS sum_profit,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM amt GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q211_tpch_q11" ->
      s"""WITH $PartsuppCte,
         | v AS (SELECT ps_partkey,
         |   CAST(round(ps_supplycost * ps_availqty * 100.0) AS BIGINT)
         |     AS cmicro
         |  FROM partsupp
         |  JOIN supplier ON s_suppkey = ps_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'),
         | pv AS (SELECT ps_partkey,
         |   CAST(sum(CAST(cmicro AS HUGEINT)) AS BIGINT) AS vmicro
         |  FROM v GROUP BY 1),
         | tot AS (SELECT CAST(sum(CAST(vmicro AS HUGEINT)) AS BIGINT) AS t
         |  FROM pv)
         |SELECT ps_partkey, round(CAST(vmicro AS DOUBLE) / 100.0, 2) AS value
         |FROM pv, tot
         |WHERE CAST(vmicro AS DOUBLE) > 0.001 * CAST(t AS DOUBLE)
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    // ship/commit/receipt derived by the same key arithmetic as the
    // Spark side; date + integer is day addition in DuckDB
    "q212_tpch_q12" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    ['MAIL','SHIP','AIR','TRUCK','RAIL','REG AIR','FOB']
        |      [CAST((l_orderkey * 3 + l_linenumber * 13) % 7 AS INT) + 1]
        |      AS l_shipmode,
        |    CAST(l_shipdate AS DATE) AS sd,
        |    CAST(l_shipdate AS DATE)
        |      + CAST((l_orderkey * 3 + l_linenumber * 17) % 61 - 30 AS INT)
        |      AS cd,
        |    CAST(l_shipdate AS DATE)
        |      + CAST((l_orderkey * 11 + l_linenumber * 5) % 30 + 1 AS INT)
        |      AS rd
        |  FROM lineitem)
        |SELECT l_shipmode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM li JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipmode IN ('MAIL','SHIP')
        |  AND cd < rd AND sd < cd
        |  AND rd >= DATE '1997-01-01' AND rd < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
