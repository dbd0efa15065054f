package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract expectations: a declarative assertion battery evaluated
  * in ONE corpus pass (the Great-Expectations shape, Spark-native). The
  * point at 100 TB is the single scan: every rule is an aggregate
  * expression folded into one `agg`, map-side combined — N rules cost
  * one pass, not N.
  *
  * Determinism discipline: rule expressions must derive their actual
  * from EXACT aggregates (counts, integer sums, min/max) with at most
  * one final float division — `avg` over doubles is summation-order
  * dependent across partitions and would flake a bit-exact gate.
  * [[Expect.rate]] builds the compliant count-ratio shape.
  */
object Expect {

  /** One expectation: `actual` is an aggregate expression; `op` is one
    * of `<=`, `>=`, `==` against `threshold`.
    */
  final case class Rule(name: String, actual: Column, op: String, threshold: Double) {
    require(Seq("<=", ">=", "==").contains(op), s"unsupported op '$op'")
  }

  /** Fraction of rows satisfying `cond` — exact integer counts, one
    * final division (deterministic).
    */
  def rate(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L)).cast("double") /
      count(lit(1)).cast("double")

  /** Evaluate the battery: one row per rule,
    * `(check, actual, op, threshold, passed)`; `passed` compares the
    * UNROUNDED actual, `actual` is rounded to 6 for display/gating.
    * The whole report is one aggregate over `df` plus a row-explode of
    * the single result row — no per-rule scans, no driver-side math.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique")
    val aggs = rules.map(r => r.actual.cast("double").as(r.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val checks = rules.map { r =>
      struct(lit(r.name).as("check"), col(r.name).as("actual"),
        lit(r.op).as("op"), lit(r.threshold).as("threshold"))
    }
    one.select(explode(array(checks: _*)).as("c"))
      .select(col("c.check").as("check"),
        round(col("c.actual"), 6).as("actual"),
        col("c.op").as("op"),
        col("c.threshold").as("threshold"),
        when(col("c.op") === "<=", col("c.actual") <= col("c.threshold"))
          .when(col("c.op") === ">=", col("c.actual") >= col("c.threshold"))
          .otherwise(col("c.actual") === col("c.threshold"))
          .as("passed"))
  }
}
