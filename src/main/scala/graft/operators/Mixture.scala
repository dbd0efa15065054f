package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture planning — turn per-source availability into a concrete
  * "how many tokens from each source" plan for a token budget. The
  * standard recipe (GPT-3 App. A, Llama, the Pile): weights are
  * temperature-flattened availability shares (`alpha` < 1 boosts small
  * sources), each source's take is capped at `maxEpochs` passes over
  * its data (up-sampling beyond a few epochs hurts), and `epochs`
  * reports the implied repetition rate.
  *
  *   w_s      = avail_s^alpha / Σ avail^alpha
  *   take_s   = min(avail_s · maxEpochs, round(w_s · budget))
  *   epochs_s = take_s / avail_s
  *
  * Deliberately single-pass (no water-filling redistribution of
  * saturated sources' leftover budget — that is an iterative fixpoint;
  * the `shortfall` column says exactly how much budget went unplaced,
  * and re-running with a higher alpha or budget is the operator's
  * redistribution story).
  *
  * Scale shape: the input is the per-source aggregate (one row per
  * source — the [[DatasetCard]] output shape), so everything here is
  * arithmetic over a source-count-sized frame; the single total is a
  * broadcast scalar. The heavy lifting (counting tokens) already
  * happened upstream.
  */
object Mixture {

  /** Plan columns: (sourceCol, avail, weight r6, take, epochs r6) plus
    * every row carries the same `shortfall` (budget − Σ take, ≥ 0 —
    * nonzero when caps bound the plan).
    */
  def plan(avail: DataFrame, sourceCol: String, tokensCol: String,
           budget: Long, alpha: Double = 0.5,
           maxEpochs: Double = 4.0): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val a = avail.select(col(sourceCol),
      col(tokensCol).cast("long").as("avail"))
    // source-ordered f64 fold (the q109/q131 discipline): the weights
    // are powers (irrational), so a free-order sum could drift a ulp
    // and flip a rounding boundary against a SQL twin
    val wsum = a.agg(aggregate(
      sort_array(collect_list(struct(col(sourceCol).as("s"),
        pow(col("avail").cast("double"), alpha).as("w")))),
      lit(0.0), (acc, x) => acc + x.getField("w")).as("wsum"))
    val planned = a.crossJoin(broadcast(wsum))
      .withColumn("weight",
        round(pow(col("avail").cast("double"), alpha) / col("wsum"), 6))
      .withColumn("take",
        least(
          // floor on the epoch cap, round-half-up on the share — both
          // integer token counts, derived from the ROUNDED weight so
          // the plan is reproducible from its own printed numbers
          floor(col("avail").cast("double") * maxEpochs).cast("long"),
          round(col("weight") * budget, 0).cast("long")))
      .withColumn("epochs",
        // an empty source plans 0 tokens at 0 epochs — guarded, because
        // Spark's double division gives NaN at 0/0 where SQL gives NULL
        when(col("avail") === 0L, lit(0.0))
          .otherwise(round(col("take").cast("double") / col("avail"), 6)))
      .drop("wsum")
    val short = planned.agg((lit(budget) - sum(col("take"))).as("shortfall"))
    planned.crossJoin(broadcast(short))
      .withColumn("shortfall", greatest(col("shortfall"), lit(0L)))
  }
}
