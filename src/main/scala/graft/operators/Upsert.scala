package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Copy-on-write upsert (MERGE): rows in `updates` replace same-key rows
  * in `base`, new keys append — the mutation primitive a corpus pipeline
  * needs for re-crawls, label corrections, and takedown compliance,
  * re-expressed as a pure dataflow (no table format required: the result
  * IS the next immutable snapshot, written alongside the old one and
  * swapped like `Collection.compact`).
  *
  * Shape: ONE full-outer join on the key. Both sides shuffle on the key
  * — the base side's shuffle is the unavoidable cost of key-matched
  * replacement; when updates are tiny relative to the corpus, prefer
  * running this per partition-bucket of keys (or pre-bucket the base
  * with [[Bucketing]], which makes the join exchange-free on the base
  * side). Column merge is per-column COALESCE(update, base): an update
  * row takes precedence wholesale; a NULL in an update column therefore
  * falls back to the base value (document-level replace-with-null needs
  * a sentinel — the usual MERGE caveat).
  */
object Upsert {

  def apply(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert requires identical schemas; base=${base.columns.toSeq} " +
        s"updates=${updates.columns.toSeq}")
    // SQL MERGE errors on multiple matches for one target row; so do we —
    // a duplicate update key would multiply through the join and corrupt
    // the snapshot. The guard rides the update side's key column (which
    // the join needs, so it can't be pruned away) and costs one window
    // pass over the UPDATE side only — the small side by assumption.
    val dupGuard = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val guarded = updates
      .withColumn("_upd_n", count(lit(1)).over(dupGuard))
      .withColumn(key,
        when(col("_upd_n") === 1, col(key))
          .otherwise(raise_error(concat(
            lit("duplicate update key in upsert: "), col(key).cast("string")))))
      .drop("_upd_n")
    val cols = base.columns.filter(_ != key)
    base.as("b").join(guarded.as("u"),
        col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(
        coalesce(col(s"u.$key"), col(s"b.$key")).as(key) +:
          cols.toSeq.map(c => coalesce(col(s"u.$c"), col(s"b.$c")).as(c)): _*)
  }
}
