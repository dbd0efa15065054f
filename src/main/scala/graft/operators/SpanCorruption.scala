package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683 §3.1.4)
  * — the denoising-objective example constructor: mask token spans,
  * replace each span with a numbered sentinel in the INPUT, and emit the
  * masked content behind the same sentinels as the TARGET:
  *
  *   text   : the quick brown fox jumps
  *   input  : the <extra_id_0> fox <extra_id_1>
  *   target : <extra_id_0> quick brown <extra_id_1> jumps
  *
  * Masking is deterministic: token position p of document k masks iff
  * the exact md5 fraction of `salt:k:p` is ≤ rate — reproducible across
  * runs/engines, re-dealable by salt (the q108 discipline), and adjacent
  * masked positions merge into one span exactly like the paper's
  * span-level corruption.
  *
  * Scale shape: every window here is PARTITIONED BY the document key —
  * per-doc span bookkeeping, never a global window; the heavy state is
  * one shuffle of (key, position, token) rows. String assembly is a
  * per-doc sorted-array fold (codegen'd higher-order functions), not a
  * driver loop.
  *
  * Oracle parity: the mask decision is one IEEE compare of an exact
  * hash fraction; span ids are integer running sums; the rendered
  * strings are order-bound concatenations — all bit-identical in a SQL
  * twin with the same windows.
  */
object SpanCorruption {

  private def cleanTokens(text: Column): Column =
    array_remove(TextFunctions.tokens(lower(text)), "")

  /** Per-document corruption example: (keyCol, input, target, n_spans).
    * Documents whose every token masks have input = sentinels only;
    * documents with nothing masked have target = '' and n_spans = 0;
    * empty documents yield ('', '', 0).
    */
  def corrupt(docs: DataFrame, keyCol: String, textCol: String,
              rate: Double = 0.15, salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    val toks = docs
      .select(col(keyCol), posexplode(cleanTokens(col(textCol)))
        .as(Seq("p", "tok")))
    val u = (conv(substring(md5(concat_ws(":", lit(salt),
        col(keyCol).cast("string"), col("p").cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("p"))
    val flagged = toks
      .withColumn("m", u <= lit(rate))
      .withColumn("is_start", col("m") && !lag(col("m"), 1, false).over(w))
      .withColumn("span_id",
        sum(when(col("is_start"), 1L).otherwise(0L)).over(w) - 1L)
    // input piece: unmasked token, or the span's sentinel at its start
    val pieces = flagged.withColumn("piece",
      when(!col("m"), col("tok"))
        .when(col("is_start"),
          concat(lit("<extra_id_"), col("span_id"), lit(">"))))
    // target piece: sentinel-prefixed first token, bare continuation
    val tpieces = flagged.filter(col("m")).withColumn("piece",
      when(col("is_start"),
        concat(lit("<extra_id_"), col("span_id"), lit("> "), col("tok")))
        .otherwise(col("tok")))
    def render(df: DataFrame) = df.filter(col("piece").isNotNull)
      .groupBy(col(keyCol)).agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("piece")))),
          x => x.getField("piece"))).as("s"))
    val inputs = render(pieces).withColumnRenamed("s", "input")
    val targets = tpieces.groupBy(col(keyCol)).agg(
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("p"), col("piece")))),
        x => x.getField("piece"))).as("target"),
      (max(col("span_id")) + 1L).as("n_spans"))
    docs.select(col(keyCol))
      .join(inputs, Seq(keyCol), "left")
      .join(targets, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("input"), lit("")).as("input"),
        coalesce(col("target"), lit("")).as("target"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
