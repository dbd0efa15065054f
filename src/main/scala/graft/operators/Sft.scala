package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) example assembly: render (prompt, response)
  * pairs into the training text with an explicit LOSS SPAN — the char
  * range the loss applies to (the response; prompt and template tokens
  * are context only). Emitting the span as offsets instead of a parallel
  * mask array keeps the table narrow, survives any later tokenizer
  * choice (tokenizers map char offsets to token masks), and makes the
  * rendering engine-checkable: the span is pure string-length
  * arithmetic over the same concat both engines compute.
  *
  * Template (the minimal chat shape):
  * {{{
  *   [<|system|>\n{system}\n]<|user|>\n{prompt}\n<|assistant|>\n{response}<|end|>
  * }}}
  *
  * Scale shape: one row-local projection — concat + length arithmetic,
  * whole-stage codegen, no shuffle, stateless on a stream.
  */
object Sft {

  private val UserTag = "<|user|>\n"
  private val AsstTag = "\n<|assistant|>\n"
  private val SysTag = "<|system|>\n"
  private val EndTag = "<|end|>"

  /** `(keyCol, text, loss_start, loss_end)` — 1-based INCLUSIVE char
    * offsets of the response inside `text` (`substring(text, loss_start,
    * loss_end - loss_start + 1) == response` by construction; the spec
    * pins it). Null prompt/response render as empty strings; an empty
    * response yields `loss_end = loss_start - 1` (an empty span, not a
    * dropped row — the caller decides whether to filter empties).
    */
  def renderPairs(df: DataFrame, keyCol: String, promptCol: String,
                  responseCol: String,
                  systemPrompt: Option[String] = None): DataFrame = {
    val p = coalesce(col(promptCol).cast("string"), lit(""))
    val r = coalesce(col(responseCol).cast("string"), lit(""))
    val sys: Column = systemPrompt
      .map(s => concat(lit(SysTag), lit(s), lit("\n")))
      .getOrElse(lit(""))
    val prefix = concat(sys, lit(UserTag), p, lit(AsstTag))
    df.select(col(keyCol),
      concat(prefix, r, lit(EndTag)).as("text"),
      (length(prefix) + 1).cast("long").as("loss_start"),
      (length(prefix) + length(r)).cast("long").as("loss_end"))
  }

  /** Preference-pair (DPO/RLHF reward-model) assembly: each
    * (prompt, chosen, rejected) row renders as TWO training rows
    * sharing the pair key — `(keyCol, side 'chosen'|'rejected', text,
    * loss_start, loss_end)` — both sides through the IDENTICAL template
    * and span arithmetic as [[renderPairs]], so the only difference
    * between a pair's rows is the response span's content (exactly the
    * contrast a preference loss consumes). Row-local: one projection
    * per side, a two-way union, no shuffle.
    */
  def renderPreferencePairs(df: DataFrame, keyCol: String,
                            promptCol: String, chosenCol: String,
                            rejectedCol: String,
                            systemPrompt: Option[String] = None): DataFrame = {
    def side(responseCol: String, label: String) =
      renderPairs(df, keyCol, promptCol, responseCol, systemPrompt)
        .select(col(keyCol), lit(label).as("side"), col("text"),
          col("loss_start"), col("loss_end"))
    side(chosenCol, "chosen").unionByName(side(rejectedCol, "rejected"))
  }

  /** Preference-pair MINING: from a scored candidate pool (N sampled
    * responses per prompt, each with a reward/judge score) pick the
    * per-prompt (chosen, rejected) = (best, worst) pair when the score
    * gap clears `minMargin` — the best-vs-worst construction RLHF/DPO
    * datasets are built from (Ouyang et al. 2022 collect pairwise
    * rankings; best-vs-worst is the max-signal pair). Prompts with one
    * candidate, or whose pool is score-flat (best == worst candidate
    * after tie-breaks), or whose margin is under the floor, emit
    * nothing — a near-tie pair is label noise, not training signal.
    *
    * Scale shape: ONE hash aggregation. Both extremes are struct
    * min/max aggregates (map-side partial combine, constant state per
    * prompt) — no window, no per-prompt sort, no candidate list held
    * anywhere. Ties break deterministically toward the smaller
    * candidate id on both sides (chosen maximizes (score, -id), so the
    * smallest id among top-scored wins; rejected minimizes (score, id)).
    *
    * `candCol` must be numeric (ids); null scores are dropped before
    * mining. Output: (promptCol, chosen_id, rejected_id,
    * margin DOUBLE rounded 6) — margin is chosen minus rejected score.
    */
  def minePreferencePairs(df: DataFrame, promptCol: String, candCol: String,
                          scoreCol: String,
                          minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0.0, s"minMargin must be >= 0, got $minMargin")
    pairsFromExtremes(
      preferenceExtremes(df, promptCol, candCol, scoreCol),
      promptCol, minMargin)
  }

  /** The per-prompt extreme state behind [[minePreferencePairs]]:
    * (promptCol, best_score, best_id, worst_score, worst_id). Constant
    * per-prompt size, so it doubles as the STORED state of an
    * incremental pipeline — fold new candidate batches in with
    * [[mergePreferenceExtremes]] instead of re-scanning the pool (the
    * incremental-novelty/Hamming discipline applied to RLHF mining).
    * The aggregation is also STREAMING-safe as-is (min/max structs are
    * native streaming state): call this on a streaming frame and read
    * the running extremes in Update/Complete mode — stream == batch is
    * spec'd in Session4OpsSpec.
    */
  def preferenceExtremes(df: DataFrame, promptCol: String, candCol: String,
                         scoreCol: String): DataFrame =
    df.filter(col(scoreCol).isNotNull)
      .select(col(promptCol), col(candCol).cast("long").as("__c"),
        col(scoreCol).cast("double").as("__s"))
      .groupBy(col(promptCol))
      .agg(
        max(struct(col("__s").as("s"), (-col("__c")).as("nk"),
          col("__c").as("k"))).as("__best"),
        min(struct(col("__s").as("s"), col("__c").as("k"))).as("__worst"))
      .select(col(promptCol),
        col("__best.s").as("best_score"), col("__best.k").as("best_id"),
        col("__worst.s").as("worst_score"), col("__worst.k").as("worst_id"))

  /** Fold two extreme tables (stored state + a new batch's
    * [[preferenceExtremes]]) into one: min/max are associative, so any
    * batch arrival order converges to the whole-pool extremes (spec'd).
    * Cost is O(prompts touched), never O(candidate pool).
    */
  def mergePreferenceExtremes(a: DataFrame, b: DataFrame,
                              promptCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(promptCol))
      .agg(
        max(struct(col("best_score").as("s"), (-col("best_id")).as("nk"),
          col("best_id").as("k"))).as("__best"),
        min(struct(col("worst_score").as("s"),
          col("worst_id").as("k"))).as("__worst"))
      .select(col(promptCol),
        col("__best.s").as("best_score"), col("__best.k").as("best_id"),
        col("__worst.s").as("worst_score"), col("__worst.k").as("worst_id"))

  /** Extremes -> training pairs: the margin filter and the degenerate
    * (single-candidate / score-flat) drop from [[minePreferencePairs]].
    */
  def pairsFromExtremes(ext: DataFrame, promptCol: String,
                        minMargin: Double = 0.0): DataFrame =
    ext.select(col(promptCol),
        col("best_id").as("chosen_id"),
        col("worst_id").as("rejected_id"),
        round(col("best_score") - col("worst_score"), 6).as("margin"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
}
