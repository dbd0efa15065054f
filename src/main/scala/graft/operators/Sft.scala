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
}
