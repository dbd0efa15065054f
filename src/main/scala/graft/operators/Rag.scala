package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** RAG context assembly: turn a ranked hits page into the prompt context
  * a generator consumes. The reference is a RAG-native store (its README
  * positions search output as LLM context); this is the missing last
  * step — deterministic, budget-aware packing of the page into one
  * context block.
  *
  * Greedy by rank: documents enter in (score DESC, key ASC) order while
  * the running whitespace-token total stays within `budgetTokens`; a
  * document that would overflow is skipped and packing CONTINUES (the
  * standard skip-and-continue knapsack heuristic — a long #2 must not
  * starve short #3..#k). Everything is row-local arithmetic on a page
  * of k <= 100 rows that is already driver-bounded — packing adds no
  * corpus-scale work at all.
  */
object Rag {

  /** Pack a hits page `(content, key, score)` into one context row:
    * `(context, n_docs, n_tokens)`. `context` is the selected documents
    * joined by `sep` in rank order; token counts are whitespace tokens
    * (the [[TextFunctions.tokens]] definition every quality metric
    * shares).
    */
  def packContext(page: DataFrame, budgetTokens: Int,
                  contentCol: String = "content", keyCol: String = "key",
                  scoreCol: String = "score", sep: String = "\n\n"): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    // one struct array, sorted by rank: (-score, key) ascending == the
    // page order; the greedy fold then runs INSIDE one aggregate expression
    // so the whole pack is a single row-local pass over k structs
    val ranked = sort_array(collect_list(struct(
      (-col(scoreCol)).as("ns"), col(keyCol).as("k"),
      coalesce(col(contentCol).cast("string"), lit("")).as("c"))))
    // fold state: (tokens used, docs taken, packed text)
    val packed = aggregate(
      ranked,
      struct(lit(0L).as("used"), lit(0L).as("n"), lit("").as("ctx")),
      (acc, x) => {
        val nt = size(TextFunctions.tokens(lower(x.getField("c")))).cast("long")
        val fits = acc.getField("used") + nt <= budgetTokens
        struct(
          when(fits, acc.getField("used") + nt).otherwise(acc.getField("used")).as("used"),
          when(fits, acc.getField("n") + 1).otherwise(acc.getField("n")).as("n"),
          when(fits,
            when(acc.getField("n") === 0, x.getField("c"))
              .otherwise(concat(acc.getField("ctx"), lit(sep), x.getField("c"))))
            .otherwise(acc.getField("ctx")).as("ctx"))
      })
    page.agg(packed.as("p"))
      .select(col("p.ctx").as("context"), col("p.n").as("n_docs"),
        col("p.used").as("n_tokens"))
  }
}
