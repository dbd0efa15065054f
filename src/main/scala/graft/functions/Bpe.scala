package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch, ACL
  * 2016) — the tokenizer-training step of a training-data pipeline,
  * distributed the way BPE is actually trained at scale: ONE corpus-
  * linear pass builds the word-frequency table (distinct words with
  * counts — vocabulary-sized, orders of magnitude smaller than the
  * corpus), and every merge iteration runs over THAT table only. A 100
  * TB corpus with a 100M-word vocabulary pays the corpus scan once;
  * each of the (typically 30-60k) merge rounds is a small aggregate +
  * array rewrite over the vocab table, never a corpus re-scan.
  *
  * Determinism: candidate merges rank by (count DESC, pair ASC) — a
  * total order, so the learned merge list is reproducible across runs,
  * partitionings, and engines (counts are exact integers; no float
  * anywhere). The round-1 pair counts are the SQL-checkable surface
  * (q143); the iterative loop is spec'd against a driver-side reference
  * implementation (BpeSpec), the house pattern for fixpoint operators.
  *
  * Words are lowercased whitespace tokens (the corpus-wide `Toks`
  * discipline); initial symbols are single characters, merges
  * concatenate adjacent symbol pairs left-to-right (the paper's greedy
  * application order — the fold below reproduces it exactly, because a
  * freshly merged symbol `a+b` can never equal the left element `a` of
  * the same rule, so overlapping occurrences like "aaa" merge
  * non-overlapping from the left).
  */
object Bpe {

  /** One merge rule: adjacent symbols `a`,`b` rewrite to `a+b`. */
  final case class Merge(a: String, b: String, count: Long)

  /** Corpus -> word-frequency table `(word, freq)` — the single
    * corpus-linear pass; everything downstream is vocab-sized.
    */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Tokenizer-coverage report: per `groupCol` value, how well a stored
    * vocabulary covers the corpus at word granularity — total tokens,
    * out-of-vocabulary tokens, OOV rate, and distinct OOV types. This is
    * the fertility/coverage health check run before committing to a
    * tokenizer for a training run: a source whose OOV rate spikes is
    * either a language the vocab wasn't trained on or a corpus-drift
    * signal (new jargon, encoding damage).
    *
    * `vocab` is any DataFrame with a `word` column (e.g. the stored
    * tokenizer artifact's vocab table, or [[wordFreqs]] top-N).
    * Tokenization matches [[wordFreqs]] (lowercased whitespace words),
    * so `coverage(df, c, g, wordFreqs(df, c))` is total coverage by
    * construction.
    *
    * Scale shape: one corpus-linear explode, one broadcast hash join
    * against the vocab (vocabularies are ≤ a few hundred thousand rows
    * — always the broadcast side), one partial-agg'd groupBy on
    * `groupCol`. No window, no shuffle beyond the per-group aggregate.
    */
  def coverage(df: DataFrame, textCol: String, groupCol: String,
               vocab: DataFrame): DataFrame = {
    val toks = df.select(col(groupCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val v = vocab.select(col("word")).distinct()
      .withColumn("__in_vocab", lit(1))
    toks.join(broadcast(v), Seq("word"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("__in_vocab").isNull, col("word")))
          .as("n_oov_types"))
      .select(col(groupCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov") / col("n_tokens"), 6).as("oov_rate"),
        col("n_oov_types"))
  }

  /** Attach the initial symbol decomposition (single characters). */
  def withSymbols(wordFreqs: DataFrame): DataFrame =
    wordFreqs.withColumn("syms",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Adjacent-pair counts over a symbolized vocab table, weighted by
    * word frequency: `(sym_a, sym_b, cnt)`.
    */
  def pairCounts(symbolized: DataFrame): DataFrame =
    symbolized
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS sym_a,
          |              element_at(syms, i + 1) AS sym_b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Left-to-right greedy application of ONE merge rule to a symbol
    * array — a linear fold, codegen-friendly (no UDF).
    */
  def applyMergeCol(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(s))))
  }

  /** Learn `numMerges` merge rules. Each round: count pairs over the
    * vocab table, pick the (count DESC, pair ASC) argmax, rewrite the
    * symbol arrays, checkpoint (truncating the per-round lineage so
    * round r never replays rounds 1..r-1). Stops early when the best
    * pair's count drops below `minCount`.
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var vocab = withSymbols(wordFreqs(df, textCol)).localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("sym_a"), col("sym_b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val m = Merge(top(0).getAs[String]("sym_a"),
          top(0).getAs[String]("sym_b"), top(0).getAs[Long]("cnt"))
        out += m
        vocab = vocab.withColumn("syms",
          applyMergeCol(col("syms"), m.a, m.b)).localCheckpoint(true)
        round += 1
      }
    }
    out.result()
  }

  /** Tokenize a corpus with a learned merge list: words decompose to
    * characters, then each rule applies in learned order (rule r only
    * ever sees the output of rules 1..r-1 — the standard BPE apply).
    * Returns the input plus a `tokens` array column of the
    * concatenation of all words' symbol sequences.
    *
    * Scale shape: row-local (no shuffle, no join); the merge list is a
    * compile-time literal chain, so a 30k-rule tokenizer belongs behind
    * a broadcast trie in production — this expression form is for the
    * short rule lists the specs and demos use.
    */
  def segment(df: DataFrame, textCol: String, merges: Seq[Merge],
              out: String = "tokens"): DataFrame = {
    val words = filter(split(trim(lower(col(textCol))), "\\s+"),
      w => w =!= "")
    // per-word symbol arrays, then fold every merge rule over them
    val base = transform(words, w =>
      transform(sequence(lit(1), length(w)), i => substring2(w, i)))
    val folded = merges.foldLeft(base) { (acc, m) =>
      transform(acc, syms => applyMergeCol(syms, m.a, m.b))
    }
    df.withColumn(out, flatten(folded))
  }

  /** `substring(str, i, 1)` with a Column start — the builtin binds a
    * literal start, so spell it via `expr`-free slicing.
    */
  private def substring2(s: Column, i: Column): Column =
    s.substr(i, lit(1))

  /** Driver-side twin of [[applyMergeCol]] — one rule, one word, same
    * left-to-right fold (a fresh `a+b` can never re-match as `a`).
    */
  def applyMergeLocal(syms: Vector[String], a: String, b: String): Vector[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (buf.nonEmpty && buf.last == a && s == b)
        buf(buf.length - 1) = a + b
      else buf += s
    }
    buf.toVector
  }

  /** Tokenize with a STORED rule list (the serving path): rules ship as
    * a broadcast-sized array and apply row-locally in learned order —
    * no shuffle, no join, no per-rule expression nesting (a 30k-rule
    * tokenizer as a [[segment]] expression chain would explode codegen;
    * here rule application is a plain loop per word). Bit-equal to
    * [[segment]] for any rule list (spec'd).
    */
  def segmentWithRules(df: DataFrame, textCol: String,
                       rules: Seq[(String, String)],
                       out: String = "tokens"): DataFrame = {
    val bRules = df.sparkSession.sparkContext.broadcast(rules.toArray)
    val tokUdf = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        .iterator.flatMap { word =>
          var syms = word.map(_.toString).toVector
          bRules.value.foreach { case (a, b) =>
            syms = applyMergeLocal(syms, a, b)
          }
          syms
        }.toSeq
    }
    df.withColumn(out, tokUdf(col(textCol)))
  }
}
