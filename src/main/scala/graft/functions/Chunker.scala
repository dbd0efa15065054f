package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Hierarchical markdown chunker (E6) — the reference's only UDTF-like
  * operator (1 text -> N chunks), re-expressed in Scala.
  *
  * Behavioral spec (reference src/chunker.rs:76-299):
  *   1. blank text -> no chunks; text within `maxTokens` -> itself;
  *   2. otherwise split at ATX header boundaries, trying H1 then H2 then H3,
  *      recursing into oversized sections (chunker.rs:135-175);
  *   3. sections still too large split on blank-line paragraphs, merged
  *      greedily up to the limit with `overlapTokens` carried between chunks
  *      (chunker.rs:180-232);
  *   4. single oversized paragraphs fall back to raw token-window splitting
  *      with overlap, always advancing to guarantee termination
  *      (chunker.rs:236-279).
  *
  * Token counting approximates 1.3 tokens per whitespace word, rounded up
  * (chunker.rs:106-114; the real-tokenizer branch needs a model file — out
  * of scope offline). Headers are `#{1,6}` followed by space or EOL
  * (chunker.rs:118-131).
  *
  * Spark surface: `chunkMarkdown` returns `array<string>`; pair with
  * `explode` for the table-generating form. The algorithm is per-row pure —
  * it parallelizes trivially and needs no shuffle.
  */
object Chunker {

  /** Default token counter: 1.3 tokens per whitespace word, rounded up
    * (the reference's approximation, chunker.rs:106-114).
    */
  val approxTokens: String => Int = { text =>
    val words = text.split("\\s+").count(_.nonEmpty)
    math.ceil(words * 1.3).toInt
  }

  /** `countTokens` is pluggable — drop in a real tokenizer's counter
    * (the reference's tokenizer branch, chunker.rs:106-114) and every
    * split decision follows it; the split logic itself never changes.
    */
  final case class ChunkerConfig(maxTokens: Int = 512, overlapTokens: Int = 50,
                                 countTokens: String => Int = approxTokens)

  def countTokens(text: String): Int = approxTokens(text)

  /** Header level (count of leading '#', 1..6) when `line` is an ATX header:
    * '#'*level followed by a space or end-of-line.
    */
  def headerLevel(line: String): Option[Int] = {
    if (!line.startsWith("#")) None
    else {
      val level = line.takeWhile(_ == '#').length
      if (level > 6) None
      else if (line.length == level || line.charAt(level) == ' ') Some(level)
      else None
    }
  }

  def chunk(text: String, config: ChunkerConfig = ChunkerConfig()): Seq[String] = {
    if (text.trim.isEmpty) Seq.empty
    else if (config.countTokens(text) <= config.maxTokens) Seq(text)
    else
      splitByHeaders(text, config).flatMap { seg =>
        if (seg.trim.isEmpty) Seq.empty
        else if (config.countTokens(seg) <= config.maxTokens) Seq(seg)
        else splitByParagraphs(seg, config)
      }
  }

  /** Try H1, then H2, then H3 boundaries; first level that actually splits
    * wins, and oversized sections recurse (to find deeper headers inside).
    */
  private def splitByHeaders(text: String, config: ChunkerConfig): Seq[String] = {
    (1 to 3).iterator
      .map(level => splitAtLevel(text, level))
      .find(_.length > 1)
      .map(_.flatMap { section =>
        if (config.countTokens(section) > config.maxTokens) splitByHeaders(section, config)
        else Seq(section)
      })
      .getOrElse(Seq(text))
  }

  /** Split at exactly `level` headers, keeping each header with the section
    * it opens.
    */
  private def splitAtLevel(text: String, level: Int): Seq[String] = {
    val sections = Seq.newBuilder[String]
    val current = new StringBuilder
    for (line <- text.linesIterator) {
      if (headerLevel(line).contains(level) && current.toString.trim.nonEmpty) {
        sections += current.toString.replaceAll("\\s+$", "")
        current.clear()
      }
      current.append(line).append('\n')
    }
    if (current.toString.trim.nonEmpty)
      sections += current.toString.replaceAll("\\s+$", "")
    sections.result()
  }

  /** Greedy paragraph merge up to the token limit, with overlap carry-over;
    * paragraphs that alone exceed the limit go through the raw token split
    * (their sub-chunks are final — no carry into the accumulator).
    */
  private def splitByParagraphs(text: String, config: ChunkerConfig): Seq[String] = {
    val chunks = Seq.newBuilder[String]
    var current = ""
    for (raw <- text.split("\n\n"); para = raw.trim if para.nonEmpty) {
      if (config.countTokens(para) > config.maxTokens) {
        if (current.trim.nonEmpty) { chunks += current; current = "" }
        chunks ++= splitByTokens(para, config)
      } else {
        val candidate = if (current.isEmpty) para else s"$current\n\n$para"
        if (config.countTokens(candidate) <= config.maxTokens) current = candidate
        else {
          if (current.trim.nonEmpty) chunks += current
          val overlap = tailOverlap(current, config)
          current = if (overlap.isEmpty) para else s"$overlap\n\n$para"
        }
      }
    }
    if (current.trim.nonEmpty) chunks += current
    chunks.result()
  }

  /** Raw token-window split of one oversized block. Chunks hold whole words;
    * the window rewinds by up to `overlapTokens` between chunks but always
    * advances past a chunk that overlap would stall on (termination even for
    * a 500-char single "word").
    */
  private def splitByTokens(text: String, config: ChunkerConfig): Seq[String] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Seq.empty
    // with the default counter, the token count of a joined word slice is
    // ceil(wordCount * 1.3) — computed arithmetically instead of re-joining
    // the growing slice per step (O(W^2) on a single huge paragraph); a
    // custom counter gets the honest join-and-count
    val defaultCounter = config.countTokens eq approxTokens
    def sliceTokens(start: Int, end: Int): Int =
      if (defaultCounter) math.ceil((end - start) * 1.3).toInt
      else config.countTokens(words.slice(start, end).mkString(" "))
    val chunks = Seq.newBuilder[String]
    var start = 0
    while (start < words.length) {
      var end = start + 1
      while (end < words.length && sliceTokens(start, end + 1) <= config.maxTokens)
        end += 1
      chunks += words.slice(start, end).mkString(" ")
      start =
        if (config.overlapTokens == 0 || end >= words.length) end
        else {
          var overlapWords = 0
          var tokCount = 0
          var i = end - 1
          var done = false
          while (i >= 0 && !done) {
            val wTokens = config.countTokens(words(i))
            if (tokCount + wTokens > config.overlapTokens) done = true
            else { tokCount += wTokens; overlapWords += 1; i -= 1 }
          }
          val newStart = end - overlapWords
          if (newStart > start) newStart else end
        }
    }
    chunks.result()
  }

  /** Longest word-suffix of `text` within `overlapTokens`. */
  private def tailOverlap(text: String, config: ChunkerConfig): String = {
    if (config.overlapTokens == 0 || text.isEmpty) return ""
    val words = text.split("\\s+").filter(_.nonEmpty)
    var taken = 0
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = words.length - 1
    var done = false
    while (i >= 0 && !done) {
      val t = taken + config.countTokens(words(i))
      if (t > config.overlapTokens) done = true
      else { taken = t; kept.prepend(words(i)); i -= 1 }
    }
    kept.mkString(" ")
  }

  /** Column form: `chunk_markdown(text)` -> array<string>. */
  def chunkMarkdown(text: Column, maxTokens: Int = 512, overlapTokens: Int = 50): Column = {
    val config = ChunkerConfig(maxTokens, overlapTokens)
    val f = udf((s: String) => if (s == null) Seq.empty[String] else chunk(s, config))
    f(text)
  }
}
