package graft.functions

/** Greedy longest-match WordPiece tokenizer (the public algorithm from
  * Devlin et al. 2018, as implemented by the HuggingFace `tokenizers`
  * crate the reference's real-tokenizer branch loads —
  * reference src/chunker.rs:106-114). Fully offline: the vocabulary is a
  * plain newline-delimited piece list (continuation pieces prefixed
  * `##`), shipped as a classpath resource — no model download.
  *
  * Pipeline per word: lowercase, split punctuation into standalone
  * tokens (BERT "basic tokenizer" behavior), then greedy longest-prefix
  * match against the vocab; a word with any unmatchable remainder
  * becomes one `[UNK]` (whole-word UNK, as in BERT).
  *
  * The instance is Serializable and immutable — safe to close over in
  * UDFs and `ChunkerConfig.countTokens`, one shared copy per executor.
  */
final class WordPieceTokenizer(vocab: Seq[String], unkToken: String = "[UNK]")
    extends Serializable {

  private val wordPieces = vocab.filterNot(_.startsWith("##")).toSet
  private val contPieces = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
  private val maxPieceLen =
    (vocab.map(v => if (v.startsWith("##")) v.length - 2 else v.length) :+ 1).max

  /** WordPiece pieces of one already-basic-tokenized token. */
  def tokenizeWord(word0: String): Seq[String] = {
    // Locale.ROOT: default-locale lowercasing (e.g. Turkish dotless i)
    // would change token counts per machine and break the golden pins
    val word = word0.toLowerCase(java.util.Locale.ROOT)
    if (word.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < word.length) {
      val inWord = start == 0
      var len = math.min(maxPieceLen, word.length - start)
      var found = -1
      while (len >= 1 && found < 0) {
        val piece = word.substring(start, start + len)
        val hit = if (inWord) wordPieces.contains(piece) else contPieces.contains(piece)
        if (hit) found = len else len -= 1
      }
      if (found < 0) return Seq(unkToken) // whole-word UNK
      out += (if (inWord) word.substring(start, start + found)
              else "##" + word.substring(start, start + found))
      start += found
    }
    out.result()
  }

  /** Basic-tokenize then WordPiece: whitespace split, punctuation runs
    * become standalone single-char tokens.
    */
  def tokenize(text: String): Seq[String] =
    basicTokens(text).flatMap(tokenizeWord)

  /** The `ChunkerConfig.countTokens` contract: pieces in `text`. */
  def count(text: String): Int = basicTokens(text).map(tokenizeWord(_).length).sum

  private def basicTokens(text: String): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      // split each punctuation char into its own token (BERT basic)
      val parts = Seq.newBuilder[String]
      val cur = new StringBuilder
      for (c <- w) {
        if (!c.isLetterOrDigit) {
          if (cur.nonEmpty) { parts += cur.toString; cur.clear() }
          parts += c.toString
        } else cur.append(c)
      }
      if (cur.nonEmpty) parts += cur.toString
      parts.result()
    }
}

object WordPieceTokenizer {

  /** The shipped demo vocabulary (`graft/wordpiece-vocab.txt` on the
    * classpath): alphabet + digit fallback pieces, common English words
    * and affix pieces. Deterministic — golden tests pin against it.
    */
  lazy val default: WordPieceTokenizer = {
    val in = getClass.getClassLoader.getResourceAsStream("graft/wordpiece-vocab.txt")
    require(in != null, "wordpiece-vocab.txt missing from classpath")
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toVector
      new WordPieceTokenizer(lines)
    } finally in.close()
  }

  /** Load a vocabulary from disk — the reference's `--tokenizer-path`
    * branch (chunker.rs:106-114 loads a HuggingFace tokenizer.json for
    * exact token counting). Accepts either a `tokenizer.json` (the
    * `model.vocab` token->id map, pieces ordered by id) or a plain
    * newline-delimited piece list.
    */
  def fromFile(path: String): WordPieceTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val raw = try src.mkString finally src.close()
    val pieces =
      if (raw.dropWhile(_.isWhitespace).startsWith("{")) {
        import org.json4s._
        org.json4s.jackson.JsonMethods.parse(raw) \ "model" \ "vocab" match {
          case JObject(fields) =>
            fields.collect { case (tok, JInt(id)) => (tok, id) }
              .sortBy(_._2).map(_._1).toVector
          case _ => throw new IllegalArgumentException(
            s"$path: no model.vocab map in tokenizer.json")
        }
      } else raw.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    require(pieces.nonEmpty, s"$path: empty vocabulary")
    new WordPieceTokenizer(pieces)
  }
}
