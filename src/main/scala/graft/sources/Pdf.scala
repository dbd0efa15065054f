package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** PDF text import (S5) — a minimal but REAL extractor in pure JVM code,
  * replacing round-1's heuristic-only stand-in.
  *
  * Reference behavior (src/pdf.rs:49-73): open the PDF, sample
  * ceil(sqrt(pages)) pages, require >= 50 non-whitespace chars on >= 50%
  * of them (is_text_pdf), then convert the whole document to one text
  * blob. This implementation parses the PDF container directly:
  *
  *  - content streams are located by scanning for `stream`/`endstream`
  *    framing (no xref needed for linearly-written files);
  *  - `/FlateDecode` streams are inflated with `java.util.zip.Inflater`
  *    (zlib is in the JDK — no external dependency);
  *  - text is read from the text-showing operators `Tj`, `'`, and `TJ`
  *    inside the decoded streams, with PDF string-escape handling.
  *
  * Limitations (documented, deliberate): no xref/object-stream chasing,
  * no CID/ToUnicode font maps (simple single-byte encodings only), no
  * encryption. That covers the linear text-first PDFs the reference's
  * `add-docs file.pdf` flow targets; scanned/image PDFs correctly fail
  * the text gate.
  */
object Pdf {

  /** Text of each content stream, in file order — the per-page unit fed
    * to the sampling heuristic (content streams map 1:1 to pages in
    * linearly written text PDFs).
    */
  def extractPageTexts(bytes: Array[Byte]): Seq[String] =
    findStreams(bytes).flatMap { case (dict, raw) =>
      if (dict.contains("/Image")) None
      else {
        val data = if (dict.contains("/FlateDecode")) inflate(raw) else raw
        val txt = textFromContent(new String(data, java.nio.charset.StandardCharsets.ISO_8859_1))
        if (txt.trim.nonEmpty) Some(txt) else None
      }
    }

  /** The reference's is_text_pdf gate over real extracted pages. */
  def isTextPdf(bytes: Array[Byte]): Boolean =
    TextFunctions.isMostlyText(extractPageTexts(bytes))

  /** Whole-document text (pages joined), or None for scanned/undecodable
    * PDFs — the `pdf_to_markdown` analog (pdf.rs:63-73).
    */
  def pdfToText(bytes: Array[Byte]): Option[String] = {
    val pages = extractPageTexts(bytes)
    if (!TextFunctions.isMostlyText(pages)) None
    else Some(pages.mkString("\n\n"))
  }

  /** Distributed read: one row per text-bearing PDF under `path` (glob ok)
    * with columns (path, text). Binary payloads flow through Spark's
    * binaryFile source, so extraction parallelizes per file across
    * executors; scanned PDFs are filtered out like the reference errors
    * them out.
    */
  def readPdfText(spark: SparkSession, path: String): DataFrame = {
    val extract = udf((b: Array[Byte]) => pdfToText(b))
    spark.read.format("binaryFile").load(Ingest.resolvePath(path))
      .select(col("path"), extract(col("content")).as("text"))
      .filter(col("text").isNotNull)
  }

  /** add-docs PDF parity (reference main.rs:445-465 -> collection_actor
    * ImportPdf:724-754): extracted text lands in `column`, optionally
    * chunked so every chunk becomes its own row, through the S6
    * schema-widening path ([[graft.core.Collection.importChunksDf]]).
    * Extraction AND chunking run per file on executors; the driver never
    * holds the chunk list.
    */
  def addPdfChunks(c: graft.core.Collection, path: String, column: String,
                   chunker: Option[graft.functions.Chunker.ChunkerConfig]
                     = None): Unit = {
    val base = readPdfText(c.spark, path)
    val rows = chunker match {
      case Some(cfg) =>
        val f = udf((s: String) =>
          if (s == null) Seq.empty[String]
          else graft.functions.Chunker.chunk(s, cfg))
        base.select(explode(f(col("text"))).as(column))
      case None => base.select(col("text").as(column))
    }
    c.importChunksDf(rows, column)
  }

  /** S5: import every text PDF matching `path` into the collection. */
  def importPdf(c: graft.core.Collection, path: String): Unit =
    c.importDf(readPdfText(c.spark, path))

  /** S5 append form. */
  def appendPdf(c: graft.core.Collection, path: String): Unit =
    c.appendDf(readPdfText(c.spark, path))

  // ---- container parsing ----------------------------------------------

  /** (dict-context, raw-bytes) for every `stream`...`endstream` block. */
  private[sources] def findStreams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val ascii = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var from = 0
    var i = ascii.indexOf("stream", from)
    while (i >= 0) {
      // keyword must be the token "stream", not the tail of "endstream"
      val isEnd = i >= 3 && ascii.regionMatches(i - 3, "endstream", 0, 9)
      if (!isEnd) {
        var dataStart = i + "stream".length
        if (dataStart < ascii.length && ascii.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < ascii.length && ascii.charAt(dataStart) == '\n') dataStart += 1
        val end = ascii.indexOf("endstream", dataStart)
        if (end > dataStart) {
          // walk back to the OUTERMOST `<<` of the stream dict, balancing
          // nested dictionaries (e.g. /DecodeParms << ... >>) — a plain
          // lastIndexOf would stop at the innermost and lose /FlateDecode
          val dictStart = outermostDictStart(ascii, i)
          val dict = if (dictStart >= 0) ascii.substring(dictStart, i) else ""
          // strip the EOL that precedes `endstream`
          var dataEnd = end
          if (dataEnd > dataStart && ascii.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && ascii.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          out += ((dict, java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)))
          from = end + "endstream".length
        } else from = i + "stream".length
      } else from = i + "stream".length
      i = ascii.indexOf("stream", from)
    }
    out.result()
  }

  /** Scanning back from `beforePos`, the position of the `<<` opening the
    * outermost dictionary (nested `<< >>` pairs balanced); -1 if none.
    */
  private[sources] def outermostDictStart(ascii: String, beforePos: Int): Int = {
    // the stream dict closes with `>>` just before `stream`; scanning
    // backwards, the `<<` that brings the depth back to zero is its
    // outermost opener — stop there, never walk into the previous object
    var depth = 0
    var i = beforePos - 1
    while (i > 0) {
      if (ascii.charAt(i) == '>' && ascii.charAt(i - 1) == '>') {
        depth += 1; i -= 2
      } else if (ascii.charAt(i) == '<' && ascii.charAt(i - 1) == '<') {
        if (depth <= 1) return i - 1
        depth -= 1
        i -= 2
      } else i -= 1
    }
    -1
  }

  private[sources] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray // stuck (truncated)
      }
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }
    finally inf.end() // native zlib memory — must not wait for finalization
  }

  /** Text-showing operators in one decoded content stream: `(s) Tj`,
    * `(s) '`, and `[ ... ] TJ` arrays — for both literal strings (escapes
    * per the PDF spec subset: \n \r \t \b \f \( \) \\ and \ooo octal) and
    * hex strings (`<48656C6C6F>`, whitespace allowed, odd length padded
    * with 0 per spec).
    */
  private[sources] def textFromContent(content: String): String = {
    val sb = new StringBuilder
    val lit = """\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>"""
    val tjArray = (s"""\\[((?:$lit|[^\\]])*)\\]\\s*TJ""").r
    val single = (s"""($lit)\\s*(Tj|')""").r
    val litRe = lit.r
    // walk both operator kinds in document order; a Tj-shaped match whose
    // literal sits inside an already-consumed TJ array is skipped
    val matches =
      (tjArray.findAllMatchIn(content).map(m => (m.start, m.end, "TJ", m.group(1))) ++
        single.findAllMatchIn(content).map(m => (m.start, m.end, m.group(2), m.group(1))))
        .toSeq.sortBy(_._1)
    var lastEnd = -1
    matches.foreach { case (start, end, kind, payload) =>
      if (start >= lastEnd) {
        kind match {
          case "TJ" =>
            litRe.findAllIn(payload).foreach(s => sb.append(unescape(s)))
            sb.append(' ')
          case "'" =>
            sb.append('\n').append(unescape(payload))
          case _ =>
            sb.append(unescape(payload)).append(' ')
        }
        lastEnd = end
      }
    }
    sb.toString
  }

  private def unescape(pdfString: String): String =
    if (pdfString.startsWith("<")) {
      val hex = pdfString.stripPrefix("<").stripSuffix(">")
        .filterNot(_.isWhitespace)
      val padded = if (hex.length % 2 == 0) hex else hex + "0"
      val sb = new StringBuilder(padded.length / 2)
      var i = 0
      while (i + 2 <= padded.length) {
        sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
        i += 2
      }
      sb.toString
    } else unescapeLiteral(pdfString)

  private def unescapeLiteral(parenLiteral: String): String = {
    val s = parenLiteral.stripPrefix("(").stripSuffix(")")
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\' || i == s.length - 1) { sb.append(c); i += 1 }
      else {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case d if d >= '0' && d <= '7' =>
            val oct = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(ch => ch >= '0' && ch <= '7')
            sb.append(Integer.parseInt(oct, 8).toChar)
            i += 1 + oct.length
          case other => sb.append(other); i += 2
        }
      }
    }
    sb.toString
  }
}
