package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All the numeric/string ones are pure Catalyst column expressions
  * (codegen'd, no UDF) with exact DuckDB-SQL equivalents so the driver
  * oracle can hash-match them; language ID is a deterministic Scala UDF
  * (not SQL-expressible — verified by ScalaTest instead).
  *
  * The reference itself has no text analytics beyond a "is mostly text"
  * PDF heuristic (src/pdf.rs:11-41); these are the north-star extensions
  * (BASELINE.json) built on the same `documents` fixture.
  */
object TextFunctions {

  /** Whitespace tokens; empty/blank text -> empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count — the approximate "word count" the reference's
    * chunker builds on (chunker.rs:106-114).
    */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words * 1.3 rounded up, matching
    * the chunker's approximation.
    */
  def approxBpeCount(text: Column): Column =
    ceil(tokenCount(text) * lit(1.3)).cast("long")

  def charCount(text: Column): Column = length(text)

  /** ASCII-punctuation character count (explicit class — identical meaning
    * in Java and DuckDB regex dialects).
    */
  private val PunctClass = """[!-/:-@\[-`{-~]"""
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctClass, ""))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(charCount(text), lit(1))

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      greatest(charCount(text), lit(1))

  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      greatest(charCount(text), lit(1))

  /** Mean word length over non-whitespace chars. */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** The shared English stopword list (quality metrics, the q21/q50/q89
    * oracles, and the keyword `Analyzer.Stopworded` default all use it).
    */
  val Stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this")

  /** Fraction of tokens that are (lowercased) English stopwords — a cheap
    * natural-language-ness signal.
    */
  def stopwordRatio(text: Column): Column = {
    val stops = typedLit(Stopwords)
    size(filter(tokens(text), t => array_contains(stops, lower(t)))).cast("double") /
      greatest(tokenCount(text), lit(1))
  }

  /** Composite document-quality score in [0, 1]: rewards reasonable length
    * and stopword presence, penalizes punctuation/digit noise. Deterministic
    * arithmetic, replicated verbatim in the oracle SQL.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(20.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(5.0), lit(1.0))
    val digitPenalty = least(digitRatio(text) * lit(5.0), lit(1.0))
    round(
      lit(0.4) * lenScore + lit(0.3) * stopScore +
        lit(0.15) * (lit(1.0) - punctPenalty) +
        lit(0.15) * (lit(1.0) - digitPenalty), 6)
  }

  /** Whitespace-normalized lowercase form — the canonical text for exact
    * fingerprinting. Collapse runs FIRST, then trim: `trim` (in Spark and
    * DuckDB alike) strips only spaces, so a trailing `" \n"` would survive
    * trim-then-collapse as a trailing space.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Fraction of non-whitespace characters in a Unicode character
    * class (a Java regex class like `\p{IsHan}` or `[0-9]`) — the
    * script/digit profiling primitive behind [[scriptProfile]]. Counts
    * by removal (`n - length(remove-class)`), row-local codegen'd
    * regexp work, 0.0 on whitespace-only/empty text. BMP-safe: the
    * count is UTF-16 code units, which equals codepoints for every
    * script class profiled here (supplementary-plane text would need a
    * codepoint-true counter).
    */
  def charClassFrac(text: Column, cls: String): Column = {
    val t = regexp_replace(text, "\\s", "")
    val n = length(t)
    when(n === 0, lit(0.0))
      .otherwise((n - length(regexp_replace(t, cls, ""))) / n)
  }

  /** Per-document script/digit profile — the multilingual routing and
    * numeric-junk screen: `(n_chars, latin_frac, han_frac, cyr_frac,
    * digit_frac)` over non-whitespace characters, fractions rounded to
    * 6. A document whose declared `lang` disagrees with its dominant
    * script is mislabeled or encoding-damaged; a document that is
    * mostly digits is a table/serial dump, not prose — both are
    * filter-stage signals cheaper than any model. Pure row-local
    * projection, no shuffle.
    */
  def scriptProfile(text: Column): Seq[Column] = {
    val t = regexp_replace(text, "\\s", "")
    Seq(
      length(t).cast("long").as("n_chars"),
      round(charClassFrac(text, "\\p{IsLatin}"), 6).as("latin_frac"),
      round(charClassFrac(text, "\\p{IsHan}"), 6).as("han_frac"),
      round(charClassFrac(text, "\\p{IsCyrillic}"), 6).as("cyr_frac"),
      round(charClassFrac(text, "[0-9]"), 6).as("digit_frac"))
  }

  /** Exact-dup fingerprint: md5 of the normalized text (md5 produces the
    * same hex in Spark and DuckDB, so this is oracle-checkable).
    */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** PII scrubbing for training corpora: emails, NANP-style phone
    * numbers, and IPv4 addresses replaced by typed redaction markers.
    * Pure Catalyst `regexp_replace` chain (codegen'd, no UDF) with
    * RE2-compatible patterns (no lookaround — DuckDB's RE2 lacks it), so
    * the exact scrubbed string is SQL-oracle-checkable.
    *
    * Order matters: email first (so digit patterns can't partially match
    * inside an address), then IPv4, then phones. IPv4 octets are
    * range-validated (0-255), so a version-like `1.2.3.400` is NOT
    * redacted as an IP. Phones split into two patterns by separator:
    *
    *  - A phone containing at least one HYPHEN cannot be confused with a
    *    dotted digit run, so it keeps plain `\b` anchors — sentence-end
    *    (`call 555-123-4567.`), dot-adjacent (`end.555-123-4567`,
    *    `555-123-4567.5`), and adjacent-phone contexts all redact.
    *  - An all-DOT phone is exactly the ambiguous shape, so it anchors
    *    against adjacent dots and digits by consuming one char of
    *    context per side (restored via `$1`/`$3` backrefs): inside a
    *    longer dotted run such as `192.168.100.1234` no phone sub-match
    *    fires, while `call 555.123.4567.` still redacts (dot followed by
    *    a non-digit is valid trailing context). Known limitation of the
    *    consumed context: two all-dot phones separated by a single
    *    character redact only the first.
    */
  val PiiEmail = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val PiiIpv4 = s"\\b($Octet\\.){3}$Octet\\b"
  val PiiPhoneHyphen = "\\b\\d{3}(-\\d{3}[-.]\\d{4}|\\.\\d{3}-\\d{4})\\b"
  val PiiPhoneDot = "(^|[^.\\d])(\\d{3}\\.\\d{3}\\.\\d{4})(\\.[^\\d]|\\.$|[^.\\d]|$)"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, PiiEmail, "<EMAIL>"),
          PiiIpv4, "<IP>"),
        PiiPhoneHyphen, "<PHONE>"),
      PiiPhoneDot, "$1<PHONE>$3")

  /** HTML → text for tag-bearing web corpora: `script`/`style` elements
    * drop WITH their content (the one place tag-stripping alone leaks
    * non-prose), remaining tags become spaces, the six entities real
    * corpora actually contain unescape (`&amp;` LAST so `&amp;lt;`
    * correctly yields `&lt;`, never a double-unescape to `<`), and
    * whitespace collapses. Row-local codegen'd regexp chain, no UDF —
    * and deliberately RE2-compatible (no backreferences: script and
    * style get separate patterns), so the exact cleaning is
    * re-derivable in any engine. A full HTML parser is a document-
    * format concern (the sources/Pdf precedent); this is the corpus-
    * cleaning step.
    */
  val HtmlScript = "(?is)<script[^>]*>.*?</script>"
  val HtmlStyle = "(?is)<style[^>]*>.*?</style>"
  val HtmlTag = "(?s)<[^>]+>"

  /** Canonical text normalization for web corpora: Unicode NFC (the
    * one-true-composition pass — 'e' + COMBINING ACUTE and precomposed
    * U+00E9 must hash/dedup/tokenize identically or every downstream
    * operator silently splits them), control characters stripped (C0
    * minus tab/newline, plus DEL — PDF and scraped text carry these),
    * whitespace collapsed, trimmed. NFC itself is a JDK `Normalizer`
    * UDF (no Catalyst equivalent; row-local, stream-safe); the strips
    * are codegen'd regexp chains, and the whole pipeline is
    * re-derivable in any engine with an NFC function (DuckDB:
    * `nfc_normalize`), which is what the q179 oracle does.
    */
  def normalizeText(text: Column): Column = {
    val nfc = udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }
    trim(regexp_replace(
      regexp_replace(nfc(text), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))
  }

  def stripHtml(text: Column): Column = {
    val noTags = regexp_replace(
      regexp_replace(regexp_replace(text, HtmlScript, " "), HtmlStyle, " "),
      HtmlTag, " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Word n-gram shingles as an array column (pure Catalyst: slice over a
    * generated index sequence — no UDF, no explode).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** UDF twin of [[wordShingles]] (non-distinct, ordered). Prefer this in
    * hot queries: the Catalyst composition above is a large expression tree
    * that janino spends seconds compiling per plan (measured 5.5s -> 0.6s
    * on the bigram-count query); the UDF is one call.
    */
  def wordShinglesUdf(text: Column, n: Int): Column = {
    val f = udf { (s: String) =>
      val toks = Option(s).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Seq.empty[String]
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    f(text)
  }

  // ---- language ID (deterministic heuristic UDF) ----------------------

  /** Tiny per-language marker profiles: common function words. Scored by
    * marker hits per token; `und` when nothing matches or text is blank.
    * (A trigram model would need shipped profile data; marker words keep it
    * dependency-free and deterministic.)
    */
  private val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Set("el", "la", "los", "las", "es", "una", "que", "por", "para", "con"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "avec"),
    "it" -> Set("il", "la", "che", "di", "è", "una", "per", "con", "del", "non"))

  def detectLang(text: String): String = {
    if (text == null || text.trim.isEmpty) return "und"
    // CJK detection by codepoint range first (no tokenization applies).
    val cjk = text.codePoints().toArray.count(cp =>
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF))
    if (cjk * 2 > text.length) return "zh"
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> toks.count(markers.contains)
    }
    val (best, hits) = scores.maxBy { case (l, h) => (h, l) }
    if (hits == 0) "und" else best
  }

  def langId(text: Column): Column = {
    val f = udf((s: String) => detectLang(s))
    f(text)
  }

  // ---- "is mostly text" heuristic (E7) --------------------------------

  /** The reference's text-PDF detector re-expressed as a cheap text-quality
    * gate (src/pdf.rs:11-41): sample ~ceil(sqrt(pages)) pages, require >= 50
    * non-whitespace chars on >= 50% of sampled pages. Here a "page" is any
    * pre-split unit of text (the PDF parsing itself is out of scope in the
    * zero-egress build).
    */
  val MinCharsPerPage = 50
  def isMostlyText(pages: Seq[String]): Boolean = {
    if (pages.isEmpty) return false
    val sampleN = math.ceil(math.sqrt(pages.length.toDouble)).toInt
    val step = math.max(1, pages.length / sampleN)
    val sampled = pages.indices.by(step).take(sampleN).map(pages)
    val textish = sampled.count(p =>
      p.count(!_.isWhitespace) >= MinCharsPerPage)
    textish * 2 >= sampled.length
  }

  /** Column form over a single text blob: >= 50 non-whitespace chars. */
  def isTextLike(text: Column): Column =
    length(regexp_replace(text, "\\s", "")) >= lit(MinCharsPerPage)

  // ---- rolling-hash fingerprint (Rabin-Karp style) ---------------------

  /** 64-bit polynomial rolling hash of the normalized text (base 257, mod
    * 2^61-1). Content-defined fingerprint usable for shift-tolerant chunk
    * identity. Normalization is collapse-whitespace-THEN-trim (same order
    * as [[normalized]]) so the DuckDB oracle — whose `trim` strips only
    * spaces — computes the identical character stream; the hash itself is
    * plain integer arithmetic, replicated in SQL via `list_reduce`.
    */
  def rollingHash(text: String): Long = {
    val Mod = (1L << 61) - 1 // Mersenne prime modulus
    // (a * 2^k) mod (2^61-1) without 128-bit math: 2^61 ≡ 1 (mod M), so the
    // bits shifted past position 60 wrap around to the bottom. All
    // intermediates stay under 2^62 — no signed overflow.
    def mulPow2(a: Long, k: Int): Long = {
      val r = ((a << k) & Mod) + (a >>> (61 - k))
      if (r >= Mod) r - Mod else r
    }
    var h = 0L
    val s = if (text == null) "" else text.toLowerCase.replaceAll("\\s+", " ").trim
    var i = 0
    while (i < s.length) {
      // h*257 + c = h*256 + h + c, each term < M so the sum fits in 63 bits
      var r = mulPow2(h, 8) + h + s.charAt(i).toLong
      while (r >= Mod) r -= Mod
      h = r
      i += 1
    }
    h
  }

  def rollingHashUdf(text: Column): Column = {
    val f = udf((s: String) => rollingHash(s))
    f(text)
  }
}
