package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Design constraints:
  *  - pure `org.apache.spark.sql.functions` column expressions (codegen'd,
  *    no UDFs) so the hot path stays inside whole-stage codegen and scales
  *    as a narrow map stage at 100 TB;
  *  - all hashing is engine-portable arithmetic (md5-derived 48-bit integer
  *    base hash + affine mixing mod a prime), so results are reproducible
  *    bit-for-bit across engines and cluster sizes — a requirement for
  *    incremental dedup over a growing corpus.
  */
object TextAnalysis {

  /** Large primes for portable integer hashing. */
  val P31: Long = 2147483647L   // 2^31 - 1 (Mersenne)
  val P9: Long  = 1000000007L

  /** Whitespace tokenization on single spaces (keeps empties, like a strict
    * split — normalize text first if collapsing runs is wanted).
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Portable 48-bit integer hash: first 12 hex chars of md5. Stable across
    * engines, JVMs and partitions (unlike murmur-with-seed variants whose
    * implementations differ between engines).
    *
    * Evaluated by the native codegen'd expression
    * [[graft.functions.Md5Prefix48]] — numerically identical to
    * `conv(substring(md5(c), 1, 12), 16, 10).cast("long")` but with no hex
    * string materialization / base-16 re-parse per value (this sits in the
    * per-shingle hot path of every minhash/simhash query).
    */
  def hash48(c: Column): Column = graft.functions.NativeHash.hash48Native(c)

  /** hash48 reduced mod 2^31-1 — the base for affine minhash permutations. */
  def hash31(c: Column): Column = hash48(c) % P31

  /** Canonical text normalization for fingerprinting: lower, strip
    * non-alphanumerics (keep spaces), collapse whitespace runs, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint = md5 of normalized text (exact near-canonical
    * dedup key).
    */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Naive-but-engine-portable HTML → text extraction — the web-corpus
    * cleaning stage (trafilatura-lite): drop script/style BLOCKS first
    * (their bodies may contain stray '<'), strip remaining tags,
    * unescape the XML entities + nbsp (&amp; deliberately LAST so
    * double-escaped text resolves one level per pass, the standard
    * order), collapse whitespace. A pure codegen'd regexp_replace
    * chain — no UDF — restricted to the pattern subset (non-greedy
    * dotall, character classes) on which Java regex and RE2 agree, so a
    * DuckDB oracle replays it verbatim.
    */
  def htmlToText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** The document's <title> content (raw — titles are short enough that
    * entity unescaping is the caller's choice).
    */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?s)<title>(.*?)</title>", 1)

  /** HTML block-boundary tags (the elements that start/end a text block;
    * inline markup like a/b/em/span stays INSIDE blocks). `\b` keeps `p`
    * from matching the prefix of `pre` — supported identically by Java
    * regex and RE2.
    */
  val blockTagPattern: String =
    "(?i)</?(?:article|aside|blockquote|br|div|dl|dt|dd|fieldset|" +
      "figcaption|figure|footer|form|h[1-6]|header|hr|li|main|nav|ol|p|" +
      "pre|section|table|tbody|td|th|thead|tr|ul)\\b[^>]*>"

  /** Strip tags, unescape entities, collapse whitespace — the per-block
    * text view (the tail of [[htmlToText]], factored so the block scorer
    * and the oracle share one definition).
    */
  private def blockClean(b: Column): Column = {
    val noTags = regexp_replace(b, "<[^>]+>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Main-content extraction by block-level TEXT-DENSITY scoring — the
    * trafilatura/boilerpipe-shape upgrade over [[htmlToText]]'s bare tag
    * stripping (which keeps nav/footer/sidebar text that must not reach a
    * training corpus). Head/script/style go first, the page splits at
    * block-tag boundaries, and a block survives iff its visible text is
    * long enough (≥ `minLen` chars) AND less than half of it is LINK
    * text (link density < 0.5 — the classic boilerplate discriminator:
    * nav bars, footers and link-list sidebars are mostly anchor text,
    * body paragraphs are not, and a paragraph that merely CONTAINS a
    * link passes). Survivors re-concatenate in document order.
    *
    * A pure regexp/HOF chain (split + filter/transform lambdas — narrow,
    * no UDF, no shuffle), restricted to the Java-regex/RE2-agreeing
    * subset so a DuckDB oracle replays it verbatim.
    */
  def extractMainContent(html: Column, minLen: Int = 20): Column = {
    val noHead = regexp_replace(html, "(?is)<head[^>]*>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val blocks = split(noStyle, blockTagPattern, -1)
    def linkText(b: Column): Column = blockClean(array_join(
      regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "))
    val kept = filter(blocks, b =>
      length(blockClean(b)) >= minLen &&
        length(linkText(b)) * 2 < length(blockClean(b)))
    trim(regexp_replace(
      array_join(transform(kept, b => blockClean(b)), " "), "\\s+", " "))
  }

  /** Order-sensitive rolling polynomial fingerprint over tokens:
    * fold(0, (acc, t) => (acc * 31 + hash48(t)) % P9). Detects permuted
    * copies that set-based (Jaccard) measures miss.
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(
      transform(tokens(text), t => hash48(t)),
      lit(0L),
      (acc, h) => (acc * 31 + h) % P9)

  /** Token count (single-space tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count heuristic: words are split into ~4-char units;
    * count = sum(ceil(len(word)/4)) ≈ byte-pair-encoded token count.
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Stopword fraction of tokens (quality signal). Exact integer counts;
    * the single final division is IEEE double — deterministic.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    hits.cast("double") / size(toks)
  }

  /** Mean token length: exact integer sum / count. */
  def meanTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast("double") / tokenCount(text)

  /** Quality score in [0,1]: combines length band, stopword presence and
    * mean-word-length band — the shape of a C4/Gopher-style filter with
    * deterministic arithmetic.
    */
  def qualityScore(text: Column, nChars: Column): Column =
    qualityLevel(text, nChars).cast("double") / 3

  /** The integer rule-hit count behind [[qualityScore]] (0..3) — the
    * natural BUCKETING key for calibration reports: the score is
    * discrete, so grouping by level is exact and needs no global
    * quantile pass.
    */
  def qualityLevel(text: Column, nChars: Column): Column = {
    val lenOk  = (nChars >= 100 && nChars <= 20000).cast("int")
    val stopOk = (stopwordRatio(text) > 0.001).cast("int")
    val mwl    = meanTokenLen(text)
    val mwlOk  = (mwl >= lit(3.0) && mwl <= lit(12.0)).cast("int")
    (lenOk + stopOk + mwlOk).cast("long")
  }

  /** Duplicate-2-gram fraction (Gopher-style repetition signal): 1 -
    * distinct(2grams)/count(2grams). 0 = no repetition; rises toward 1 for
    * boilerplate/spam. Exact integer counts, one final IEEE division.
    * Evaluated by the native codegen'd kernel
    * [[graft.functions.RepetitionRatio]] — the HOF formulation
    * (transform + array_distinct) is interpreted-per-element and measured
    * 20× slower in filter position (see the expression's scaladoc).
    */
  def repetitionRatio(text: Column): Column =
    graft.functions.NativeTextStats.repetitionRatioNative(text)

  /** Gopher-style rule flags: the composite quality filter as individual
    * boolean signals plus the conjunctive keep decision — the form a real
    * curation pipeline wants (per-rule rejection stats, not just a score).
    * All rules are exact integer/ratio comparisons over codegen'd column
    * expressions: a narrow map stage, no shuffle, thresholds are the
    * contract.
    */
  def gopherFlags(text: Column): Seq[(String, Column)] = {
    val n = tokenCount(text)
    val mwl = meanTokenLen(text)
    val flags = Seq(
      "f_len"  -> (n >= 5 && n <= 10000),
      "f_mwl"  -> (mwl >= 2.0 && mwl <= 10.0),
      "f_stop" -> (stopwordRatio(text) >= 0.01),
      "f_rep"  -> (repetitionRatio(text) < 0.3))
    flags :+ ("kept" -> flags.map(_._2).reduce(_ && _))
  }

  /** The PII redaction chain, applied IN ORDER (order is part of the
    * contract — each rule must fire before a later, coarser rule can
    * shred its shape): emails first (user parts contain dots/digits),
    * UUIDs before the digit rules (hex segments contain digit runs),
    * grouped credit-card digits before phones (a 4-4-4-4 group's tail
    * would otherwise match the 3-3-4 phone shape; covers 4-4-4-4 with
    * per-gap independent separators — mixed "1234-5678 9012-3456"
    * included — and Amex's 4-6-5 grouping), separator-tolerant
    * phones, IPv4 before the bare digit-run rule (dots split octets),
    * and long contiguous digit runs last (account numbers, unformatted
    * cards/phones). Patterns are the RE2-compatible Java-regex subset
    * (character classes, bounded quantifiers, `\b`, optional groups —
    * no lookaround, no backrefs) so a DuckDB oracle replays the chain
    * verbatim; the l18 oracle is BUILT from this Seq.
    */
  val redactionRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
      "[0-9a-fA-F]{12}\\b", "<UUID>"),
    ("\\b\\d{4}[- ](\\d{6}[- ]\\d{5}|\\d{4}[- ]\\d{4}[- ]\\d{4})\\b", "<CC>"),
    ("(\\+\\d{1,2}[ .-]?)?(\\(\\d{3}\\)[ .-]?|\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b",
      "<PHONE>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("[0-9]{7,}", "<NUM>"))

  /** Deterministic PII-shaped redaction: emails, UUIDs, grouped card
    * numbers, separator-tolerant phones, IPv4 addresses and long digit
    * runs replaced by fixed tokens (the masking pass of a training-data
    * pipeline; the regexes are the contract, so results are
    * engine-portable). A pure codegen'd [[redactionRules]] fold — no
    * UDF, narrow scan path.
    */
  def redact(text: Column): Column =
    redactionRules.foldLeft(text) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }

  /** Language-ID marker vocabularies (function-word heuristic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "los", "que", "es", "de"),
    "fr" -> Seq("le", "la", "les", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不")
  )

  /** N-gram/function-word language ID: score each language by marker-token
    * hits; argmax wins, ties broken by language-code order (the seq above is
    * sorted), zero hits => "und". Pure integer comparisons — deterministic.
    *
    * Shape note: each score is computed ONCE into an array of (score,
    * reversed-index) structs and `array_max` picks the winner — struct
    * ordering is (score, then reversed index), so ties resolve to the
    * EARLIEST language, matching "first max wins". The natural
    * when/otherwise foldLeft duplicates every prior score expression inside
    * each comparison level: exponential expression growth that measured 7×
    * on the composed l33 pipeline.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val n = langMarkers.size
    val entries = langMarkers.zipWithIndex.map { case ((_, markers), i) =>
      struct(size(filter(toks, t => t.isInCollection(markers))).as("s"),
        lit(n - 1 - i).as("ri"))
    }
    val best = array_max(array(entries: _*))
    val codes = lit(langMarkers.map(_._1).toArray)
    when(best.getField("s") > 0,
      element_at(codes, lit(n) - best.getField("ri"))).otherwise(lit("und"))
  }
}
