package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for LLM training-data pipelines. All are
 * compositions of built-in (codegen'd) Spark SQL functions — no Scala
 * UDFs in the hot path, so whole-stage codegen stays intact and the
 * same column expressions run unchanged on a 1000-executor cluster.
 */
object TextFunctions {

  /** Canonical whitespace normalization: collapse EVERY whitespace run
    * (tabs, newlines, CRs included) to one space FIRST, then trim.
    * Order matters (r17 review): Spark's `trim` strips only the space
    * character, so the old trim-then-collapse left a boundary space on
    * tab/newline-padded text — "foo\n" fingerprinted differently from
    * "foo", and boundary splits kept phantom empty tokens that
    * inflated every token-denominated metric (tokenCountWs,
    * meanWordLen, stopwordRatio → qualityScore) on real-world
    * newline-terminated documents. Collapsing first turns any boundary
    * whitespace into a plain space trim CAN strip. */
  private[graft] def normWs(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = {
    val n = normWs(text)
    when(length(n) === 0, lit(0)).otherwise(size(split(n, " ")))
  }

  /**
   * BPE-ish subword count: alphanumeric runs plus individual
   * non-space punctuation marks, the way byte-pair tokenizers
   * pre-segment text. RE2-compatible pattern (no lookaround) so the
   * same regex is oracle-checkable.
   */
  val BpeTokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Character length. */
  def charCount(text: Column): Column = length(text)

  /** Ratio of punctuation chars to all chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(length(text) === 0, lit(0.0)).otherwise(punct.cast("double") / length(text))
  }

  /** Ratio of uppercase letters to all letters (0 when no letters). */
  def upperRatio(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^A-Za-z]", ""))
    val uppers = length(regexp_replace(text, "[^A-Z]", ""))
    when(letters === 0, lit(0.0)).otherwise(uppers.cast("double") / letters)
  }

  /** Mean whitespace-token length in characters. */
  def meanWordLen(text: Column): Column = {
    val toks = tokenCountWs(text)
    when(toks === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / toks)
  }

  /** English stopword hit ratio among whitespace tokens. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "that", "this", "it", "as", "be", "at", "by")

  def stopwordRatio(text: Column): Column = {
    val n = normWs(text)
    val toks = split(lower(n), " ")
    val hits = size(filter(toks, t => t.isin(EnglishStopwords: _*)))
    when(length(n) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks))
  }

  /**
   * Composite quality score in [0,1]: length sweet-spot, moderate
   * punctuation, presence of stopwords, not shouting. The standard
   * heuristic-filter family (Gopher/C4-style rules) expressed as one
   * codegen'd column.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(charCount(text).cast("double") / 500.0, lit(1.0))
    val punctOk = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.3)
    val stopOk = when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.4)
    val caseOk = when(upperRatio(text) <= 0.3, 1.0).otherwise(0.5)
    round((lenScore * 0.4 + punctOk * 0.2 + stopOk * 0.2 + caseOk * 0.2), 4)
  }

  /**
   * Fraction of lines that are duplicates of an earlier line — the
   * Gopher-style repetition filter signal. 0 for single-line/empty
   * text; codegen-friendly (array ops, no UDF).
   */
  def repetitionRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val n = size(lines)
    val distinctN = size(array_distinct(lines))
    when(n <= 0, lit(0.0)).otherwise((n - distinctN).cast("double") / n)
  }

  /** Non-empty lines of a document — the unit the RefinedWeb/Gopher
    * LINE-wise rules are stated over (ratio denominators must not count
    * blank separator lines, or a sparsely-formatted doc dilutes every
    * signal). */
  private def nonEmptyLines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** Share of lines starting with a list-bullet marker (`-`, `*`, and
    * the typographic bullets) — the Gopher rule drops docs with > 90%
    * bullet lines (scraped navigation/menus render as bullet swarms).
    * RE2-compatible class, oracle-replayable. */
  val BulletLinePattern = "^[-*•‣▪●·]\\s"

  def bulletLineRatio(text: Column): Column = {
    val lines = nonEmptyLines(text)
    val n = size(lines)
    val bullets = size(filter(lines, l => trim(l).rlike(BulletLinePattern)))
    when(n <= 0, lit(0.0)).otherwise(bullets.cast("double") / n)
  }

  /** Share of lines ending in an ellipsis ("..." or the one-char
    * `…`) — truncated-teaser boilerplate ("read more...");
    * Gopher drops docs above 30%. */
  def ellipsisLineRatio(text: Column): Column = {
    val lines = nonEmptyLines(text)
    val n = size(lines)
    val ell = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
    when(n <= 0, lit(0.0)).otherwise(ell.cast("double") / n)
  }

  /** Share of lines that carry NO alphabetic character (prices, page
    * numbers, table debris, separators) — prose has almost none. */
  def nonAlphaLineRatio(text: Column): Column = {
    val lines = nonEmptyLines(text)
    val n = size(lines)
    val numeric = size(filter(lines, l => !l.rlike("[A-Za-z]")))
    when(n <= 0, lit(0.0)).otherwise(numeric.cast("double") / n)
  }

  /** The composed line-wise keep decision (RefinedWeb/Gopher line
    * rules): ≤ 90% bullet lines, ≤ 30% ellipsis lines, ≤ 50% lines
    * with no letters. Thresholds are the published defaults; callers
    * tune per corpus. */
  def lineQualityKeep(text: Column,
                      maxBulletRatio: Double = 0.9,
                      maxEllipsisRatio: Double = 0.3,
                      maxNonAlphaRatio: Double = 0.5): Column =
    bulletLineRatio(text) <= maxBulletRatio &&
      ellipsisLineRatio(text) <= maxEllipsisRatio &&
      nonAlphaLineRatio(text) <= maxNonAlphaRatio

  /** Code-symbol character class: the punctuation that dominates
    * source code but is rare in prose. RE2-compatible. */
  val CodeSymbolPattern = "[{}\\[\\]();=<>+\\-*/&|^%#@!~]"

  /** Share of code-symbol characters — prose sits well under 0.05,
    * real source code above 0.10. */
  def symbolRatio(text: Column): Column = {
    val sym = length(text) - length(regexp_replace(text, CodeSymbolPattern, ""))
    when(length(text) === 0, lit(0.0)).otherwise(sym.cast("double") / length(text))
  }

  /** Share of non-empty lines starting with ≥ 2 spaces or a tab —
    * block indentation, the strongest structural code signal. */
  def indentedLineRatio(text: Column): Column = {
    val lines = nonEmptyLines(text)
    val n = size(lines)
    val ind = size(filter(lines, l => l.rlike("^(  |\\t)")))
    when(n <= 0, lit(0.0)).otherwise(ind.cast("double") / n)
  }

  /** Language-keyword hits per whitespace token (def/class/import/
    * return/function/const/void/public — high-frequency keywords
    * shared across mainstream languages), word-boundary anchored so
    * prose "definition"/"classical" don't fire; bare if/else/for/while
    * are deliberately absent — they are common English words and would
    * make every conditional sentence look like code. */
  val CodeKeywordPattern: String =
    "\\b(?:def|class|import|return|function|const|var|void|public|static)\\b"

  def codeKeywordDensity(text: Column): Column = {
    val hits = size(regexp_extract_all(text, lit(CodeKeywordPattern), lit(0)))
    val toks = tokenCountWs(text)
    when(toks <= 0, lit(0.0)).otherwise(hits.cast("double") / toks)
  }

  /** Composite code-likeness in [0,1] — the pre-training mix labeling
    * signal (route to the code pipeline, or weight code differently in
    * the corpus mix). Weights chosen so prose scores ≈ 0.05-0.2 and
    * real source ≥ 0.5; exact formula mirrored by the oracle, so
    * treat it as a contract, not a tunable. */
  def codeLikeScore(text: Column): Column =
    least(lit(1.0),
      symbolRatio(text) * 3.0 + indentedLineRatio(text) * 0.5 +
        codeKeywordDensity(text) * 2.0)

  /** Mojibake/encoding-damage character class: the U+FFFD replacement
    * char (a decoder already gave up), C0 controls except \t \n \r,
    * DEL, and the C1 range U+0080–U+009F (the classic signature of
    * cp1252 bytes mislabeled as UTF-8). RE2-compatible, so the same
    * pattern is oracle-checkable. */
  val MojibakePattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F\\x{FFFD}]"

  /** Share of mojibake/control characters — the standard crawl-hygiene
    * signal for encoding damage (mislabeled charsets, truncated
    * multi-byte sequences, binary spills into text fields). 0 for
    * empty text; threshold upstream of tokenization — damaged bytes
    * poison shingles, fingerprints and LM scores alike. */
  def mojibakeRatio(text: Column): Column = {
    val bad = length(text) - length(regexp_replace(text, MojibakePattern, ""))
    when(length(text) === 0, lit(0.0)).otherwise(bad.cast("double") / length(text))
  }

  /**
   * Shannon entropy (bits/char) over the character distribution —
   * low-entropy documents are boilerplate/degenerate. Computed with
   * aggregate over the distinct characters of the normalized text.
   */
  def charEntropy(text: Column): Column = {
    // guard against split("") emitting empty elements (regex-engine /
    // version dependent) — a phantom "" char would bias every entropy
    val chars = filter(split(text, ""), c => length(c) > 0)
    val n = size(chars)
    val uniq = array_distinct(chars)
    val ent = aggregate(uniq, lit(0.0d), (acc, ch) => {
      val cnt = size(filter(chars, c => c === ch)).cast("double")
      val p = cnt / n.cast("double")
      acc - p * log2(p)
    })
    when(n <= 0, lit(0.0)).otherwise(ent)
  }

  /**
   * 64-bit content fingerprint over normalized text (case-folded,
   * whitespace-collapsed) — xxHash64, a distributed-friendly stand-in
   * for a rolling Rabin hash: identical post-normalization content
   * maps to the same bucket on any executor.
   */
  def fingerprint(text: Column): Column =
    xxhash64(lower(normWs(text)))

  /** Seeded variant over the SAME normalization chain — callers that
    * need independent hashes (two-hash streaming dedup) must not
    * re-spell the chain inline, or the next normalization fix misses
    * the copy and batch/streaming fingerprints silently diverge (the
    * exact drift class the r17 normWs fix closed).
    *
    * The seed goes FIRST (r18, ADVICE): Spark's xxhash64 folds
    * children sequentially with the running hash as the next seed, so
    * `xxhash64(text, seed)` is H(seed, H(text, 42)) — a deterministic
    * function of the UNSEEDED fingerprint, meaning any 64-bit
    * collision between distinct texts collides on BOTH columns and a
    * widened two-hash dedup key adds zero collision resistance.
    * Seed-first perturbs the hash STATE before the text folds in,
    * yielding a genuinely independent family. (Streaming note: this
    * changes `_fp2` values, so dropDuplicatesWithinWatermark state
    * keys from pre-r18 checkpoints do not match — restart streams
    * from a fresh checkpoint, the same upgrade rule the r17 widening
    * already imposed.) */
  def fingerprint(text: Column, seed: Int): Column =
    xxhash64(lit(seed), lower(normWs(text)))

  /** Cross-engine-replayable fingerprint twin: md5 hex over the SAME
    * normalization chain. Use where the fingerprint must be
    * reproduced outside the JVM (DuckDB/Python audits replay
    * `md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))`
    * byte-identically); [[fingerprint]] stays the hot-path default
    * (8-byte column vs 32, one codegen'd hash vs a digest). */
  def fingerprintMd5(text: Column): Column =
    md5(lower(normWs(text)).cast("binary"))

  /** Normalized whitespace tokens (case-folded, collapsed). Materialize
   * this as a real column before building shingles/signatures on top —
   * a lambda that embeds this expression re-runs the regex split per
   * array element; a lambda over the materialized attribute doesn't. */
  def tokens(text: Column): Column =
    split(lower(normWs(text)), " ")

  /** Character n-gram array over normalized text (for Jaccard / MinHash). */
  def charNgrams(text: Column, n: Int): Column = {
    val norm = lower(normWs(text))
    filter(
      transform(sequence(lit(0), greatest(length(norm) - n, lit(0))),
        i => norm.substr(i + 1, lit(n))),
      g => length(g) === n)
  }

  /** Word n-gram (shingle) array from a pre-materialized token column.
   * Emits only valid positions — no post-filter, no re-split. */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Word n-gram (shingle) array over normalized text. Prefer
   * materializing `tokens(text)` first and calling
   * `wordShinglesFromTokens` when used inside further lambdas. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /**
   * Language ID over a fixed language set using stopword/character
   * evidence — the classic n-gram-profile heuristic reduced to
   * codegen-friendly marker matching. Returns the highest-scoring of
   * en/de/fr/es/it/pt, or "und" when no evidence.
   */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => when(t.contains(s" $w "), 1).otherwise(0)).reduce(_ + _)
    val scores = Seq(
      "zh" -> when(t.rlike("[\\u4e00-\\u9fff]"), 10).otherwise(0),
      "en" -> hits(Seq("the", "and", "of", "to", "is", "that", "with", "for")),
      "de" -> (hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit")) +
        when(t.rlike("[äöüß]"), 2).otherwise(0)),
      "fr" -> (hits(Seq("le", "la", "les", "et", "est", "une", "dans", "pour")) +
        when(t.rlike("[àâçéèêëîï]"), 2).otherwise(0)),
      "es" -> (hits(Seq("el", "los", "las", "es", "una", "para", "con", "por")) +
        when(t.rlike("[ñ¿¡]"), 2).otherwise(0)),
      "it" -> (hits(Seq("il", "gli", "che", "di", "una", "per", "non", "sono")) +
        when(t.rlike("[àèìòù]"), 1).otherwise(0)),
      "pt" -> (hits(Seq("o", "os", "das", "em", "uma", "para", "com", "não")) +
        when(t.rlike("[ãõç]"), 2).otherwise(0)))
    val best = scores.map { case (lang, s) => struct(s.as("s"), lit(lang).as("l")) }
    val winner = greatest(best: _*)
    when(winner.getField("s") <= 0, lit("und")).otherwise(winner.getField("l"))
  }
}
