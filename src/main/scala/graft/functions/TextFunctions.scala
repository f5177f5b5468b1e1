package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  * All are compositions of codegen'd built-ins (no UDFs), so they stay
  * inside whole-stage codegen and scale linearly with input bytes — the
  * right shape for a 100 TB document corpus.
  */
object TextFunctions {

  /** Whitespace tokens of a document. Empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word tokens are weighted by ceil(len/4) — the
    * common "~4 chars per token" heuristic — plus punctuation/digit runs
    * counted individually. A cheap, deterministic stand-in for a real BPE
    * vocabulary that needs no dictionary broadcast. */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(
      transform(tokens(text), t => ceil(length(t) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) === 0, lit(0.0)).otherwise(punct.cast("double") / length(text))
  }

  /** Ratio of tokens that are in a stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
        .cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents, low
    * punctuation density, and some — but not wall-to-wall — stopwords.
    * Weights are fixed so the score is deterministic and comparable
    * across runs. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    round(lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3, 6)
  }

  /** Default English stopword list used by the quality heuristics. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Character n-grams of the whitespace-normalized text. */
  def charNgrams(text: Column, n: Int): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    when(length(norm) < n, array(norm))
      .otherwise(transform(sequence(lit(1), length(norm) - (n - 1)), i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles (space-joined runs of n consecutive tokens).
    * Native kernel — the declarative slice+concat_ws version
    * ([[wordShinglesHof]]) allocates per window and dominated dedup cost. */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.expressions.SimilarityExpressions.wordShingles(tokens(text), n)

  /** HOF formulation of [[wordShingles]], kept for cross-checking. */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Rolling-hash document fingerprint: xxhash64 over each word shingle,
    * keep the k smallest hashes (a deterministic bottom-k sketch — the
    * same family as MinHash but single-permutation). Two documents'
    * fingerprints overlap ∝ their shingle Jaccard similarity. */
  def fingerprint(text: Column, shingleLen: Int = 3, k: Int = 16): Column =
    slice(array_sort(array_distinct(transform(wordShingles(text, shingleLen), s => xxhash64(s)))), 1, k)

  /** [[fingerprint]] over the engine-portable md5-based 60-bit hash
    * ([[graft.curate.Curate.portableHash60]]) instead of xxhash64 — a SQL
    * oracle can replay the sketch bit-for-bit (same bottom-k semantics;
    * xxhash64 stays the at-scale default, md5 costs ~3× per shingle). */
  def fingerprintPortable(text: Column, shingleLen: Int = 3, k: Int = 16): Column =
    slice(array_sort(array_distinct(transform(wordShingles(text, shingleLen),
      s => graft.curate.Curate.portableHash60(s)))), 1, k)

  /** Collapse whitespace runs to single spaces and trim — the first
    * normalization pass of every text-cleaning pipeline. Explicit char
    * class instead of `\s` because Java regex includes \x0B in \s and RE2
    * does not — the explicit class means the same thing in both, keeping
    * oracles portable. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Strip C0/C1 control characters (except tab/newline, which whitespace
    * normalization handles). */
  def stripControlChars(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** Email-address pattern shared by redaction and its oracle — kept simple
    * enough to mean the same thing in Java regex and RE2. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone pattern (optional +1, separators). The
    * country-code separator lives inside the optional group so the pattern
    * never consumes a preceding space. */
  val PhonePattern: String = "(\\+?1[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Replace every match of `pattern` with `replacement` — the PII-redaction
    * primitive (emails, phones, ids). Pure regexp_replace: codegen'd,
    * row-local, linear in bytes. */
  def redactPattern(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** Standard PII scrub: emails then phones, with typed placeholders. */
  def redactPii(text: Column): Column =
    redactPattern(redactPattern(text, EmailPattern, "<EMAIL>"), PhonePattern, "<PHONE>")

  /** Shannon entropy (bits) of the character distribution — a cheap
    * perplexity proxy: junk/base64 high, boilerplate low, natural language
    * in a recognizable band. Native row-local kernel. */
  def charEntropy(text: Column): Column =
    graft.functions.expressions.TextExpressions.charEntropy(text)

  /** Gopher-style n-gram repetition stats: struct<top_frac, dup_frac> over
    * the document's n-token word grams (most-frequent-gram coverage and
    * duplicate-gram fraction — the standard boilerplate filters for
    * training-data curation). Native row-local kernel, no shuffle. */
  def ngramRepetition(text: Column, n: Int = 2): Column =
    graft.functions.expressions.TextExpressions.ngramRepetition(tokens(text), n)

  /** Heuristic language ID from stopword-profile hits. Profiles are tiny
    * per-language marker-word sets; the language with the most token hits
    * wins, 'und' when nothing matches. Deterministic ties broken by
    * language code order. */
  def languageId(text: Column): Column = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
      "en" -> Seq("the", "a", "and", "is", "of", "to", "in", "it"),
      "es" -> Seq("el", "la", "los", "las", "es", "y", "un", "una", "con"),
      "fr" -> Seq("le", "la", "les", "est", "et", "un", "une", "dans"),
      "zh" -> Seq("的", "是", "了", "在", "和", "有"))
    // native single-pass kernel (one token→profile-bitmask lookup per
    // token); the previous Column form paid one interpreted HOF filter
    // pass per profile per row. Semantics identical: hits with
    // multiplicity, max hits wins, ties → lexicographically greatest
    // code, zero hits → 'und'.
    graft.functions.expressions.TextExpressions
      .languageId(tokens(lower(text)), profiles)
  }
  /** Unicode canonical normalization (NFC) — see
    * [[graft.functions.expressions.UnicodeExpressions]]. */
  def nfcNormalize(text: Column): Column =
    graft.functions.expressions.UnicodeExpressions.nfcNormalize(text)
}
