package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines.
  *
  * Everything here is a pure Catalyst expression (no UDFs) so it stays
  * inside whole-stage codegen and survives a 1000-executor scale-up:
  * per-row cost only, no shuffle, no driver involvement.
  *
  * Reference provenance: length scoring mirrors
  * `score_pipeline_lenth.py:35–38`; tokenization/templating mirror the
  * prompt handling in `main.py:177–212`. The quality / language-ID /
  * fingerprint functions are the north-star text-analysis extensions
  * (not present in the reference).
  */
object TextFns {

  /** Whitespace tokens of a text column (trimmed, regex split). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count — cheapest possible tokenizer. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count proxy: words plus extra units for every 6
    * chars of a long word (a deterministic stand-in for a real BPE
    * vocab, which would live behind the same column contract).
    * Native codegen'd ([[graft.plans.SubwordCount]]); the HOF
    * formulation below is the readable contract. */
  def subwordCount(c: Column): Column = graft.plans.SubwordCount(c)

  /** Reference HOF formulation of [[subwordCount]] (same values). */
  def subwordCountHof(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, w) => acc + lit(1L) + floor(length(w) / lit(6.0)).cast("long"))

  /** Canonical comparison form for near-identical-text dedup: strip
    * an explicit ASCII punctuation class, collapse whitespace runs,
    * trim, lowercase. The punctuation class is enumerated (not a
    * regex category) because Java and RE2 disagree on category
    * contents; `lower` is applied to the ORIGINAL text only — both
    * engines lowercase é/É identically, while an upper→lower round
    * trip would diverge on ß. Replayed verbatim by
    * [[canonicalFormSql]]. */
  def canonicalForm(c: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(c, "[.,;:!?'\"()\\[\\]{}-]", " "), "\\s+", " ")))

  /** DuckDB twin of [[canonicalForm]] (RE2 needs the explicit 'g'
    * flag; Spark replaces globally by default). */
  def canonicalFormSql(col: String): String =
    s"""lower(trim(regexp_replace(regexp_replace($col,""" +
      """ '[.,;:!?''"()\[\]{}-]', ' ', 'g'), '\s+', ' ', 'g')))"""

  /** Characters that are not alphanumeric or whitespace, as a ratio of
    * total length. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("double") /
      length(c).cast("double")

  /** Mean word length in characters. */
  def avgWordLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") /
      tokenCount(c).cast("double")

  /** Number of occurrences of `needle` in `hay` (non-regex, exact). */
  def countOccurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(replace(hay, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")

  /** Stopword hits per token — the classic quality heuristic. */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")
  def stopwordRatio(c: Column): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    val hits = Stopwords
      .map(w => countOccurrences(padded, s" $w "))
      .reduce(_ + _)
    hits.cast("double") / tokenCount(c).cast("double")
  }

  /** Composite quality score in [0, ~1]: length sweet-spot, low
    * punctuation, some stopwords, sane word lengths. Deterministic and
    * cross-engine reproducible (used by the DuckDB oracle).
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(400.0), lit(1.0))
    val punct    = punctRatio(c)
    val stop     = least(stopwordRatio(c) * lit(5.0), lit(1.0))
    val wordLen  = avgWordLen(c)
    val wlScore  = when(wordLen.between(3.0, 8.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * lit(0.4) + (lit(1.0) - punct) * lit(0.2) +
      stop * lit(0.2) + wlScore * lit(0.2), 6)
  }

  /** Language-marker n-gram hit count (whole-word matches). */
  def langMarkerHits(c: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    markers.map(w => countOccurrences(padded, s" $w ")).reduce(_ + _)
  }

  /** Heuristic language ID over marker-word sets. With the synthetic
    * corpus every doc shares one vocabulary, so this demonstrates the
    * operator shape (argmax over per-language scores) deterministically.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "a"),
    "es" -> Seq("data", "table"),
    "de" -> Seq("window", "stream"),
    "fr" -> Seq("query", "merge"),
    "zh" -> Seq("spark", "vector"))
  def langId(c: Column): Column = {
    // deterministic argmax: fold over (score, lang) keeping strictly-
    // greater winners, so ties resolve to the first-listed language
    val scored = LangMarkers.map { case (lang, ms) =>
      (langMarkerHits(c, ms), lit(lang))
    }
    scored.tail.foldLeft(struct(scored.head._1.as("s"), scored.head._2.as("l"))) {
      case (acc, (s, l)) =>
        when(s > acc.getField("s"), struct(s.as("s"), l.as("l"))).otherwise(acc)
    }.getField("l")
  }

  /** Order-aware document fingerprint: position-weighted character sum
    * mod 1e9+7. A rolling-hash stand-in that both Spark and DuckDB can
    * compute exactly (integer math only). Implemented as the native
    * codegen'd [[graft.plans.TextFingerprint]] (the HOF formulation,
    * kept below as [[fingerprintHof]], allocates a row per character).
    * Spark transform() lambda index is 0-based; the DuckDB oracle uses
    * its 1-based index minus one.
    */
  def fingerprint(c: Column): Column = graft.plans.TextFingerprint(c)

  /** Reference HOF formulation of [[fingerprint]] (same values). */
  def fingerprintHof(c: Column): Column = {
    val chars = split(c, "")
    val weighted = transform(chars, (ch, i) =>
      ascii(ch).cast("long") * ((i.cast("long") % lit(31L)) + lit(1L)))
    aggregate(weighted, lit(0L), (acc, x) => (acc + x) % lit(1000000007L))
  }

  /** DuckDB-side SQL fragment equivalent of [[fingerprint]]. */
  def fingerprintSql(col: String): String =
    s"CAST(list_aggregate(list_transform(string_split($col, ''), " +
      s"(ch, i) -> ascii(ch)::BIGINT * ((((i - 1) % 31) + 1)::BIGINT)), 'sum') % 1000000007 AS BIGINT)"

  /** Word n-gram shingles (space-joined), for Jaccard/MinHash dedup.
    * Native codegen'd ([[graft.plans.WordShingles]]); [[shinglesHof]]
    * is the readable contract both it and the DuckDB oracle follow. */
  def shingles(c: Column, n: Int): Column =
    graft.plans.WordShingles(c, n)

  /** Distinct shingles (array_distinct fused into the same pass —
    * first-occurrence order). */
  def shinglesDistinct(c: Column, n: Int): Column =
    graft.plans.WordShingles(c, n, distinct = true)

  /** Reference HOF formulation of [[shingles]] (same values). */
  def shinglesHof(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Prompt templating (reference P1, `main.py:72–83,177–212`): branch
    * on an empty `input` column between the two alpaca templates.
    */
  val TemplateNoInput =
    "Below is an instruction that describes a task. Write a response that appropriately completes the request.\n\n### Instruction:\n%s\n\n### Response:\n"
  val TemplateWithInput =
    "Below is an instruction that describes a task, paired with an input that provides further context. Write a response that appropriately completes the request.\n\n### Instruction:\n%s\n\n### Input:\n%s\n\n### Response:\n"
  def promptToUse(instruction: Column, input: Column): Column =
    when(coalesce(input, lit("")) === "",
      format_string(TemplateNoInput, instruction))
      .otherwise(format_string(TemplateWithInput, instruction, input))
  def wholeText(instruction: Column, input: Column, output: Column): Column =
    concat(promptToUse(instruction, input), output)
}
