package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * Column expressions (codegen'd, no UDFs) so they pipeline into scans and
  * stay inside WholeStageCodegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens (empty-string-safe). Spelled with native codegen'd
    * expressions only: after `trim`, `\s+`-splitting cannot produce empty
    * tokens except on empty/whitespace-only input, so the empty-token
    * filter reduces to one length guard — the naive
    * `filter(split(...), _ =!= "")` runs the interpreted ArrayFilter HOF
    * per token on every tokens() consumer. Null text stays null (the
    * DuckDB twin `list_filter(regexp_split_to_array(...))` also
    * null-propagates); DataOpsSpec asserts parity with the filter
    * spelling on edge inputs.
    */
  def tokens(text: Column): Column = {
    // regex edge-trim, NOT `trim` (which strips only 0x20 — a tab-edged
    // string would yield empty edge tokens the guard below can't see);
    // the trim class matches the split class, so no empty token survives
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(t.isNull, lit(null).cast("array<string>"))
      .when(length(t) > 0, split(t, "\\s+"))
      .otherwise(array().cast("array<string>"))
  }

  /** The pre-optimization filter spelling of [[tokens]] — kept as the
    * documented semantics for the parity test.
    */
  private[graft] def tokensFilterTwin(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: maximal runs of letters, of digits, and of
    * other non-space symbols each count one pre-token — the GPT-2-style
    * pre-tokenizer partition ("abc123!!" → abc, 123, !! = 3). The
    * alternation is RE2-compatible (no lookarounds), so DuckDB replays it
    * verbatim in the doc_text_stats oracle.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(raw"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+"), lit(0)))

  def charCount(text: Column): Column = length(text)

  def meanWordLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, raw"[\p{Punct}]", ""))).cast("double")
        / length(text)).otherwise(lit(0.0))

  /** Fraction of alphabetic characters. */
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, raw"[^\p{L}]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  private val stopwordsEn = Seq("the", "a", "an", "and", "of", "to", "in", "is",
    "that", "it", "on", "for", "with", "as", "was", "at", "by", "this")

  /** The stopword vocabulary behind [[stopwordRatio]] (shared with the
    * Corpus quality gate and its SQL oracles).
    */
  private[graft] def stopwordList: Seq[String] = stopwordsEn

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal (C4/Gopher-style filters).
    */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val stops = array(stopwordsEn.map(lit): _*)
    when(size(ts) > 0,
      size(filter(ts, t => array_contains(stops, lower(t)))).cast("double") / size(ts))
  }

  /** Composite quality score in [0,1]: length, word shape, symbol load —
    * a Gopher-rules-style heuristic, deterministic and cheap.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(10, 100000), lit(1.0)).otherwise(lit(0.0))
    val mwl = coalesce(meanWordLength(text), lit(0.0))
    val shapeOk = when(mwl.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val alphaOk = alphaRatio(text)
    (lenOk + shapeOk + punctOk + alphaOk) / 4
  }

  /** Stopword-profile language ID over a fixed language set. Returns the
    * language with the most stopword hits; "und" (undetermined) when
    * nothing matches. Latin profiles count whole-token matches in ONE pass
    * over one materialized token array (the old spelling re-evaluated the
    * full tokenization once per profile — 5× regex work per row); Chinese
    * has no whitespace tokens, so its profile counts stopword CHARACTER
    * occurrences in the raw text (`length − length(replace)` per char,
    * exact and codegen-friendly) — token equality against single-character
    * stopwords could never fire on real zh text. Ties resolve to the
    * lexicographically greatest language code (array_max on
    * (hits, lang) structs), matching the SQL twin's CASE order.
    */
  def langId(text: Column): Column = {
    val latin: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
      "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein", "eine", "mit", "zu"),
      "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "dans", "pour", "que"),
      "es" -> Seq("el", "los", "las", "es", "un", "una", "en", "por", "para", "que"),
    )
    val ts = tokens(lower(text))
    val zero = struct(latin.map { case (l, _) => lit(0).as(l) }: _*)
    val acc = aggregate(ts, zero, (a, t) => struct(latin.map { case (l, words) =>
      (a.getField(l) +
        when(array_contains(array(words.map(lit): _*), t), 1).otherwise(0)).as(l)
    }: _*))
    val zhChars = Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他")
    val hZh = zhChars.map(c =>
      length(text) - length(replace(text, lit(c), lit("")))).reduce(_ + _)
    val scored = latin.map { case (l, _) =>
      struct(acc.getField(l).as("hits"), lit(l).as("lang"))
    } :+ struct(hZh.cast("int").as("hits"), lit("zh").as("lang"))
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit content fingerprint over normalized text (case-folded,
    * whitespace/punct collapsed) — exact-dup key robust to formatting.
    */
  def fingerprint(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), raw"[^\p{L}\p{N}]+", " ")))

  /** Word n-gram shingles from a PRE-TOKENIZED array column. `ts` should be
    * a materialized column (project `tokens(lower(text))` first): lambda
    * bodies in higher-order functions re-evaluate their referenced subtrees
    * per element, so feeding the raw tokenization expression here makes the
    * regexp split run once per shingle — quadratic work per row.
    */
  def wordShinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
      .otherwise(array())

  /** Word n-gram shingles. Convenience form; hot paths should tokenize into
    * a column first and use `wordShinglesFromTokens` (see its scaladoc).
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(lower(text)), n)

  /** Whitespace-collapsed lowercase text — materialize this into a column
    * BEFORE shingling (see `charShinglesFromNorm`).
    */
  def normalizedText(text: Column): Column =
    regexp_replace(lower(text), raw"\s+", " ")

  /** Character k-shingles of an ALREADY-normalized text column. The split
    * exists because inlining the normalization into the transform lambda
    * re-runs the regex once per shingle position — O(len^2) regex work per
    * row on the dedup hot path.
    */
  def charShinglesFromNorm(norm: Column, k: Int): Column =
    when(length(norm) >= k,
      transform(sequence(lit(0), length(norm) - k),
        i => norm.substr(i + 1, lit(k))))
      .otherwise(array())

  /** Character k-shingles of raw text. Convenience form; hot paths should
    * materialize `normalizedText` into a column first and use
    * `charShinglesFromNorm`.
    */
  def charShingles(text: Column, k: Int): Column =
    charShinglesFromNorm(normalizedText(text), k)
}
