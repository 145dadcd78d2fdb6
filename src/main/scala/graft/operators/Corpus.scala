package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** Corpus-curation operators for LLM training-data pipelines: within-document
  * repetition measurement, cross-corpus contamination stats, Gopher-style
  * quality gates, PII scrubbing, and deterministic sampling.
  *
  * Shapes follow the public filtering literature — Rae et al. 2021 (Gopher
  * repetition/quality rules, table A1), Penedo et al. 2023 (RefinedWeb),
  * Raffel et al. 2020 (C4). The reference engine has no corpus module; these
  * extend the same documents-table surface as [[Dedup]] / [[Similarity]].
  *
  * Module-level invariants (same stance as Dedup): no cross joins, no
  * driver-side loops; hot per-row tokenize/shingle loops run as one compiled
  * JVM call per row with Column-expression twins parity-asserted in
  * DataOpsSpec; every output is deterministic and reproducible in portable
  * SQL (md5-derived sampling, string shuffle keys), so each operator carries
  * an exact DuckDB oracle.
  */
object Corpus {

  // ------------------------------------------------------------ repetition

  /** Compiled one-pass twin of the expression stats (token and word-n-gram
    * totals and distinct counts); DataOpsSpec asserts parity with the
    * `TextFunctions.tokens` / `wordShinglesFromTokens` Column spelling.
    */
  private[graft] def repStatsJvm(text: String, n: Int): (Int, Int, Int, Int) = {
    val toks = Dedup.tokenizeJvm(text)
    val tset = new java.util.HashSet[String]()
    toks.foreach(tset.add)
    val ngrams = Dedup.shinglesJvm(toks, n)
    val gset = new java.util.HashSet[String]()
    ngrams.foreach(gset.add)
    (toks.length, tset.size, ngrams.length, gset.size)
  }

  /** Within-document repetition stats (Gopher's "repetitious text" family):
    * duplicate-token and duplicate-word-n-gram fractions. Pure per-row map —
    * no shuffle at any scale; pipelines into the parquet scan. Documents
    * with fewer than `n` tokens have zero n-grams and a null n-gram
    * fraction; null/empty text counts as zero tokens.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    val statsUdf = udf((t: String) => repStatsJvm(t, n))
    df.select(col(idCol), statsUdf(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s._1").as("n_tokens"),
        col("__s._2").as("n_distinct_tokens"),
        col("__s._3").as("n_ngrams"),
        col("__s._4").as("n_distinct_ngrams"))
      .withColumn("dup_token_fraction",
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("n_distinct_tokens")).cast("double") / col("n_tokens")))
      .withColumn("dup_ngram_fraction",
        when(col("n_ngrams") > 0,
          (col("n_ngrams") - col("n_distinct_ngrams")).cast("double") / col("n_ngrams")))
  }

  // --------------------------------------------------- corpus contamination

  /** Cross-corpus shingle-sharing stats — the dedup-diagnostics view of the
    * inverted index `Dedup.exactJaccardPairs` builds: for each document, how
    * many of its DISTINCT word n-grams appear in at least `minDocs`
    * documents (the per-doc "how much of me exists elsewhere" measure used
    * to audit dedup effectiveness and benchmark contamination).
    *
    * Plan: explode distinct shingles (compiled kernel), hash-aggregate
    * shingle → document-frequency (map-side partial aggregation absorbs hot
    * shingles), shuffle-join the frequencies back (AQE skew-split applies),
    * aggregate by document. Shuffle keys are the shingle strings themselves,
    * which keeps the pipeline reproducible in any SQL engine.
    */
  def sharedShingleStats(df: DataFrame, idCol: String, textCol: String,
                         n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2)
    val shUdf = udf((t: String) => Dedup.distinctShinglesJvm(t, n))
    val sh = df.select(col(idCol), explode(shUdf(col(textCol))).as("__g"))
    val counts = sh.groupBy("__g").agg(count(lit(1)).as("__gdf"))
    val per = sh.join(counts, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__gdf") >= minDocs, 1L).otherwise(0L)).as("n_shared"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_fraction",
        when(col("n_shingles") > 0,
          col("n_shared").cast("double") / col("n_shingles")))
  }

  /** Benchmark decontamination check (the GPT-3/PaLM appendix-style n-gram
    * overlap audit): for each document in `bench`, the fraction of its
    * DISTINCT word n-grams that appear anywhere in `train`. Complements
    * [[sharedShingleStats]] (within-corpus) with the two-table form used to
    * detect eval-set leakage into training data.
    *
    * Plan: the bench side (tiny next to a 100 TB train corpus) broadcasts
    * as a distinct shingle set; the train scan streams its exploded
    * shingles through one broadcast-hash semi-join — NO shuffle and no
    * pre-distinct on the train side (a left-outer from bench could only
    * build on the train side, which would shuffle billions of shingles).
    * Only the hit set — bounded by the bench's own shingle count — is
    * deduplicated, then joined back onto the bench shingles.
    */
  def benchmarkContamination(train: DataFrame, bench: DataFrame,
                             idCol: String, textCol: String,
                             n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    val shUdf = udf((t: String) => Dedup.distinctShinglesJvm(t, n))
    // read twice (semi-join build + per-doc aggregate); pin the bench-sized
    // shingle relation so the benchmark is only shingled once
    val benchSh = bench.select(col(idCol), explode(shUdf(col(textCol))).as("__g"))
      .localCheckpoint()
    val hitSh = train.select(explode(shUdf(col(textCol))).as("__g"))
      .join(broadcast(benchSh.select(col("__g")).distinct()), Seq("__g"), "left_semi")
      .distinct().withColumn("__hit", lit(1L))
    val per = benchSh.join(broadcast(hitSh), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
    bench.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_fraction",
        when(col("n_ngrams") > 0,
          col("n_contaminated").cast("double") / col("n_ngrams")))
  }

  /** [[benchmarkContamination]] for benchmarks too large to broadcast as an
    * exact shingle set — the two-phase Bloom screen: a Bloom filter over
    * the benchmark's distinct shingles (built with Spark's own sketch,
    * ~10 bits/element at 1% fpp vs the full strings) broadcasts everywhere
    * and prunes the 100 TB train scan to the might-contain candidates; an
    * EXACT semi-join of only those survivors against the benchmark shingles
    * then removes the false positives, so the output is bit-identical to
    * the exact operator (a Bloom filter has no false negatives) — asserted
    * by parity test, and the same oracle SQL applies. Train-side work per
    * row is one hash probe; the phase-2 join's left side is bounded by
    * true hits + fpp · train-distinct, not the corpus.
    *
    * `expectedItems` sizes the filter (0 = count the benchmark shingles
    * first, one extra bench-sized job).
    */
  def benchmarkContaminationBloom(train: DataFrame, bench: DataFrame,
                                  idCol: String, textCol: String, n: Int,
                                  expectedItems: Long = 0L,
                                  fpp: Double = 0.01): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val shUdf = udf((t: String) => Dedup.distinctShinglesJvm(t, n))
    // pinned like the exact variant's benchSh: the count (expectedItems=0),
    // the Bloom build, the phase-2 semi-join, and the per-doc aggregate
    // would otherwise each re-tokenize and re-shingle the benchmark —
    // four full passes for one relation
    val benchSh = bench.select(col(idCol), explode(shUdf(col(textCol))).as("__g"))
      .localCheckpoint()
    val benchDistinct = benchSh.select(col("__g")).distinct()
    val expected = if (expectedItems > 0) expectedItems
      else math.max(benchDistinct.count(), 1L)
    val bf = benchDistinct.stat.bloomFilter("__g", expected, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val mightUdf = udf((g: String) => bc.value.mightContainString(g))
    val candidates = train.select(explode(shUdf(col(textCol))).as("__g"))
      .filter(mightUdf(col("__g"))).distinct()
    // exact verify: kill the Bloom false positives; both sides are
    // benchmark-scale now, so a plain shuffle join is fine at any corpus size
    val hitSh = candidates.join(benchDistinct, Seq("__g"), "left_semi")
      .withColumn("__hit", lit(1L))
    val per = benchSh.join(hitSh, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
    bench.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_fraction",
        when(col("n_ngrams") > 0,
          col("n_contaminated").cast("double") / col("n_ngrams")))
  }

  // ------------------------------------------------------------ quality gate

  /** Compiled one-pass twin of the gate's measurement expressions: token
    * count, mean word length (code points, like Spark's `length`), punct and
    * alpha character ratios, and the number of DISTINCT stopwords present
    * (the expression counts stopwords matched, not token occurrences).
    * Token boundaries are shared between `tokens(text)` and
    * `tokens(lower(text))` — lowercasing never touches whitespace — so one
    * raw-token pass serves every measure. Null and empty text both measure
    * as all-zeros, which reproduces the expression flags (including
    * `symbol_ratio_ok = 1` on empty input, asserted in DataOpsSpec).
    */
  private[graft] def gopherStatsJvm(text: String, stopwords: Set[String])
      : (Int, Double, Double, Double, Int) = {
    val raw =
      if (text == null) Array.empty[String]
      // \s-only edge trim (Dedup.EdgeWs): String.trim strips every char
      // <= 0x20, diverging from the expression twin on NUL-edged text
      else Dedup.EdgeWs.matcher(text).replaceAll("")
        .split("\\s+").filter(_.nonEmpty)
    var sumTokLen = 0L
    val stopsSeen = new java.util.HashSet[String]()
    raw.foreach { t =>
      sumTokLen += t.codePointCount(0, t.length)
      val lt = t.toLowerCase(java.util.Locale.ROOT)
      if (stopwords.contains(lt)) stopsSeen.add(lt)
    }
    var nChars = 0; var nPunct = 0; var nAlpha = 0
    if (text != null) {
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        nChars += 1
        // \p{Punct} in Java regex is the POSIX ASCII class: visible
        // non-alphanumeric ASCII
        if (cp >= 0x21 && cp <= 0x7e &&
            !(cp >= '0' && cp <= '9') && !(cp >= 'A' && cp <= 'Z') &&
            !(cp >= 'a' && cp <= 'z')) nPunct += 1
        if (Character.isLetter(cp)) nAlpha += 1
        i += Character.charCount(cp)
      }
    }
    val mwl = if (raw.nonEmpty) sumTokLen.toDouble / raw.length else 0.0
    val punct = if (nChars > 0) nPunct.toDouble / nChars else 0.0
    val alpha = if (nChars > 0) nAlpha.toDouble / nChars else 0.0
    (raw.length, mwl, punct, alpha, stopsSeen.size)
  }

  /** Gopher-style quality gate (Rae et al. 2021, table A1 family): per-rule
    * integer flags plus their conjunction (`keep`). Measurement runs as one
    * compiled JVM call per row ([[gopherStatsJvm]]); the Column-expression
    * spelling ([[gopherFilterExprTwin]]) remains the documented semantics,
    * with full-output parity asserted in DataOpsSpec. Thresholds default to
    * the public Gopher ranges.
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.7,
                   minStopwords: Int = 2): DataFrame = {
    val stopSet = TextFunctions.stopwordList.toSet
    val statsUdf = udf((t: String) => gopherStatsJvm(t, stopSet))
    def flag(c: Column): Column = when(c, lit(1)).otherwise(lit(0))
    df.select(col(idCol), statsUdf(col(textCol)).as("__g"))
      .select(col(idCol),
        flag(col("__g._1").between(minWords, maxWords)).as("word_count_ok"),
        flag(col("__g._2").between(minMeanWordLen, maxMeanWordLen)).as("mean_word_len_ok"),
        flag(col("__g._3") <= maxSymbolRatio).as("symbol_ratio_ok"),
        flag(col("__g._4") >= minAlphaRatio).as("alpha_ratio_ok"),
        flag(col("__g._5") >= minStopwords).as("stopwords_ok"))
      .withColumn("keep",
        (col("word_count_ok") * col("mean_word_len_ok") * col("symbol_ratio_ok")
          * col("alpha_ratio_ok") * col("stopwords_ok")).cast("int"))
  }

  /** The Column-expression spelling of [[gopherFilter]] — the documented
    * semantics and the shape the DuckDB oracle replays. Kept for the
    * DataOpsSpec parity sweep; the public entry point uses the compiled
    * kernel (the per-row stopword HOF scan here is interpreted, ~5x slower).
    */
  private[graft] def gopherFilterExprTwin(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.7,
                   minStopwords: Int = 2): DataFrame = {
    val text = col(textCol)
    val lts = TextFunctions.tokens(lower(text))
    val nTok = size(lts)
    val mwl = coalesce(TextFunctions.meanWordLength(text), lit(0.0))
    val stopHits = size(filter(
      array(TextFunctions.stopwordList.map(lit): _*),
      s => array_contains(lts, s)))
    def flag(c: Column): Column = when(c, lit(1)).otherwise(lit(0))
    df.select(col(idCol),
        flag(nTok.between(minWords, maxWords)).as("word_count_ok"),
        flag(mwl.between(minMeanWordLen, maxMeanWordLen)).as("mean_word_len_ok"),
        flag(TextFunctions.punctRatio(text) <= maxSymbolRatio).as("symbol_ratio_ok"),
        flag(TextFunctions.alphaRatio(text) >= minAlphaRatio).as("alpha_ratio_ok"),
        flag(stopHits >= minStopwords).as("stopwords_ok"))
      .withColumn("keep",
        (col("word_count_ok") * col("mean_word_len_ok") * col("symbol_ratio_ok")
          * col("alpha_ratio_ok") * col("stopwords_ok")).cast("int"))
  }

  // ------------------------------------------------------------------- PII

  /** Conservative RE2-compatible PII patterns (no lookarounds/backrefs, so
    * the same strings run under Java regex and any RE2-based SQL engine).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9][0-9 -]{6,}[0-9]"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))

  /** Redact PII spans with typed placeholders. Replacement order matters and
    * is part of the contract: emails first (their local/domain parts contain
    * dot-digit runs the IPv4 pattern could claim), then phones (anchored by
    * the leading '+'), then bare IPv4s.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailPattern, "<EMAIL>"), PhonePattern, "<PHONE>"), Ipv4Pattern, "<IP>")

  /** Per-document PII counts + redacted text. Pure expressions, shuffle-free. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      emailCount(col(textCol)).as("n_emails"),
      ipv4Count(col(textCol)).as("n_ips"),
      phoneCount(col(textCol)).as("n_phones"),
      redactPii(col(textCol)).as("redacted"))

  // -------------------------------------------------------------- chunking

  /** Split each document into fixed-size token windows with `overlap`
    * tokens of context carry-over — the standard pre-training sequence
    * prep. Output: (`idCol`, chunk_idx, chunk_text, n_tokens); the final
    * chunk keeps its partial tail (pack or drop downstream), documents
    * with no tokens produce no rows. Pure expressions over the token
    * array — the explode is the output itself, so the operator is one
    * codegen'd map + generate per row at any corpus size.
    *
    * Window convention: starts advance by `chunkSize - overlap` while
    * start < n (the sliding-window family most chunkers use). When
    * `overlap > 0` and `(n - 1) % step < overlap`, the trailing window is
    * fully contained in the previous one — its tokens appear twice.
    * Callers that need duplicate-free coverage should drop trailing
    * chunks whose `chunk_idx * step + n_tokens <= ` the previous chunk's
    * end, or chunk with `overlap = 0` and pack downstream.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .select(col(idCol), col("__ts"),
        explode(when(col("__n") > 0,
            sequence(lit(0), floor((col("__n") - 1) / lit(step)).cast("int")))
          .otherwise(array().cast("array<int>"))).as("__ci"))
      .select(col(idCol),
        col("__ci").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__ts"), col("__ci") * step + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("__ts"), col("__ci") * step + 1, lit(chunkSize)))
          .as("n_tokens"))
  }

  // -------------------------------------------------------------- sampling

  /** Deterministic md5-derived bucket in [0, 1000) — the portable spelling
    * the IVF quantizer sampler uses (Similarity.ivfBuild). Stable under
    * repartitioning and engine changes, unlike `df.sample`; DuckDB spells it
    * `('0x'||substr(md5(salt||':'||key),1,15))::BIGINT % 1000`.
    */
  def hashBucketPermille(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 15), 16, 10)
      .cast("bigint") % 1000

  /** Deterministic Bernoulli-style sample: keep rows whose salted key bucket
    * falls below `permille`. A pure filter — pushes toward the scan, no
    * shuffle, reproducible row-for-row at any cluster size.
    */
  def hashSample(df: DataFrame, keyCol: String, salt: String,
                 permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.filter(hashBucketPermille(col(keyCol), salt) < permille)
  }

  /** Exactly-min(k, |stratum|) rows per stratum, deterministically: rank
    * within each stratum by (md5 of the salted key, key) and keep the first
    * k — a seeded uniform draw without replacement. One shuffle on the
    * strata columns; a pathologically hot stratum ranks inside a single
    * partition, so for single-stratum corpora prefer [[hashSample]].
    *
    * Determinism precondition: `keyCol` must be unique within each stratum
    * — rows sharing a key value tie on both the hash and the tiebreak, so
    * which of them survives the k-cutoff is partition-order-dependent.
    * (The same unique-id assumption underlies [[sampleToTokenBudget]] and
    * [[packSequences]] ordering.)
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], keyCol: String,
                       salt: String, k: Int): DataFrame = {
    require(strataCols.nonEmpty && k > 0)
    val h = md5(concat(lit(salt + ":"), col(keyCol).cast("string")))
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Per-domain corpus mixing to a token budget (the "data mixture" step of
    * pre-training prep): within each `domainCol` value, documents are taken
    * in seeded-uniform order (md5 of the salted id, as [[stratifiedSample]])
    * until their cumulative token count reaches the domain's budget. A
    * document straddling the boundary is KEPT (budgets are floors, not
    * caps); domains absent from `budgets` get 0 and are dropped entirely.
    * One shuffle on the domain column; cumulative sums are window scans, so
    * a domain's documents rank inside one task — at 100 TB split hot
    * domains into salted sub-domains upstream or raise `budgets`
    * granularity. Output: (idCol, domainCol, n_tokens, cum_tokens), all
    * integer-exact and reproducible in portable SQL.
    */
  def sampleToTokenBudget(df: DataFrame, idCol: String, textCol: String,
                          domainCol: String, budgets: Map[String, Long],
                          salt: String): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val h = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(domainCol)).orderBy(h.asc, col(idCol).asc)
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (d, b)) =>
      when(col(domainCol) === d, lit(b)).otherwise(acc)
    }
    df.select(col(idCol), col(domainCol),
        TextFunctions.tokenCount(lower(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  /** Temperature-flattened domain mixture (the T5 §5.4 / GPT-3 / LLaMA
    * multi-corpus recipe): per-domain sampling mass `w_d = n_d^alpha` over
    * token counts, flattening the head domains so low-resource domains keep
    * coverage, allocated as `floor(totalBudget · w_d / Σ w)` tokens per
    * domain — feed the result straight into [[sampleToTokenBudget]].
    *
    * Reproducibility: at the default `alpha = 0.5` the weight is one IEEE
    * `sqrt` of an exact integer — correctly rounded by the 754 standard, so
    * both engines produce bit-identical doubles — and Σw is an ordered fold
    * over domains. Other alphas go through `pow`, whose last-ulp behavior
    * is libm-specific: supported, but the cross-engine hash contract is
    * only claimed at 0.5. Null domains are excluded (they would sort
    * differently across engines).
    *
    * Scale shape: one map-side-combined count aggregate (domains-sized
    * relation), a one-row ordered-fold aggregate broadcast back — nothing
    * scales past the domain count.
    *
    * Output: (`domainCol`, n_tokens, weight, token_budget).
    */
  def temperatureMixBudgets(df: DataFrame, textCol: String, domainCol: String,
                            totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(coalesce(sum(TextFunctions.tokenCount(lower(col(textCol))).cast("long")),
        lit(0L)).as("n_tokens"))
    val weighted = counts.withColumn("weight",
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), alpha))
    val totalW = weighted.agg(
      aggregate(
        transform(array_sort(collect_list(struct(col(domainCol), col("weight")))),
          s => s.getField("weight")),
        lit(0.0), (a, x) => a + x).as("__w"))
    weighted.crossJoin(broadcast(totalW))
      .select(col(domainCol), col("n_tokens"), col("weight"),
        floor(lit(totalBudget).cast("double") * col("weight") / col("__w"))
          .cast("long").as("token_budget"))
  }

  // -------------------------------------------------------------- packing

  /** Pack documents into fixed-capacity training sequences, GPT-style
    * concat-and-split: the corpus is split into `nStreams` deterministic
    * hash streams; within a stream documents are concatenated in seeded
    * order and the token stream is cut every `capacity` tokens, so a
    * document may span sequences and every token lands in exactly one
    * (stream, seq_idx) slot with zero padding waste.
    *
    * Output: one row per (document × sequence it touches) —
    * (`idCol`, stream, seq_idx, doc_tok_start, n_tokens): take `n_tokens`
    * tokens of the document starting at 0-based `doc_tok_start` and append
    * them to sequence `seq_idx` of `stream`. Empty documents emit nothing.
    *
    * Scale shape: one shuffle (by stream) + per-stream window cumsum +
    * explode. Streams are the parallelism unit — size `nStreams` ≳ cluster
    * cores; each stream's cumsum is a single sorted scan. All arithmetic is
    * integer, so the layout is bit-reproducible anywhere, including the
    * DuckDB oracle.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int, nStreams: Int, salt: String): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    require(nStreams >= 1, s"nStreams must be positive, got $nStreams")
    val h = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val stream = (conv(substring(h, 1, 15), 16, 10).cast("bigint") % nStreams)
      .as("stream")
    val w = Window.partitionBy(col("stream")).orderBy(col("__h").asc, col(idCol).asc)
    val C = lit(capacity.toLong)
    df.select(col(idCol), h.as("__h"), stream,
        TextFunctions.tokenCount(lower(col(textCol))).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__start", sum(col("__n")).over(w) - col("__n"))
      .select(col(idCol), col("stream"), col("__start"), col("__n"),
        explode(sequence(floor(col("__start") / C),
          floor((col("__start") + col("__n") - 1) / C))).as("seq_idx"))
      .select(col(idCol), col("stream"), col("seq_idx"),
        greatest(col("seq_idx") * C - col("__start"), lit(0L)).as("doc_tok_start"),
        (least((col("seq_idx") + 1) * C, col("__start") + col("__n")) -
          greatest(col("seq_idx") * C, col("__start"))).as("n_tokens"))
  }

  // ---------------------------------------------------- corpus statistics

  /** Per-document top-`k` keywords by lexical specificity: score =
    * tf / df over lowercased whitespace tokens (term count in the document
    * over the number of documents containing the term — the rational
    * tf-idf surrogate: monotone in tf and in 1/df, with a linear instead
    * of logarithmic rarity damping, so the score is one correctly-rounded
    * IEEE division and reproducible bit-for-bit in SQL). Ties break on the
    * token string. Output: (`idCol`, rank, token, tf, df, score).
    *
    * Scale shape: explode → two counting aggregates (per-doc tf, corpus
    * df over the already-collapsed doc×token relation) → equi-join on the
    * token → per-document window top-k. Shuffles on token and id only; no
    * driver-side data.
    */
  def keywordStats(df: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val tf = df
      .select(col(idCol), explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfCounts, Seq("token"))
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        col("score"))
  }

  /** Corpus-level top-`k` word `n`-grams by total occurrence count, ties
    * broken on the gram string. The plan is the scalable one at any size:
    * explode → hash aggregate → TakeOrderedAndProject (per-partition
    * heaps, no global sort). The tokenize→shingle chain runs as one
    * compiled JVM call per row (Catalyst higher-order functions are
    * interpreted — the expression twin below is the documented semantics
    * and DataOpsSpec asserts parity; the swap is worth ~2.5x on the
    * corpus-wide scan). Output: (ngram, cnt).
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"n and k must be positive, got n=$n k=$k")
    val shUdf = udf((text: String) =>
      Dedup.shinglesJvm(Dedup.tokenizeJvm(text), n))
    df.select(explode(shUdf(col(textCol))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Column-expression twin of [[topNgrams]]'s per-row shingle chain —
    * the documented semantics the compiled kernel must match
    * (DataOpsSpec parity test).
    */
  private[graft] def topNgramsExprTwin(df: DataFrame, textCol: String,
                                       n: Int, k: Int): DataFrame =
    df.select(explode(TextFunctions.wordShinglesFromTokens(
        TextFunctions.tokens(lower(col(textCol))), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** Token-distribution drift between two corpora (did the mixture shift?
    * is a scrape contaminated?): for every token with at least `minCount`
    * total occurrences, the chi-square-style contribution
    * `(p_a - p_b)^2 / (p_a + p_b)` where p_x = count_x / total_tokens_x.
    * Every arithmetic step is a fixed-order IEEE operation on
    * integer-valued doubles, so the statistic is reproducible bit-for-bit
    * in portable SQL; rank/filter downstream on `drift`.
    *
    * Scale shape: one counting aggregate per corpus, a full outer join on
    * the token, and two 1-row total scalars — no driver-side data beyond
    * those totals. Output: (token, count_a, count_b, drift).
    */
  def tokenDriftStats(a: DataFrame, b: DataFrame, textCol: String,
                      minCount: Long = 1L): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(out))
    // each collapsed count relation feeds a scalar total AND the outer
    // join; pin both so each corpus is tokenized once
    val ca = counts(a, "count_a").localCheckpoint()
    val cb = counts(b, "count_b").localCheckpoint()
    def total(c: DataFrame, col0: String): Double = {
      val r = c.agg(sum(col(col0))).first()
      require(!r.isNullAt(0) && r.getLong(0) > 0,
        s"corpus for $col0 has no tokens — drift is undefined")
      r.getLong(0).toDouble
    }
    val na = total(ca, "count_a")
    val nb = total(cb, "count_b")
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("count_a"), lit(0L)).as("count_a"),
        coalesce(col("count_b"), lit(0L)).as("count_b"))
      .filter(col("count_a") + col("count_b") >= minCount)
    val pa = col("count_a") / lit(na)
    val pb = col("count_b") / lit(nb)
    joined.select(col("token"), col("count_a"), col("count_b"),
      ((pa - pb) * (pa - pb) / (pa + pb)).as("drift"))
  }

  // ---------------------------------------------------- n-gram LM scoring

  /** CCNet-style n-gram LM quality score: an add-one-smoothed bigram model
    * over lowercased whitespace tokens is fit on `train` and every `score`
    * document gets its mean transition probability
    * `mean_i (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)` plus the count of
    * transitions never seen in training. High-probability docs read like
    * the training corpus; gibberish and boilerplate score low — the same
    * filtering signal as CCNet's KenLM perplexity (Wenzek et al. 2020)
    * with a rational-arithmetic statistic instead of a log-space one, so
    * the score is reproducible bit-for-bit in portable SQL (each
    * probability is one correctly-rounded IEEE division of integer-valued
    * doubles, and the per-document mean folds them in position order).
    *
    * Scale shape: two aggregates over the exploded train bigrams (one
    * shuffle; prefix counts re-aggregate the already-collapsed bigram
    * relation), a scalar vocabulary count, then score-side explode +
    * shuffled equi-joins against the count relations and one per-document
    * ordered fold. No driver-side data beyond the 1-row vocab scalar; the
    * bigram join is a plain shuffle join, broadcastable when the model is
    * small.
    *
    * Output: (`idCol`, n_bigrams, n_unseen, mean_prob) — mean_prob null
    * for documents with fewer than two tokens.
    */
  def bigramLmScore(train: DataFrame, score: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    def bigrams(df: DataFrame): DataFrame =
      df.select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("__ts"))
        .filter(size(col("__ts")) >= 2)
        .select(col(idCol), col("__ts"),
          explode(sequence(lit(1), size(col("__ts")) - 1)).as("pos"))
        .select(col(idCol), col("pos"),
          element_at(col("__ts"), col("pos")).as("w"),
          element_at(col("__ts"), col("pos") + 1).as("v"))

    // the bigram table feeds BOTH the prefix totals and the scoring join;
    // pin it so the tokenize → explode pass over the training corpus runs
    // once (the collapsed relation is at most the distinct-bigram count)
    val bigramCounts = bigrams(train).groupBy("w", "v")
      .agg(count(lit(1)).as("__bc"))
      .localCheckpoint()
    val prefixCounts = bigramCounts.groupBy("w")
      .agg(sum(col("__bc")).as("__pc"))
    val vocab: Long = train
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .agg(countDistinct(col("t"))).first().getLong(0)

    val scored = bigrams(score)
      .join(bigramCounts, Seq("w", "v"), "left")
      .join(prefixCounts, Seq("w"), "left")
      .select(col(idCol), col("pos"),
        ((coalesce(col("__bc"), lit(0L)) + lit(1.0)) /
          (coalesce(col("__pc"), lit(0L)) + lit(vocab.toDouble))).as("prob"),
        when(col("__bc").isNull, lit(1L)).otherwise(lit(0L)).as("unseen"))
    val per = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("unseen")).as("n_unseen"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("prob")))),
            s => s.getField("prob")),
          lit(0.0), (a, x) => a + x).as("__sum"))
      .select(col(idCol), col("n_bigrams"), col("n_unseen"),
        (col("__sum") / col("n_bigrams")).as("mean_prob"))
    score.select(col(idCol)).distinct()
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        col("mean_prob"))
  }

  // ------------------------------------------------- lexical diversity

  /** Per-document lexical-diversity quality signals, all log-free so the
    * statistics are reproducible bit-for-bit in portable SQL: the
    * type-token ratio `n_types / n_tokens`, the top-token share
    * `max_tf / n_tokens` (boilerplate pages are dominated by one token),
    * and the Simpson repeat index `sum(tf^2) / n_tokens^2` — the
    * probability two random token draws collide, i.e. the rational
    * complement of the Gini–Simpson diversity index (Simpson 1949). Every
    * numerator/denominator is an exact integer (long) aggregate, so each
    * ratio is a single correctly-rounded IEEE division — no
    * summation-order sensitivity at all. Exact up to per-document token
    * counts of 2^26 (tf^2 sums stay under 2^53), far beyond any real
    * document.
    *
    * Complements [[repetitionStats]]: that measures *adjacent/n-gram*
    * repetition (Gopher's "repetitious text"); this measures global
    * distributional concentration.
    *
    * Scale shape: explode → per-(doc,token) counting aggregate → per-doc
    * re-aggregate of the collapsed relation (two shuffles on id, no
    * driver-side data); empty documents survive via a left join with
    * zero counts and null ratios.
    *
    * Output: (`idCol`, n_tokens, n_types, ttr, top_share, simpson).
    */
  def lexicalDiversityStats(df: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val per = tf.groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        max(col("tf")).as("__maxtf"),
        sum(col("tf") * col("tf")).as("__sumsq"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("__maxtf").cast("double") / col("n_tokens")).as("top_share"),
        (col("__sumsq").cast("double") / (col("n_tokens") * col("n_tokens")))
          .as("simpson"))
    df.select(col(idCol)).distinct()
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        col("ttr"), col("top_share"), col("simpson"))
  }

  // ------------------------------------------------------- BM25 retrieval

  /** BM25 top-`k` retrieval of documents for a bag of query terms
    * (Robertson & Walker 1994; the Okapi tf saturation
    * `tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))` with the standard
    * k1=1.2, b=0.75 defaults) — the workhorse for corpus triage and
    * nearest-neighbour text search without embeddings. The term weight is
    * the *rational* idf `(N - df + 0.5) / (df + 0.5)` — the odds ratio
    * inside Robertson's log — kept log-free deliberately: `ln` is not a
    * correctly-rounded IEEE operation, so a log-space score could differ
    * between engines in the last ulp and break the hash oracle (same
    * stance as [[bigramLmScore]]). Rarer terms still weigh strictly more;
    * only the compression of the scale differs from textbook BM25.
    *
    * The per-document score folds the matched-term contributions in
    * lexicographic term order (an ordered IEEE sum), so the total is
    * bit-reproducible in portable SQL.
    *
    * Scale shape: per-(doc,term) tf aggregate filtered to the query's
    * terms *before* the df join (the scan reduces to query-term postings —
    * the inverted-index access pattern, without materializing an index),
    * a broadcast-sized df relation (≤ one row per query term), and a
    * final `TakeOrderedAndProject` top-k (per-partition heaps, no global
    * sort). No driver-side data beyond the N/avgdl scalars.
    *
    * Output: top-k (`idCol`, n_matched, score), ties on the score broken
    * by id.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // Locale.ROOT: a default-locale lowercase on a tr-TR JVM maps I to
    // dotless i while Spark's lower() stays ASCII — the term would never
    // match (gopherStatsJvm already does this; keep the file consistent)
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(terms.nonEmpty, "queryTerms must be non-empty")
    val (lens, contrib) = bm25Core(df, idCol, textCol, k1, b)
    val tf = df
      .select(col(s"`$idCol`"),
        explode(TextFunctions.tokens(lower(col(s"`$textCol`")))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col(s"`$idCol`"), col("token")).agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfCounts), Seq("token"))
      .join(lens, Seq(idCol))
      .select(col(s"`$idCol`"), col("token"), contrib.as("__c"))
      .groupBy(col(s"`$idCol`"))
      .agg(count(lit(1)).as("n_matched"),
        aggregate(
          transform(array_sort(collect_list(struct(col("token"), col("__c")))),
            s => s.getField("__c")),
          lit(0.0), (a, x) => a + x).as("score"))
      .orderBy(col("score").desc, col(s"`$idCol`").asc)
      .limit(k)
  }

  /** Shared scoring core of [[bm25TopK]] / [[bm25Join]] — ONE definition
    * of the per-doc length relation and the rational BM25 contribution so
    * the single-query and batched paths cannot drift. Returns the pinned
    * lens(idCol, __dl) relation (localCheckpoint: the N/avgdl scalar
    * action AND the callers' final join both read it — without the pin
    * the corpus is tokenized twice; the tokenDriftStats/bigramLmScore
    * discipline) and the contribution Column over (tf, df, __dl) rows.
    * avgdl is one division of integer-valued doubles: identical in any
    * engine.
    */
  private def bm25Core(docs: DataFrame, idCol: String, textCol: String,
                       k1: Double, b: Double): (DataFrame, Column) = {
    val lens = docs.select(col(s"`$idCol`"),
      TextFunctions.tokenCount(lower(col(s"`$textCol`"))).cast("long").as("__dl"))
      .localCheckpoint()
    val corpus = lens.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__t"))
      .first()
    val nDocs: Long = corpus.getLong(0)
    require(nDocs > 0, "corpus is empty")
    val avgdl: Double = corpus.getLong(1).toDouble / nDocs.toDouble
    val contrib =
      ((lit(nDocs) - col("df")).cast("double") + lit(0.5)) / (col("df").cast("double") + lit(0.5)) *
        ((col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl").cast("double") / lit(avgdl)))))
    (lens, contrib)
  }

  /** Batched BM25 retrieval join — [[bm25TopK]] generalized from one query
    * to a query TABLE: for every (query id, terms array) row, the top-k
    * docs under the identical rational (log-free) BM25 scoring, with the
    * identical normalization (lowercase + per-query distinct terms) and
    * the identical term-ordered score fold, so scores are hash-exact
    * cross-engine. Output: (query_id, rank, `idCol`, score) — rank
    * 1-based by (score DESC, doc id ASC); queries matching no document
    * produce no rows.
    *
    * Scale shape: the distinct query vocabulary broadcasts into a
    * postings prefilter BEFORE any shuffle, so per-(query, doc) work is
    * bounded by matching postings, never |queries|·|corpus|; document
    * frequencies are computed once per term (they are query-independent);
    * the exploded (query, term) pairs broadcast onto the postings; and
    * the per-query top-k is the same native bounded-heap aggregate as the
    * k-NN joins (TopKByScore) — map-side partial heaps, no global sort.
    * A query id appearing on several `queries` rows retrieves with the
    * UNION of its term sets (terms dedup across rows, so a shared term
    * can never contribute twice).
    */
  def bm25Join(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTermsCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    Similarity.requireIntegralId(docs, idCol, "bm25 doc")
    Similarity.requireIntegralId(queries, qIdCol, "bm25 query")
    // Spark lower() (UTF8String, locale-independent) on BOTH the query
    // terms and the doc text — the same function on both sides, so a term
    // can never miss its own casing (bm25TopK's Locale.ROOT concern).
    // distinct(): dedup across a query's rows, not just within one array
    val qTerms = queries.select(col(s"`$qIdCol`").cast("long").as("__qid"),
        explode(transform(col(s"`$qTermsCol`"), t => lower(t))).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .distinct()
    val (lens, contrib) = bm25Core(docs, idCol, textCol, k1, b)
    // distinct cross-query vocabulary: the postings prefilter
    val vocab = qTerms.select(col("token")).distinct()
    val tf = docs
      .select(col(s"`$idCol`"),
        explode(TextFunctions.tokens(lower(col(s"`$textCol`")))).as("token"))
      .join(broadcast(vocab), Seq("token"))
      .groupBy(col(s"`$idCol`"), col("token")).agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfCounts), Seq("token"))
      .join(lens, Seq(idCol))
      .join(broadcast(qTerms), Seq("token"))
      .select(col("__qid"), col(s"`$idCol`").cast("long").as("__id"),
        col("token"), contrib.as("__c"))
      .groupBy(col("__qid"), col("__id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("token"), col("__c")))),
          s => s.getField("__c")),
        lit(0.0), (a, x) => a + x).as("__score"))
    Similarity.groupedTopK(scored, idCol, k, scoreName = "score")
  }

  // ---------------------------------------------------- quantile buckets

  /** Adds a label column that buckets rows by global quantile cutoffs of
    * `scoreCol` — CCNet's head/middle/tail partitioning of a corpus by LM
    * quality (Wenzek et al. 2020, §4.3) generalized to any score and any
    * cut list: `labels(i)` covers scores in `[q(cuts(i-1)), q(cuts(i)))`,
    * the last label everything at or above the top cutoff, rows with a
    * null score stay null. Cutoffs are the exact linear-interpolation
    * quantiles (Spark `percentile` ≡ portable `QUANTILE_CONT`, the parity
    * the conformal-interval oracles already prove), so the assignment is
    * hash-reproducible.
    *
    * Scale shape: ONE aggregate produces all cutoffs as a 1-row relation
    * joined back by broadcast — no global sort, no unpartitioned window
    * (an `ntile` spelling would move the corpus to one partition). The
    * input is referenced twice (cutoffs + assignment); persist or
    * checkpoint upstream if it is itself expensive. Exact `percentile`
    * buffers the score column per partition during the aggregate; at
    * extreme scale swap `approx_percentile` in — the plan shape is
    * unchanged (the oracle contract is what demands exactness here).
    */
  def quantileBuckets(df: DataFrame, scoreCol: String, cuts: Seq[Double],
                      labels: Seq[String],
                      bucketCol: String = "bucket"): DataFrame = {
    require(labels.length == cuts.length + 1,
      s"need one label per bucket: ${cuts.length} cuts -> ${cuts.length + 1} labels, got ${labels.length}")
    require(cuts.nonEmpty && cuts.forall(q => q > 0.0 && q < 1.0) &&
      cuts.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing within (0, 1), got $cuts")
    // the scored relation is read twice (cutoffs + assignment) and is
    // usually a DERIVED score (an LM/classifier pass over the corpus) —
    // pin it so the upstream scoring runs once. The pinned relation is
    // per-doc numeric rows, i.e. output-sized, never the raw corpus.
    val pinned = df.localCheckpoint()
    val qAggs = cuts.zipWithIndex.map { case (q, i) =>
      percentile(col(scoreCol), lit(q)).as(s"__q$i")
    }
    val cutRow = pinned.agg(qAggs.head, qAggs.tail: _*)
    val score = col(scoreCol)
    val assigned = cuts.indices.reverse.foldLeft(
      when(score.isNull, lit(null).cast("string"))
        .when(score >= col(s"__q${cuts.length - 1}"), lit(labels.last))) {
      case (acc, i) if i > 0 => acc.when(score >= col(s"__q${i - 1}"), lit(labels(i)))
      case (acc, _) => acc.otherwise(lit(labels.head))
    }
    pinned.crossJoin(broadcast(cutRow))
      .withColumn(bucketCol, assigned)
      .drop(cuts.indices.map(i => s"__q$i"): _*)
  }

  /** [[quantileBuckets]] per stratum — CCNet proper buckets perplexity
    * PER LANGUAGE (Wenzek et al. 2020 §3: head/middle/tail thresholds are
    * computed on each language's own distribution, not globally), and the
    * same holds for any mixed-domain corpus where score scales differ by
    * stratum. One grouped percentile aggregate (strata-sized relation)
    * broadcast-joined back on the strata keys; rows with a null score, a
    * null stratum key, or a stratum with no non-null scores emit a null
    * bucket — never a silently-global fallback.
    */
  def quantileBucketsBy(df: DataFrame, strataCols: Seq[String],
                        scoreCol: String, cuts: Seq[Double],
                        labels: Seq[String],
                        bucketCol: String = "bucket"): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column is needed")
    require(labels.length == cuts.length + 1,
      s"need one label per bucket: ${cuts.length} cuts -> ${cuts.length + 1} labels, got ${labels.length}")
    require(cuts.nonEmpty && cuts.forall(q => q > 0.0 && q < 1.0) &&
      cuts.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing within (0, 1), got $cuts")
    val qAggs = cuts.zipWithIndex.map { case (q, i) =>
      percentile(col(scoreCol), lit(q)).as(s"__q$i")
    }
    // same double-read as quantileBuckets: pin the (per-doc, output-sized)
    // scored relation so the upstream scoring runs once
    val pinned = df.localCheckpoint()
    val cutRows = pinned.groupBy(strataCols.map(col): _*).agg(qAggs.head, qAggs.tail: _*)
    val score = col(scoreCol)
    val assigned = cuts.indices.reverse.foldLeft(
      when(score.isNull || col(s"__q${cuts.length - 1}").isNull,
        lit(null).cast("string"))
        .when(score >= col(s"__q${cuts.length - 1}"), lit(labels.last))) {
      case (acc, i) if i > 0 => acc.when(score >= col(s"__q${i - 1}"), lit(labels(i)))
      case (acc, _) => acc.otherwise(lit(labels.head))
    }
    pinned.join(broadcast(cutRows), strataCols, "left")
      .withColumn(bucketCol, assigned)
      .drop(cuts.indices.map(i => s"__q$i"): _*)
  }

  /** [[quantileBuckets]] with `approx_percentile` cutoffs — the documented
    * extreme-scale swap-in (SCALING.md): the exact percentile buffers every
    * score per partition during the aggregate, while the approximate
    * aggregate holds a fixed-size KLL-style sketch per partition, so memory
    * is O(accuracy) at any corpus size. Identical plan shape (one
    * aggregate, one broadcast, zero Window operators) and identical
    * bucketing expression; cutoffs differ from the exact ones by at most
    * `1/accuracy` in rank, so there is no DuckDB oracle — the contract is
    * the exact variant's on rank-separated data (unit-tested).
    */
  def quantileBucketsApprox(df: DataFrame, scoreCol: String, cuts: Seq[Double],
                            labels: Seq[String], bucketCol: String = "bucket",
                            accuracy: Int = 10000): DataFrame = {
    require(labels.length == cuts.length + 1,
      s"need one label per bucket: ${cuts.length} cuts -> ${cuts.length + 1} labels, got ${labels.length}")
    require(cuts.nonEmpty && cuts.forall(q => q > 0.0 && q < 1.0) &&
      cuts.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing within (0, 1), got $cuts")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    val qAggs = cuts.zipWithIndex.map { case (q, i) =>
      approx_percentile(col(scoreCol), lit(q), lit(accuracy)).as(s"__q$i")
    }
    val pinned = df.localCheckpoint()
    val cutRow = pinned.agg(qAggs.head, qAggs.tail: _*)
    val score = col(scoreCol)
    val assigned = cuts.indices.reverse.foldLeft(
      when(score.isNull, lit(null).cast("string"))
        .when(score >= col(s"__q${cuts.length - 1}"), lit(labels.last))) {
      case (acc, i) if i > 0 => acc.when(score >= col(s"__q${i - 1}"), lit(labels(i)))
      case (acc, _) => acc.otherwise(lit(labels.head))
    }
    pinned.crossJoin(broadcast(cutRow))
      .withColumn(bucketCol, assigned)
      .drop(cuts.indices.map(i => s"__q$i"): _*)
  }

  // -------------------------------------------------------- collocations

  /** Corpus-level collocation extraction: the top-`k` adjacent token
    * pairs by *lift* `P(w,v) / (P(w) P(v)) = n_tokens c(w,v) / (c(w) c(v))`
    * among pairs with at least `minCount` occurrences — the classic
    * association measure (Church & Hanks 1990's PMI is its log; lift is
    * kept log-free so the statistic is one exact product chain and one
    * correctly-rounded division, bit-reproducible in portable SQL; the
    * ranking is identical because log is monotone). High-lift pairs are
    * multiword expressions ("new york", "machine learning") — the signal
    * for tokenizer vocab curation and phrase mining. Products stay exact
    * below 2^53: safe to corpus sizes of ~10^8 tokens with the default
    * counts; beyond that, pre-scale with `minCount`.
    *
    * Scale shape: one bigram counting aggregate + one token counting
    * aggregate, two equi-joins of the collapsed pair relation against the
    * (much smaller) unigram relation, then `TakeOrderedAndProject`
    * (per-partition heaps). The `minCount` filter lands on the aggregated
    * pair relation *before* the joins. No driver-side data beyond the
    * 1-row token total.
    *
    * Output: top-k (w, v, cnt, count_w, count_v, lift), ties on lift
    * broken by (w, v).
    */
  def collocationTopK(df: DataFrame, textCol: String, k: Int,
                      minCount: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val toks = df
      .select(TextFunctions.tokens(lower(col(textCol))).as("__ts"))
    val pairs = toks.filter(size(col("__ts")) >= 2)
      .select(explode(sequence(lit(1), size(col("__ts")) - 1)).as("__i"),
        col("__ts"))
      .select(element_at(col("__ts"), col("__i")).as("w"),
        element_at(col("__ts"), col("__i") + 1).as("v"))
      .groupBy("w", "v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    // pinned: the nTokens scalar action below AND both final-plan branches
    // (pairs, uni join) read this relation — unpinned, the corpus is
    // tokenized three times with no shareable exchange
    val uni = toks
      .select(explode(col("__ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val r = uni.agg(sum(col("c"))).first()
    require(!r.isNullAt(0) && r.getLong(0) > 0, "corpus has no tokens")
    val nTokens: Double = r.getLong(0).toDouble
    pairs
      .join(uni.select(col("t").as("w"), col("c").as("count_w")), Seq("w"))
      .join(uni.select(col("t").as("v"), col("c").as("count_v")), Seq("v"))
      .select(col("w"), col("v"), col("cnt"), col("count_w"), col("count_v"),
        ((col("cnt").cast("double") * lit(nTokens)) /
          (col("count_w").cast("double") * col("count_v").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("w").asc, col("v").asc)
      .limit(k)
  }

  // ------------------------------------------------ C4 page cleaning

  /** C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning...", §2.2): line-level retention + page-level
    * drops, as pure Column expressions over the line array — zero
    * shuffles, pipelines into the scan.
    *
    * Line rules (a line survives iff ALL hold, after trimming):
    *  - at least `minWordsPerLine` whitespace words (C4: 3);
    *  - ends in a terminal punctuation mark (`.`, `!`, `?`, `"`);
    *  - does not mention "javascript" (case-insensitive).
    * Page rules (evaluated on the original text / the kept lines):
    *  - any `blockedPhrases` hit (default "lorem ipsum", case-insensitive)
    *    drops the page;
    *  - a `{` drops the page (code);
    *  - fewer than `minSentences` terminal marks across the kept lines
    *    drops the page.
    * The curly-brace and phrase checks look at the ORIGINAL text (a code
    * page whose braces sit on dropped lines is still a code page). C4's
    * remaining rule — three-sentence span dedup across the corpus — is
    * [[graft.operators.Dedup.removeDuplicateSpans]], applied downstream.
    *
    * Output: one row per input doc — (id, text_clean, kept, n_lines,
    * n_lines_kept, n_sentences, drop_reason) with drop_reason null for
    * kept pages ("blocked_phrase" > "brace" > "too_few_sentences"
    * precedence otherwise). Dropped pages keep their cleaned text for
    * inspection; filter on `kept` to materialize the cleaned corpus.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              minWordsPerLine: Int = 3, minSentences: Int = 5,
              blockedPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    // "\r?\n": a CRLF corpus would otherwise keep a trailing \r on every
    // line — Spark's Java-regex `$` matches BEFORE a final \r while the
    // DuckDB twin's RE2 `$` does not, so the terminal-punct rule would
    // diverge across engines (and text_clean would embed \r)
    val lines = split(text, "\r?\n")
    // whitespace edge-trim, not trim() (0x20-only): a tab-edged line must
    // not defeat the terminal-punct check; class mirrors the twin exactly
    def wsTrim(l: Column): Column =
      regexp_replace(l, "^[ \\t\\r\\f\\u000B]+|[ \\t\\r\\f\\u000B]+$", "")
    def wordCount(l: Column): Column =
      size(filter(split(wsTrim(l), "\\s+"), t => t =!= ""))
    val keptLines = filter(lines, l =>
      wordCount(l) >= minWordsPerLine &&
        wsTrim(l).rlike("[.!?\"]$") &&
        !lower(l).contains("javascript"))
    val cleanText = array_join(keptLines, "\n")
    // sentence count = terminal marks in the kept text, counted by length
    // difference (split-based counting differs across engines on trailing
    // separators)
    val nSentences = (length(cleanText) -
      length(regexp_replace(cleanText, "[.!?]", ""))).cast("int")
    val phraseHit = blockedPhrases
      .map(p => lower(text).contains(p.toLowerCase(java.util.Locale.ROOT)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val reason = when(phraseHit, lit("blocked_phrase"))
      .when(text.contains("{"), lit("brace"))
      .when(nSentences < minSentences, lit("too_few_sentences"))
    df.select(col(idCol),
      cleanText.as("text_clean"),
      reason.isNull.as("kept"),
      size(lines).as("n_lines"),
      size(keptLines).as("n_lines_kept"),
      nSentences.as("n_sentences"),
      reason.as("drop_reason"))
  }

  // ------------------------------------------- DSIR importance resampling

  /** Portable md5-60 as a Column (the expression twin of Dedup.md560):
    * top 15 hex digits of md5(utf8) as a non-negative 60-bit long. DuckDB
    * spells it `('0x'||substr(md5(s),1,15))::BIGINT`.
    */
  /** The repo-wide portable 60-bit hash (md5 prefix as a bigint) — shared
    * so the spelling has one home (GraftGbm bin sampling reuses it).
    */
  private[graft] def md560Col(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by how target-like its hashed n-gram profile is, then draw a
    * k-document sample with Gumbel top-k — importance resampling without
    * replacement in one pass.
    *
    * Features are the unigrams + adjacent bigrams of the lowercased
    * whitespace tokens, hashed into `buckets` buckets with the portable
    * md5-60 family, so bucket assignment replays bit-for-bit in any SQL
    * engine with md5. Both corpora's bucket histograms are
    * Laplace-smoothed multinomials; a bucket's log-ratio is ONE ln of a
    * rational built from exact long counts,
    * ((n_t+1)·(N_q+B)) / ((n_q+1)·(N_t+B)), so the only cross-engine FP
    * divergence is that ln's last ulp (numerator/denominator products are
    * exact doubles while corpus gram counts stay under ~2^26). A
    * document's log-weight folds its buckets' c·lr terms in bucket order
    * (deterministic IEEE sum); the Gumbel key adds g = -ln(-ln(u)) with
    * u = (md560(salt:id)+1) / 2^61 ∈ (0, 1/2] — the denominator is an
    * exact double, so u is never 0 or 1 and replays identically in SQL.
    *
    * The CONTRACT is the selection, not the float: real corpora separate
    * adjacent keys by orders of magnitude more than a ulp, so the
    * (rank, id) result is stable across engines — the oracle compares
    * exactly that.
    *
    * Scale: the bucket log-ratio table is ≤ `buckets` rows (broadcast
    * join); per-document work is one groupBy(id, bucket) + one
    * groupBy(id); selection is orderBy+limit = TakeOrderedAndProject
    * (per-partition heaps). No all-pairs, no full-corpus global sort.
    */
  def dsirSample(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int, buckets: Int = 4096,
                 salt: String = "dsir"): DataFrame = {
    require(k > 0 && buckets > 0, "k and buckets must be positive")
    val b = lit(buckets.toLong)
    def gramBuckets(df: DataFrame): DataFrame = {
      val toks = df.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("__ts"))
      val unis = toks.select(col(idCol), explode(col("__ts")).as("__g"))
      val bis = toks.filter(size(col("__ts")) >= 2)
        .select(col(idCol),
          explode(sequence(lit(1), size(col("__ts")) - 1)).as("__i"),
          col("__ts"))
        .select(col(idCol), concat_ws(" ",
          element_at(col("__ts"), col("__i")),
          element_at(col("__ts"), col("__i") + 1)).as("__g"))
      unis.unionByName(bis).select(col(idCol), pmod(md560Col(col("__g")), b).as("__b"))
    }

    def histogram(df: DataFrame): DataFrame =
      df.groupBy(col("__b")).agg(count(lit(1)).as("__n"))

    // The tokenize→2-explode→hash subplan is the dominant cost; run it
    // ONCE over the raw side and materialize only the per-(doc, bucket)
    // COUNTS (map-side partial agg collapses the gram relation before the
    // shuffle — the r12 profile showed checkpointing the gram-level
    // relation itself paid a second full-size pass). The raw bucket
    // histogram is the exact long-sum of those counts, so both it and the
    // per-doc weights derive from the one small relation (the target side
    // is read once anyway).
    val docCounts = gramBuckets(raw)
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val tHist = histogram(gramBuckets(target))
    val qHist = docCounts.groupBy(col("__b")).agg(sum(col("__c")).as("__n"))
    val tTotal = tHist.agg(sum(col("__n")).as("__nt_total"))
    val qTotal = qHist.agg(sum(col("__n")).as("__nq_total"))
    // bucket log-ratio lookup: ≤ `buckets` rows, broadcast everywhere.
    // Raw-side base (left join): a bucket no raw gram hashes into is never
    // referenced by a raw document, so it needs no lut row.
    val lut = qHist.select(col("__b"), col("__n").as("__nq"))
      .join(tHist.select(col("__b"), col("__n").as("__nt")), Seq("__b"), "left")
      .crossJoin(broadcast(tTotal)).crossJoin(broadcast(qTotal))
      .select(col("__b"),
        log(((coalesce(col("__nt"), lit(0L)) + lit(1L)).cast("double") *
             (col("__nq_total") + b).cast("double")) /
            ((col("__nq") + lit(1L)).cast("double") *
             (col("__nt_total") + b).cast("double"))).as("__lr"))

    val docWeights = docCounts
      .join(broadcast(lut), Seq("__b"))
      .groupBy(col(idCol))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__b"),
          (col("__c").cast("double") * col("__lr")).as("__t")))),
          s => s.getField("__t")),
        lit(0.0), (a, x) => a + x).as("log_weight"))

    // seeded Gumbel key: u = (2h+1)/2^61 with h the 60-bit portable hash —
    // centered on (0,1) so -ln(-ln u) is a TRUE standard Gumbel. The old
    // (h+1)/2^61 put u in (0, 1/2]: a truncated Gumbel capped at
    // -ln(ln 2) ≈ 0.367, which silently mis-weights the Xie et al. top-k
    // resample. Integer-then-cast keeps the twin's exact FP sequence.
    val u = (md560Col(concat(lit(s"$salt:"), col(idCol).cast("string")))
        * lit(2L) + lit(1L))
      .cast("double") / lit(math.pow(2.0, 61))
    val keyed = raw.select(col(idCol)).distinct()
      .join(docWeights, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("log_weight"), lit(0.0)).as("log_weight"),
        (coalesce(col("log_weight"), lit(0.0)) - log(-log(u))).as("__key"))
    val top = keyed.orderBy(col("__key").desc, col(idCol).asc).limit(k)
    // rank the k winners without an unpartitioned WindowExec (the plan
    // class PlanGuard bans at ANY row count since r9): the limit-k
    // relation sorts within one partition and numbers by monotonic id —
    // bounded by k rows, and the warning class in logs stays a real defect
    top.coalesce(1).sortWithinPartitions(col("__key").desc, col(idCol).asc)
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
      .select(col("rank"), col(idCol), col("log_weight"))
  }

  // ------------------------------------------------- quality classifier

  /** Multinomial Naive Bayes "looks-like-target" quality classifier — the
    * supervised filter family behind GPT-3's Common-Crawl screening
    * (Brown et al. 2020, App. A: a classifier trained on WebText-vs-crawl)
    * and CCNet/fastText-style language/quality gates: train per-token
    * log-likelihood ratios on a positive (target) and a negative (raw)
    * corpus with add-one smoothing, then score each document by the summed
    * evidence of its token occurrences plus the class prior;
    * `label = score > 0` keeps target-looking docs.
    *
    * Reproducibility contract (the [[bigramLmScore]] discipline): each
    * token weight is `ln(((cPos+1)·(totNeg+V)) / ((cNeg+1)·(totPos+V)))`
    * evaluated as exactly one IEEE double multiply per side, one division,
    * one ln — over exact integer inputs — and the per-doc score is an
    * ordered fold over token positions, so both engines execute the
    * identical operation sequence and the doubles hash-match (Math.log and
    * DuckDB ln are bit-equal on this platform; verified over a 5000-point
    * rational grid).
    *
    * Out-of-vocabulary occurrences (token in neither training corpus) get
    * the same formula at cPos=cNeg=0 — the smoothing mass — so every token
    * contributes and `n_oov` makes the coverage observable.
    *
    * Scale shape: two token-count aggregates over the training corpora
    * (map-side combine), five one-row scalar aggregates, one equi-join of
    * score-side occurrences to the token-weight relation (broadcast when
    * small, shuffle otherwise — Catalyst's call), one per-doc fold. No
    * driver-side data beyond the five scalars, no windows over raw rows.
    *
    * Output: (`idCol`, n_tokens, n_oov, nb_score, label).
    */
  def nbQualityScore(pos: DataFrame, neg: DataFrame, score: DataFrame,
                     idCol: String, textCol: String): DataFrame = {
    // ONE tokenize → explode → aggregate pass over BOTH training corpora
    // (r13; was one pass per class): side-tag the union and split the
    // per-token counts with conditional sums. A token seen only in one
    // class carries an exact 0 for the other — the scoring join below
    // coalesces its old per-class null to 0, so every downstream value is
    // identical (integer counts, exact in FP) — and the out-of-vocabulary
    // flag (token absent from BOTH classes = no row here) is unchanged.
    // Pinned: the vocabulary-sized relation feeds the scalar totals AND
    // the scoring join (the dsirSample lesson).
    val tagged = pos.select(lit(1L).as("__side"), col(idCol), col(textCol))
      .unionByName(neg.select(lit(0L).as("__side"), col(idCol), col(textCol)))
    val counts = tagged
      .select(col("__side"), TextFunctions.tokens(lower(col(textCol))).as("__ts"))
      .filter(size(col("__ts")) >= 1)
      .select(col("__side"), explode(col("__ts")).as("token"))
      .groupBy("token")
      .agg(sum(col("__side")).as("__cp"),
        sum(lit(1L) - col("__side")).as("__cn"))
      .localCheckpoint()
    // the five one-row scalars fold into TWO jobs (exact integer sums, so
    // the combined aggregations are value-identical to separate ones):
    // token totals + vocab size over the pinned counts relation, and both
    // doc priors over the side-tagged union (pre-tokenize — cheap)
    val tv = counts
      .agg(sum(col("__cp")).as("tp"), sum(col("__cn")).as("tn"),
        count(lit(1)).as("v")).first()
    val totPos = if (tv.isNullAt(0)) 0L else tv.getLong(0)
    val totNeg = if (tv.isNullAt(1)) 0L else tv.getLong(1)
    val vocab = tv.getLong(2)
    val docCounts = tagged.groupBy(col("__side")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nPos = docCounts.getOrElse(1L, 0L)
    val nNeg = docCounts.getOrElse(0L, 0L)
    require(nPos > 0 && nNeg > 0, "both training corpora must be non-empty")
    val prior = math.log(nPos.toDouble / nNeg.toDouble)

    // r14: posexplode_OUTER keeps one null-token row per token-free doc, so
    // every score doc surfaces from the ONE aggregate — the old shape
    // re-scanned the score corpus for its id set and left-joined the
    // aggregate back (a second full pass + a distinct exchange + a join for
    // rows the aggregate already saw; same fold as Stats.strengths). The
    // null-token row contributes nothing: count(token) skips it (n_tokens
    // 0), the oov flag requires a real token, and collect_list skips the
    // null struct (fold over the empty list = prior) — value-identical,
    // including the all-docs-surface contract.
    val weighted = score
      .select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("__ts"))
      .select(col(idCol), posexplode_outer(col("__ts")).as(Seq("pos", "token")))
      .join(counts, Seq("token"), "left")
      .select(col(idCol), col("pos"), col("token"),
        log((coalesce(col("__cp"), lit(0L)) + lit(1L)).cast("double") *
              lit((totNeg + vocab).toDouble) /
            ((coalesce(col("__cn"), lit(0L)) + lit(1L)).cast("double") *
              lit((totPos + vocab).toDouble))).as("w"),
        when(col("token").isNotNull &&
            col("__cp").isNull && col("__cn").isNull, lit(1L))
          .otherwise(lit(0L)).as("oov"))
    weighted.groupBy(col(idCol))
      .agg(count(col("token")).as("n_tokens"), sum(col("oov")).as("n_oov"),
        aggregate(
          transform(array_sort(collect_list(
            when(col("token").isNotNull, struct(col("pos"), col("w"))))),
            s => s.getField("w")),
          lit(prior), (a, x) => a + x).as("nb_score"))
      .select(col(idCol), col("n_tokens"), col("n_oov"), col("nb_score"))
      .withColumn("label", col("nb_score") > lit(0.0))
  }
}
