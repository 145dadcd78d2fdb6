package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/** Deduplication at training-data scale. Every method is shuffle-conscious:
  * exact dedup is one hash aggregate; MinHash/SimHash candidate generation
  * is a band-bucket groupBy (no cross join anywhere); verification runs only
  * inside buckets.
  *
  * Shapes follow the standard public literature (Broder 1997 MinHash,
  * Charikar 2002 SimHash, banding from Mining of Massive Datasets ch.3).
  */
object Dedup {

  // -------------------------------------------------------------- compiled
  // kernels: the tokenize→shingle→hash chains are hot per-row loops, and
  // Catalyst higher-order functions are interpreted (CodegenFallback) — at
  // ~50 tokens/doc the expression path costs ~1ms/row in lambda dispatch
  // and array boxing. These JVM kernels compute the same values (bit-
  // identical hashes via Spark's own XXH64, seed 42 like `xxhash64`) in one
  // compiled call per row; DataOpsSpec asserts parity with the Column
  // expressions, which remain the documented semantics.

  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  // edge-trim ONLY \s (the TextFunctions.tokens contract), not String.trim
  // (which strips every char <= 0x20 incl. NUL): the kernels must tokenize
  // exactly like the expression twins or the parity/oracle contracts break
  // on control-character-edged text
  private[graft] val EdgeWs: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("^\\s+|\\s+$")

  private[graft] def tokenizeJvm(text: String): Array[String] =
    if (text == null) Array.empty
    else EdgeWs.matcher(text.toLowerCase(java.util.Locale.ROOT)).replaceAll("")
      .split("\\s+").filter(_.nonEmpty)

  private[graft] def shinglesJvm(toks: Array[String], n: Int): Array[String] =
    if (toks.length < n) Array.empty
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))

  /** xxhash64(string) with Spark's default seed 42 — bit-identical to the
    * `xxhash64` Column function on a single string argument.
    */
  private[graft] def xxh64String(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Bit-identical to `xxhash64(lit(seed: Int), hash: Long)`: Spark chains
    * child hashes, so the int seed hashes first (seed 42), then the long.
    */
  private def seedHashes(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  private[graft] def minhashJvm(text: String, shingleSize: Int,
                                    numHashes: Int): Array[Long] = {
    val sh = shinglesJvm(tokenizeJvm(text), shingleSize)
    if (sh.isEmpty) return null
    val seeds = seedHashes(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = xxh64String(sh(i))
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashLong(h, seeds(k))
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  /** SimHash normalization shared by both hash families (and mirrored by
    * the Column `simhash` regex and the DuckDB oracle's regexp_replace):
    * lowercase, strip non-letter/digit/space, split on whitespace.
    */
  private def simhashTokens(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).replaceAll("[^\\p{L}\\p{N}\\s]", "")
      .trim.split("\\s+").filter(_.nonEmpty)

  /** Sign-vote fingerprint over `bits` bit positions of `hash(token)`. */
  private def simhashVote(toks: Array[String], bits: Int,
                          hash: String => Long): Long = {
    val counts = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val h = hash(toks(i))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Compiled twin of `simhash` (same normalization regex, same xxhash64
    * token hashes, same sign votes) — null text stays null.
    */
  private[graft] def simhashJvm(text: String): java.lang.Long = {
    if (text == null) return null
    java.lang.Long.valueOf(simhashVote(simhashTokens(text), 64, xxh64String))
  }

  /** Compiled distinct word-shingle sets (twin of
    * `array_distinct(wordShinglesFromTokens(tokens(lower(text)), n))`).
    */
  private[graft] def distinctShinglesJvm(text: String, n: Int): Array[String] =
    shinglesJvm(tokenizeJvm(text), n).distinct

  // ---------------------------------------------------------------- portable
  // hash family: top-60-bits-of-md5 base hash + affine rehash mod 2^61-1.
  // Every step is reproducible in plain SQL in any engine that has md5 —
  // DuckDB spells the base hash `('0x'||substr(md5(s),1,15))::BIGINT` and
  // the rehash with HUGEINT arithmetic — which is what buys the sketch
  // pipelines (MinHash bands, SimHash blocks, hyperplane LSH) an EXACT
  // cross-engine oracle. The xxhash64 family above stays the fast default;
  // `portable = true` on the public entry points switches families without
  // touching the bucketing/pair plans.

  private[graft] val P61: Long = (1L << 61) - 1

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 15 hex digits of md5(utf8(s)) as a non-negative long (60 bits). */
  private[graft] def md560(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** (a*x + b) mod 2^61-1, exact for a, x, b in [0, 2^61): the 128-bit
    * product splits as hi*2^64 + lo with 2^64 ≡ 8 and 2^61 ≡ 1 (mod p).
    */
  private[graft] def affine61(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // < 2^58
    val lo = a * x                   // unsigned low 64 bits
    val loMod = (lo & P61) + (lo >>> 61)
    var r = hi * 8 + loMod + b       // < 3 * 2^61 < 2^63
    while (r >= P61) r -= P61
    r
  }

  /** Per-seed affine coefficients, themselves md5-derived (`a` nonzero). */
  private[graft] def affineCoeffs(numHashes: Int): (Array[Long], Array[Long]) = (
    Array.tabulate(numHashes)(k => md560(s"a:$k") % (P61 - 1) + 1),
    Array.tabulate(numHashes)(k => md560(s"b:$k") % P61))

  /** Portable-family MinHash signature: base = md560(shingle), component k
    * = min over shingles of (a_k * base + b_k) mod 2^61-1. Coefficients
    * depend only on `numHashes` — callers hoist them out of per-row loops
    * (the convenience overload below computes them per call for tests).
    */
  private[graft] def minhashJvmPortable(text: String, shingleSize: Int,
                                        numHashes: Int): Array[Long] = {
    val (as, bs) = affineCoeffs(numHashes)
    minhashJvmPortable(text, shingleSize, as, bs)
  }

  private[graft] def minhashJvmPortable(text: String, shingleSize: Int,
                                        as: Array[Long], bs: Array[Long]): Array[Long] = {
    val numHashes = as.length
    val sh = shinglesJvm(tokenizeJvm(text), shingleSize)
    if (sh.isEmpty) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = md560(sh(i))
      var k = 0
      while (k < numHashes) {
        val v = affine61(as(k), h, bs(k))
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  /** Portable-family SimHash: 60-bit fingerprint (md560 token hashes), sign
    * votes per bit — null text stays null, token-free text hashes to 0.
    */
  private[graft] def simhashJvmPortable(text: String): java.lang.Long = {
    if (text == null) return null
    java.lang.Long.valueOf(simhashVote(simhashTokens(text), 60, md560))
  }

  /** Exact dedup on a key expression: keeps the row with the smallest
    * `orderCol` per key. One shuffle (hash aggregate semantics via window).
    */
  def exact(df: DataFrame, key: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups by normalized-content fingerprint: returns
    * (fingerprint, n_docs, doc_ids) for groups with >1 member.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(idCol))).as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** MinHash signature: `numHashes` minima of seeded hashes over shingles.
    * Null/empty shingle sets get null signatures (excluded from LSH).
    *
    * Each shingle STRING is hashed once (`shingleHashes`); the per-seed
    * family re-hashes the resulting 64-bit value — fixed-width input, so the
    * 64-function family costs ~the same as one string hash instead of 64.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    minhashFromHashes(shingleHashes(shingles), numHashes)

  /** One strong 64-bit hash per shingle string. */
  def shingleHashes(shingles: Column): Column = transform(shingles, s => xxhash64(s))

  /** Signature from pre-computed shingle hashes (bind these to a column
    * first so the string hashing runs once, not once per seed).
    */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    when(size(hashes) > 0,
      array((0 until numHashes).map { seed =>
        array_min(transform(hashes, h => xxhash64(lit(seed), h)))
      }: _*))

  /** Full MinHash band-bucket relation (band, bhash, members) — shared by
    * pair generation and drop monitoring.
    */
  /** md560 as a Column function (portable band/bucket hashing). */
  private val md560Udf = udf((s: String) => md560(s))

  private def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
                             shingleSize: Int, numHashes: Int, bands: Int,
                             portable: Boolean): DataFrame = {
    require(numHashes % bands == 0)
    val rpb = numHashes / bands
    // small-file scans arrive as one partition; the per-row shingle/hash
    // work is the cost center, so spread it before computing. The compiled
    // kernel (minhashJvm — bit-identical to minhashSignature) does the
    // whole tokenize→shingle→hash→minima chain in one call per row.
    val sigUdf =
      if (portable) {
        // coefficients depend only on numHashes: computed ONCE here and
        // captured in the closure, not 2×numHashes md5 digests per row
        val (as, bs) = affineCoeffs(numHashes)
        udf((text: String) => minhashJvmPortable(text, shingleSize, as, bs))
      } else udf((text: String) => minhashJvm(text, shingleSize, numHashes))
    val sig = df.repartition(col(idCol))
      .select(col(idCol).as("__id"), sigUdf(col(textCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
      // materialization barrier: each band-hash expression references
      // __sig, and project collapse would otherwise inline the signature
      // computation into every reference — recomputing it per band per
      // row. Signatures are doc-count-sized (docs × numHashes longs);
      // building the LSH index once is the standard move at any scale.
      .localCheckpoint()

    // band key "b:v1,v2,..." under the portable family (oracle SQL:
    // b||':'||array_to_string(list_slice(sig,...),','))
    def bandHash(b: Column, members: Column): Column =
      if (portable) md560Udf(concat(b.cast("string"), lit(":"), concat_ws(",", members)))
      else xxhash64(b, concat_ws(",", members))
    val banded = sig.select(col("__id"), col("__sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            bandHash(b, slice(col("__sig"), b * lit(rpb) + 1, lit(rpb)))
              .as("bhash")))).as("__b"))
      .select(col("__id"), col("__sig"), col("__b.band"), col("__b.bhash"))

    banded.groupBy(col("band"), col("bhash"))
      .agg(collect_list(struct(col("__id"), col("__sig"))).as("members"))
  }

  /** Buckets dropped by `minhashPairs`'s `maxBucket` cap: (band, bhash,
    * bucket_size). Empty means no candidate loss; run this alongside
    * `minhashPairs` (same params) to monitor what the cap discarded —
    * oversized buckets are degenerate/boilerplate content, but the loss
    * must be observable, not silent.
    */
  def minhashDroppedBuckets(df: DataFrame, idCol: String, textCol: String,
                            shingleSize: Int = 3, numHashes: Int = 64,
                            bands: Int = 16, maxBucket: Int = 1000,
                            portable: Boolean = false): DataFrame =
    minhashBuckets(df, idCol, textCol, shingleSize, numHashes, bands, portable)
      .select(col("band"), col("bhash"), size(col("members")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** MinHash-LSH near-duplicate candidate pairs.
    *
    * signature → `bands` bands of `rowsPerBand` hashes → hash each band →
    * groupBy (band index, band hash) → pairs within small buckets. The
    * band-bucket explode produces `bands` rows per doc — linear, not
    * quadratic; the only quadratic work is inside same-bucket groups, capped
    * by `maxBucket` (oversized buckets = degenerate content; inspect the
    * drops with `minhashDroppedBuckets`).
    *
    * Returns (id_a, id_b, estJaccard) with id_a < id_b, deduplicated across
    * bands, estJaccard = signature agreement fraction.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, numHashes: Int = 64,
                   bands: Int = 16, maxBucket: Int = 1000,
                   portable: Boolean = false): DataFrame = {
    val buckets = minhashBuckets(df, idCol, textCol, shingleSize, numHashes, bands, portable)
      .filter(size(col("members")).between(2, maxBucket))

    // pairs within bucket (i < j), estimated Jaccard from full signatures
    val pairs = buckets.select(explode(expr(
      """
      flatten(transform(members, (m, i) ->
        transform(slice(members, i + 2, size(members)), n ->
          struct(least(m.__id, n.__id) as id_a,
                 greatest(m.__id, n.__id) as id_b,
                 aggregate(zip_with(m.__sig, n.__sig, (x, y) -> if(x = y, 1, 0)),
                           0, (a, b) -> a + b)
                   / cast(size(m.__sig) as double) as est_jaccard))))
      """)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.est_jaccard"))

    pairs.groupBy(col("id_a"), col("id_b")).agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** Near-duplicate pairs refined by EXACT edit distance: MinHash-LSH
    * candidates (bucket-local, capped, drops observable) filtered to pairs
    * whose full texts are within `maxDist` Levenshtein edits — the
    * fuzzy-exact tier between shingle similarity and byte equality, which
    * catches boilerplate pages differing only by a date or an id. The
    * O(len²) Levenshtein runs ONLY on candidate pairs, never all-pairs;
    * bound document length upstream for adversarial corpora.
    *
    * Returns (id_a, id_b, edit_dist).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int, minEstJaccard: Double = 0.5,
                        shingleSize: Int = 3, numHashes: Int = 64,
                        bands: Int = 16, maxBucket: Int = 1000,
                        portable: Boolean = false): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val pairs = minhashPairs(df, idCol, textCol, shingleSize, numHashes,
        bands, maxBucket, portable)
      .filter(col("est_jaccard") >= minEstJaccard)
    val texts = df.select(col(idCol), col(textCol))
    pairs
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), Seq("id_a"))
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), Seq("id_b"))
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb")))
      .filter(col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /** Shingles hotter than `maxShingleDf` for these inputs: (shingle, df).
    * These are excluded from `exactJaccardPairs` candidate generation; a
    * pair ALL of whose common shingles are hot is missed. Empty result =
    * the pair output is exhaustively exact.
    */
  def hotShingles(df: DataFrame, idCol: String, textCol: String,
                  shingleSize: Int = 3, maxShingleDf: Int = 10000): DataFrame = {
    val shUdf = udf((text: String) => distinctShinglesJvm(text, shingleSize))
    df.select(explode(shUdf(col(textCol))).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf)
  }

  /** Exact n-gram Jaccard pairs via inverted-index join (no LSH, no cross
    * join). Shared-shingle counts come from a groupBy over the RARE part of
    * the index (shingles with document frequency ≤ `maxShingleDf` — the
    * standard prefix-filtering cap; without it one shingle shared by k docs
    * emits k² join rows), corrected EXACTLY by intersecting each pair's
    * (small) hot-shingle subsets — so reported values are exact
    * |A∩B|/|A∪B| regardless of the cap, with join work bounded by
    * cap × index size. The size-ratio length filter prunes pairs that
    * cannot reach the threshold before the pair aggregation. Only pairs
    * whose EVERY common shingle is hot are missed; `hotShingles` (same
    * params) reports what the cap excluded.
    */
  def exactJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5,
                        maxShingleDf: Int = 10000): DataFrame = {
    // materialize the per-doc shingle sets once (compiled kernel, one call
    // per row): every downstream branch (the index build, sizes) reuses
    // them instead of re-tokenizing
    val shUdf = udf((text: String) => distinctShinglesJvm(text, shingleSize))
    val sh = df.repartition(col(idCol))
      .select(col(idCol).as("__id"), shUdf(col(textCol)).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .localCheckpoint()
    // ONE aggregation builds the whole inverted index as per-shingle sorted
    // doc lists; its size splits rare (pair-generating) from hot
    // (correction-only) shingles. This replaces the former
    // hot-count/anti-join/self-join triple with a single shuffle on the
    // shingle key; materialized because both branches read it.
    val byShingle = sh.select(col("__id"), explode(col("__sh")).as("__g"))
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .localCheckpoint()
    // shared-rare-shingle counts: pairs are emitted bucket-locally with a
    // two-level explode (outer = the i-th member, inner = members after it),
    // so per-row output stays bounded by the bucket size instead of
    // buffering the full i<j pair expansion of a bucket in one row.
    val rare = byShingle.filter(size(col("__ids")) <= maxShingleDf)
    val cRare = rare
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "id_a")))
      .select(col("id_a"), explode(
        slice(col("__ids"), col("__i") + 2,
          greatest(size(col("__ids")) - col("__i") - 1, lit(0)))).as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__c"))
    // per-doc hot-shingle subset: tiny arrays (only docs touching hot
    // shingles appear); bundled with the set sizes into one doc-level
    // lookup so each pair side joins once, not twice.
    val docHot = byShingle.filter(size(col("__ids")) > maxShingleDf)
      .select(col("__g"), explode(col("__ids")).as("__id"))
      .groupBy(col("__id")).agg(sort_array(collect_list(col("__g"))).as("__hot"))
    val docMeta = sh.select(col("__id"), size(col("__sh")).as("__n"))
      .join(docHot, Seq("__id"), "left")
    val empty = array().cast("array<string>")
    cRare
      .join(docMeta.select(col("__id").as("id_a"), col("__n").as("__na"),
        col("__hot").as("__hot_a")), Seq("id_a"))
      .join(docMeta.select(col("__id").as("id_b"), col("__n").as("__nb"),
        col("__hot").as("__hot_b")), Seq("id_b"))
      // length filter: jaccard >= t needs max(na, nb) <= min(na, nb)/t
      .filter(col("__na") <= col("__nb") / threshold &&
        col("__nb") <= col("__na") / threshold)
      .withColumn("__call", col("__c") + size(array_intersect(
        coalesce(col("__hot_a"), empty), coalesce(col("__hot_b"), empty))))
      .withColumn("jaccard",
        col("__call").cast("double") / (col("__na") + col("__nb") - col("__call")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard verification of candidate pairs: joins the shingle
    * sets back and computes |A∩B| / |A∪B|. Run after minhashPairs.
    */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, idCol: String,
                    textCol: String, shingleSize: Int = 3,
                    threshold: Double = 0.7): DataFrame = {
    val shUdf = udf((text: String) => distinctShinglesJvm(text, shingleSize))
    val sh = df.select(col(idCol).as("__jid"), shUdf(col(textCol)).as("__sh"))
    val a = sh.select(col("__jid").as("id_a"), col("__sh").as("__sh_a"))
    val b = sh.select(col("__jid").as("id_b"), col("__sh").as("__sh_b"))
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"))
  }

  /** 64-bit SimHash of the token multiset (Charikar 2002): sign of the
    * per-bit weighted sum of token hashes. Pure expressions.
    */
  def simhash(text: Column): Column = {
    // punctuation-insensitive: hash the normalized token stream
    val ts = tokens(regexp_replace(lower(text), raw"[^\p{L}\p{N}\s]", ""))
    val acc = aggregate(ts,
      array_repeat(lit(0), 64),
      (a, t) => {
        val h = xxhash64(t)
        zip_with(a, sequence(lit(0), lit(63)),
          (cnt, i) => cnt + when(call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(zip_with(acc, sequence(lit(0), lit(63)),
        (cnt, i) => when(cnt > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (s, b) => s.bitwiseOR(b))
  }

  /** SimHash near-dup candidates: split the 64-bit fingerprint into
    * `blocks` chunks; pairs agreeing on any chunk (≤ hamming distance
    * guarantee by pigeonhole) meet in a bucket. Verify by true hamming
    * distance ≤ maxHamming.
    */
  private def simhashBuckets(df: DataFrame, idCol: String, textCol: String,
                             blocks: Int, portable: Boolean): DataFrame = {
    // blocks must partition the fingerprint exactly (64-bit xx family,
    // 60-bit portable family): a remainder silently ignores high bits, and
    // blocks=1 would shift-overflow the chunk mask (1L << 64 == 1L on the
    // JVM) into all-zero chunks
    val fpBits = if (portable) 60 else 64
    require(blocks >= 2 && blocks <= fpBits && fpBits % blocks == 0,
      s"blocks must divide $fpBits and be >= 2, got $blocks")
    val bits = fpBits / blocks
    val simUdf =
      if (portable) udf((text: String) => simhashJvmPortable(text))
      else udf((text: String) => simhashJvm(text))
    val withSim = df.repartition(col(idCol))
      .select(col(idCol).as("__id"), simUdf(col(textCol)).as("__sim"))
      .filter(col("__sim").isNotNull)
      // same barrier as minhashBuckets: the per-block chunk expressions
      // all reference __sim; the checkpoint keeps the fingerprint build
      // single-pass and out of every block reference.
      .localCheckpoint()
    val banded = withSim.select(col("__id"), col("__sim"),
      explode(transform(sequence(lit(0), lit(blocks - 1)),
        b => struct(b.as("blk"),
          call_function("shiftright", col("__sim"), (b * lit(bits)).cast("int"))
            .bitwiseAND((1L << bits) - 1).as("chunk")))).as("__b"))
      .select(col("__id"), col("__sim"), col("__b.blk"), col("__b.chunk"))
    banded.groupBy(col("blk"), col("chunk"))
      .agg(collect_list(struct(col("__id"), col("__sim"))).as("members"))
  }

  /** Buckets dropped by `simhashPairs`'s `maxBucket` cap: (blk, chunk,
    * bucket_size) — the observable record of candidate loss.
    */
  def simhashDroppedBuckets(df: DataFrame, idCol: String, textCol: String,
                            blocks: Int = 4, maxBucket: Int = 1000,
                            portable: Boolean = false): DataFrame =
    simhashBuckets(df, idCol, textCol, blocks, portable)
      .select(col("blk"), col("chunk"), size(col("members")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   blocks: Int = 4, maxHamming: Int = 3,
                   maxBucket: Int = 1000, portable: Boolean = false): DataFrame = {
    // the pigeonhole candidate guarantee (two prints within maxHamming
    // share at least one unchanged chunk) requires maxHamming < blocks;
    // past it pairs would be SILENTLY missed, not just slower
    require(maxHamming < blocks,
      s"maxHamming=$maxHamming needs blocks > maxHamming (got $blocks): " +
        "the banding pigeonhole only guarantees candidates when fewer " +
        "differing bits exist than chunks")
    hammingPairsFromBuckets(
      simhashBuckets(df, idCol, textCol, blocks, portable),
      maxHamming, maxBucket)
  }

  /** In-bucket pair generation shared by every fingerprint family:
    * `buckets` holds `members: array<struct<__id, __sim>>`; emits
    * (id_a, id_b, hamming) for in-bucket pairs within `maxHamming`,
    * deduped across buckets. Bucket size capped at `maxBucket` (the
    * pigeonhole candidate-explosion guard — drops are the caller's to
    * observe via their bucket frame).
    */
  private def hammingPairsFromBuckets(buckets: DataFrame, maxHamming: Int,
                                      maxBucket: Int): DataFrame = {
    val capped = buckets.filter(size(col("members")).between(2, maxBucket))
    val pairs = capped.select(explode(expr(
      """
      flatten(transform(members, (m, i) ->
        transform(slice(members, i + 2, size(members)), n ->
          struct(least(m.__id, n.__id) as id_a,
                 greatest(m.__id, n.__id) as id_b,
                 bit_count(m.__sim ^ n.__sim) as hamming))))
      """)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .groupBy(col("id_a"), col("id_b")).agg(min("hamming").as("hamming"))
    pairs.filter(col("hamming") <= maxHamming)
  }

  /** Hamming-near pairs over PRECOMPUTED fingerprints — the simhash
    * block-pigeonhole machinery opened up for other 64-bit-ish families
    * (perceptual image dHash, audio fingerprints): two fingerprints within
    * `maxHamming` share at least one of `blocks` exact sub-chunks whenever
    * maxHamming < blocks, so candidates meet in chunk buckets and no
    * all-pairs comparison exists. `df` needs (idCol, fpCol long).
    */
  def fingerprintPairs(df: DataFrame, idCol: String, fpCol: String,
                       blocks: Int = 4, maxHamming: Int = 3,
                       maxBucket: Int = 1000, fpBits: Int = 64): DataFrame = {
    require(blocks >= 2 && blocks <= fpBits && fpBits % blocks == 0,
      s"blocks must divide $fpBits and be >= 2, got $blocks")
    require(maxHamming < blocks,
      s"maxHamming=$maxHamming needs blocks > maxHamming (got $blocks): " +
        "the banding pigeonhole only guarantees candidates when fewer " +
        "differing bits exist than chunks")
    val bits = fpBits / blocks
    val withSim = df.select(col(idCol).as("__id"), col(fpCol).as("__sim"))
      .filter(col("__sim").isNotNull)
    val banded = withSim.select(col("__id"), col("__sim"),
      explode(transform(sequence(lit(0), lit(blocks - 1)),
        b => struct(b.as("blk"),
          call_function("shiftright", col("__sim"), (b * lit(bits)).cast("int"))
            .bitwiseAND((1L << bits) - 1).as("chunk")))).as("__b"))
      .select(col("__id"), col("__sim"), col("__b.blk"), col("__b.chunk"))
    hammingPairsFromBuckets(
      banded.groupBy(col("blk"), col("chunk"))
        .agg(collect_list(struct(col("__id"), col("__sim"))).as("members")),
      maxHamming, maxBucket)
  }

  /** Resolve near-dup candidate PAIRS into dedup CLUSTERS: connected
    * components over the undirected pair graph, labeling every member with
    * the smallest id in its component (the canonical representative — keep
    * it, drop the rest). The missing last step between `minhashPairs`/
    * `simhashPairs`/`exactJaccardPairs` and an actual curation decision.
    *
    * Algorithm: min-label propagation with pointer-jumping compression —
    * each round takes the min label over neighbors, then rewrites every
    * label by its label's label (path halving), so convergence is
    * O(log diameter) rounds of id-partitioned shuffle joins rather than
    * O(diameter). Dedup components are overwhelmingly tiny (pair→cluster
    * fan-ins, short chains), so rounds stay in low single digits; each
    * round's frames are checkpoint-truncated to keep plans flat. Fails
    * loudly if `maxIters` rounds don't converge instead of returning a
    * partial clustering.
    *
    * Ids keep their column type (longs here, strings work too: `least`/
    * `min` order lexicographically). Only ids that appear in at least one
    * pair are returned.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxIters: Int = 25): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val edges = bridge.checkpointWithoutStats(
      pairs.select(col(aCol).as("__src"), col(bCol).as("__dst"))
        .unionByName(pairs.select(col(bCol).as("__src"), col(aCol).as("__dst")))
        .distinct())
    var labels = bridge.checkpointWithoutStats(
      edges.select(col("__src").as("__id")).distinct()
        .withColumn("__lbl", col("__id")))
    var converged = labels.isEmpty
    var it = 0
    while (!converged && it < maxIters) {
      // neighbor minimum
      val nbrMin = edges.join(labels, edges("__dst") === labels("__id"))
        .groupBy(col("__src")).agg(min(col("__lbl")).as("__nlbl"))
      val propagated = labels.join(nbrMin, labels("__id") === nbrMin("__src"), "left")
        .select(col("__id"),
          least(col("__lbl"), coalesce(col("__nlbl"), col("__lbl"))).as("__lbl"))
      // pointer jumping: label <- label(label)
      val parent = propagated.select(col("__id").as("__pid"), col("__lbl").as("__plbl"))
      val next = bridge.checkpointWithoutStats(
        propagated.join(parent, propagated("__lbl") === parent("__pid"), "left")
          .select(col("__id"), coalesce(col("__plbl"), col("__lbl")).as("__lbl")))
      val changed = next.join(labels.withColumnRenamed("__lbl", "__old"), "__id")
        .filter(col("__lbl") =!= col("__old")).limit(1).count()
      labels = next
      converged = changed == 0L
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — " +
        "pathological pair graph (diameter growth); raise maxIters")
    labels.select(col("__id").as("id"), col("__lbl").as("component"))
  }

  /** End-to-end near-dup deduplication: MinHash-LSH candidate pairs →
    * connected components → keep each cluster's smallest id. Returns the
    * surviving rows of `df` unchanged. One anti-join against the (tiny
    * relative to the corpus) non-representative id set; docs too short to
    * shingle never pair, so they always survive.
    */
  def deduplicate(df: DataFrame, idCol: String, textCol: String,
                  shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                  minEstJaccard: Double = 0.5, maxBucket: Int = 1000,
                  portable: Boolean = false): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, shingleSize, numHashes,
        bands, maxBucket, portable)
      .filter(col("est_jaccard") >= minEstJaccard)
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__loser"))
    df.join(losers, df(idCol) === losers("__loser"), "left_anti")
  }

  // ------------------------------------------------------------- winnowing

  /** Robust-winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    * 2003, the MOSS algorithm): hash every character `k`-gram of the
    * normalized text, slide a window of `w` consecutive gram hashes, and
    * keep each window's minimum — ties broken to the RIGHTMOST position,
    * the paper's rule. The guarantee: any shared substring of length
    * `k + w - 1` between two documents yields at least one shared
    * fingerprint, while only ~`2/(w+1)` of grams are kept — local
    * contamination/plagiarism detection with a bounded sketch, robust to
    * insertions that break global fingerprints like [[TextFunctions.fingerprint]].
    *
    * The gram hash is the portable md5-top-60-bits family, so the selected
    * set is reproducible in any engine with md5. The rightmost-argmin is
    * computed without nested window functions: a per-document rolling MIN
    * gives each full window's minimum, and an equi-join back to the gram
    * relation on (id, hash) with the window's position range recovers the
    * rightmost occurrence — per-document work, ~1 matching gram per
    * window, no cross-document anything.
    *
    * Scale shape: one per-id window pass (id-partitioned sort, the panel
    * invariant), one self-equi-join on (id, hash) whose per-key match
    * count is the within-doc multiplicity of the minimum hash, one
    * aggregate, one distinct. No global window, no driver-side data.
    *
    * Output: distinct (`idCol`, pos, fp) — `pos` the 0-based gram
    * position, `fp` the 60-bit gram hash. Documents shorter than
    * `k + w - 1` normalized chars produce no rows (no full window).
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 2, s"k-gram size must be at least 2, got $k")
    require(w >= 2, s"winnow window must be at least 2, got $w")
    val fpUdf = udf((text: String) => winnowJvm(text, k, w))
    df.select(col(idCol), explode(fpUdf(col(textCol))).as("__fp"))
      .select(col(idCol), col("__fp._1").as("pos"), col("__fp._2").as("fp"))
  }

  /** One-pass compiled winnowing selection: md560 gram hashes + the
    * classic sliding-window-minimum deque, popping `>=` from the back so
    * the front is always the RIGHTMOST minimum of the current window —
    * O(len) per document, no window exchange, no join. Bit-identical to
    * [[winnowFingerprintsExprTwin]] (DataOpsSpec parity) because the md5
    * base hash and the normalize→shingle chain are shared spellings.
    */
  private[graft] def winnowJvm(text: String, k: Int,
                               w: Int): Array[(Long, Long)] = {
    if (text == null) return Array.empty
    val nt = text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    val n = nt.length - k + 1
    if (n < w) return Array.empty
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = md560(nt.substring(i, i + k)); i += 1 }
    // deque of gram indices with strictly increasing hashes
    val dq = new Array[Int](n)
    var lo = 0
    var hi = 0 // exclusive
    val out = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    var t = 0
    while (t < n) {
      while (hi > lo && hs(dq(hi - 1)) >= hs(t)) hi -= 1
      dq(hi) = t; hi += 1
      if (dq(lo) <= t - w) lo += 1
      if (t >= w - 1) out.add((dq(lo).toLong, hs(dq(lo))))
      t += 1
    }
    out.toArray
  }

  /** Window + join spelling of [[winnowFingerprints]] — the documented
    * semantics (it mirrors the DuckDB oracle SQL token for token): a
    * per-id rolling MIN gives each full window's minimum and the join
    * back to the gram relation recovers the rightmost occurrence. Kept
    * for the parity test; the kernel replaces it on the hot path because
    * the per-gram `substr` lambda is an interpreted higher-order function
    * and the (id, hash) join multiplicity is quadratic on degenerate
    * repeated-content documents.
    */
  private[graft] def winnowFingerprintsExprTwin(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val grams = df
      .select(col(idCol),
        posexplode(charShingles(col(textCol), k)).as(Seq("pos", "__g")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        conv(substring(md5(col("__g")), 1, 15), 16, 10).cast("long").as("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    val wins = grams
      .select(col(idCol), col("pos").as("t"),
        min(col("h")).over(win).as("__minh"),
        count(lit(1)).over(win).as("__cnt"))
      .filter(col("__cnt") === w)
      .drop("__cnt")
    val g = grams.select(col(idCol).as("__gid"), col("pos").as("__gpos"),
      col("h").as("__gh"))
    wins.join(g,
        col(idCol) === col("__gid") && col("__minh") === col("__gh") &&
          col("__gpos") >= col("t") - (w - 1) && col("__gpos") <= col("t"))
      .groupBy(col(idCol), col("t"), col("__minh"))
      .agg(max(col("__gpos")).as("pos"))
      .select(col(idCol), col("pos"), col("__minh").as("fp"))
      .distinct()
  }

  // ---------------------------------------------------------------- span-
  // level exact-substring duplication (the dedup granularity between
  // whole-document exact dedup and document-pair near-dup): token spans
  // repeated ANYWHERE in the corpus — other documents or the same one —
  // reported as maximal runs per document, the shape used to cut
  // memorized boilerplate out of training text (Lee et al. 2022,
  // "Deduplicating Training Data Makes Language Models Better"; the
  // reference corpus ops stop at whole-doc granularity).

  /** Token n-grams per document as 60-bit portable hashes in position
    * order — compiled kernel (one call per row; the transform/slice
    * expression chain is an interpreted HOF at ~1µs/element).
    */
  private[graft] def spanGramHashesJvm(text: String, n: Int): Array[Long] =
    shinglesJvm(tokenizeJvm(text), n).map(md560)

  /** Expression twin of [[spanGramHashesJvm]] — documented semantics,
    * asserted bit-identical in DataOpsSpec and mirrored token for token by
    * the DuckDB oracle (`('0x'||substr(md5(gram),1,15))::BIGINT`).
    */
  private[graft] def spanGramHashesExpr(text: Column, n: Int): Column = {
    val ts = graft.functions.TextFunctions.tokens(lower(text))
    when(ts.isNull, lit(null).cast("array<bigint>"))
      .when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - n + 1), i =>
          conv(substring(md5(array_join(slice(ts, i, lit(n)), " ")), 1, 15), 16, 10)
            .cast("long")))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Maximal duplicated token spans per document: every n-gram occurring
    * at >= `minOccurrences` corpus positions is marked, and overlapping
    * or adjacent marked grams coalesce (via the interval sweep) into
    * 1-based inclusive token ranges (id, span_start, span_end,
    * n_dup_grams).
    *
    * Scale shape: |tokens| gram rows, one map-side-combined count by
    * hash, one hash join back (hot boilerplate grams are high-df keys —
    * AQE skew-splits them), one per-doc interval sweep. Never pairwise in
    * documents.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, minOccurrences: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be at least 1, got $n")
    require(minOccurrences >= 2, s"minOccurrences must be at least 2, got $minOccurrences")
    val occ = gramOccurrences(df, idCol, textCol, n)
    val dup = occ.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minOccurrences)
      .select(col("__h"))
    val iv = occ.join(dup, "__h")
      .select(col(idCol), col("__pos").as("__s"),
        (col("__pos") + (n - 1)).cast("long").as("__e"))
    // ADJACENT marked grams must coalesce (scaladoc contract): for n >= 2
    // gram adjacency already makes the token intervals overlap, but at
    // n = 1 adjacent grams produce touching one-token intervals that a
    // zero-gap merge keeps apart — allow a 1-token gap there only
    Sessions.mergeIntervals(iv, Seq(idCol), "__s", "__e",
      minGap = if (n == 1) 1L else 0L)
      .select(col(idCol), col("__s").as("span_start"), col("__e").as("span_end"),
        col("n_merged").as("n_dup_grams"))
  }

  /** (id, 1-based gram position, md5-60 gram hash) occurrence relation. */
  private def gramOccurrences(df: DataFrame, idCol: String, textCol: String,
                              n: Int): DataFrame = {
    val hashesUdf = udf((t: String) => spanGramHashesJvm(t, n))
    df.select(col(idCol), posexplode(hashesUdf(col(textCol))).as(Seq("__p0", "__h")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__pos"), col("__h"))
  }

  /** The cleaning step over [[duplicateSpans]]: cut every duplicated span
    * occurrence EXCEPT the globally first one (smallest (id, position) —
    * id compared in its column type), and emit the surviving token stream
    * per document. This is the Lee et al. 2022 move applied at n-gram
    * granularity.
    *
    * Keeper guarantee (per GRAM, not per token): each duplicated n-gram's
    * keeper OCCURRENCE is never cut by its own gram. When DIFFERENT
    * duplicated grams overlap the same tokens, a keeper gram's tokens can
    * still be removed by the other gram's overlapping non-keeper
    * occurrence — so heavily self-overlapping boilerplate may survive
    * fewer than once in rare alignments. (The per-gram rule is the
    * relational form; a cut-exclusion pass protecting keeper token ranges
    * would need another join against the keeper set per cut.)
    *
    * The output `textCol` is the NORMALIZED token stream (lowercased,
    * single-spaced — the tokenize→detokenize caveat), plus
    * `n_tokens_removed`. Documents whose every token was cut come out
    * with an empty string, not a dropped row.
    *
    * Fully relational (explode/aggregate/anti-join/re-aggregate, work
    * linear in token count, no doc-pairwise step), so the DuckDB twin can
    * replay it exactly: tokens anti-joined against exploded cut ranges,
    * re-assembled with an ordered string_agg.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, minOccurrences: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be at least 1, got $n")
    require(minOccurrences >= 2, s"minOccurrences must be at least 2, got $minOccurrences")
    val occ = gramOccurrences(df, idCol, textCol, n)
    // per duplicated hash: the globally-first occurrence survives
    val firstOcc = occ.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col(idCol), col("__pos"))).as("__keep"))
      .filter(col("__c") >= minOccurrences)
      .select(col("__h"), col("__keep"))
    val cutGrams = occ.join(firstOcc, "__h")
      .filter(!(col(idCol) === col(s"__keep.`$idCol`") &&
        col("__pos") === col("__keep.__pos")))
      .select(col(idCol), col("__pos").as("__s"),
        (col("__pos") + (n - 1)).cast("long").as("__e"))
    // covered positions: explode each cut gram's range and dedupe (the
    // union of ranges — at most the doc's token count, so linear)
    val cutPos = cutGrams
      .select(col(idCol), explode(sequence(col("__s"), col("__e"))).as("__pos"))
      .distinct()
    val toks = df.select(col(idCol),
        posexplode(tokens(lower(col(textCol)))).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__pos"), col("__tok"))
    val kept = toks.join(cutPos, Seq(idCol, "__pos"), "left_anti")
    // ordered re-assembly; left join keeps fully-cut (and empty) docs
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__tok")))),
        e => e.getField("__tok")), " ").as("__cleaned"))
    val counts = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__total"))
    val keptCounts = kept.groupBy(col(idCol)).agg(count(lit(1)).as("__kept"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .join(counts, Seq(idCol), "left")
      .join(keptCounts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__cleaned"), lit("")).as(textCol),
        (coalesce(col("__total"), lit(0L)) - coalesce(col("__kept"), lit(0L)))
          .as("n_tokens_removed"))
  }

  // ------------------------------------------ paragraph-level exact dedup

  /** Corpus-wide paragraph deduplication, the Dolma / RefinedWeb recipe:
    * every paragraph (newline-separated unit, after trimming) that occurs
    * more than once across the corpus keeps ONLY its globally-first
    * occurrence — ordered by (doc id, position within doc) — and every
    * later copy is cut from its document. Complements the token-n-gram
    * [[removeDuplicateSpans]] (exact substring granularity) with the
    * coarser structural unit real pipelines dedupe first: boilerplate
    * headers, navigation, license blocks.
    *
    * Empty/whitespace-only paragraphs are preserved verbatim (they carry
    * document structure and are not "content" to dedupe).
    *
    * Relational shape: posexplode paragraphs → one hash aggregate picks
    * the global keeper per distinct paragraph → a join marks losers →
    * ordered re-assembly per doc. Work is linear in corpus paragraphs; the
    * only skew risk is a paragraph shared by millions of docs, which the
    * aggregate (not a self-join) absorbs. Output: (id, textCol cleaned,
    * n_paragraphs, n_paragraphs_removed).
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // WHITESPACE edge-trim, not trim() (which strips only ASCII 0x20, the
    // same pitfall TextFunctions.tokens documents): on a CRLF corpus every
    // blank line survives a space-only trim as "\r", all of them dedup to
    // one global keeper, and paragraph structure is destroyed corpus-wide.
    // \n cannot appear (split key), so the class is the remaining ASCII ws.
    def wsTrim(c: Column): Column =
      regexp_replace(c, "^[ \\t\\r\\f\\u000B]+|[ \\t\\r\\f\\u000B]+$", "")
    val paras = df.select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("__pos", "__para")))
    val content = paras.filter(wsTrim(col("__para")) =!= "")
    // globally-first occurrence per distinct (trimmed) paragraph
    val keeper = content
      .groupBy(wsTrim(col("__para")).as("__key"))
      .agg(min(struct(col(idCol).as("__kid"), col("__pos").as("__kpos")))
        .as("__keep"), count(lit(1)).as("__occ"))
    // keeper is one row per DISTINCT paragraph — often broadcastable but
    // unbounded on a diverse corpus; no hint, let Catalyst/AQE decide.
    // A leading 64-bit hash key makes the join keys (hash, string): the
    // sort-merge comparisons at scale resolve on the long and fall back to
    // the full string only for true duplicates, while the string equality
    // in the key set keeps the match exact under hash collisions.
    val marked = paras.join(keeper,
        xxhash64(wsTrim(col("__para"))) === xxhash64(col("__key")) &&
          wsTrim(col("__para")) === col("__key"), "left")
      .select(col(idCol), col("__pos"), col("__para"),
        // keep: empty paragraphs, unique paragraphs, and the first copy
        (col("__key").isNull || col("__occ") === 1L ||
          (col("__keep.__kid") === col(idCol) &&
            col("__keep.__kpos") === col("__pos"))).as("__kept"))
    // ONE aggregate produces the rebuilt text AND the stats — collect_list
    // skips the null emitted for cut paragraphs, so the kept-only filter
    // folds into the same pass instead of a second scan over `marked`.
    val rebuilt = marked.groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(
          when(col("__kept"), struct(col("__pos"), col("__para"))))),
        e => e.getField("__para")), "\n").as("__cleaned"),
      count(lit(1)).as("__n"),
      sum(when(!col("__kept"), 1L).otherwise(0L)).as("__cut"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__cleaned"), lit("")).as(textCol),
        coalesce(col("__n"), lit(0L)).cast("int").as("n_paragraphs"),
        coalesce(col("__cut"), lit(0L)).cast("int").as("n_paragraphs_removed"))
  }
}
