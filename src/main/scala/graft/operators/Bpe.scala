package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer training over a distributed corpus
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"). The reference engine has no tokenizer module; this
  * extends the documents-table surface for pre-training prep, where the
  * tokenizer itself is trained on the corpus being curated.
  *
  * Scale design: the ONLY full-corpus pass is the word-frequency collapse
  * (explode → one counting shuffle) — the same collapse industrial BPE
  * trainers do before merging — so 100 TB of text becomes a relation
  * bounded by distinct-word count. The merge loop then maintains the
  * pair-count relation by DELTA: each merge re-explodes only the words
  * containing the merged pair (pairs − affected + rewritten, integer-exact
  * longs), one 1-row argmax action per merge, and the driver only ever
  * holds the merge list (numMerges rows). Lineage is truncated with a
  * localCheckpoint on both compact relations every few merges so the plan
  * stays flat in numMerges.
  *
  * Words are lowercased whitespace tokens split into single characters with
  * a trailing `</w>` end-of-word marker; a merge fuses every non-overlapping
  * left-to-right occurrence of the pair. Ties on the pair count break on
  * (left, right) string order, so training is fully deterministic.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Job-group id carried by every training-loop Spark job (spec-countable). */
  val TrainJobGroup = "graft-bpe-train"

  /** Word-frequency collapse: the one full-corpus pass.
    * Output: (word, cnt).
    */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol array for a word: single characters + `</w>`. */
  private def initialSymbols(word: Column): Column =
    concat(filter(split(word, ""), c => c =!= ""), array(lit(EndOfWord)))

  /** Adjacent symbol-pair counts over a (symbols, cnt) vocabulary relation,
    * weighted by word count; every occurrence inside a word counts.
    * Output: (sym_left, sym_right, cnt).
    */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("symbols")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("symbols")) - 1),
          i => struct(element_at(col("symbols"), i).as("sym_left"),
            element_at(col("symbols"), i + 1).as("sym_right")))).as("p"))
      .groupBy(col("p.sym_left").as("sym_left"), col("p.sym_right").as("sym_right"))
      .agg(sum(col("cnt")).as("cnt"))

  /** First-iteration pair statistics straight off the corpus — the
    * primitive a single BPE merge decision needs, exactly reproducible in
    * SQL. Output: (sym_left, sym_right, cnt).
    */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCounts(wordFreqs(df, textCol)
      .select(col("cnt"), initialSymbols(col("word")).as("symbols")))

  /** Fuse every non-overlapping left-to-right (l, r) occurrence. */
  private[graft] def applyMergeJvm(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** True when the symbol array contains (l, r) adjacent. */
  private def hasAdjacent(symbols: Column, l: Column, r: Column): Column = {
    val n = size(symbols)
    exists(zip_with(slice(symbols, lit(1), n - 1), slice(symbols, lit(2), n - 1),
      (a, b) => a === l && b === r), x => x)
  }

  /** Signed adjacent-pair structs of one symbol array (empty when the word
    * is fully merged) — lets one explode carry +new and −old together.
    */
  private def signedPairs(symbols: Column, sign: Int, cnt: Column): Column =
    when(size(symbols) >= 2,
      transform(sequence(lit(1), size(symbols) - 1),
        i => struct(element_at(symbols, i).as("sym_left"),
          element_at(symbols, i + 1).as("sym_right"),
          (cnt * lit(sign.toLong)).as("cnt"))))
      .otherwise(array())

  /** Train `numMerges` BPE merges — exact sequential Sennrich training
    * (each merge is the global argmax AFTER the previous merge applied;
    * batching merges is not sound without triple counts, since a merge can
    * create pairs counting up to its own frequency).
    *
    * Industrial shape: the word-frequency collapse is the ONLY pass whose
    * size scales with the corpus; the distinct-(word,cnt) vocabulary it
    * produces is what in-memory BPE trainers (the classic Sennrich script,
    * HF tokenizers) train on. When that vocabulary fits `localVocabCap`
    * rows it is collected ONCE and the full merge loop runs driver-local —
    * int-interned symbols, delta-maintained pair counts, a lazy-deletion
    * priority queue for the argmax — so a 32k-merge production vocab costs
    * TWO Spark actions (count + collect), not 32k sequential jobs. Above
    * the cap the loop falls back to the distributed delta path
    * ([[bpeTrainDistributed]]): per-merge 1-row argmax actions whose
    * shuffles are sized by the AFFECTED words only. Both paths produce
    * bit-identical merge tables (counts are exact longs; ties on the pair
    * count break on (left, right) string order — fully deterministic).
    * Stops early when no pair reaches `minPairCount`. Returns the merge
    * table (rank, sym_left, sym_right, cnt) — rank is 1-based application
    * order.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 1L,
               localVocabCap: Long = 4000000L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val freqs = graft.tools.JobGroups.withJobGroup(sc, Bpe.TrainJobGroup,
      "BPE word-frequency collapse")(
      wordFreqs(df, textCol).localCheckpoint())
    val vocabSize = freqs.count()
    if (vocabSize <= localVocabCap) {
      val vocab = graft.tools.JobGroups.withJobGroup(sc, Bpe.TrainJobGroup,
        "BPE vocab collect")(
        freqs.select(col("word"), col("cnt")).collect()
          .map(r => (r.getString(0), r.getLong(1))))
      bpeTrainLocal(vocab, numMerges, minPairCount)
        .toDF("rank", "sym_left", "sym_right", "cnt")
    } else bpeTrainDistributed(freqs, numMerges, minPairCount)
  }

  /** Driver-local exact Sennrich merge loop over the collected
    * (word, cnt) vocabulary. Symbols are interned to Int ids (pair key =
    * one Long), pair counts are delta-maintained per merge over only the
    * words containing the pair, and the argmax comes from a max-heap with
    * lazy invalidation (entries are revalidated against the live count on
    * pop) — O((V·len + M·affected)·log P) total, no quadratic rescans.
    * Identical semantics to the distributed path: occurrences inside a
    * word count with multiplicity, merges fuse non-overlapping
    * left-to-right, ties break on (left, right) STRING order.
    */
  private[graft] def bpeTrainLocal(vocab: Array[(String, Long)], numMerges: Int,
                                   minPairCount: Long): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val names = mutable.ArrayBuffer.empty[String]
    val ids = mutable.HashMap.empty[String, Int]
    def intern(s: String): Int =
      ids.getOrElseUpdate(s, { names += s; names.length - 1 })
    def pk(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xffffffffL)
    def pkL(p: Long): Int = (p >>> 32).toInt
    def pkR(p: Long): Int = (p & 0xffffffffL).toInt

    // split by CODE POINT, not UTF-16 char: the distributed path's
    // split(word, "") uses regex code-point semantics and never splits a
    // surrogate pair, so non-BMP text (emoji, supplementary CJK) must
    // produce the same whole-code-point symbols here to keep the
    // local/distributed routing bit-identical
    val words = vocab.map { case (w, _) =>
      (w.codePoints().toArray.map(cp => intern(new String(Character.toChars(cp))))
        :+ intern(EndOfWord))
    }
    val cnts = vocab.map(_._2)

    // pair multiset of one word (multiplicity-weighted, like signedPairs)
    def pairsOf(a: Array[Int]): mutable.LongMap[Int] = {
      val m = mutable.LongMap.empty[Int]
      var i = 0
      while (i < a.length - 1) {
        val p = pk(a(i), a(i + 1))
        m.update(p, m.getOrElse(p, 0) + 1)
        i += 1
      }
      m
    }

    val pairCnt = mutable.LongMap.empty[Long]
    val pairWords = mutable.LongMap.empty[mutable.HashSet[Int]]
    var wi = 0
    while (wi < words.length) {
      val c = cnts(wi)
      pairsOf(words(wi)).foreachEntry { (p, m) =>
        pairCnt.update(p, pairCnt.getOrElse(p, 0L) + m * c)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += wi
      }
      wi += 1
    }

    // tie-break comparator matching the distributed path EXACTLY: Spark's
    // string asc is UTF8String binary order = Unicode CODE POINT order,
    // which differs from Java's UTF-16 compareTo for supplementary
    // characters (surrogates sort below U+E000..U+FFFF in UTF-16) — so
    // compare by code point, not by char
    def cmpCodePoints(x: String, y: String): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val cx = x.codePointAt(i); val cy = y.codePointAt(i)
        if (cx != cy) return Integer.compare(cx, cy)
        i += Character.charCount(cx) // equal code points: same advance
      }
      Integer.compare(x.length, y.length)
    }
    // max-heap: larger count first; ties -> SMALLEST (left, right) names
    val ord = new Ordering[(Long, Long)] { // (cnt, pairKey)
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else {
          val l = cmpCodePoints(names(pkL(b._2)), names(pkL(a._2)))
          if (l != 0) l else cmpCodePoints(names(pkR(b._2)), names(pkR(a._2)))
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, Long)](ord)
    pairCnt.foreachEntry { (p, c) => heap.enqueue((c, p)) }

    def applyMergeInt(a: Array[Int], l: Int, r: Int, fused: Int): Array[Int] = {
      val out = new Array[Int](a.length)
      var i = 0; var j = 0
      while (i < a.length) {
        if (i + 1 < a.length && a(i) == l && a(i + 1) == r) {
          out(j) = fused; i += 2
        } else { out(j) = a(i); i += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(out, j)
    }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // pop until the top entry matches the live count (lazy invalidation)
      var top: Option[(Long, Long)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCnt.getOrElse(e._2, 0L) == e._1 && e._1 > 0L) top = Some(e)
      }
      top match {
        case None => done = true
        case Some((c, p)) if c < minPairCount => done = true
        case Some((c, p)) =>
          val l = pkL(p); val r = pkR(p)
          merges += ((rank, names(l), names(r), c))
          val fused = intern(names(l) + names(r))
          val affected = pairWords.getOrElse(p, mutable.HashSet.empty[Int]).toArray
          val touched = mutable.LongMap.empty[Boolean]
          var k = 0
          while (k < affected.length) {
            val idx = affected(k)
            val w = cnts(idx)
            val before = pairsOf(words(idx))
            val after0 = applyMergeInt(words(idx), l, r, fused)
            val after = pairsOf(after0)
            words(idx) = after0
            before.foreachEntry { (q, m) =>
              val nv = pairCnt.getOrElse(q, 0L) - m.toLong * w
              if (nv == 0L) pairCnt.remove(q) else pairCnt.update(q, nv)
              if (!after.contains(q))
                pairWords.get(q).foreach { s => s -= idx; if (s.isEmpty) pairWords.remove(q) }
              touched.update(q, true)
            }
            after.foreachEntry { (q, m) =>
              pairCnt.update(q, pairCnt.getOrElse(q, 0L) + m.toLong * w)
              pairWords.getOrElseUpdate(q, mutable.HashSet.empty[Int]) += idx
              touched.update(q, true)
            }
            k += 1
          }
          // one heap entry per touched pair at its settled post-merge count
          touched.foreachEntry { (q, _) =>
            val cc = pairCnt.getOrElse(q, 0L)
            if (cc > 0L) heap.enqueue((cc, q))
          }
          rank += 1
      }
    }
    merges.toSeq
  }

  /** The distributed delta-maintained merge loop (the over-cap fallback):
    * one 1-row argmax action per merge; the per-merge shuffle is sized by
    * the AFFECTED words, never a full re-explode of the vocabulary; two
    * lineage-truncating checkpoints every 8 merges; jobs run under
    * [[Bpe.TrainJobGroup]] so a spec can budget them from the scheduler.
    */
  private[graft] def bpeTrainDistributed(freqs: DataFrame, numMerges: Int,
                                         minPairCount: Long): DataFrame = {
    val spark = freqs.sparkSession
    var words = freqs
      .select(col("cnt"), initialSymbols(col("word")).as("symbols"))
      .localCheckpoint()
    var pairs = pairCounts(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val mergeUdf = udf((s: Seq[String], l: String, r: String) => applyMergeJvm(s, l, r))
    var rank = 1
    var done = false
    val sc = spark.sparkContext
    // save/restore (incl. interruptOnCancel) rather than clear: a caller
    // running under its OWN job group must get it back after training
    graft.tools.JobGroups.withJobGroup(sc, Bpe.TrainJobGroup, "BPE merge training") {
      while (rank <= numMerges && !done) {
        val top = pairs
          .orderBy(col("cnt").desc, col("sym_left").asc, col("sym_right").asc)
          .limit(1).collect()
        if (top.isEmpty || top(0).getAs[Long]("cnt") < minPairCount) done = true
        else {
          val (l, r, c) = (top(0).getAs[String]("sym_left"),
            top(0).getAs[String]("sym_right"), top(0).getAs[Long]("cnt"))
          merges += ((rank, l, r, c))
          val affected = words.filter(hasAdjacent(col("symbols"), lit(l), lit(r)))
          // integer-exact delta fold in ONE explode + one shuffle per merge:
          // +pairs of the rewritten word, −pairs of the original, summed
          // into the running table; net-zero pairs drop out (counts are
          // exact longs, so 0 means gone, never FP residue)
          val delta = affected
            .select(col("cnt"), col("symbols"),
              mergeUdf(col("symbols"), lit(l), lit(r)).as("__new"))
            .select(explode(concat(
              signedPairs(col("__new"), 1, col("cnt")),
              signedPairs(col("symbols"), -1, col("cnt")))).as("p"))
            .select(col("p.sym_left").as("sym_left"),
              col("p.sym_right").as("sym_right"), col("p.cnt").as("cnt"))
          pairs = pairs.unionByName(delta)
            .groupBy(col("sym_left"), col("sym_right"))
            .agg(sum(col("cnt")).as("cnt"))
            .filter(col("cnt") =!= 0L)
          words = words.select(col("cnt"),
            mergeUdf(col("symbols"), lit(l), lit(r)).as("symbols"))
          // flat plans in numMerges: truncate lineage on both compact
          // relations at the same cadence
          if (rank % 8 == 0) {
            words = words.localCheckpoint()
            pairs = pairs.localCheckpoint()
          }
          rank += 1
        }
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "sym_left", "sym_right", "cnt")
  }

  /** Apply a learned merge table to a corpus: every lowercased whitespace
    * token is split to characters + `</w>` and the merges replay in rank
    * order — the standard BPE encode. The merge list (numMerges rows)
    * ships in the closure; the encode is a pure per-row map, no shuffle.
    * Adds `bpe_tokens` (array of subword symbols, `</w>` markers kept).
    *
    * For repeated encoding jobs, dictionary-encode distinct words first and
    * join back — this direct form re-encodes each occurrence.
    */
  def bpeSegment(df: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val ms = merges.toArray
    val segUdf = udf((text: String) => {
      Dedup.tokenizeJvm(text).toSeq.flatMap { w =>
        // CODE-POINT split like both training paths: a UTF-16 char split
        // would break non-BMP symbols into surrogate halves the trained
        // merges can never match (and leak invalid lone surrogates)
        val cps = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toSeq
        var syms: Seq[String] = cps :+ EndOfWord
        ms.foreach { case (l, r) => syms = applyMergeJvm(syms, l, r) }
        syms
      }
    })
    df.withColumn("bpe_tokens", segUdf(col(textCol)))
  }

  /** Convenience: train on a corpus and return (merges, segmenter input). */
  def trainedMerges(mergesDf: DataFrame): Seq[(String, String)] =
    mergesDf.orderBy("rank").collect()
      .map(r => (r.getAs[String]("sym_left"), r.getAs[String]("sym_right"))).toSeq
}
