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
    * create pairs counting up to its own frequency) with DELTA-maintained
    * pair counts: a merge only changes words that contain the merged pair
    * adjacently, so each iteration folds
    * `pairs − pairs(affected) + pairs(affected_rewritten)` into the next
    * argmax — the per-merge shuffle is sized by the AFFECTED words, never
    * a full re-explode of the vocabulary. One Spark action per merge (the
    * 1-row argmax; deltas ride its lazy plan), plus two lineage-truncating
    * checkpoints every 8 merges; jobs run under [[Bpe.TrainJobGroup]] so a
    * spec can budget them from the scheduler. Ties on the pair count break
    * on (left, right) string order — fully deterministic. Stops early when
    * no pair reaches `minPairCount`. Returns the merge table
    * (rank, sym_left, sym_right, cnt) — rank is 1-based application order.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 1L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    var words = wordFreqs(df, textCol)
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
        var syms: Seq[String] = w.map(_.toString) :+ EndOfWord
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
