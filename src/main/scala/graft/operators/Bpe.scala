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
  * (explode → one counting shuffle). Every merge iteration then runs on the
  * vocabulary-sized (word, count, symbols) relation — the same collapse
  * industrial BPE trainers do before merging — so 100 TB of text becomes a
  * relation bounded by distinct-word count, and the driver only ever holds
  * the merge list (numMerges rows) plus one 1-row argmax per iteration.
  * Lineage is truncated with a localCheckpoint every few merges so the plan
  * stays flat in numMerges.
  *
  * Words are lowercased whitespace tokens split into single characters with
  * a trailing `</w>` end-of-word marker; a merge fuses every non-overlapping
  * left-to-right occurrence of the pair. Ties on the pair count break on
  * (left, right) string order, so training is fully deterministic.
  */
object Bpe {

  val EndOfWord = "</w>"

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

  /** Train `numMerges` BPE merges. Each iteration: pair-count aggregate on
    * the compact vocabulary relation, a 1-row deterministic argmax
    * (cnt desc, left asc, right asc), and a per-word merge rewrite. Stops
    * early when no pair reaches `minPairCount`. Returns the merge table
    * (rank, sym_left, sym_right, cnt) — rank is 1-based application order.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 1L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    var words = wordFreqs(df, textCol)
      .select(col("cnt"), initialSymbols(col("word")).as("symbols"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val mergeUdf = udf((s: Seq[String], l: String, r: String) => applyMergeJvm(s, l, r))
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("sym_left").asc, col("sym_right").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minPairCount) done = true
      else {
        val (l, r, c) = (top(0).getAs[String]("sym_left"),
          top(0).getAs[String]("sym_right"), top(0).getAs[Long]("cnt"))
        merges += ((rank, l, r, c))
        words = words.select(col("cnt"),
          mergeUdf(col("symbols"), lit(l), lit(r)).as("symbols"))
        // flat plan in numMerges: truncate lineage on the compact relation
        if (rank % 8 == 0) words = words.localCheckpoint()
        rank += 1
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
