package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Ingest-time quality gating for document streams — the STATELESS
  * Structured Streaming twin of `Corpus.nbQualityScore`: the trained
  * Naive Bayes model (per-token log-likelihood ratios, the out-of-vocab
  * smoothing weight, the doc prior) is collected once and ships as a task
  * broadcast — vocab-bounded, the fastText deployment shape — and each
  * arriving document scores in ONE compiled pass. No state store, no
  * watermark, no shuffle: micro-batch work is exactly the arriving rows at
  * any ingest rate. The identical code path serves batch frames, and the
  * scoring arithmetic replays the batch scorer's IEEE operation sequence
  * (same per-token multiply/divide/ln, same position-ordered summation
  * seeded with the prior), so stream and batch scores are bit-equal —
  * StreamingSpec asserts it.
  */
object StreamingQuality {

  /** Collected NB model: `weights` covers the training vocabulary,
    * `oovWeight` is the smoothing mass for unseen tokens (the same weight
    * formula at cPos = cNeg = 0), `prior` = ln(nPos/nNeg).
    */
  final case class NbModel(weights: Map[String, Double], oovWeight: Double,
                           prior: Double) {
    require(weights != null, "weights must not be null")
  }

  /** Train the classifier on static corpora — the identical counting and
    * smoothing arithmetic as `Corpus.nbQualityScore` (add-one over the
    * joint vocabulary), collected to a driver-side model. The vocabulary
    * relation is the collect: size it like any fastText vocab (millions of
    * tokens fit comfortably; cap upstream if the corpus is adversarial).
    */
  def trainNb(pos: DataFrame, neg: DataFrame, textCol: String): NbModel = {
    def counts(df: DataFrame): DataFrame = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val cp = counts(pos)
    val cn = counts(neg)
    val joined = cp.withColumnRenamed("c", "cp")
      .join(cn.withColumnRenamed("c", "cn"), Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      .collect()
    val totPos = joined.map(_.getLong(1)).sum
    val totNeg = joined.map(_.getLong(2)).sum
    val vocab = joined.length.toLong
    val nPos = pos.count()
    val nNeg = neg.count()
    require(nPos > 0 && nNeg > 0, "both training corpora must be non-empty")
    val negV = (totNeg + vocab).toDouble
    val posV = (totPos + vocab).toDouble
    def w(cp: Long, cn: Long): Double =
      math.log((cp + 1L).toDouble * negV / ((cn + 1L).toDouble * posV))
    NbModel(
      joined.map(r => r.getString(0) -> w(r.getLong(1), r.getLong(2))).toMap,
      oovWeight = w(0L, 0L),
      prior = math.log(nPos.toDouble / nNeg.toDouble))
  }

  /** Row result of the streaming scorer — matches the batch scorer's
    * output columns.
    */
  final case class NbScore(n_tokens: Long, n_oov: Long, nb_score: Double,
                           label: Boolean)

  /** Attach (n_tokens, n_oov, nb_score, label) to a (streaming or batch)
    * document frame. One broadcast, one per-row kernel call — a pure
    * projection, legal in any streaming output mode.
    *
    * `n_oov` counts occurrences outside the training vocabulary (they
    * score `oovWeight`, never zero silently), mirroring the batch scorer.
    */
  def attachNbScore(docs: DataFrame, textCol: String, model: NbModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val scoreUdf = udf((text: String) => {
      val m = bc.value
      val toks = Dedup.tokenizeJvm(text)
      var acc = m.prior
      var oov = 0L
      var i = 0
      while (i < toks.length) {
        m.weights.get(toks(i)) match {
          case Some(w) => acc += w
          case None    => acc += m.oovWeight; oov += 1L
        }
        i += 1
      }
      NbScore(toks.length.toLong, oov, acc, acc > 0.0)
    })
    docs.withColumn("__nb", scoreUdf(col(textCol)))
      .withColumn("n_tokens", col("__nb.n_tokens"))
      .withColumn("n_oov", col("__nb.n_oov"))
      .withColumn("nb_score", col("__nb.nb_score"))
      .withColumn("label", col("__nb.label"))
      .drop("__nb")
  }

  /** Convenience gate: keep only target-looking documents (label = true,
    * optionally a stricter score floor).
    */
  def filterQuality(docs: DataFrame, textCol: String, model: NbModel,
                    minScore: Double = 0.0): DataFrame =
    attachNbScore(docs, textCol, model).filter(col("nb_score") > lit(minScore))
}
