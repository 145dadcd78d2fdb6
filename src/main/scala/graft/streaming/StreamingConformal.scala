package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.forecast.Conformal

/** Streaming Adaptive Conformal Inference — the online deployment ACI was
  * designed for (Gibbs & Candès 2021): as (actual, prediction) pairs
  * arrive per series, the per-series miscoverage target walks
  * αₜ₊₁ = clamp₀¹(αₜ + γ(α − errₜ)) and each emission carries the
  * adaptive band — so coverage self-corrects under distribution shift,
  * which the frozen attach-time bands (`StreamingForecast
  * .attachWithIntervals`) cannot do.
  *
  * State is ONE double per series (the current α). Calibration scores are
  * frozen at attach and ride the task closure sorted per series — the
  * same bounded-model deployment shape as the NB gate. The per-step
  * arithmetic is `Conformal.aciStep`, the SAME compiled kernel the batch
  * walk uses, so stream and batch paths are bit-equal under
  * event-time-ordered ingest (StreamingSpec asserts it).
  */
object StreamingConformal {

  private[streaming] case class AciIn(id: String, ds: Long, y: Double,
      yhat: Double)
  private[streaming] case class AciState(alpha: Double)
  private[streaming] case class AciRow(unique_id: String, ds: Long,
      y: Double, yhat: Double, alpha_t: Double, qhat: Double, err: Double,
      lo: Double, hi: Double)

  /** Attach the ACI gate to a streaming frame with columns (`idCol`,
    * `dsCol` long-castable, `yCol`, `predCol`). `calib` is a STATIC frame
    * of (idCol, scoreCol) nonconformity scores, collected and frozen at
    * attach. Append mode.
    */
  def aciGate(rows: DataFrame, calib: DataFrame, idCol: String,
              dsCol: String, yCol: String, predCol: String,
              scoreCol: String, alpha: Double, gamma: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(gamma > 0, s"gamma must be positive, got $gamma")
    val spark = rows.sparkSession
    import spark.implicits._
    // frozen per-series calibration arrays (ascending), keyed by the
    // stringified id to match the keyed stream
    val cal: Map[String, Array[Double]] = calib
      .select(col(idCol).cast("string").as("id"),
        col(scoreCol).cast("double").as("s"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("s"))).as("arr"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    val alpha0 = alpha; val g = gamma
    val keyed = rows
      .filter(col(yCol).isNotNull && col(predCol).isNotNull)
      .select(col(idCol).cast("string").as("id"),
        col(dsCol).cast("long").as("ds"), col(yCol).cast("double").as("y"),
        col(predCol).cast("double").as("yhat"))
      .as[AciIn]
    keyed.groupByKey(_.id)
      .flatMapGroupsWithState[AciState, AciRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: String, it: Iterator[AciIn], state: GroupState[AciState]) =>
          val calArr: Seq[Double] = cal.get(id).map(_.toSeq).orNull
          var a = state.getOption.map(_.alpha).getOrElse(alpha0)
          val out = it.toArray.sortBy(_.ds).map { r =>
            val (q, err, aNext) = Conformal.aciStep(calArr, a, r.y, r.yhat,
              alpha0, g)
            val row = AciRow(id, r.ds, r.y, r.yhat, a, q, err,
              r.yhat - q, r.yhat + q)
            a = aNext
            row
          }
          state.update(AciState(a))
          out.iterator
      }.toDF()
  }
}
