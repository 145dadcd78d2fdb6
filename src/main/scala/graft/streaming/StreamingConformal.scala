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
  * State is per series in the STATE STORE: the current α plus the frozen
  * calibration scores, seeded through flatMapGroupsWithState's
  * initial-state overload at attach time. Before r10 the whole calibration
  * map rode the task CLOSURE — fine for NB-gate-sized catalogs, the wrong
  * shape for 10⁷ series (every task deserializes every series'
  * calibration; the closure grows with the catalog). With the state-store
  * layout each key holds only its own scores, partitioned like any other
  * keyed state, and the task binary stays O(1) — asserted by the
  * closure-size spec. The per-step arithmetic is `Conformal.aciStep`, the
  * SAME compiled kernel the batch walk uses, so stream and batch paths are
  * bit-equal under event-time-ordered ingest (StreamingSpec asserts it).
  */
object StreamingConformal {

  private[streaming] case class AciIn(id: String, ds: Long, y: Double,
      yhat: Double)
  /** Per-series state-store record: current α and the frozen ascending
    * calibration scores (null-safe empty array for never-calibrated keys).
    */
  private[streaming] case class AciState(alpha: Double, cal: Array[Double],
      calibrated: Boolean)
  private[streaming] case class AciRow(unique_id: String, ds: Long,
      y: Double, yhat: Double, alpha_t: Double, qhat: Double, err: Double,
      lo: Double, hi: Double)

  /** The keyed update function. Captures only the two scalar knobs —
    * calibration lives in the per-key state, never in the closure (the
    * closure-size spec serializes this function to pin that).
    */
  private[graft] def aciFunc(alpha0: Double, g: Double):
      (String, Iterator[AciIn], GroupState[AciState]) => Iterator[AciRow] =
    (id: String, it: Iterator[AciIn], state: GroupState[AciState]) => {
      val st = state.getOption.getOrElse(AciState(alpha0, Array.empty, calibrated = false))
      val calArr: Seq[Double] =
        if (st.calibrated) scala.collection.immutable.ArraySeq.unsafeWrapArray(st.cal)
        else null
      var a = st.alpha
      val out = it.toArray.sortBy(_.ds).map { r =>
        val (q, err, aNext) = Conformal.aciStep(calArr, a, r.y, r.yhat,
          alpha0, g)
        val row = AciRow(id, r.ds, r.y, r.yhat, a, q, err,
          r.yhat - q, r.yhat + q)
        a = aNext
        row
      }
      state.update(st.copy(alpha = a))
      out.iterator
    }

  /** Attach the ACI gate to a streaming frame with columns (`idCol`,
    * `dsCol` long-castable, `yCol`, `predCol`). `calib` is a STATIC frame
    * of (idCol, scoreCol) nonconformity scores, frozen into each key's
    * initial state at attach. Append mode.
    */
  def aciGate(rows: DataFrame, calib: DataFrame, idCol: String,
              dsCol: String, yCol: String, predCol: String,
              scoreCol: String, alpha: Double, gamma: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(gamma > 0, s"gamma must be positive, got $gamma")
    val spark = rows.sparkSession
    import spark.implicits._
    val alpha0 = alpha; val g = gamma
    // per-series frozen calibration arrays (ascending), seeded as the
    // stream's INITIAL keyed state: a distributed aggregation + state-store
    // write, never a driver collect or a closure capture
    val initialState = calib
      .select(col(idCol).cast("string").as("id"),
        col(scoreCol).cast("double").as("s"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("s"))).as("arr"))
      .as[(String, Seq[Double])]
      .groupByKey(_._1)
      .mapValues(kv => AciState(alpha0, kv._2.toArray, calibrated = true))
    val keyed = rows
      // null/non-castable ds would poison the query (non-nullable field)
      .filter(col(yCol).isNotNull && col(predCol).isNotNull &&
        col(dsCol).cast("long").isNotNull)
      .select(col(idCol).cast("string").as("id"),
        col(dsCol).cast("long").as("ds"), col(yCol).cast("double").as("y"),
        col(predCol).cast("double").as("yhat"))
      .as[AciIn]
    keyed.groupByKey(_.id)
      .flatMapGroupsWithState[AciState, AciRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout(), initialState)(
        aciFunc(alpha0, g))
      .toDF()
  }
}
