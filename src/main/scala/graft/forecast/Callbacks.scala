package graft.forecast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Predict-time callback surface — reference callbacks.py plus the
  * before/after pair `_predict_recursive` threads (core.py:1661-1672).
  * `beforePredict` sees (and may transform) each step's feature frame
  * before scoring; the returned frame is what gets scored. `afterPredict`
  * sees each step's scored frame (`(id, ds, __yhat)`) and may transform
  * the `__yhat` column; the returned value is BOTH what re-enters the
  * recursive state as the next step's target and what the predict output
  * reports (the reference stores the transformed array via `_update_y`
  * and reads predictions back out of that state).
  */
trait PredictCallback extends Serializable {
  def beforePredict(step: Int, modelName: String, feats: DataFrame): DataFrame =
    feats
  def afterPredict(step: Int, modelName: String, preds: DataFrame): DataFrame =
    preds
  /** Scalar twin of `afterPredict` over the prediction value alone. Define
    * it ONLY when `beforePredict` is the identity and `afterPredict` is
    * exactly this map applied to `__yhat` — that contract is what lets the
    * fused per-series kernel (LocalLoop) stay eligible with the callback
    * attached; bit-identity between the two paths is asserted in
    * ForecastSpec.
    */
  def afterScalar: Option[Double => Double] = None
}

/** Clamp each step's predictions into `[lo, hi]` before they feed back —
  * the reference's canonical after-predict use (non-negative demand whose
  * clipped values must drive the next step's lags). Null predictions pass
  * through unchanged. Operates on the TRANSFORMED target scale: target
  * transforms invert after the loop, exactly as the reference applies its
  * callback inside `_predict_recursive` and inverts afterwards.
  */
final class ClipPredictions(lo: Double = Double.NegativeInfinity,
                            hi: Double = Double.PositiveInfinity)
    extends PredictCallback {
  require(lo <= hi, s"empty clip range [$lo, $hi]")
  // null/NaN pass through explicitly: Spark's least/greatest order NaN
  // LAST (a NaN prediction would silently clamp to `hi`), while the scalar
  // twin's math.min/max propagate NaN — guarding both keeps the driver and
  // fused paths bit-identical on every input
  override def afterPredict(step: Int, modelName: String,
                            preds: DataFrame): DataFrame =
    preds.withColumn("__yhat",
      when(col("__yhat").isNull || isnan(col("__yhat")), col("__yhat"))
        .otherwise(least(greatest(col("__yhat"), lit(lo)), lit(hi))))
  override def afterScalar: Option[Double => Double] =
    Some(v => if (v.isNaN) v else math.min(hi, math.max(lo, v)))
}

/** Collects every step's input features (reference SaveFeatures,
  * callbacks.py:12-42 — which materializes eager copies). Each step frame is
  * `localCheckpoint`ed at capture time: the loop state it reads is already
  * materialized then, so the checkpoint costs one narrow job, the SAME plan
  * the scorer was about to run anyway — the returned frame is the
  * checkpointed one, so scoring reuses the blocks and `features()` later is
  * a union of materialized RDDs instead of re-executing every step's
  * featurization plan.
  */
final class SaveFeatures extends PredictCallback {
  private var frames: Vector[(Int, DataFrame)] = Vector.empty

  override def beforePredict(step: Int, modelName: String,
                             feats: DataFrame): DataFrame = {
    val pinned = feats.localCheckpoint()
    // cross_validation runs a bounded few windows concurrently (Par) and
    // each window's predict drives this hook — the append must not lose
    // captures to a race
    synchronized { frames :+= (step -> pinned) }
    pinned
  }

  /** Union of every captured step frame; `withStep` adds the step index. */
  def features(withStep: Boolean = false): DataFrame = {
    require(frames.nonEmpty,
      "no features captured; pass this callback to predict first")
    frames.map { case (s, df) =>
      if (withStep) df.withColumn("step", lit(s)) else df
    }.reduce(_ unionByName _)
  }
}
