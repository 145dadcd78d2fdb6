package graft.forecast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Predict-time callback surface — reference callbacks.py. The callback
  * sees (and may transform) each step's feature frame before scoring; the
  * returned frame is what gets scored.
  */
trait PredictCallback extends Serializable {
  def beforePredict(step: Int, modelName: String, feats: DataFrame): DataFrame
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

  def beforePredict(step: Int, modelName: String, feats: DataFrame): DataFrame = {
    val pinned = feats.localCheckpoint()
    frames :+= (step -> pinned)
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
