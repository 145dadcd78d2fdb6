package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.functions.LagTransform

/** Standalone lag-feature computation for dynamic exogenous regressors —
  * reference `transform_exog` (/root/reference/mlforecast/
  * feature_engineering.py:15-69): every non-id/time column is treated as a
  * target and gets the full transform set, with feature columns named
  * `<column>_<transform name>`.
  */
object TransformExog {
  def apply(df: DataFrame, lags: Seq[Int] = Nil,
            lagTransforms: Map[Int, Seq[LagTransform]] = Map.empty,
            idCol: String = "unique_id", timeCol: String = "ds",
            freq: Freq = Freq.Day): DataFrame = {
    require(lags.nonEmpty || lagTransforms.nonEmpty,
      "at least one of lags or lagTransforms is required")
    val spec = FeatureSpec(lags = lags, lagTransforms = lagTransforms)
    val targets = df.columns.filterNot(c => c == idCol || c == timeCol).toSeq
    require(targets.nonEmpty, "no exog columns to transform")
    // Every target's features are window expressions over the SAME
    // (id, ds) partitioning, so they accumulate on one frame and Catalyst
    // collapses them into a single WindowExec — one sort, zero joins. A
    // per-target featurize + equi-join back (the naive shape) would cost
    // T extra shuffle joins and T re-scans of the input.
    targets.foldLeft(df) { (acc, tgt) =>
      val p = PanelFrame(acc, idCol, timeCol, tgt, freq)
      Featurizer.addFeatures(p, spec)
        .withColumnsRenamed(spec.featureNames.map(n => n -> s"${tgt}_$n").toMap)
    }
  }
}
