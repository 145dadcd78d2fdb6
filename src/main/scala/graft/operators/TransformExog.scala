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
    targets.foldLeft(df) { (acc, tgt) =>
      val p = PanelFrame(
        df.select(col(idCol), col(timeCol), col(s"`$tgt`")),
        idCol, timeCol, tgt, freq)
      val feats = Featurizer.addFeatures(p, spec)
        .select((Seq(col(idCol), col(timeCol)) ++
          spec.featureNames.map(n => col(s"`$n`").as(s"${tgt}_$n"))): _*)
      acc.join(feats, Seq(idCol, timeCol), "left")
    }
  }
}
