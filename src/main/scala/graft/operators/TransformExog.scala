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
    // Collision guards. (1) An input column named like a generated feature
    // (e.g. a pre-existing 'lag1') would make Featurizer SKIP computing
    // that feature (its keep-existing contract) and the rename below would
    // then mislabel the raw input as the transform output — silently wrong
    // data. (2) Output names are `<target>_<feature>`: they must not
    // collide with each other or with input columns (e.g. targets 'x' and
    // 'x_lag1' both present).
    val featNames = spec.featureNames
    val clash = df.columns.filter(featNames.contains)
    require(clash.isEmpty,
      s"input columns ${clash.toSeq} collide with generated feature names " +
        s"($featNames) — rename them before transform_exog")
    val outNames = for (t <- targets; n <- featNames) yield s"${t}_$n"
    val dupOut = outNames.diff(outNames.distinct).distinct
    require(dupOut.isEmpty,
      s"generated output names collide across targets: $dupOut — rename the " +
        "exog columns so <target>_<feature> is unique")
    val outClash = outNames.filter(df.columns.contains)
    require(outClash.isEmpty,
      s"input columns ${outClash} collide with generated output names — " +
        "rename them before transform_exog")
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
