package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, GraftGbm, Losses, MLForecast, SparkGBT, SparkLinearRegression}
import graft.functions.RollingMean
import graft.operators.FeatureSpec
import graft.sources.Panels

/** Accuracy-golden regression lock — the layer the reference pins in CI
  * (tests/test_m4.py:44-135 asserts M4 SMAPE/MASE to 1e-6 for fixed
  * configs). The hash oracles in CORRECTNESS lock behavior, but a model
  * change that re-hashes everything would slip through them silently; this
  * spec pins end-model ACCURACY on a fixed panel + config, so quality drift
  * fails loudly.
  *
  * Config is the reference's M4-Daily shape (tests/test_m4.py:56-81):
  * Differences([1]) target transform, lags 1..14, RollingMean(7) at lags 7
  * and 14, linear regression + gradient-boosted trees. Fixture is the
  * committed deterministic synthetic daily panel (Panels
  * .syntheticDailySeries, seed 0); holdout = last 14 days per series.
  *
  * Goldens were produced by this exact code path and are asserted to 1e-6
  * (6 decimals). Both MLlib solvers here are deterministic on a fixed
  * local[4] layout (normal-equation LR; seeded GBT over a deterministic
  * spark.range-derived partitioning).
  */
class AccuracyGoldenSpec extends SparkSpec {

  private val H = 14
  private val ModelNames = Seq("lr", "gbt", "ggbm")

  private lazy val metrics: Map[String, Double] = {
    val panel = Panels.syntheticDailySeries(spark, nSeries = 20,
      minLength = 120, maxLength = 200, seed = 0L)
    val w = Window.partitionBy(col("unique_id")).orderBy(col("ds").desc)
    val ranked = panel.withColumn("__r", row_number().over(w))
    val train = ranked.filter(col("__r") > H).drop("__r")
    val valid = ranked.filter(col("__r") <= H).drop("__r")

    val conf = MLForecast(
      models = Seq(SparkLinearRegression(), SparkGBT(maxIter = 10, maxDepth = 3),
        GraftGbm(numRounds = 30, numLeaves = 15, minDataInLeaf = 5)),
      freq = Freq.Day,
      spec = FeatureSpec(
        lags = (1 to 14),
        lagTransforms = Map(
          7 -> Seq(RollingMean(7)),
          14 -> Seq(RollingMean(7)))),
      targetTransforms = Seq(Differences(Seq(1))))

    val preds = conf.fit(PanelFrame(train, freq = Freq.Day)).predict(H)
    val joined = preds.join(
      valid.select(col("unique_id"), col("ds"), col("y")),
      Seq("unique_id", "ds"))
    assert(joined.count() == 20L * H, "every holdout row must be forecast")

    val smape = Losses.overall(joined, "unique_id", "y", ModelNames, "smape")
      .head()
    val mase = Losses.maseById(joined, train, "unique_id", "ds", "y",
        ModelNames, season = 7)
      .agg(avg(col("lr")).as("lr"), avg(col("gbt")).as("gbt"),
        avg(col("ggbm")).as("ggbm"))
      .head()
    Map(
      "smape_lr" -> smape.getDouble(0), "smape_gbt" -> smape.getDouble(1),
      "smape_ggbm" -> smape.getDouble(2),
      "mase_lr" -> mase.getDouble(0), "mase_gbt" -> mase.getDouble(1),
      "mase_ggbm" -> mase.getDouble(2))
  }

  // The pinned goldens. A legitimate, intentional accuracy change must
  // update these values IN THE SAME COMMIT and say why in its message.
  private val Golden = Map(
    "smape_lr" -> 0.022236448,
    "smape_gbt" -> 0.332256696,
    "smape_ggbm" -> 0.073048096,
    "mase_lr" -> 0.856204407,
    "mase_gbt" -> 12.951039132,
    "mase_ggbm" -> 3.396405087)

  for (key <- Seq("smape_lr", "smape_gbt", "smape_ggbm",
    "mase_lr", "mase_gbt", "mase_ggbm")) {
    test(s"pinned accuracy golden: $key") {
      val actual = metrics(key)
      info(f"$key = $actual%.9f")
      assert(math.abs(actual - Golden(key)) <= 1e-6,
        f"$key drifted: actual $actual%.9f vs golden ${Golden(key)}%.9f — " +
          "a deliberate model change must update the golden in the same commit")
    }
  }
}
