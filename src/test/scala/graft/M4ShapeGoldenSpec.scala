package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, GraftGbm, Losses, MLForecast, SparkGBT}
import graft.functions.{ExpandingMean, ExponentiallyWeightedMean, RollingMean}
import graft.operators.FeatureSpec

/** Generalization league on the reference's HEADLINE workload shape —
  * M4 Hourly (tests/test_m4.py:16-55): Differences([24]) target transform,
  * daily-multiple lags, ExponentiallyWeightedMean(0.3) + weekly RollingMean
  * at lag 24, LightGBM-style booster config (lr 0.05, λ1 0.03, λ2 0.5,
  * bagging 0.9, feature_fraction 0.8), 48-step holdout — scaled to a
  * committed deterministic hourly-shaped fixture (M4 itself is unavailable
  * offline). Two claims, each failing loudly on regression:
  *
  *   1. LEAGUE: the native GraftGbm lands at-or-better than MLlib GBT on
  *      held-out SMAPE (the reference's booster is LightGBM; ours must
  *      compete on its home turf, not just fit the training set).
  *   2. GOLDEN: ggbm's held-out SMAPE is pinned to 1e-6 — quality drift
  *      from any deliberate model change must update the pin in the same
  *      commit (same contract as AccuracyGoldenSpec).
  */
class M4ShapeGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val H = 48 // the M4 Hourly horizon

  /** Deterministic hourly-shaped panel: 10 series × 600 hours with series-
    * specific level/trend, a strong period-24 pattern (sinusoid + business-
    * hours plateau), and bounded hash noise — the structure Differences([24])
    * and daily-multiple lags are built to exploit.
    */
  private def hourlyPanel: DataFrame = {
    val rows = for {
      s <- 0 until 10
      t <- 0 until 600
    } yield {
      val level = 200.0 + 35.0 * s
      val trend = 0.05 * (s % 4)
      val phase = t % 24
      val seas = (10.0 + 2.0 * (s % 5)) * math.sin(2 * math.Pi * phase / 24.0) +
        (if (phase >= 8 && phase <= 18) 15.0 + s else 0.0)
      val noise =
        (Math.floorMod(GraftGbm.mix64(s * 100000L + t), 1000L) / 1000.0 - 0.5) * 4.0
      (s"H$s", t.toLong, level + trend * t + seas + noise)
    }
    rows.toDF("unique_id", "ds", "y")
  }

  private lazy val metrics: Map[String, Double] = {
    val panel = hourlyPanel
    val w = Window.partitionBy(col("unique_id")).orderBy(col("ds").desc)
    val ranked = panel.withColumn("__r", row_number().over(w))
    val train = ranked.filter(col("__r") > H).drop("__r")
    val valid = ranked.filter(col("__r") <= H).drop("__r")

    val conf = MLForecast(
      models = Seq(
        SparkGBT(maxIter = 40, maxDepth = 6),
        // the Hourly lgb_params shape, leaf budget scaled to the fixture
        GraftGbm(numRounds = 60, numLeaves = 63, maxDepth = 8,
          learningRate = 0.05, lambdaL1 = 0.03, lambdaL2 = 0.5,
          baggingFraction = 0.9, baggingFreq = 1, featureFraction = 0.8,
          minDataInLeaf = 5)),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(
        lags = Seq(24, 48, 72),
        lagTransforms = Map(
          24 -> Seq(ExponentiallyWeightedMean(0.3), RollingMean(168)),
          48 -> Seq(ExponentiallyWeightedMean(0.3)))),
      targetTransforms = Seq(Differences(Seq(24))))

    val preds = conf.fit(PanelFrame(train, freq = Freq.IntFreq(1))).predict(H)
    val joined = preds.join(
      valid.select(col("unique_id"), col("ds"), col("y")),
      Seq("unique_id", "ds"))
    assert(joined.count() == 10L * H, "every holdout hour must be forecast")
    val smape = Losses.overall(joined, "unique_id", "y", Seq("gbt", "ggbm"), "smape")
      .head()
    Map("smape_gbt" -> smape.getDouble(0), "smape_ggbm" -> smape.getDouble(1))
  }

  test("league: native booster at-or-better than MLlib GBT on the M4-Hourly shape") {
    val (g, t) = (metrics("smape_ggbm"), metrics("smape_gbt"))
    info(f"held-out SMAPE: ggbm $g%.9f vs gbt $t%.9f")
    assert(g <= t * 1.05,
      f"ggbm SMAPE $g%.6f worse than 1.05x MLlib GBT $t%.6f on the reference's headline shape")
    // and it genuinely learned the structure (constant-forecast SMAPE on
    // this fixture is two orders of magnitude larger)
    assert(g < 0.05, f"ggbm SMAPE $g%.6f — failed to learn the hourly structure")
  }

  // Pinned golden; a deliberate model change must update it IN THE SAME
  // COMMIT and say why in its message.
  private val GoldenGgbm = 0.003030745

  test("pinned generalization golden: smape_ggbm on the M4-Hourly shape") {
    val actual = metrics("smape_ggbm")
    info(f"smape_ggbm = $actual%.9f")
    assert(math.abs(actual - GoldenGgbm) <= 1e-6,
      f"smape_ggbm drifted: actual $actual%.9f vs golden $GoldenGgbm%.9f")
  }

  test("VERBATIM reference M4-Hourly config trains and learns (200 rounds, 2500 leaves)") {
    // tests/test_m4.py:16-43 verbatim — not the scaled league shape: all 14
    // daily-multiple lags, EWM(0.3)+RollingMean(168)+RollingMean(336) at
    // lags 24 AND 48, Differences([24]), and the real LightGBM params
    // (n_estimators=200, num_leaves=2500, lr=0.05, λ1=0.03, λ2=0.5,
    // bagging 0.9/1, feature_fraction 0.8). The 2500-leaf budget makes the
    // level passes chunk open nodes (MaxOpenPerPass=64) and the 200 rounds
    // ride the driver-local path — the config the scaled league couldn't
    // afford is now cheap enough to gate in CI. Needs ≥ ~720 obs of
    // history per series before the first complete feature row, so this
    // fixture is 1000 hours (same generator as hourlyPanel, longer).
    val rows = for {
      s <- 0 until 10
      t <- 0 until 1000
    } yield {
      val level = 200.0 + 35.0 * s
      val trend = 0.05 * (s % 4)
      val phase = t % 24
      val seas = (10.0 + 2.0 * (s % 5)) * math.sin(2 * math.Pi * phase / 24.0) +
        (if (phase >= 8 && phase <= 18) 15.0 + s else 0.0)
      val noise =
        (Math.floorMod(GraftGbm.mix64(s * 100000L + t), 1000L) / 1000.0 - 0.5) * 4.0
      (s"H$s", t.toLong, level + trend * t + seas + noise)
    }
    val panel = rows.toDF("unique_id", "ds", "y")
    val w = Window.partitionBy(col("unique_id")).orderBy(col("ds").desc)
    val ranked = panel.withColumn("__r", row_number().over(w))
    val train = ranked.filter(col("__r") > H).drop("__r")
    val valid = ranked.filter(col("__r") <= H).drop("__r")
    val conf = MLForecast(
      models = Seq(GraftGbm(name = "ggbm", numRounds = 200, numLeaves = 2500,
        maxDepth = 16, learningRate = 0.05, lambdaL1 = 0.03, lambdaL2 = 0.5,
        baggingFraction = 0.9, baggingFreq = 1, featureFraction = 0.8)),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(
        lags = (1 to 14).map(_ * 24),
        lagTransforms = Map(
          24 -> Seq(ExponentiallyWeightedMean(0.3), RollingMean(168), RollingMean(336)),
          48 -> Seq(ExponentiallyWeightedMean(0.3), RollingMean(168), RollingMean(336)))),
      targetTransforms = Seq(Differences(Seq(24))))
    val preds = conf.fit(PanelFrame(train, freq = Freq.IntFreq(1))).predict(H)
    val joined = preds.join(valid.select(col("unique_id"), col("ds"), col("y")),
      Seq("unique_id", "ds"))
    assert(joined.count() == 10L * H, "every holdout hour must be forecast")
    val smape = Losses.overall(joined, "unique_id", "y", Seq("ggbm"), "smape")
      .head().getDouble(0)
    info(f"verbatim-config smape_ggbm = $smape%.9f")
    assert(smape < 0.05, f"verbatim reference config failed to learn: SMAPE $smape%.6f")
    // pinned golden (same 1e-6 contract as the leagues): a deliberate model
    // change must update this in the same commit and say why
    val golden = 0.002887939
    assert(math.abs(smape - golden) <= 1e-6,
      f"verbatim-config smape drifted: actual $smape%.9f vs golden $golden%.9f")
  }

  // ---------------------------------------------------------------------
  // Daily / Weekly / Yearly leagues (tests/test_m4.py:56-134): each config
  // exercises a DIFFERENT transform stack — Daily RollingMean(7)@{7,14},
  // Weekly ExpandingMean+RollingMean(4)@{4,8} under an l1 objective,
  // Yearly ExpandingMean@{1,6} under l1 — so objective / feature
  // regressions the Hourly shape can't see fail one of these.
  // ---------------------------------------------------------------------

  /** Fit both boosters on `panel` minus the last `h` steps, forecast `h`,
    * return held-out SMAPE per model.
    */
  private def league(panel: DataFrame, h: Int, conf: MLForecast): Map[String, Double] = {
    val w = Window.partitionBy(col("unique_id")).orderBy(col("ds").desc)
    val ranked = panel.withColumn("__r", row_number().over(w))
    val train = ranked.filter(col("__r") > h).drop("__r")
    val valid = ranked.filter(col("__r") <= h).drop("__r")
    val preds = conf.fit(PanelFrame(train, freq = Freq.IntFreq(1))).predict(h)
    val joined = preds.join(valid.select(col("unique_id"), col("ds"), col("y")),
      Seq("unique_id", "ds"))
    assert(joined.count() == panel.select("unique_id").distinct.count() * h,
      "every holdout step must be forecast")
    val r = Losses.overall(joined, "unique_id", "y", Seq("gbt", "ggbm"), "smape").head()
    Map("gbt" -> r.getDouble(0), "ggbm" -> r.getDouble(1))
  }

  /** Deterministic daily-shaped panel: 10 series × 420 days, weekly
    * pattern + weekday plateau + trend — the structure Differences([1])
    * and RollingMean(7)@{7,14} exploit.
    */
  private def dailyPanel: DataFrame = {
    val rows = for { s <- 0 until 10; t <- 0 until 420 } yield {
      val level = 120.0 + 25.0 * s
      val trend = 0.08 * (s % 5 + 1)
      val dow = t % 7
      val seas = (8.0 + 1.5 * (s % 3)) * math.sin(2 * math.Pi * dow / 7.0) +
        (if (dow <= 4) 6.0 + 0.5 * s else -4.0)
      val noise =
        (Math.floorMod(GraftGbm.mix64(s * 77777L + t), 1000L) / 1000.0 - 0.5) * 3.0
      (s"D$s", t.toLong, level + trend * t + seas + noise)
    }
    rows.toDF("unique_id", "ds", "y")
  }

  /** Weekly-shaped panel: 10 series × 312 weeks, period-52 annual cycle +
    * trend (ExpandingMean+RollingMean(4)@{4,8}, l1 objective).
    */
  private def weeklyPanel: DataFrame = {
    val rows = for { s <- 0 until 10; t <- 0 until 312 } yield {
      val level = 300.0 + 40.0 * s
      val trend = 0.15 * (s % 4 + 1)
      val seas = (20.0 + 3.0 * (s % 5)) * math.sin(2 * math.Pi * (t % 52) / 52.0)
      val noise =
        (Math.floorMod(GraftGbm.mix64(s * 131071L + t), 1000L) / 1000.0 - 0.5) * 8.0
      (s"W$s", t.toLong, level + trend * t + seas + noise)
    }
    rows.toDF("unique_id", "ds", "y")
  }

  /** Yearly-shaped panel: 10 series × 60 years, trend-dominated with
    * mild curvature (short lags + ExpandingMean@{1,6}, l1 objective).
    */
  private def yearlyPanel: DataFrame = {
    val rows = for { s <- 0 until 10; t <- 0 until 60 } yield {
      val level = 1000.0 + 150.0 * s
      val trend = (3.0 + 0.8 * (s % 5)) * t + 0.02 * (s % 3) * t * t
      val noise =
        (Math.floorMod(GraftGbm.mix64(s * 524287L + t), 1000L) / 1000.0 - 0.5) * 20.0
      (s"Y$s", t.toLong, level + trend + noise)
    }
    rows.toDF("unique_id", "ds", "y")
  }

  private lazy val dailyMetrics = league(dailyPanel, h = 14, MLForecast(
    models = Seq(
      SparkGBT(maxIter = 30, maxDepth = 6),
      // Daily lgb_params (test_m4.py:57-59): 30 estimators, default l2,
      // leaf budget scaled to the fixture
      GraftGbm(numRounds = 30, numLeaves = 31, maxDepth = 8, minDataInLeaf = 5)),
    freq = Freq.IntFreq(1),
    spec = FeatureSpec(
      lags = (1 to 14),
      lagTransforms = Map(7 -> Seq(RollingMean(7)), 14 -> Seq(RollingMean(7)))),
    targetTransforms = Seq(Differences(Seq(1)))))

  private lazy val weeklyMetrics = league(weeklyPanel, h = 13, MLForecast(
    models = Seq(
      // both boosters on ABSOLUTE loss — the reference's Weekly config is
      // objective=l1, so the fair GBT twin is lossType="absolute"
      SparkGBT(maxIter = 40, maxDepth = 6, lossType = "absolute"),
      // Weekly lgb_params (test_m4.py:83-86): l1 objective, leaf budget
      // scaled; exercises the exact-weighted-median base score + renewal
      GraftGbm(numRounds = 100, numLeaves = 31, maxDepth = 8,
        minDataInLeaf = 5, objective = "l1")),
    freq = Freq.IntFreq(1),
    spec = FeatureSpec(
      lags = (1 to 32),
      lagTransforms = Map(
        4 -> Seq(ExpandingMean(), RollingMean(4)),
        8 -> Seq(ExpandingMean(), RollingMean(4)))),
    targetTransforms = Seq(Differences(Seq(1)))))

  private lazy val yearlyMetrics = league(yearlyPanel, h = 6, MLForecast(
    models = Seq(
      SparkGBT(maxIter = 40, maxDepth = 6, lossType = "absolute"),
      // Yearly lgb_params (test_m4.py:110-113): l1 objective
      GraftGbm(numRounds = 100, numLeaves = 31, maxDepth = 8,
        minDataInLeaf = 5, objective = "l1")),
    freq = Freq.IntFreq(1),
    spec = FeatureSpec(
      lags = (1 to 6),
      lagTransforms = Map(1 -> Seq(ExpandingMean()), 6 -> Seq(ExpandingMean()))),
    targetTransforms = Seq(Differences(Seq(1)))))

  // Pinned goldens; a deliberate model change must update them IN THE SAME
  // COMMIT and say why in its message.
  private val GoldenDaily = 0.003987900
  private val GoldenWeekly = 0.007181596
  private val GoldenYearly = 0.004252914

  for ((shape, m, golden, learnBar) <- Seq(
    ("Daily", () => dailyMetrics, GoldenDaily, 0.05),
    ("Weekly", () => weeklyMetrics, GoldenWeekly, 0.05),
    ("Yearly", () => yearlyMetrics, GoldenYearly, 0.05))) {
    test(s"league: native booster at-or-better than MLlib GBT on the M4-$shape shape") {
      val mm = m()
      val (g, t) = (mm("ggbm"), mm("gbt"))
      info(f"$shape held-out SMAPE: ggbm $g%.9f vs gbt $t%.9f")
      assert(g <= t * 1.05,
        f"ggbm SMAPE $g%.6f worse than 1.05x MLlib GBT $t%.6f on the $shape shape")
      assert(g < learnBar, f"ggbm SMAPE $g%.6f — failed to learn the $shape structure")
    }
    test(s"pinned generalization golden: smape_ggbm on the M4-$shape shape") {
      val actual = m()("ggbm")
      info(f"smape_ggbm($shape) = $actual%.9f")
      assert(math.abs(actual - golden) <= 1e-6,
        f"smape_ggbm($shape) drifted: actual $actual%.9f vs golden $golden%.9f")
    }
  }
}
