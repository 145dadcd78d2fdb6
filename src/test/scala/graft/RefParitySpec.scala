package graft

import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, LocalStandardScaler, MLForecast, Models, SparkLinearRegression}
import graft.operators.FeatureSpec

/** Edge behaviors pinned by the reference's own test suite that the oracle
  * queries don't reach: dropped-series transform inversion
  * (test_forecast.py:1095 test_transforms_inverted_when_series_dropped),
  * short series inside CV windows (test_forecast.py:899
  * test_short_series_in_cv), and CV actually consuming the weight column
  * across windows (test_forecast.py:617 test_cv_weight_col — refit=False
  * regression for reference issue #497).
  */
class RefParitySpec extends SparkSpec {
  import spark.implicits._

  /** Panel with per-series lengths; integer time axis ending at a common
    * last period (equal ends, like generate_daily_series(equal_ends)).
    */
  private def panelWithLengths(lengths: Map[String, Int], end: Int = 100) = {
    val rows = lengths.toSeq.sortBy(_._1).flatMap { case (id, n) =>
      ((end - n) until end).map { t =>
        (id, t.toLong, ((t * 7 + id.hashCode.abs) % 23).toDouble)
      }
    }
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  test("transforms invert correctly when short series are dropped from training") {
    // lag 10 + Differences([1]) need 11 rows; series "tiny" (5) contributes
    // ZERO training rows after dropna — the reference asserts fitted values
    // still invert to the original y for every emitted row
    val p = panelWithLengths(Map("a" -> 40, "b" -> 30, "tiny" -> 5))
    val conf = MLForecast(
      models = Seq(Models.naive),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1, 10)),
      targetTransforms = Seq(Differences(Seq(1)), LocalStandardScaler()))
    val fitted = conf.fit(p)
    val fv = fitted.fittedValues(1)
    // inversion: the y column carried through fitted values must equal the
    // original panel's y on every joined row (reference: allclose)
    val joined = fv.select(col("unique_id"), col("ds"), col("y").as("y_fitted"))
      .join(p.df.select(col("unique_id"), col("ds"), col("y").as("y_orig")),
        Seq("unique_id", "ds"))
    assert(joined.count() > 0)
    val bad = joined.filter(abs(col("y_fitted") - col("y_orig")) > 1e-9).count()
    assert(bad == 0, s"$bad fitted rows failed transform inversion")
    // and predict still emits all series that HAVE state (the reference
    // drops the too-short series from training but forecasting them relies
    // on the transform tails; naive needs lag10 history to echo)
    val preds = fitted.predict(1)
    assert(preds.filter(col("unique_id") === "a").count() == 1)
    assert(preds.filter(col("unique_id") === "b").count() == 1)
  }

  test("short series inside CV windows don't poison the long ones") {
    // window geometry: 2 windows x h=7 steps back from the common end; the
    // 16-row series has no rows before the first cutoff minus lag — the
    // reference keeps the valid windows it can and never throws
    val p = panelWithLengths(Map("long1" -> 80, "long2" -> 60, "short" -> 16))
    val conf = MLForecast(
      models = Seq(Models.naive),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1)))
    val cv = conf.fit(p).crossValidation(nWindows = 2, h = 7)
    // both long series appear in both windows
    for (id <- Seq("long1", "long2")) {
      assert(cv.filter(col("unique_id") === id).count() == 14,
        s"$id should have 2x7 CV rows")
    }
    // the short series contributes whatever windows its history supports —
    // and whatever appears must carry non-null actuals
    val shortRows = cv.filter(col("unique_id") === "short")
    assert(shortRows.filter(col("y").isNull).count() == 0)
  }

  test("CV consumes the weight column across windows (refit true and false)") {
    val base = panelWithLengths(Map("w1" -> 100, "w2" -> 100))
    // weights: heavy on the most recent half
    val wdf = base.df.withColumn("weight",
      when(col("ds") >= 75L, lit(10.0)).otherwise(lit(0.1)))
    val p = base.copy(df = wdf, weightCol = Some("weight"))
    val pUniform = base.copy(df = base.df.withColumn("weight", lit(1.0)),
      weightCol = Some("weight"))
    val conf = MLForecast(
      models = Seq(SparkLinearRegression()),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1, 2), dateFeatures = Nil))
    for (refit <- Seq(true, false)) {
      val skewed = conf.fit(p).crossValidation(2, 7, refit = refit)
        .select(col("unique_id"), col("ds"), col("lr")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val uniform = conf.fit(pUniform).crossValidation(2, 7, refit = refit)
        .select(col("unique_id"), col("ds"), col("lr")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(skewed.keySet == uniform.keySet)
      val maxDiff = skewed.map { case (k, v) => math.abs(v - uniform(k)) }.max
      assert(maxDiff > 1e-9,
        s"refit=$refit: weights had no effect on CV predictions")
    }
  }
}
