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

  test("pipeline is invariant to non-standard id/time/target column names") {
    // reference test_core.py:409 test_non_standard_df: the whole pipeline
    // must behave identically under renamed id/time/target columns
    val std = panelWithLengths(Map("a" -> 60, "b" -> 45))
    val renamed = PanelFrame(
      std.df.toDF("some_id", "timestamp", "value"),
      idCol = "some_id", timeCol = "timestamp", targetCol = "value",
      freq = Freq.IntFreq(1))
    val spec = FeatureSpec(lags = Seq(1, 7),
      lagTransforms = Map(1 -> Seq(graft.functions.RollingMean(7))))
    def conf = MLForecast(
      models = Seq(Models.naive, SparkLinearRegression()),
      freq = Freq.IntFreq(1), spec = spec,
      targetTransforms = Seq(Differences(Seq(1))))
    val fStd = conf.fit(std)
    val fRen = conf.fit(renamed)

    def norm(df: org.apache.spark.sql.DataFrame, id: String, ts: String) =
      df.withColumnRenamed(id, "unique_id").withColumnRenamed(ts, "ds")
        .orderBy("unique_id", "ds").collect().toSeq

    assert(norm(fStd.predict(7), "unique_id", "ds") ==
      norm(fRen.predict(7), "some_id", "timestamp"))
    assert(norm(fStd.fittedValues(1), "unique_id", "ds").size ==
      norm(fRen.fittedValues(1), "some_id", "timestamp").size)
    val cvStd = norm(fStd.crossValidation(2, 5), "unique_id", "ds")
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("naive")))
    val cvRen = norm(fRen.crossValidation(2, 5), "some_id", "timestamp")
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("naive")))
    assert(cvStd == cvRen)
  }

  test("existing features on the input are kept as-is, not recomputed") {
    // reference test_core.py:388 test_existing_features: a precomputed lag1
    // and month column survive verbatim; only the missing features (lag2,
    // year) are added
    val df = Seq(
      (1L, java.sql.Date.valueOf("2000-01-01"), 10.0, 1.0, 12),
      (1L, java.sql.Date.valueOf("2000-01-02"), 11.0, 1.0, 12),
      (1L, java.sql.Date.valueOf("2000-01-03"), 12.0, 1.0, 12))
      .toDF("unique_id", "ds", "y", "lag1", "month")
    val p = PanelFrame(df, freq = Freq.Day)
    val out = graft.operators.Featurizer.addFeatures(p,
      FeatureSpec(lags = Seq(1, 2), dateFeatures = Seq("year", "month")))
      .orderBy("ds").collect()
    assert(out.map(_.getAs[Double]("lag1")).toSeq == Seq(1.0, 1.0, 1.0))
    assert(out.map(_.getAs[Int]("month")).toSeq == Seq(12, 12, 12))
    assert(out.map(_.getAs[Int]("year")).toSeq == Seq(2000, 2000, 2000))
    assert(out.map(r => Option(r.get(r.fieldIndex("lag2")))).toSeq ==
      Seq(None, None, Some(10.0)))
  }

  test("row order of the input never changes results") {
    // reference test_core.py:371 test_unsorted_df
    val p = panelWithLengths(Map("a" -> 50, "b" -> 35))
    val shuffled = p.copy(df = p.df
      .withColumn("__r", pmod(xxhash64(col("unique_id"), col("ds")), lit(997)))
      .orderBy("__r").drop("__r").repartition(7))
    val conf = MLForecast(
      models = Seq(Models.naive, SparkLinearRegression()),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1, 7),
        lagTransforms = Map(1 -> Seq(graft.functions.RollingMean(7)))),
      targetTransforms = Seq(Differences(Seq(1))))
    def run(pp: PanelFrame) = conf.fit(pp).predict(5)
      .orderBy("unique_id", "ds").collect().toSeq
    assert(run(p) == run(shuffled))
  }

  test("interval edges: level-0 recovers the point forecast; levels nest monotonically") {
    // reference test_conformal.py:109-136: point columns survive interval
    // decoration unchanged; level=[0] distribution intervals collapse to
    // the mean (cuts both land on the median of the symmetric paths); and
    // lo-95 <= lo-80 <= lo-50 <= pred <= hi-50 <= hi-80 <= hi-95 row-wise
    val p = panelWithLengths(Map("a" -> 80, "b" -> 70, "c" -> 64))
    val conf = MLForecast(Seq(Models.seasonalNaive(7)), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1, 7)))
    val fitted = conf.fit(p)
    val point = fitted.predict(7).orderBy("unique_id", "ds").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("seasonal_naive7")).toMap

    val z = fitted.predictWithIntervals(7, levels = Seq(0), nWindows = 3,
      method = "conformal_distribution")
    val zRows = z.orderBy("unique_id", "ds").collect()
    zRows.foreach { r =>
      val k = (r.getString(r.fieldIndex("unique_id")), r.getLong(r.fieldIndex("ds")))
      val m = r.getAs[Double]("seasonal_naive7")
      assert(m == point(k), "point forecast must survive interval decoration")
      assert(math.abs(r.getAs[Double]("seasonal_naive7-lo-0") - m) < 1e-9,
        s"lo-0 should equal the point forecast at $k")
      assert(math.abs(r.getAs[Double]("seasonal_naive7-hi-0") - m) < 1e-9)
    }

    for (method <- Seq("conformal_error", "conformal_distribution")) {
      val iv = fitted.predictWithIntervals(7, levels = Seq(50, 80, 95),
        nWindows = 3, method = method).collect()
      iv.foreach { r =>
        val m = r.getAs[Double]("seasonal_naive7")
        val lo = Seq(95, 80, 50).map(l => r.getAs[Double](s"seasonal_naive7-lo-$l"))
        val hi = Seq(50, 80, 95).map(l => r.getAs[Double](s"seasonal_naive7-hi-$l"))
        val chain = lo ++ Seq(m) ++ hi
        assert(chain.zip(chain.tail).forall { case (x, y) => x <= y + 1e-9 },
          s"$method intervals not nested: $chain")
      }
    }
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
