package graft

import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast._
import graft.operators.FeatureSpec

/** CV with prediction intervals + per-fold fitted values — reference
  * cross_validation(prediction_intervals=, level=, fitted=True)
  * (forecast.py:1878-1882, 1967-2017, 2079-2086).
  */
class CvIntervalsSpec extends SparkSpec {
  import spark.implicits._

  /** Two linear series y = t (+offset): every SNaive(2) residual is exactly
    * 2, so all conformal quantiles are hand-computable.
    */
  private def linearPanel(): PanelFrame = {
    val rows = for {
      (id, off) <- Seq("a" -> 0.0, "b" -> 10.0)
      t <- 0 until 30
    } yield (id, t.toLong, t + off)
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  private def snaiveConf = MLForecast(
    models = Seq(Models.seasonalNaive(2)),
    freq = Freq.IntFreq(1),
    spec = FeatureSpec(lags = Seq(2)))

  test("cv intervals: refit windows match hand-computed conformal_error bounds") {
    // y = t: SNaive(2) always predicts y(t-2) = t-2, |err| = 2 everywhere.
    // Fit-time calibration => lo = yhat - 2, hi = yhat + 2 at every step.
    val out = snaiveConf.fit(linearPanel())
      .crossValidationWithIntervals(nWindows = 2, h = 2, levels = Seq(80))
      .collect()
    assert(out.length == 2 * 2 * 2) // series x windows x steps
    out.foreach { r =>
      val yhat = r.getAs[Double]("seasonal_naive2")
      assert(math.abs(r.getAs[Double]("y") - yhat - 2.0) < 1e-12)
      assert(math.abs(r.getAs[Double]("seasonal_naive2-lo-80") - (yhat - 2.0)) < 1e-12)
      assert(math.abs(r.getAs[Double]("seasonal_naive2-hi-80") - (yhat + 2.0)) < 1e-12)
    }
  }

  test("cv intervals: frozen windows take the signed recalibrate path") {
    // refit=false: window 1 recalibrates with SIGNED residuals (all exactly
    // +2) from a frozen backtest => lo = hi = yhat + 2 (asymmetric shift,
    // not a widening). Window 0 keeps the symmetric fit-time bounds.
    val cv = snaiveConf.fit(linearPanel())
      .crossValidationWithIntervals(nWindows = 2, h = 2, levels = Seq(80),
        refit = false)
    val rows = cv.collect()
    val cutoffs = rows.map(_.getAs[Long]("cutoff")).distinct.sorted
    assert(cutoffs.length == 2)
    rows.foreach { r =>
      val yhat = r.getAs[Double]("seasonal_naive2")
      val (lo, hi) = (r.getAs[Double]("seasonal_naive2-lo-80"),
        r.getAs[Double]("seasonal_naive2-hi-80"))
      if (r.getAs[Long]("cutoff") == cutoffs.head) {
        assert(math.abs(lo - (yhat - 2.0)) < 1e-12)
        assert(math.abs(hi - (yhat + 2.0)) < 1e-12)
      } else {
        assert(math.abs(lo - (yhat + 2.0)) < 1e-12)
        assert(math.abs(hi - (yhat + 2.0)) < 1e-12)
      }
    }
  }

  test("cv intervals: single window equals predictWithIntervals on its train slice") {
    val panel = linearPanel()
    val fitted = snaiveConf.fit(panel)
    val cv = fitted.crossValidationWithIntervals(nWindows = 1, h = 3,
      levels = Seq(90), method = "conformal_distribution")
    // window 0 train slice = everything up to last-3
    val train = PanelFrame(
      panel.df.filter(col("ds") <= lit(30 - 1 - 3)), freq = Freq.IntFreq(1))
    val direct = snaiveConf.fit(train)
      .predictWithIntervals(3, Seq(90), method = "conformal_distribution")
    val key = Seq("unique_id", "ds")
    val joined = cv.select((key.map(col) ++ Seq(
        col("seasonal_naive2").as("m1"),
        col("`seasonal_naive2-lo-90`").as("l1"),
        col("`seasonal_naive2-hi-90`").as("h1"))): _*)
      .join(direct.select((key.map(col) ++ Seq(
        col("seasonal_naive2").as("m2"),
        col("`seasonal_naive2-lo-90`").as("l2"),
        col("`seasonal_naive2-hi-90`").as("h2"))): _*), key)
    assert(joined.count() == 2 * 3)
    assert(joined.filter(
      abs(col("m1") - col("m2")) > 1e-12 ||
      abs(col("l1") - col("l2")) > 1e-12 ||
      abs(col("h1") - col("h2")) > 1e-12).isEmpty)
  }

  test("cv intervals: shared nested-CV fast path matches the per-window path") {
    // data-free models take the one-pass shared nested CV (union of nested
    // cutoff offsets, sliced per window by (id, cutoff)); fusedPredict=false
    // forces the original per-window nested run. Bit-identical output is
    // the contract — the fast path is a plan change, not a semantics change.
    val panel = linearPanel()
    val fast = snaiveConf.fit(panel)
      .crossValidationWithIntervals(nWindows = 3, h = 2, levels = Seq(80, 95),
        stepSize = Some(1))
    val slow = snaiveConf.copy(fusedPredict = false).fit(panel)
      .crossValidationWithIntervals(nWindows = 3, h = 2, levels = Seq(80, 95),
        stepSize = Some(1))
    assert(fast.columns.sorted.sameElements(slow.columns.sorted))
    val cols = fast.columns.sorted.toSeq
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(c => col(s"`$c`")): _*)
    assert(norm(fast).exceptAll(norm(slow)).isEmpty &&
      norm(slow).exceptAll(norm(fast)).isEmpty)
    // refitEvery mixes refit windows (shared-nested) and frozen windows
    // (signed transfer) — the fast path must slice the right cutoffs
    val fastMix = snaiveConf.fit(panel)
      .crossValidationWithIntervals(nWindows = 4, h = 2, levels = Seq(80),
        stepSize = Some(1), refitEvery = Some(2))
    val slowMix = snaiveConf.copy(fusedPredict = false).fit(panel)
      .crossValidationWithIntervals(nWindows = 4, h = 2, levels = Seq(80),
        stepSize = Some(1), refitEvery = Some(2))
    val colsM = fastMix.columns.sorted.toSeq
    def normM(df: org.apache.spark.sql.DataFrame) =
      df.select(colsM.map(c => col(s"`$c`")): _*)
    assert(normM(fastMix).exceptAll(normM(slowMix)).isEmpty &&
      normM(slowMix).exceptAll(normM(fastMix)).isEmpty)
  }

  test("cv intervals: shared backtest fast path matches per-window with target transforms") {
    // r12: with target transforms the kernel can't run, but data-free
    // predictions at cutoff c are still pure functions of history <= c
    // (warmup re-fits Differences tails and scaler stats on the slice
    // <= c), so ONE driver-loop backtest over the union of offsets
    // replaces a nested CV per refit window. Bit-identical output is the
    // contract; a non-linear panel so transforms don't degenerate.
    val rows = for {
      (id, off) <- Seq("a" -> 0.0, "b" -> 10.0)
      t <- 0 until 40
    } yield (id, t.toLong, math.sin(t * 0.7) * 5.0 + t * 0.5 + off)
    val panel = PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
    val conf = MLForecast(
      models = Seq(Models.seasonalNaive(2)),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(2)),
      targetTransforms = Seq(Differences(Seq(1)), LocalStandardScaler()))
    def run(c: MLForecast, refitEvery: Option[Int]) = c.fit(panel)
      .crossValidationWithIntervals(nWindows = 3, h = 2, levels = Seq(80, 95),
        stepSize = Some(1), refitEvery = refitEvery)
    def norm(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(c => col(s"`$c`")): _*)
    }
    for (re <- Seq(None, Some(2))) {
      val fastRaw = run(conf, re)
      val slowRaw = run(conf.copy(fusedPredict = false), re)
      // pin the RAW column order: runWithIntervals documents that the
      // shared-backtest path re-selects to run()'s layout, so downstream
      // positional consumers see identical frames — a sorted-only compare
      // would let the layouts drift apart silently
      assert(fastRaw.columns.sameElements(slowRaw.columns),
        s"fast path column ORDER diverged from run()'s layout " +
          s"(refitEvery=$re): ${fastRaw.columns.toSeq} vs ${slowRaw.columns.toSeq}")
      val fast = norm(fastRaw)
      val slow = norm(slowRaw)
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"fast/slow interval CV diverged with transforms (refitEvery=$re)")
    }
  }

  test("cv intervals: kernel chains match the driver backtest — multi-stage diffs + scaler family") {
    // r14 (ADVICE): the r13 parity coverage used Differences(Seq(1)) +
    // LocalStandardScaler only — phase always 0, one diff stage, one scaler
    // kind. These chains pin the multi-stage/multi-phase tail indexing
    // (d > 1, two stages) and the minmax/robust kernels against the driver
    // backtest with exceptAll bit-identity. Float targets via sin so the
    // arithmetic is not integer-degenerate; the robust/minmax stats are
    // order-independent (percentile/min/max), so scaler-first chains hold
    // bit-exactly too.
    val rows = for {
      (id, off) <- Seq("a" -> 0.0, "b" -> 10.0)
      t <- 0 until 40
    } yield (id, t.toLong, math.sin(t * 0.7) * 5.0 + t * 0.5 + off)
    val panel = PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
    val chains = Seq(
      "diff_1_7 + standard" ->
        Seq(Differences(Seq(1, 7)), LocalStandardScaler()),
      "diff_2_3 + minmax" ->
        Seq(Differences(Seq(2, 3)), LocalMinMaxScaler()),
      "robust_mad then diff_2" ->
        Seq(LocalRobustScaler("mad"), Differences(Seq(2))),
      "robust_iqr only" -> Seq(LocalRobustScaler("iqr")))
    def norm(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(c => col(s"`$c`")): _*)
    }
    for ((label, tfms) <- chains) {
      val conf = MLForecast(
        models = Seq(Models.seasonalNaive(2)),
        freq = Freq.IntFreq(1),
        spec = FeatureSpec(lags = Seq(2)),
        targetTransforms = tfms)
      val fast = norm(conf.fit(panel)
        .crossValidationWithIntervals(nWindows = 3, h = 2, levels = Seq(80),
          stepSize = Some(1)))
      val slow = norm(conf.copy(fusedPredict = false).fit(panel)
        .crossValidationWithIntervals(nWindows = 3, h = 2, levels = Seq(80),
          stepSize = Some(1)))
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"kernel-vs-driver interval CV diverged for chain: $label")
    }
  }

  test("cv fitted values: per-fold hand check and frozen-model parity") {
    // y = t: fitted h=1 values are y(t-2) = t-2 on every post-dropna train
    // row of each fold. refit irrelevant for a data-free model: outputs of
    // refit=true and refit=false must be identical.
    val fitted = snaiveConf.fit(linearPanel())
    val fv = fitted.crossValidationFittedValues(nWindows = 2, h = 2)
    val rows = fv.collect()
    // folds: cutoffs at 30-1-4=25 (fold 0) and 27 (fold 1); train rows with
    // lag-2 available start at t=2 => 24 + 26 rows per series
    assert(rows.length == 2 * (24 + 26))
    assert(fv.columns.take(4).toSeq ==
      Seq("unique_id", "ds", "fold", "y"))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("y") -
        r.getAs[Double]("seasonal_naive2") - 2.0) < 1e-12)
      val fold = r.getAs[Int]("fold")
      val maxDs = if (fold == 0) 25L else 27L
      assert(r.getAs[Long]("ds") <= maxDs)
    }
    val frozen = fitted.crossValidationFittedValues(nWindows = 2, h = 2,
      refit = false)
    assert(fv.exceptAll(frozen).isEmpty && frozen.exceptAll(fv).isEmpty)
  }

  test("interval metrics and quantile loss: hand-computed goldens") {
    val df = Seq(
      ("a", 1L, 10.0, 8.0, 12.0), // inside
      ("a", 2L, 13.0, 8.0, 12.0), // above by 1
      ("a", 3L, 7.0, 8.0, 12.0),  // below by 1
      ("a", 4L, 8.0, 8.0, 12.0),  // on the lower edge: covered
    ).toDF("unique_id", "ds", "y", "m-lo-80", "m-hi-80")
    val im = Losses.intervalMetricsById(df, "unique_id", "ds", "y", Seq("m"),
      Seq(80)).collect().head
    val p = 2.0 / ((100.0 - 80.0) / 100.0) // 9.999999999999998, NOT 10
    assert(im.getAs[Double]("m-coverage-80") == 0.5)
    assert(im.getAs[Double]("m-width-80") == 4.0)
    assert(math.abs(im.getAs[Double]("m-winkler-80") - (16.0 + 2 * p) / 4.0) < 1e-12)
    val ql = Losses.quantileLossById(df, "unique_id", "ds", "y",
      Seq(0.1 -> "m-lo-80", 0.9 -> "m-hi-80")).collect().head
    // e_lo = y-8 = [2,5,-1,0]:  QL_0.1 = (0.2+0.5+0.9+0)/4   = 0.4
    // e_hi = y-12 = [-2,1,-5,-4]: QL_0.9 = (0.2+0.9+0.5+0.4)/4 = 0.5
    assert(math.abs(ql.getAs[Double]("m-lo-80-ql") - 0.4) < 1e-12)
    assert(math.abs(ql.getAs[Double]("m-hi-80-ql") - 0.5) < 1e-12)
    assert(math.abs(ql.getAs[Double]("mqloss") - 0.45) < 1e-12)
  }

  test("sparse direct horizons join calendar-step interval quantiles") {
    // y = t with the naive model: |err| at calendar step s is EXACTLY s,
    // so the level-90 band half-width at horizon s must be s. With
    // horizons = (1, 3) a row_number spelling would hand the horizon-3
    // row step 2's quantile (width 2, silently wrong).
    val rows = for (id <- Seq("a", "b"); t <- 0 until 30)
      yield (id, t.toLong, t.toDouble)
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1)), horizons = Some(Seq(1, 3)))
    val out = mlf.fit(p).predictWithIntervals(h = 3, levels = Seq(90), nWindows = 2)
      .filter(col("unique_id") === "a").orderBy("ds").collect()
    assert(out.length == 2)
    val w = out.map(r =>
      r.getAs[Double]("naive-hi-90") - r.getAs[Double]("naive"))
    assert(w(0) == 1.0 && w(1) == 3.0, s"sparse-step widths: ${w.toSeq}")
  }

  test("driver recursive loop keeps double feedback on integer targets") {
    import graft.functions.RollingMean
    // IntegerType target: the carried state must stay DOUBLE — casting a
    // step's 18.5 back to int would feed 18 into step 2's features
    val rows = (0 until 20).map(i => ("a", i.toLong, i))
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
    val mlf = MLForecast(
      Seq(FeatureEcho("rm2", "rolling_mean_lag1_window_size2")),
      Freq.IntFreq(1),
      FeatureSpec(lagTransforms = Map(1 -> Seq(RollingMean(2)))))
    def run(fused: Boolean) =
      mlf.copy(fusedPredict = fused).fit(p).predict(3)
        .orderBy("ds").collect().map(_.getAs[Double]("rm2")).toSeq
    val driver = run(fused = false)
    val fusedP = run(fused = true)
    assert(driver == fusedP, s"driver $driver != fused $fusedP")
    // step 2 must see step 1's FRACTIONAL prediction: (19 + 18.5) / 2
    assert(driver(1) == (19.0 + 18.5) / 2.0, driver.toString)
  }

  test("interval steps follow the calendar, not row position, on gapped windows") {
    // scores keyed by CALENDAR step; preds for cutoff=100 with ds=102
    // missing — the ds=103 row is calendar step 3, and a row_number
    // spelling would silently hand it step 2's quantile
    val scores = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0))
      .toDF("unique_id", "__step", "__score_m")
    val preds = Seq(("a", 101L, 100L, 5.0), ("a", 103L, 100L, 5.0))
      .toDF("unique_id", "ds", "cutoff", "m")
    val out = Conformal.addIntervals(preds, scores, "unique_id", "ds",
        Seq("m"), levels = Seq(50), freq = Some(Freq.IntFreq(1)))
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("m-hi-50")).toMap
    assert(out(101L) == 15.0)
    assert(out(103L) == 35.0, s"gapped step mis-aligned: $out")
    // a null bound is unevaluable, not a coverage miss
    val iv = Seq(("a", 1L, 5.0, java.lang.Double.valueOf(4.0), java.lang.Double.valueOf(6.0)),
      ("a", 2L, 5.0, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double]))
      .toDF("unique_id", "ds", "y", "m-lo-50", "m-hi-50")
      .withColumn("m", col("y"))
    val cov = Losses.intervalMetricsById(iv, "unique_id", "ds", "y",
      Seq("m"), Seq(50)).collect().head
    assert(cov.getAs[Double]("m-coverage-50") == 1.0,
      "null-band row must not count as a miss")
  }
}
