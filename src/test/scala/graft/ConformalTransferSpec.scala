package graft

import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast._
import graft.operators.FeatureSpec

/** Goldens replicate the reference algorithms (conformal_prediction.py)
  * computed independently with numpy on the same inputs.
  */
class ConformalTransferSpec extends SparkSpec {
  import spark.implicits._

  test("weighted quantile matches Tibshirani searchsorted goldens") {
    val rows = Seq(
      (3.0, 1.0), (1.0, 2.0), (4.0, 0.5), (1.0, 1.0),
      (5.0, 3.0), (9.0, 0.25), (2.0, 1.5), (6.0, 1.0),
    ).map { case (v, w) => (1, v, w) }
    val df = rows.toDF("__step", "v", "w")
    val wTest = df.agg(avg($"w").as("__wtest"))
    val out = ConformalTransfer.weightedQuantiles(
      df.crossJoin(broadcast(wTest)), Seq("__step"), "v", "w",
      col("__wtest"), Seq(0.5, 0.8, 0.95))
      .collect().head
    assert(out.getDouble(1) == 4.0)
    assert(out.getDouble(2) == 6.0)
    assert(out.getDouble(3).isPosInfinity)
  }

  private def scalePanel(): PanelFrame = {
    val rows =
      Seq("a" -> Seq(1.0, 2, 4, 7, 11), "b" -> Seq(5.0), "c" -> Seq(2.0, 9),
        "d" -> Seq(3.0, 3, 3, 3)).flatMap { case (id, ys) =>
        ys.zipWithIndex.map { case (y, t) => (id, t.toLong, y) }
      }
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  test("series scales: mad with floor and no-diff fallback") {
    val m = ConformalTransfer.seriesScales(scalePanel(), "mad")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("a") - 1.0) < 1e-12)
    assert(math.abs(m("b") - 5.0) < 1e-12) // no diffs -> mean |y|
    assert(math.abs(m("c") - 0.0005) < 1e-12) // floored
    assert(math.abs(m("d") - 0.0005) < 1e-12) // flat series floored
  }

  test("series scales: std with single-diff fallback") {
    val m = ConformalTransfer.seriesScales(scalePanel(), "std")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("a") - 1.2909944487358056) < 1e-12)
    assert(math.abs(m("b") - 5.0) < 1e-12)
    assert(math.abs(m("c") - 7.0) < 1e-12) // std of one diff -> |dy|
    assert(math.abs(m("d") - 0.003145497224367903) < 1e-12)
  }

  test("robust scale ratio: IQR path and degenerate fallback") {
    val src = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("__score_m")
    val tgt = Seq(2.0, 5.0, 6.0, 9.0, 30.0).toDF("__score_m")
    val r = ConformalTransfer.robustScaleRatio(src, tgt, "__score_m")
      .collect().head.getDouble(0)
    assert(math.abs(r - 2.0) < 1e-12)
    val const = Seq(2.0, 2.0, 2.0).toDF("__score_m")
    val r2 = ConformalTransfer.robustScaleRatio(const, tgt, "__score_m")
      .collect().head.getDouble(0)
    assert(r2 == 1.0)
  }

  test("signed intervals shift with systematic bias") {
    // model under-predicts by exactly 10 -> signed scores all +10 ->
    // both interval bounds sit 10 above the prediction
    val cv = (for (id <- Seq("a", "b"); w <- 0 until 2; s <- 1 to 3)
      yield (id, (w * 10 + s).toLong, (w * 10).toLong, 50.0 + 10, 50.0))
      .toDF("unique_id", "ds", "cutoff", "y", "m")
    val scores = ConformalTransfer.signedScores(cv, "unique_id", "ds", "y", Seq("m"))
    val preds = Seq(("a", 100L, 50.0), ("a", 101L, 50.0), ("a", 102L, 50.0))
      .toDF("unique_id", "ds", "m")
    val out = ConformalTransfer.addSignedIntervals(preds, scores,
      "unique_id", "ds", Seq("m"), Seq(80)).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("m-lo-80") == 60.0)
      assert(r.getAs[Double]("m-hi-80") == 60.0)
    }
  }

  test("scale aligned transfer rescales interval width per target series") {
    // target is the source series scaled 10x, so std(Δy) also scales 10x;
    // the per-step q80 of normalized scores is 1/σ_src, so the target
    // half-width is exactly σ_tgt/σ_src = 10.
    def cumsum(t: Long): Double = t.toDouble * (t + 1) / 2
    val srcPanel = PanelFrame(
      (0L until 20L).map(t => ("s1", t, cumsum(t))).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val tgtPanel = PanelFrame(
      (0L until 20L).map(t => ("t1", t, 10.0 * cumsum(t))).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val srcScores = (for (w <- 0 until 4; s <- 1 to 2)
      yield ("s1", s, if ((w + s) % 2 == 0) 1.0 else 0.5))
      .toDF("unique_id", "__step", "__score_m")
    val preds = Seq(("t1", 100L, 0.0), ("t1", 101L, 0.0))
      .toDF("unique_id", "ds", "m")
    val out = ConformalTransfer.scaleAligned(preds, srcScores, srcPanel, tgtPanel,
      "std", "unique_id", "ds", Seq("m"), Seq(80)).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("m-hi-80") - 10.0) < 1e-9,
        s"got ${r.getAs[Double]("m-hi-80")}")
      assert(math.abs(r.getAs[Double]("m-lo-80") + 10.0) < 1e-9)
    }
  }

  test("predictWithTransfer wires specs end-to-end from two fitted pipelines") {
    // source and target panels share the weekly shape at different scales
    val pattern = Array(10.0, 20, 30, 40, 50, 60, 70)
    def panel(id: String, scale: Double, jitter: Double) = PanelFrame(
      (0 until 35).map(t =>
        (id, t.toLong, scale * pattern(t % 7) + jitter * (t % 5))).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val mlf = MLForecast(Seq(Models.seasonalNaive(7)), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(7)))
    val src = mlf.fit(panel("s1", 1.0, 1.0))
    val tgt = mlf.fit(panel("t1", 10.0, 3.0))

    // scale_aligned: fully derived inputs; intervals bracket the prediction
    val sa = tgt.predictWithTransfer(7, Seq(80),
      ConformalTransfer.ScaleAligned("std"), src, nWindows = 3)
    sa.collect().foreach { r =>
      val (lo, p, hi) = (r.getAs[Double]("seasonal_naive7-lo-80"),
        r.getAs[Double]("seasonal_naive7"), r.getAs[Double]("seasonal_naive7-hi-80"))
      assert(lo <= p && p <= hi, s"$lo / $p / $hi")
      assert(hi > lo) // the source's nonzero residuals transferred
    }
    // recalibrate: target-domain signed scores, same bracket property
    val rc = tgt.predictWithTransfer(7, Seq(80),
      ConformalTransfer.Recalibrate, src, nWindows = 3)
    rc.collect().foreach { r =>
      assert(r.getAs[Double]("seasonal_naive7-lo-80") <=
        r.getAs[Double]("seasonal_naive7-hi-80"))
    }
    // weighted variants demand caller-attached columns
    intercept[IllegalArgumentException] {
      tgt.predictWithTransfer(7, Seq(80),
        ConformalTransfer.WeightedConformal(Seq("lag7")), src)
    }
  }

  test("error scaled transfer widens intervals by the target/source IQR ratio") {
    val srcScores = (for (s <- 1 to 2; v <- Seq(1.0, 2.0, 3.0, 4.0, 10.0))
      yield ("s", s, v)).toDF("unique_id", "__step", "__score_m")
    val tgtScores = (for (s <- 1 to 2; v <- Seq(2.0, 5.0, 6.0, 9.0, 30.0))
      yield ("t", s, v)).toDF("unique_id", "__step", "__score_m")
    val preds = Seq(("t", 100L, 0.0), ("t", 101L, 0.0)).toDF("unique_id", "ds", "m")
    val out = ConformalTransfer.errorScaled(preds, srcScores, tgtScores,
      "unique_id", "ds", Seq("m"), Seq(80)).collect()
    // per-step scores {1,2,3,4,10} * ratio 2 -> q80 of {2,4,6,8,20} = 10.4
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("m-hi-80") - 10.4) < 1e-9,
        s"got ${r.getAs[Double]("m-hi-80")}")
    }
  }

  test("weighted pooled error intervals use weighted quantiles") {
    // one step; all weight on score 5 -> q80 lands on 5 even though the
    // unweighted q80 of {1,2,3,4,5} would be 4.2
    val scores = Seq((1, 1.0, 0.01), (1, 2.0, 0.01), (1, 3.0, 0.01),
      (1, 4.0, 0.01), (1, 5.0, 10.0)).toDF("__step", "__score_m", "w")
    val preds = Seq(("a", 100L, 0.0)).toDF("unique_id", "ds", "m")
    val out = ConformalTransfer.addPooledErrorIntervals(preds, scores,
      "unique_id", "ds", Seq("m"), Seq(80), weightCol = Some("w")).collect().head
    assert(out.getAs[Double]("m-hi-80") == 5.0)
    assert(out.getAs[Double]("m-lo-80") == -5.0)
  }

  test("scale aligned weighted: point weights move the normalized quantile") {
    def cumsum(t: Long): Double = t.toDouble * (t + 1) / 2
    val srcPanel = PanelFrame(
      (0L until 20L).map(t => ("s1", t, cumsum(t))).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val tgtPanel = PanelFrame(
      (0L until 20L).map(t => ("t1", t, 10.0 * cumsum(t))).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    // one step; nearly all weight mass sits on the 0.5·σ_src scores (the
    // test-point weight w_test = mean(w) also lands in the denominator, so
    // the dominant mass needs enough rows to out-vote it)
    val srcScores = ((1 to 9).map(_ => ("s1", 1, 0.5, 10.0)) :+ ("s1", 1, 1.0, 0.001))
      .toDF("unique_id", "__step", "__score_m", "w")
    val preds = Seq(("t1", 100L, 0.0)).toDF("unique_id", "ds", "m")
    val out = ConformalTransfer.transfer(
      ConformalTransfer.ScaleAlignedWeighted("std", "w"),
      ConformalTransfer.TransferInputs(preds, srcScores, "unique_id", "ds",
        Seq("m"), Seq(80), sourcePanel = Some(srcPanel), targetPanel = Some(tgtPanel)))
      .collect().head
    // weighted q80 of normalized scores lands on 0.5/σ_src -> half-width 5
    assert(math.abs(out.getAs[Double]("m-hi-80") - 5.0) < 1e-9,
      s"got ${out.getAs[Double]("m-hi-80")}")
  }

  test("weighted conformal: target-like calibration rows dominate the interval") {
    val rnd = new scala.util.Random(11)
    // calibration scores: rows with x near 0 have small errors, rows with x
    // near 6 (the target domain) have score 9
    val srcScores = ((0 until 80).map(i => (s"s$i", 1, 1.0, rnd.nextGaussian())) ++
      (0 until 80).map(i => (s"u$i", 1, 9.0, rnd.nextGaussian() + 6.0)))
      .toDF("unique_id", "__step", "__score_m", "x")
    val targetFeatures = Seq.fill(100)(rnd.nextGaussian() + 6.0)
      .map(Tuple1(_)).toDF("x")
    val preds = Seq(("t", 100L, 0.0)).toDF("unique_id", "ds", "m")
    val out = ConformalTransfer.transfer(
      ConformalTransfer.WeightedConformal(Seq("x")),
      ConformalTransfer.TransferInputs(preds, srcScores, "unique_id", "ds",
        Seq("m"), Seq(80), targetFeatures = Some(targetFeatures)))
      .collect().head
    // unweighted q80 of {1.0 x80, 9.0 x80} would be 9.0; with density-ratio
    // weights the 9.0 rows dominate even harder — but if the TARGET looked
    // like x~0 the interval would shrink to ~1: assert the weighting pulled
    // toward the target-like rows' score
    assert(out.getAs[Double]("m-hi-80") > 8.0,
      s"got ${out.getAs[Double]("m-hi-80")}")
    val outInverted = ConformalTransfer.transfer(
      ConformalTransfer.WeightedConformal(Seq("x")),
      ConformalTransfer.TransferInputs(preds, srcScores, "unique_id", "ds",
        Seq("m"), Seq(80),
        targetFeatures = Some(Seq.fill(100)(rnd.nextGaussian())
          .map(Tuple1(_)).toDF("x"))))
      .collect().head
    assert(outInverted.getAs[Double]("m-hi-80") < 8.0,
      s"got ${outInverted.getAs[Double]("m-hi-80")}")
  }

  test("transfer dispatch validates missing inputs") {
    val preds = Seq(("t", 100L, 0.0)).toDF("unique_id", "ds", "m")
    val scores = Seq(("s", 1, 1.0)).toDF("unique_id", "__step", "__score_m")
    val in = ConformalTransfer.TransferInputs(preds, scores, "unique_id", "ds",
      Seq("m"), Seq(80))
    val e = intercept[IllegalArgumentException] {
      ConformalTransfer.transfer(ConformalTransfer.Recalibrate, in)
    }
    assert(e.getMessage.contains("recalibrate requires targetScores"))
  }

  test("density ratio upweights source rows that look like the target") {
    val rnd = new scala.util.Random(7)
    val source = (Seq.fill(100)(rnd.nextGaussian()) ++
      Seq.fill(100)(rnd.nextGaussian() + 6.0)).map(Tuple1(_)).toDF("x")
    val target = Seq.fill(150)(rnd.nextGaussian() + 6.0).map(Tuple1(_)).toDF("x")
    val w = ConformalTransfer.estimateDensityRatio(source, target, Seq("x"))
      .select($"x", $"weight").collect()
    val (near, far) = w.partition(_.getDouble(0) > 3.0)
    val nearMean = near.map(_.getDouble(1)).sum / near.length
    val farMean = far.map(_.getDouble(1)).sum / far.length
    assert(nearMean > 5 * farMean, s"near=$nearMean far=$farMean")
  }

  test("replay DRE rejects duplicate keys with differing features") {
    // fold order over duplicated (label, orderCols) keys is collect-order
    // dependent; the replay trainer promises deterministic weights, so
    // non-identical duplicates must fail loudly instead of training on an
    // arbitrary one and silently keeping an arbitrary weight
    val source = Seq((1L, 2.0), (1L, 3.0), (2L, 5.0))
      .toDF("k", "x")
    val target = Seq((3L, 4.0)).toDF("k", "x")
    val e = intercept[IllegalArgumentException] {
      ConformalTransfer.estimateDensityRatioReplay(source, target,
        featureCols = Seq("x"), orderCols = Seq("k"))
    }
    assert(e.getMessage.contains("duplicate") &&
      e.getMessage.contains("differing feature vectors"))
    // byte-identical duplicates stay allowed (fold order among them is
    // moot); key 6 md5-hashes into fold 0 so both cross-fit folds train
    val okSrc = Seq((1L, 2.0), (1L, 2.0), (6L, 5.0)).toDF("k", "x")
    val out = ConformalTransfer.estimateDensityRatioReplay(okSrc, target,
      featureCols = Seq("x"), orderCols = Seq("k"))
    assert(out.select("weight").collect().forall(!_.isNullAt(0)))
  }
}
