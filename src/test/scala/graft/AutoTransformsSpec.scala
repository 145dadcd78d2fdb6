package graft

import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast._
import graft.operators.FeatureSpec

class AutoTransformsSpec extends SparkSpec {
  import spark.implicits._

  private def panel(rows: Seq[(String, Long, Double)]): PanelFrame =
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))

  test("auto differences: trend gets one diff, noise gets none (reference vector)") {
    // mirrors tests/test_target_transforms.py:107: arange(10) -> diffs=[1],
    // transformed = [nan, 1 x 9]
    val trend = (0L until 10L).map(t => ("tr", t, t.toDouble))
    // white noise: KPSS stat small -> no diffs
    val rnd = new scala.util.Random(11)
    val stat = (0L until 40L).map(t => ("st", t, rnd.nextGaussian()))
    val f = AutoDifferences(1).fit(panel(trend ++ stat))
    val tr = f.transformed.df.filter($"unique_id" === "tr").orderBy("ds")
      .select("y").collect().map(r => Option(r.get(0)))
    assert(tr.head.isEmpty)
    assert(tr.tail.forall(_.contains(1.0)))
    val st = f.transformed.df.filter($"unique_id" === "st").orderBy("ds")
      .select("y").collect().map(_.getDouble(0))
    assert(st.toSeq == stat.map(_._3)) // untouched
  }

  test("auto differences invert exactly through predict") {
    val p = panel((0L until 30L).map(t => ("s", t, 5.0 * t)))
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1)), targetTransforms = Seq(AutoDifferences(2)))
    val preds = mlf.fit(p).predict(4).orderBy("ds").collect()
    preds.foreach { r =>
      val t = r.getAs[Long]("ds")
      assert(math.abs(r.getAs[Double]("naive") - 5.0 * t) < 1e-9,
        s"ds=$t got ${r.getAs[Double]("naive")}")
    }
  }

  test("auto seasonal differences: strong weekly pattern gets one seasonal diff") {
    val pattern = Array(10.0, 20, 30, 40, 50, 60, 70)
    val p = panel((0L until 42L).map(t => ("w", t, pattern((t % 7).toInt))))
    val f = AutoSeasonalDifferences(7, 1).fit(p)
    val ys = f.transformed.df.orderBy("ds").select("y").collect().map(r => Option(r.get(0)))
    assert(ys.take(7).forall(_.isEmpty)) // first season nulled
    assert(ys.drop(7).forall(_.contains(0.0))) // exact seasonality diffs to zero
  }

  test("auto seasonal differences leave white noise alone") {
    val rnd = new scala.util.Random(3)
    val vals = (0L until 60L).map(t => ("n", t, rnd.nextGaussian()))
    val f = AutoSeasonalDifferences(7, 1).fit(panel(vals))
    val ys = f.transformed.df.orderBy("ds").select("y").collect().map(_.getDouble(0))
    assert(ys.toSeq == vals.map(_._3))
  }

  test("auto seasonality inference finds the weekly period and inverts through predict") {
    val pattern = Array(3.0, 9, 27, 5, 11, 40, 2)
    val p = panel((0L until 56L).map(t => ("w", t, pattern((t % 7).toInt) + 0.5 * t)))
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1)),
      targetTransforms = Seq(AutoSeasonalityAndDifferences(maxSeasonLength = 10, maxDiffs = 1)))
    val fitted = mlf.fit(p)
    // after one seasonal diff at lag 7 the series is constant 3.5 -> naive
    // predicts 3.5 -> inverse continues pattern + trend exactly
    val preds = fitted.predict(7).orderBy("ds").collect()
    preds.foreach { r =>
      val t = r.getAs[Long]("ds")
      val expected = pattern((t % 7).toInt) + 0.5 * t
      assert(math.abs(r.getAs[Double]("naive") - expected) < 1e-9,
        s"ds=$t got ${r.getAs[Double]("naive")} want $expected")
    }
  }

  test("box-cox: log-like series gets small lambda, round-trips through predict") {
    val p = panel((0L until 25L).map(t => ("e", t, math.exp(0.3 * t) * 10)))
    val lamRow = LocalBoxCox().fit(p) match {
      case b: BoxCoxFitted => b.lambdas.collect().head
    }
    val lam = lamRow.getDouble(1)
    assert(lam < 0.15, s"exponential growth should push lambda toward 0, got $lam")

    // diff of box-cox(exp-growth) with lambda ~0 is ~constant -> naive
    // predict + inverse should continue the curve closely
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1)),
      targetTransforms = Seq(LocalBoxCox(), Differences(Seq(1))))
    val preds = mlf.fit(p).predict(2).orderBy("ds").collect()
    preds.foreach { r =>
      val t = r.getAs[Long]("ds")
      val expected = math.exp(0.3 * t) * 10
      val got = r.getAs[Double]("naive")
      assert(math.abs(got - expected) / expected < 0.05, s"ds=$t got $got want $expected")
    }
  }

  test("box-cox update keeps lambda frozen") {
    val p = panel((0L until 25L).map(t => ("e", t, math.exp(0.3 * t) * 10)))
    val fitted = LocalBoxCox().fit(p)
    val lam = fitted match { case b: BoxCoxFitted => b.lambdas.collect().head.getDouble(1) }
    val extended = panel((0L until 26L).map(t => ("e", t, math.exp(0.3 * t) * 10)))
    val updated = fitted.update(extended)
    val lam2 = updated match { case b: BoxCoxFitted => b.lambdas.collect().head.getDouble(1) }
    assert(lam == lam2)
    // new row transformed with the frozen lambda
    val v = updated.transformed.df.filter($"ds" === 25L).select("y").collect().head.getDouble(0)
    val raw = math.exp(0.3 * 25) * 10
    val expected = if (math.abs(lam) < 1e-10) math.log(raw) else (math.pow(raw, lam) - 1) / lam
    assert(math.abs(v - expected) < 1e-9)
  }

  test("auto seasonality update freezes the fit-time season length") {
    val pattern = Array(3.0, 9, 27, 5, 11, 40, 2)
    val fitRows = (0L until 56L).map(t => ("w", t, pattern((t % 7).toInt)))
    val f = AutoSeasonalityAndDifferences(10, 1).fit(panel(fitRows))
      .asInstanceOf[AutoDiffFitted]
    val metaFit = f.meta.collect().head
    assert(metaFit.getAs[Int]("lag") == 7)
    // appended rows oscillate at period 2 with ~100x amplitude — re-running
    // season inference over the combined panel would flip the ACF argmax,
    // so a frozen update must NOT re-infer
    val extRows = fitRows ++ (56L until 112L)
      .map(t => ("w", t, if (t % 2 == 0) 1000.0 else -1000.0))
    val u = f.update(panel(extRows)).asInstanceOf[AutoDiffFitted]
    val metaU = u.meta.collect().head
    assert(metaU.getAs[Int]("lag") == 7)
    assert(metaU.getAs[Int]("n_diffs") == metaFit.getAs[Int]("n_diffs"))
  }

  test("auto differences update advances tails with frozen decision") {
    val full = panel((0L until 30L).map(t => ("s", t, 5.0 * t)))
    val oldP = panel((0L until 25L).map(t => ("s", t, 5.0 * t)))
    val newRows = (25L until 30L).map(t => ("s", t, 5.0 * t)).toDF("unique_id", "ds", "y")
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1)), targetTransforms = Seq(AutoDifferences(1)))
    val viaUpdate = mlf.fit(oldP).update(newRows).predict(3)
      .orderBy("ds").collect().map(_.getAs[Double]("naive")).toSeq
    val viaFull = mlf.fit(full).predict(3)
      .orderBy("ds").collect().map(_.getAs[Double]("naive")).toSeq
    assert(viaUpdate == viaFull)
  }
}
