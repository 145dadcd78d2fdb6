package graft.forecast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Freq, PanelFrame}
import graft.operators.FeatureSpec

/** r14: the fused transform-state relation ([[TransformState.fuseChain]])
  * replaces one full-panel window pass per diff stage + scaler with ONE
  * pass whose slices must be VALUE-IDENTICAL to the standalone per-transform
  * state relations — this spec pins that slice-by-slice with exceptAll.
  * (End-to-end coverage rides the existing predict/CV goldens, which all
  * flow through the fused prepare path now.)
  */
class TransformStateSpec extends SparkSpec {
  import spark.implicits._

  private def panel(): PanelFrame = {
    val rows = for {
      (id, off) <- Seq("a" -> 0.0, "b" -> 25.0, "c" -> -4.5)
      t <- 0 until 37
    } yield (id, t.toLong, math.sin(t * 0.61) * 7.0 + t * 0.3 + off)
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  private def fitChain(p: PanelFrame, transforms: Seq[TargetTransform])
      : (Seq[FittedTargetTransform], Seq[PanelFrame]) = {
    var cur = p
    val inputs = Seq.newBuilder[PanelFrame]
    val fitted = transforms.map { t =>
      inputs += cur
      val f = t.fit(cur)
      cur = f.transformed
      f
    }
    (fitted, inputs.result())
  }

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.columns.sorted.sameElements(b.columns.sorted),
      s"$what schema: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cols = a.columns.sorted.toSeq.map(c => col(s"`$c`"))
    val an = a.select(cols: _*); val bn = b.select(cols: _*)
    assert(an.exceptAll(bn).isEmpty && bn.exceptAll(an).isEmpty,
      s"$what values diverged")
  }

  test("fused diff+scaler chain slices equal the standalone state relations") {
    val p = panel()
    val transforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler())
    val (fitted, inputs) = fitChain(p, transforms)
    val fused = TransformState.fuseChain(transforms, fitted, inputs)
    val d0 = fitted.head.asInstanceOf[DiffFitted]
    val dF = fused.head.asInstanceOf[DiffFitted]
    assert(dF.shared.isDefined, "diff stage should join the fused relation")
    d0.tails.zip(dF.tailsResolved).zipWithIndex.foreach { case ((a, b), i) =>
      assertSame(a, b, s"diff stage $i tail")
    }
    val s0 = fitted(1).asInstanceOf[ScalerFitted]
    val sF = fused(1).asInstanceOf[ScalerFitted]
    assert(sF.shared.isDefined && (sF.shared.get eq dF.shared.get),
      "chain must share ONE fused relation")
    assertSame(s0.st, sF.stResolved, "scaler stats")
  }

  test("fused chain slices are exact through a stateless log1p stage and minmax/robust scalers") {
    // log1p keeps targets positive-domain: shift the panel up
    val base = panel()
    val p = base.copy(df = base.df.withColumn("y", col("y") + lit(40.0)))
    for ((label, transforms) <- Seq(
      "log1p+diff(2,3)+minmax" -> Seq(GlobalFuncTransform("log1p"),
        Differences(Seq(2, 3)), LocalMinMaxScaler()),
      "robust_iqr+diff(2)" -> Seq(LocalRobustScaler("iqr"), Differences(Seq(2))),
      "robust_mad+diff(1)" -> Seq(LocalRobustScaler("mad"), Differences(Seq(1))))) {
      val (fitted, inputs) = fitChain(p, transforms)
      val fused = TransformState.fuseChain(transforms, fitted, inputs)
      fitted.zip(fused).zipWithIndex.foreach {
        case ((a: DiffFitted, b: DiffFitted), i) =>
          a.tails.zip(b.tailsResolved).zipWithIndex.foreach { case ((x, y), j) =>
            assertSame(x, y, s"$label tfm $i diff stage $j tail")
          }
        case ((a: ScalerFitted, b: ScalerFitted), i) =>
          assertSame(a.st, b.stResolved, s"$label tfm $i scaler stats")
        case _ => ()
      }
    }
  }

  test("single-state and unrecognized chains are left unfused") {
    val p = panel()
    // one diff stage only — nothing to fuse, instances unchanged
    val t1 = Seq[TargetTransform](Differences(Seq(1)))
    val (f1, i1) = fitChain(p, t1)
    assert(TransformState.fuseChain(t1, f1, i1).head eq f1.head)
    // scaler only — one state pass, unchanged
    val t2 = Seq[TargetTransform](LocalStandardScaler())
    val (f2, i2) = fitChain(p, t2)
    assert(TransformState.fuseChain(t2, f2, i2).head eq f2.head)
    // BoxCox-family (no replay) — whole chain stays standalone
    val t3 = Seq[TargetTransform](Differences(Seq(1, 7)),
      AutoDifferences(1))
    val (f3, i3) = fitChain(p, t3)
    val out3 = TransformState.fuseChain(t3, f3, i3)
    assert(out3.zip(f3).forall { case (a, b) => a eq b })
  }

  test("fused predict equals the pre-fusion closed form (diff+scaler, naive)") {
    // Differences(1) + scaler + naive: the transformed naive prediction is
    // the constant last diff (scaled); inverted, step i = y_last + i * d
    // where d = y_last - y_prev. The closed form is transform-free, so it
    // checks the fused-state INVERSE end to end, not just the state values.
    val p = panel()
    val conf = MLForecast(
      models = Seq(Models.naive),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1)),
      targetTransforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler()))
    val preds = conf.fit(p).predict(3)
      .select(col("unique_id"), col("ds"), col("naive")).collect()
    val hist = p.df.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lastDs = 36L
    preds.foreach { r =>
      val id = r.getString(0)
      // replay the diff(1,7) naive recursion in scala doubles: transformed
      // naive repeats the last transformed value; scaler is affine so the
      // inverse reconstruction reduces to the diff recursion on raw values
      val y = (t: Long) => hist((id, t))
      val d2 = (t: Long) => (y(t) - y(t - 1)) - (y(t - 7) - y(t - 8))
      val lastD2 = d2(lastDs)
      val step = r.getLong(1) - lastDs
      // undo diff(7) on the constant-d2 prediction stream, then diff(1)
      val d1 = (t: Long) => y(t) - y(t - 1)
      var expected = Map.empty[Long, Double]
      val d1ext = scala.collection.mutable.Map[Long, Double]()
      for (s <- 1L to 3L)
        d1ext(lastDs + s) = d1(lastDs + s - 7) + lastD2
      val yext = scala.collection.mutable.Map[Long, Double]()
      for (s <- 1L to 3L)
        yext(lastDs + s) = yext.getOrElse(lastDs + s - 1,
          y(math.min(lastDs + s - 1, lastDs))) + d1ext(lastDs + s)
      expected = yext.toMap
      assert(math.abs(r.getDouble(2) - expected(r.getLong(1))) < 1e-9,
        s"fused inverse mismatch at $id step $step")
    }
  }
}
