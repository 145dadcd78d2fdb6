package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.functions._
import graft.operators.{FeatureSpec, Featurizer}

class LagTransformsSpec extends SparkSpec {
  import spark.implicits._

  // Two series on an integer time axis, gap-free.
  // a: y = 1..8 at ds 0..7;  b: y = 10,20,30,40 at ds 0..3
  def panel: PanelFrame = {
    val rows = (0 until 8).map(i => ("a", i.toLong, (i + 1).toDouble)) ++
      (0 until 4).map(i => ("b", i.toLong, (i + 1) * 10.0))
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  def colOf(df: DataFrame, id: String, name: String): Seq[Option[Double]] =
    df.filter($"unique_id" === id).orderBy("ds")
      .select(col(s"`$name`").cast("double")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("plain lag") {
    val out = Featurizer.addFeatures(panel, FeatureSpec(lags = Seq(1, 2)))
    assertSeqAlmost(colOf(out, "a", "lag1"),
      Seq(None, Some(1), Some(2), Some(3), Some(4), Some(5), Some(6), Some(7)))
    assertSeqAlmost(colOf(out, "b", "lag2"), Seq(None, None, Some(10), Some(20)))
  }

  test("rolling mean with min_samples") {
    val spec = FeatureSpec(lagTransforms = Map(
      1 -> Seq(RollingMean(3), RollingMean(3, minSamples = Some(1)))))
    val out = Featurizer.addFeatures(panel, spec)
    // window = ds-3..ds-1, full window required
    assertSeqAlmost(colOf(out, "a", "rolling_mean_lag1_window_size3"),
      Seq(None, None, None, Some(2), Some(3), Some(4), Some(5), Some(6)))
    assertSeqAlmost(colOf(out, "a", "rolling_mean_lag1_window_size3_min_samples1"),
      Seq(None, Some(1), Some(1.5), Some(2), Some(3), Some(4), Some(5), Some(6)))
  }

  test("rolling std matches sample std") {
    val spec = FeatureSpec(lagTransforms = Map(1 -> Seq(RollingStd(3))))
    val out = Featurizer.addFeatures(panel, spec)
    // values 1,2,3 -> std 1
    assertSeqAlmost(colOf(out, "a", "rolling_std_lag1_window_size3"),
      Seq(None, None, None, Some(1), Some(1), Some(1), Some(1), Some(1)))
  }

  test("rolling min/max/quantile") {
    val spec = FeatureSpec(lagTransforms = Map(
      2 -> Seq(RollingMin(2), RollingMax(2), RollingQuantile(0.5, 2))))
    val out = Featurizer.addFeatures(panel, spec)
    assertSeqAlmost(colOf(out, "a", "rolling_min_lag2_window_size2"),
      Seq(None, None, None, Some(1), Some(2), Some(3), Some(4), Some(5)))
    assertSeqAlmost(colOf(out, "a", "rolling_max_lag2_window_size2"),
      Seq(None, None, None, Some(2), Some(3), Some(4), Some(5), Some(6)))
    assertSeqAlmost(colOf(out, "a", "rolling_quantile_lag2_p0.5_window_size2"),
      Seq(None, None, None, Some(1.5), Some(2.5), Some(3.5), Some(4.5), Some(5.5)))
  }

  test("expanding mean/std/min/max") {
    val spec = FeatureSpec(lagTransforms = Map(1 -> Seq(
      ExpandingMean(), ExpandingStd(), ExpandingMin(), ExpandingMax())))
    val out = Featurizer.addFeatures(panel, spec)
    assertSeqAlmost(colOf(out, "a", "expanding_mean_lag1"),
      Seq(None, Some(1), Some(1.5), Some(2), Some(2.5), Some(3), Some(3.5), Some(4)))
    assertSeqAlmost(colOf(out, "b", "expanding_max_lag1"),
      Seq(None, Some(10), Some(20), Some(30)))
    // expanding std of 1,2 = sqrt(0.5)
    assert(math.abs(colOf(out, "a", "expanding_std_lag1")(2).get - math.sqrt(0.5)) < 1e-12)
    assert(colOf(out, "a", "expanding_std_lag1")(1).isEmpty) // single obs -> null
  }

  test("seasonal rolling mean") {
    // season 2, window 2 at lag 1: values at ds-1 and ds-3
    val spec = FeatureSpec(lagTransforms = Map(
      1 -> Seq(SeasonalRollingMean(2, 2, minSamples = Some(1)))))
    val out = Featurizer.addFeatures(panel, spec)
    val name = "seasonal_rolling_mean_lag1_season_length2_window_size2_min_samples1"
    // a: ds=0 -> none; ds=1 -> y(0)=1; ds=2 -> y(1)=2; ds=3 -> (y(2)+y(0))/2 = 2
    assertSeqAlmost(colOf(out, "a", name).take(4),
      Seq(None, Some(1), Some(2), Some(2)))
  }

  test("ewm matches recursive definition") {
    val spec = FeatureSpec(lagTransforms = Map(
      1 -> Seq(ExponentiallyWeightedMean(0.5))))
    val out = Featurizer.addFeatures(panel, spec)
    // e(1)=1; e(2)=.5*2+.5*1=1.5; e(3)=.5*3+.5*1.5=2.25 ...
    assertSeqAlmost(colOf(out, "a", "exponentially_weighted_mean_lag1_alpha0.5").take(5),
      Seq(None, Some(1), Some(1.5), Some(2.25), Some(3.125)))
  }

  test("offset and combine") {
    val spec = FeatureSpec(lagTransforms = Map(1 -> Seq(
      Offset(RollingMean(2), 1),
      Combine(Lag(), Offset(Lag(), 1), "truediv"))))
    val out = Featurizer.addFeatures(panel, spec)
    // Offset(RollingMean(2),1) at lag1 == RollingMean(2) at lag2
    assertSeqAlmost(colOf(out, "a", "rolling_mean_lag2_window_size2"),
      Seq(None, None, None, Some(1.5), Some(2.5), Some(3.5), Some(4.5), Some(5.5)))
    // lag1/lag2
    assertSeqAlmost(colOf(out, "a", "lag1_truediv_lag2").take(4),
      Seq(None, None, Some(2.0), Some(1.5)))
  }

  test("global pooled rolling mean aggregates across series") {
    val spec = FeatureSpec(lagTransforms = Map(
      1 -> Seq(RollingMean(2, minSamples = Some(1), pooling = Pooling(global = true)))))
    val out = Featurizer.addFeatures(panel, spec)
    val name = "global_rolling_mean_lag1_window_size2_min_samples1"
    // global bucket rows at ds-1, ds-2 across both series:
    // ds=1: rows at ds0 = {1,10} -> 5.5 ; ds=2: ds0..1 = {1,10,2,20} -> 8.25
    assertSeqAlmost(colOf(out, "a", name).take(3), Seq(None, Some(5.5), Some(8.25)))
    assertSeqAlmost(colOf(out, "b", name).take(3), Seq(None, Some(5.5), Some(8.25)))
  }

  test("groupby pooled with time_agg=sum") {
    // give each series a group: a,b in same group g1
    val rows = (0 until 4).map(i => ("a", i.toLong, 1.0, "g1")) ++
      (0 until 4).map(i => ("b", i.toLong, 2.0, "g1"))
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y", "grp"),
      freq = Freq.IntFreq(1), staticCols = Seq("grp"))
    val spec = FeatureSpec(lagTransforms = Map(1 -> Seq(
      RollingMean(2, minSamples = Some(1),
        pooling = Pooling(groupby = Seq("grp"), timeAgg = Some("sum"))))))
    val out = Featurizer.addFeatures(p, spec)
    val name = "groupby_grp_rolling_mean_lag1_window_size2_min_samples1_time_aggsum"
    // per-ts sums = 3.0 at every ds; rolling mean of sums = 3.0
    assertSeqAlmost(colOf(out, "a", name).take(3), Seq(None, Some(3), Some(3)))
  }

  test("local partition mode leaves holes (parent calendar)") {
    // one series, partition col present only on some timestamps
    val rows = Seq(
      ("a", 0L, 1.0, "x"), ("a", 1L, 2.0, "y"), ("a", 2L, 3.0, "x"),
      ("a", 3L, 4.0, "x"), ("a", 4L, 5.0, "y"))
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y", "part"), freq = Freq.IntFreq(1))
    val spec = FeatureSpec(lagTransforms = Map(1 -> Seq(
      RollingMean(2, pooling = Pooling(partitionBy = Seq("part"))))))
    val out = Featurizer.addFeatures(p, spec)
    val name = "partby_part_rolling_mean_lag1_window_size2"
    // bucket (a,x) rows at ds 0,2,3 over parent calendar 0..4; window = {ds-1, ds-2}
    // ds=0: {} -> null(min_samples=1 default but empty) ; ds=2: {ds1? not x, ds0=1} -> 1
    // ds=3: {ds2=3, ds1 not x} -> 3 ... wait window at ds=3 is ds1,ds2 -> {3} -> 3
    val got = out.filter($"part" === "x").orderBy("ds").select(col(name)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assertSeqAlmost(got, Seq(None, Some(1.0), Some(3.0)))
  }

  test("global rolling quantile uses blocked evaluation and matches brute force") {
    // 2 series x 40 timestamps: global window pools across series per
    // timestamp ordinal; block size forces multiple ordinal blocks only at
    // larger data, but correctness of the overlap must hold regardless
    val rows = for (id <- Seq("a", "b"); t <- 0L until 40L)
      yield (id, t, ((t * 13 + (if (id == "a") 0 else 5)) % 17).toDouble)
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
    val tf = RollingQuantile(0.5, 4, pooling = Pooling(global = true))
    val out = Featurizer.addFeatures(p, FeatureSpec(lagTransforms = Map(1 -> Seq(tf))))
      .select($"unique_id", $"ds", col(s"`${tf.name(1)}`").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    // brute force: values at ordinals [t-4, t-1] across BOTH series
    val byOrd = rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    def expected(t: Long): Option[Double] = {
      val vals = (math.max(0L, t - 4) to t - 1).flatMap(o => byOrd.getOrElse(o, Nil)).sorted
      if (vals.length < 4) None
      else {
        val pos = 0.5 * (vals.length - 1)
        val (lo, hi) = (pos.toInt, math.ceil(pos).toInt)
        Some(vals(lo) * (1 - (pos - lo)) + vals(hi) * (pos - lo))
      }
    }
    out.foreach { case (id, t, got) =>
      assert(got == expected(t), s"($id, $t): got $got want ${expected(t)}")
    }
    // the plan must not contain an unpartitioned window over raw rows
    val plan = Featurizer.addFeatures(p, FeatureSpec(lagTransforms = Map(1 -> Seq(tf))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition(_w"),
      "blocked evaluation should partition the window")
  }

  test("unbounded non-decomposable global transform fails fast") {
    val rows = Seq(("a", 0L, 1.0), ("a", 1L, 2.0))
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
    val tf = ExpandingQuantile(0.5, pooling = Pooling(global = true))
    val e = intercept[IllegalArgumentException] {
      Featurizer.addFeatures(p, FeatureSpec(lagTransforms = Map(1 -> Seq(tf))))
    }
    assert(e.getMessage.contains("partition_by"))
  }

  test("date features") {
    val rows = Seq(("a", java.sql.Date.valueOf("2024-01-01"), 1.0),
                   ("a", java.sql.Date.valueOf("2024-01-02"), 2.0))
    val p = PanelFrame(rows.toDF("unique_id", "ds", "y"))
    val out = Featurizer.addFeatures(p, FeatureSpec(dateFeatures =
      Seq("dayofweek", "month", "year", "is_month_start", "week")))
    val r = out.orderBy("ds").collect()
    assert(r(0).getAs[Int]("dayofweek") == 0) // 2024-01-01 is a Monday
    assert(r(1).getAs[Int]("dayofweek") == 1)
    assert(r(0).getAs[Int]("is_month_start") == 1)
    assert(r(0).getAs[Int]("week") == 1)
  }
}
