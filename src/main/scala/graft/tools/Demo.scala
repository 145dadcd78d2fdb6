package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core._
import graft.functions._
import graft.operators._

/** Dev drive: exercises the public API end-to-end on the driver-provided
  * testdata. `sbt "runMain graft.tools.Demo [sfDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val panel0 = li.groupBy(col("l_suppkey").as("unique_id"),
      to_date(col("l_shipdate")).as("ds")).agg(sum("l_quantity").as("y"))

    val pDaily = PanelFrame(panel0, freq = Freq.Day)
    println(s"== continuity violations on raw daily panel (gaps expected): " +
      s"${Validation.continuityViolations(pDaily).count()} series ==")

    // Gap-free panel: per-series observation index as integer time axis.
    val dense = panel0.withColumn("ds",
      (row_number().over(Window.partitionBy("unique_id").orderBy("ds")) - 1).cast("long"))
    val p = PanelFrame(dense, freq = Freq.IntFreq(1))
    println(s"== dense panel continuity violations (expected 0): " +
      s"${Validation.continuityViolations(p).count()} ==")

    val spec = FeatureSpec(
      lags = Seq(1, 7),
      lagTransforms = Map(
        1 -> Seq(RollingMean(7), ExpandingMean(), ExponentiallyWeightedMean(0.5),
          RollingMean(7, minSamples = Some(1),
            pooling = Pooling(global = true, timeAgg = Some("mean")))),
        7 -> Seq(RollingStd(7), SeasonalRollingMean(7, 2, Some(1)))))

    val out = Featurizer.addFeatures(p, spec)
    println("== feature columns ==")
    println(spec.featureNames.mkString(", "))
    println("== sample (one series, last 5 rows) ==")
    out.filter(col("unique_id") === out.select(min("unique_id")).head().getLong(0))
      .orderBy(col("ds").desc).limit(5).show(false)
    println("== non-null feature counts ==")
    out.select(count(lit(1)).as("rows") +:
      spec.featureNames.map(n => count(col(s"`$n`")).as(n)): _*).show(false)

    println("== physical plan (local window group) ==")
    Featurizer.addFeatures(p, FeatureSpec(lags = Seq(1),
      lagTransforms = Map(1 -> Seq(RollingMean(7), RollingStd(7))))).explain("formatted")

    // Full pipeline drive: fit two models, recursive 7-step predict, CV,
    // conformal intervals — on the dense panel derived from real lineitem.
    import graft.forecast._
    val mlf = MLForecast(
      models = Seq(SparkLinearRegression(), Models.seasonalNaive(7)),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1, 7),
        lagTransforms = Map(1 -> Seq(RollingMean(7, minSamples = Some(1))))),
      targetTransforms = Seq(Differences(Seq(1))))
    val fitted = mlf.fit(p)
    val preds = fitted.predict(7)
    println("== predict(7): " + preds.count() + " rows ==")
    preds.orderBy("unique_id", "ds").show(10, truncate = false)
    val cv = fitted.crossValidation(nWindows = 2, h = 7, refit = false)
    println("== cv rows: " + cv.count() + " ==")
    cv.select(avg(abs(col("y") - col("lr"))).as("mae_lr"),
      avg(abs(col("y") - col("seasonal_naive7"))).as("mae_sn")).show(false)
    val scores = Conformal.conformityScores(cv, "unique_id", "ds", "y", Seq("lr"))
    val withIv = Conformal.addIntervals(preds, scores, "unique_id", "ds", Seq("lr"), Seq(90))
    println("== intervals sample ==")
    withIv.orderBy("unique_id", "ds").select("unique_id", "ds", "lr", "lr-lo-90", "lr-hi-90")
      .show(5, truncate = false)

    // Round-5 surfaces: panel hygiene + diagnostics, intermittent-demand
    // baselines, champion routing, hierarchical reconciliation, ACI.
    import graft.operators.{Outliers, Reconcile, Stats}
    println("== hampel outliers (flagged rows) ==")
    val ham = Outliers.hampel(p, k = 3)
    ham.filter(col("is_outlier")).select("unique_id", "ds", "y", "med", "mad")
      .show(5, truncate = false)
    println("== seasonal decomposition strengths ==")
    Stats.strengths(p, period = 7).orderBy("unique_id").show(5, truncate = false)
    println("== intermittency classes ==")
    Stats.intermittencyStats(p).groupBy("demand_class").count().show(false)
    println("== SES / Croston / TSB baselines, h=3 ==")
    MLForecast(Seq(Models.ses(0.3), Models.croston(0.3), Models.tsb(0.3, 0.3)),
      Freq.IntFreq(1), FeatureSpec(lags = Seq(1)))
      .fit(p).predict(3).orderBy("unique_id", "ds").show(6, truncate = false)
    println("== champion routing from the CV ==")
    val champs = graft.forecast.Losses.championByLoss(cv, "unique_id", "y",
      Seq("lr", "seasonal_naive7"), "mae")
    champs.groupBy("champion").count().show(false)
    println("== bottom-up reconciliation to nations ==")
    val mapping = graft.sources.Panels.supplierStatics(spark, sfDir)
    Reconcile.bottomUp(
      preds.select(col("unique_id"), col("ds"), col("lr").as("yhat")),
      mapping, "unique_id", "nation", "ds", "yhat")
      .orderBy("nation", "ds").show(5, truncate = false)
    println("== adaptive conformal path (one series) ==")
    val aci = Conformal.aciPath(
      cv.select(col("unique_id"), abs(col("y") - col("lr")).as("score")),
      cv.select(col("unique_id"), col("ds"), col("y"), col("lr").as("yhat")),
      "unique_id", "ds", "y", "yhat", "score", alpha = 0.1, gamma = 0.05)
    aci.filter(col("unique_id") === aci.select(min("unique_id")).head().getLong(0))
      .orderBy("ds").select("ds", "alpha_t", "qhat", "err").show(7, truncate = false)

    spark.stop()
  }
}
