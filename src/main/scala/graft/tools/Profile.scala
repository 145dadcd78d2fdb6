package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, LocalStandardScaler, MLForecast, Models, SparkLinearRegression}
import graft.functions.{RollingMax, RollingMean, RollingMin}
import graft.operators.FeatureSpec
import graft.sources.Panels

/** Phase-level timing for the BASELINE workload shapes — splits fit /
  * predict / inverse so bench regressions can be localized. Not part of the
  * driver contract; run with `runMain graft.tools.Profile [sfDir]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warmup mirrors Bench
    mat(Panels.densePanel(spark, sfDir).df)
    val panel = PanelFrame(Panels.lineitemDaily(spark, sfDir), freq = Freq.Day)
    val conf = MLForecast(
      models = Seq(SparkLinearRegression(), Models.seasonalNaive(7)),
      freq = Freq.Day,
      spec = FeatureSpec(
        lags = Seq(1, 7, 14, 28),
        lagTransforms = Map(
          1 -> Seq(RollingMean(7), RollingMin(7), RollingMax(7)),
          7 -> Seq(RollingMean(7), RollingMin(7), RollingMax(7)),
          14 -> Seq(RollingMean(7)),
          28 -> Seq(RollingMean(7)),
        ),
        dateFeatures = Seq("dayofweek", "month", "year", "day")),
      targetTransforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler()))

    // one untimed full pass (class loading / codegen), then timed phases
    time("first full fit+predict") { mat(conf.fit(panel).predict(14)) }
    val fitted = time("fit") { conf.fit(panel) }
    time("predict h=14") { mat(fitted.predict(14)) }
    time("predict h=14 again") { mat(fitted.predict(14)) }
    time("fit again") { conf.fit(panel) }
    time("preprocess only") { mat(conf.preprocess(panel)) }
    spark.stop()
  }
}
