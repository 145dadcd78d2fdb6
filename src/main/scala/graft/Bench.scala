package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, LocalStandardScaler, MLForecast, Models, SparkLinearRegression}
import graft.functions.{ExpandingMean, ExponentiallyWeightedMean, RollingMax, RollingMean, RollingMin}
import graft.operators.FeatureSpec
import graft.sources.Panels

/** Benchmark main. Each query is materialized through the noop sink (NOT
  * `.count()`, which would let Catalyst prune the very window expressions
  * being timed). Besides the oracle queries it times the two BASELINE.md
  * workload shapes (tests/test_pipeline.py:21-103 in the reference):
  * preprocess with 13 lag/window features + date features + target
  * transforms, and a recursive h=14 predict with exog + keep_last_n.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Local measurement: the panels here are MBs, so AQE's size-based
      // partition coalescing collapses every stage to 3-5 tasks and idles
      // the other cores. Production sessions keep the default (coalescing
      // is right when partitions are ~100MB).
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Untimed JVM/codegen warmup so the first timed query isn't charged for
    // session initialization (panel build + the other parquet sources). A
    // warmup failure must not abort the benchmark — the timed queries
    // degrade per-query, so the warmup does too.
    def warm(body: => Unit): Unit =
      try body catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warmup failed: ${e.getMessage}")
      }
    warm { materialize(Panels.densePanel(spark, sfDir).df) }
    warm { materialize(spark.read.parquet(s"$sfDir/documents.parquet")) }
    warm { materialize(spark.read.parquet(s"$sfDir/embeddings.parquet")) }
    // The pipeline code paths (fit/predict/CV/conformal/auto-transforms) pay
    // one-time class-loading + codegen + MLlib solver init of several seconds
    // on first use; run them once on a toy panel so the first pipeline query
    // in alphabetical order doesn't absorb it.
    warm {
      import graft.forecast.{AutoDifferences, Conformal}
      val warm = spark.range(0, 80).select(
        (col("id") % 2).cast("string").as("unique_id"),
        (col("id") / 2).cast("long").as("ds"),
        ((col("id") * 7919) % 23).cast("double").as("y"))
      val wp = PanelFrame(warm, freq = Freq.IntFreq(1))
      val conf = MLForecast(
        Seq(SparkLinearRegression(), Models.seasonalNaive(7)), Freq.IntFreq(1),
        FeatureSpec(lags = Seq(1, 7), lagTransforms = Map(1 -> Seq(RollingMean(7)))),
        targetTransforms = Seq(Differences(Seq(1))))
      val f = conf.fit(wp)
      materialize(f.predict(3))
      val cv = f.crossValidation(nWindows = 2, h = 3)
      materialize(Conformal.conformityScores(cv, "unique_id", "ds", "y",
        Seq("seasonal_naive7")))
      materialize(AutoDifferences(1).fit(wp).transformed.df)
    }

    // None = the query failed. Failures must NOT fold into the totals (a
    // crashing query would otherwise IMPROVE the reported benchmark) — they
    // are listed by name on the contract line instead. Only NonFatal is
    // swallowed: after an OutOfMemoryError every later timing is garbage,
    // so fatal errors abort the run.
    def time(body: => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { materialize(body); Some((System.nanoTime() - t0) / 1e9) }
      catch { case scala.util.control.NonFatal(_) => None }
    }

    // Optional args = query-name filter (local iteration); the driver runs
    // with no args and times everything.
    val only = args.toSet
    def wanted(name: String): Boolean = only.isEmpty || only.contains(name)

    val attempts =
      SparkEntry.queries.toSeq.sortBy(_._1).collect {
        case (name, fn) if wanted(name) => name -> time(fn(spark, sfDir))
      } ++
        Seq(
          "bench_preprocess_13feat" -> (() => benchPreprocess(spark, sfDir)),
          "bench_predict_h14" -> (() => benchPredict(spark, sfDir)),
          "bench_predict_h14_unbounded" -> (() => benchPredictUnbounded(spark, sfDir)),
        ).collect { case (name, fn) if wanted(name) => name -> time(fn()) }

    val results = attempts.collect { case (n, Some(t)) => n -> t }
    val failed = attempts.collect { case (n, None) => n }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val sfName = new java.io.File(sfDir).getName

    // Full per-query detail (full precision) goes to a repo file; the
    // stdout contract is ONE short JSON line. The line must survive the
    // harness's tail capture (last ~2000 chars of the log), so it carries
    // the slowest queries individually and rolls the rest into __other.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfName","n_queries":${results.size}$failedJson}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"), fullJson)
    catch { case _: Throwable => () }

    // Locale.ROOT: f"%.2f" under a comma-decimal default locale would emit
    // invalid JSON
    def r2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
    val bySlow = results.sortBy(-_._2)
    val (head35, rest) = bySlow.splitAt(35)
    val shown = head35.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + r2(v) }
    val other =
      if (rest.isEmpty) Nil
      else List("\"__other_" + rest.size + "_fastest\":" + r2(rest.map(_._2).sum))
    val qs = (shown ++ other).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":$qs,"sf":"$sfName","detail":"bench_full.json"$failedJson}""")
    spark.stop()
  }

  /** BASELINE preprocess shape: lags [1,7,14,28], rolling mean at each lag +
    * rolling min/max — 13 features — plus 4 date features and
    * Differences([1,7]) + LocalStandardScaler target transforms.
    */
  private def workloadConf(models: Seq[graft.forecast.ForecastModel]): MLForecast =
    MLForecast(
      models = models,
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

  def benchPreprocess(spark: SparkSession, dir: String): DataFrame = {
    val panel = PanelFrame(Panels.lineitemDaily(spark, dir), freq = Freq.Day)
    workloadConf(Nil).preprocess(panel)
  }

  def benchPredict(spark: SparkSession, dir: String): DataFrame = {
    val panel = PanelFrame(Panels.lineitemDaily(spark, dir), freq = Freq.Day)
    val conf = workloadConf(Seq(SparkLinearRegression(), Models.seasonalNaive(7)))
    conf.fit(panel).predict(14)
  }

  /** Unbounded-transform predict (M4-hourly-style EWM + expanding spec):
    * exercises the incremental updates_only state carry — without it every
    * step re-windows the full history.
    */
  def benchPredictUnbounded(spark: SparkSession, dir: String): DataFrame = {
    val panel = PanelFrame(Panels.lineitemDaily(spark, dir), freq = Freq.Day)
    val conf = MLForecast(
      models = Seq(SparkLinearRegression(), Models.naive),
      freq = Freq.Day,
      spec = FeatureSpec(
        lags = Seq(1, 7),
        lagTransforms = Map(
          1 -> Seq(ExponentiallyWeightedMean(0.3), ExpandingMean()),
          7 -> Seq(RollingMean(7)))))
    conf.fit(panel).predict(14)
  }
}
