package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, MLForecast, Models}
import graft.functions.RollingMean
import graft.operators.FeatureSpec
import graft.sources.Panels

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full pipeline (diff transform, lag/rolling features,
    * seasonal-naive + linear models, recursive h=7 predict) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val panel = Panels.densePanel(spark, "/root/testdata/sf0.001")
    val conf = MLForecast(
      models = Seq(Models.seasonalNaive(7), graft.forecast.SparkLinearRegression()),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(1, 7), lagTransforms = Map(1 -> Seq(RollingMean(7)))),
      targetTransforms = Seq(Differences(Seq(1))))
    conf.fit(panel).predict(7)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    OracleQueries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    OracleQueries.all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
