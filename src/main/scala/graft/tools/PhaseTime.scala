package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Freq
import graft.forecast.{MLForecast, Models}
import graft.operators.FeatureSpec
import graft.sources.Panels

/** One-off phase timer for the cv-interval workload: splits panel build /
  * fit / interval CV / metric aggregations so wall regressions localize.
  * Diagnostic only — not part of the driver contract.
  */
object PhaseTime {
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
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val conf = MLForecast(
      models = Seq(Models.seasonalNaive(7)),
      freq = Freq.IntFreq(1),
      spec = FeatureSpec(lags = Seq(7)))
    // warm
    mat(Panels.densePanel(spark, sfDir).df)
    mat(conf.fit(Panels.densePanel(spark, sfDir))
      .crossValidationWithIntervals(nWindows = 2, h = 7, levels = Seq(80)))
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      val p = time("panel")(Panels.densePanel(spark, sfDir))
      val fitted = time("fit")(conf.fit(p))
      val cv = time("cv_intervals(mat)") {
        val c = fitted.crossValidationWithIntervals(nWindows = 2, h = 7,
          levels = Seq(80)).localCheckpoint(false)
        mat(c); c
      }
      val im = graft.forecast.Losses.intervalMetricsById(
        cv, "unique_id", "ds", "y", Seq("seasonal_naive7"), Seq(80))
      time("intervalMetricsById")(mat(im))
      val ql = graft.forecast.Losses.quantileLossById(cv, "unique_id", "ds",
        "y", Seq(0.1 -> "seasonal_naive7-lo-80", 0.9 -> "seasonal_naive7-hi-80"))
      time("quantileLossById")(mat(ql))
      time("join")(mat(im.join(ql, Seq("unique_id"))))
    }

    // r13: the benchPredict workload split fit / predict (run with a
    // second arg "benchpredict"), with a per-SQL-execution trace
    if (args.lift(1).contains("benchpredict")) {
      import graft.core.PanelFrame
      import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
      val starts = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
      val order = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, String, Double)]())
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
          event match {
            case s: SparkListenerSQLExecutionStart =>
              starts.put(s.executionId, (s.description, s.time))
            case e: SparkListenerSQLExecutionEnd =>
              Option(starts.get(e.executionId)).foreach { case (d, t0) =>
                order.add((e.executionId, d, (e.time - t0) / 1e3))
              }
            case _ => ()
          }
      })
      mat(graft.Bench.benchPredict(spark, sfDir)) // warm
      (1 to 2).foreach { round =>
        println(s"-- benchpredict round $round")
        order.clear()
        val panel = time("panel")(
          PanelFrame(Panels.lineitemDaily(spark, sfDir), freq = Freq.Day))
        val conf = graft.Bench.benchWorkloadConf()
        val fitted = time("fit")(conf.fit(panel))
        time("predict(mat)")(mat(fitted.predict(14)))
        org.apache.spark.sql.graft.bridge.waitForListeners(spark)
        order.forEach { case (id, desc, sec) =>
          println(f"  [$id%3d] $sec%7.3f s  ${desc.linesIterator.next().take(100)}")
        }
      }
    }
    spark.stop()
  }
}
