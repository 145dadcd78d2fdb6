package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{MLForecast, Models}
import graft.functions.RollingMean
import graft.operators.FeatureSpec

/** Scale smoke for the keyed-state streaming forecaster: N series × L rows
  * of history seed the state, then one micro-batch appends a row per series
  * and the h-step re-forecast is timed. Run:
  * `sbt "runMain graft.tools.StreamSmoke [nSeries] [len]"`.
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toInt).getOrElse(20000)
    val len = args.lift(1).map(_.toInt).getOrElse(280)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val panel = PanelFrame(
      spark.range(nSeries.toLong * len).select(
        (col("id") % nSeries).cast("string").as("unique_id"),
        (col("id") / nSeries).cast("long").as("ds"),
        ((col("id") * 7919) % 97).cast("double").as("y")),
      freq = Freq.IntFreq(1))
    val mlf = MLForecast(
      Seq(Models.naive, Models.seasonalNaive(7)), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1, 7), lagTransforms = Map(1 -> Seq(RollingMean(7)))))

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[smoke] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val fitted = time(s"fit ($nSeries series x $len)") { mlf.fit(panel) }

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)](
      implicitly[org.apache.spark.sql.Encoder[(String, Long, Double)]], spark)
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 7)
    val q = time("attach + state seed plan") {
      fc.writeStream.outputMode("append").format("noop").start()
    }
    try {
      val batch = (0 until nSeries).map(i => (i.toString, len.toLong, 42.0))
      input.addData(batch)
      time(s"micro-batch: $nSeries appends -> h=7 re-forecast") {
        q.processAllAvailable()
      }
      input.addData((0 until nSeries).map(i => (i.toString, len + 1L, 43.0)))
      time("second micro-batch (state warm)") { q.processAllAvailable() }
    } finally q.stop()
    spark.stop()
  }
}
