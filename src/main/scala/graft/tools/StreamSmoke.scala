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

    // Interval-bound variant: same keyed state; each emission joins the
    // attach-time (series, step) quantile table (broadcast stream-static)
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)](
      implicitly[org.apache.spark.sql.Encoder[(String, Long, Double)]], spark)
    val fci = time("attachWithIntervals calibration") {
      graft.streaming.StreamingForecast.attachWithIntervals(
        fitted, input2.toDF.toDF("unique_id", "ds", "y"), h = 7,
        levels = Seq(80))
    }
    val qi = fci.writeStream.outputMode("append").format("noop").start()
    try {
      input2.addData((0 until nSeries).map(i => (i.toString, len.toLong, 42.0)))
      time(s"interval micro-batch: $nSeries appends") { qi.processAllAvailable() }
      input2.addData((0 until nSeries).map(i => (i.toString, len + 1L, 43.0)))
      time("interval micro-batch (warm)") { qi.processAllAvailable() }
    } finally qi.stop()

    // Streaming near-dup dedup smoke: nDocs synthetic ~30-token docs, 10%
    // exact copies of their predecessor, streamed as two micro-batches
    // through the LSH bucket-claim dedup. Reports per-batch latency and
    // survivor counts (copies must be dropped in-batch and cross-batch).
    val nDocs = args.lift(2).map(_.toInt).getOrElse(50000)
    val gen = spark.range(nDocs.toLong).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0 && col("id") > 0, col("id") - 1)
          .otherwise(col("id")).as("__b"))
      .select(col("doc_id"), concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(hash(col("__b") * 31 + lit(j)), lit(5000))
          .cast("string"))): _*).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String)]], spark)
    val statePath = java.nio.file.Files.createTempDirectory("smoke_dedup").toString + "/buckets"
    var survived = 0L
    val dq = graft.streaming.StreamingDedup.nearFirstSeen(
      dIn.toDF.toDF("doc_id", "text"), "doc_id", "text", statePath) {
      (_, survivors) => survived += survivors.count()
    }
    try {
      val (b1, b2) = gen.splitAt(nDocs / 2)
      dIn.addData(b1.toSeq)
      time(s"dedup batch 1 (${b1.length} docs, cold)") { dq.processAllAvailable() }
      dIn.addData(b2.toSeq)
      time(s"dedup batch 2 (${b2.length} docs, state warm)") { dq.processAllAvailable() }
      val expected = gen.map(_._2).distinct.length
      println(s"[smoke] dedup survivors: $survived of $nDocs (distinct texts: $expected)")
      // every exact copy must drop; a handful of LSH false-positive drops
      // between genuinely distinct docs is the sketch working as designed
      require(survived <= expected && survived >= (expected * 0.99).toLong,
        s"streaming dedup survivor count off: $survived vs distinct=$expected")
    } finally dq.stop()
    spark.stop()
  }
}
