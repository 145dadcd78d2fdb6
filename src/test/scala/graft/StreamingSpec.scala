package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast._
import graft.operators.FeatureSpec
import graft.streaming.StreamingUpdate

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming update equals batch fit-on-full through predict") {
    val pattern = Array(10.0, 20, 30, 40, 50, 60, 70)
    def rows(from: Int, until: Int) =
      for (id <- Seq("a", "b"); t <- from until until)
        yield (id, t.toLong, pattern(t % 7) + (if (id == "a") 0 else 100))

    val initial = PanelFrame(rows(0, 28).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val mlf = MLForecast(Seq(Models.seasonalNaive(7)), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(7)))
    @volatile var latest: FittedMLForecast = mlf.fit(initial)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val stream = input.toDF.toDF("unique_id", "ds", "y")
    val q = StreamingUpdate.attach(latest, stream, validateNewData = true) {
      (_, f) => latest = f
    }
    try {
      input.addData(rows(28, 31))
      q.processAllAvailable()
      input.addData(rows(31, 35))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = latest.predict(5).orderBy("unique_id", "ds").collect().toSeq
    val full = mlf.fit(PanelFrame(rows(0, 35).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))).predict(5)
      .orderBy("unique_id", "ds").collect().toSeq
    assert(streamed == full)
  }

  test("event panel stream aggregates per user-day with event-time windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = input.toDF.toDF("user_id", "ts", "value")
    val panel = StreamingUpdate.eventPanelStream(events, "user_id", "ts", "value")
    val q = panel.writeStream.outputMode("complete")
      .format("memory").queryName("panel_sink").start()
    try {
      input.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2.0),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 15:00:00"), 3.0),
        (2L, java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT * FROM panel_sink ORDER BY unique_id, ds").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("y") == 5.0)
    assert(out(1).getAs[Long]("n_events") == 1 && out(1).getAs[Double]("y") == 5.0)
  }
}
