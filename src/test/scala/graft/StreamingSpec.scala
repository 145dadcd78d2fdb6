package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast._
import graft.functions.{RollingMax, RollingMean, SeasonalRollingMean}
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

  test("keyed-state streaming forecast matches batch predict after appends") {
    val pattern = Array(10.0, 20, 30, 40, 50, 60, 70)
    def rows(from: Int, until: Int) =
      for (id <- Seq("a", "b"); t <- from until until)
        yield (id, t.toLong, pattern(t % 7) + (if (id == "a") 0 else 100))

    val initial = PanelFrame(rows(0, 28).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val mlf = MLForecast(Seq(Models.seasonalNaive(7)), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(7)))
    val fitted = mlf.fit(initial)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val stream = input.toDF.toDF("unique_id", "ds", "y")
    val fc = graft.streaming.StreamingForecast.attach(fitted, stream, h = 5)
    val q = fc.writeStream.outputMode("append")
      .format("memory").queryName("fc_sink").start()
    try {
      input.addData(rows(28, 31))
      q.processAllAvailable()
      input.addData(rows(31, 35))
      q.processAllAvailable()
      // late/duplicate rows: dropped, no re-emission
      input.addData(rows(30, 33))
      q.processAllAvailable()
    } finally q.stop()

    // batch-2 emission = forecasts from origin ds=34 (DISTINCT because
    // batch 1's horizon also reaches ds=35 with the same seasonal value)
    val streamed = spark.sql(
      "SELECT DISTINCT unique_id, ds, seasonal_naive7 FROM fc_sink WHERE ds > 34 ORDER BY unique_id, ds")
      .collect().toSeq
    val full = mlf.fit(PanelFrame(rows(0, 35).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))).predict(5)
      .select(col("unique_id"), col("ds"), col("seasonal_naive7"))
      .orderBy("unique_id", "ds").collect().toSeq
    assert(streamed == full)
    // the late batch emitted nothing: every sink row comes from batches 1-2
    val n = spark.sql("SELECT COUNT(*) FROM fc_sink").collect().head.getLong(0)
    assert(n == 2 * 5 * 2) // 2 batches x h=5 x 2 series
  }

  test("streaming forecast intervals: attach-time calibration, hand-checked bounds") {
    val pattern = Array(10.0, 20, 30, 40, 50, 60, 70)
    // seasonal pattern + unit trend: y(t) - y(t-7) = 7 exactly, so every
    // attach-time conformity score is 7 and the 80% band is pred +/- 7
    def rows(from: Int, until: Int) =
      for (id <- Seq("a", "b"); t <- from until until)
        yield (id, t.toLong, pattern(t % 7) + t + (if (id == "a") 0.0 else 100.0))

    val initial = PanelFrame(rows(0, 28).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val mlf = MLForecast(Seq(Models.seasonalNaive(7)), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(7)))
    val fitted = mlf.fit(initial)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val stream = input.toDF.toDF("unique_id", "ds", "y")
    val fc = graft.streaming.StreamingForecast.attachWithIntervals(
      fitted, stream, h = 3, levels = Seq(80))
    val q = fc.writeStream.outputMode("append")
      .format("memory").queryName("fci_sink").start()
    try {
      input.addData(rows(28, 31))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.sql("SELECT * FROM fci_sink ORDER BY unique_id, ds").collect()
    assert(out.length == 2 * 3) // 2 series x h=3 from origin ds=30
    out.foreach { r =>
      val ds = r.getAs[Long]("ds")
      val off = if (r.getAs[String]("unique_id") == "a") 0.0 else 100.0
      // SNaive(7) prediction = ring value at ds-7 (an actual: h=3 < 7)
      val pred = pattern((ds % 7).toInt) + (ds - 7) + off
      assert(r.getAs[Double]("seasonal_naive7") == pred)
      assert(math.abs(r.getAs[Double]("seasonal_naive7-lo-80") - (pred - 7.0)) < 1e-12)
      assert(math.abs(r.getAs[Double]("seasonal_naive7-hi-80") - (pred + 7.0)) < 1e-12)
    }
    // a series with no attach-time history gets predictions but null bounds
    val input2 = MemoryStream[(String, Long, Double)]
    val fc2 = graft.streaming.StreamingForecast.attachWithIntervals(
      fitted, input2.toDF.toDF("unique_id", "ds", "y"), h = 2, levels = Seq(80))
    val q2 = fc2.writeStream.outputMode("append")
      .format("memory").queryName("fci_sink2").start()
    try {
      input2.addData(for (t <- 0 until 10) yield ("zz", t.toLong, 1.0 * t))
      q2.processAllAvailable()
    } finally q2.stop()
    val unseen = spark.sql("SELECT * FROM fci_sink2 WHERE unique_id = 'zz'").collect()
    assert(unseen.nonEmpty)
    assert(unseen.forall(r => r.isNullAt(r.fieldIndex("seasonal_naive7-lo-80"))))
  }

  test("streaming forecast admits gaps as missing values in the ring") {
    def rows(ts: Seq[Int]) = for (t <- ts) yield ("a", t.toLong, 1.0 * t)
    val initial = PanelFrame(rows(0 until 10).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1, 2)))
    val fitted = mlf.fit(initial)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val stream = input.toDF.toDF("unique_id", "ds", "y")
    val fc = graft.streaming.StreamingForecast.attach(fitted, stream, h = 2)
    val q = fc.writeStream.outputMode("append")
      .format("memory").queryName("gap_sink").start()
    try {
      input.addData(Seq(("a", 12L, 99.0))) // ds=10,11 skipped -> NaN fill
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.sql("SELECT ds, naive FROM gap_sink ORDER BY ds").collect()
    // ring tail: [..., 9, NaN, NaN, 99]; naive = lag1
    assert(out(0).getLong(0) == 13L && out(0).getDouble(1) == 99.0)
    // step 2's lag1 is step 1's prediction (99), so it stays 99
    assert(out(1).getLong(0) == 14L && out(1).getDouble(1) == 99.0)
  }

  test("streaming forecast snaps off-grid rows, caps corrupt gaps, keeps numeric ids") {
    // IntFreq(2) grid: step 2, numeric (Long) series ids
    val initial = PanelFrame(
      (for (t <- 0 until 10) yield (7L, 2L * t, 2.0 * t)).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(2))
    val mlf = MLForecast(Seq(Models.naive), Freq.IntFreq(2),
      FeatureSpec(lags = Seq(1)))
    val fitted = mlf.fit(initial)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 2)
    val q = fc.writeStream.outputMode("append").format("memory")
      .queryName("snap_sink").start()
    try {
      // last grid ds = 18; ds=21 is off-grid -> snaps down to 20
      input.addData(Seq((7L, 21L, 50.0)))
      q.processAllAvailable()
      // corrupt far-future timestamp: must not loop gap/step times
      input.addData(Seq((7L, 4_000_000_000L, 60.0)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.sql("SELECT unique_id, ds, naive FROM snap_sink ORDER BY ds").collect()
    assert(out.head.schema("unique_id").dataType.typeName == "long")
    // batch 1: origin snapped to 20 -> forecasts at 22, 24 with naive=50
    assert(out(0).getLong(0) == 7L && out(0).getLong(1) == 22L && out(0).getDouble(2) == 50.0)
    assert(out(1).getLong(1) == 24L && out(1).getDouble(2) == 50.0)
    // batch 2: origin snapped onto the grid anchored at 20; forecasts echo 60
    assert(out(2).getDouble(2) == 60.0 && (out(2).getLong(1) - 20L) % 2 == 0)
  }

  test("streaming forecast == batch predict on randomized specs, appends, and late series") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val lag = 1 + rnd.nextInt(3)
      val w = 2 + rnd.nextInt(3)
      val tfm = rnd.nextInt(3) match {
        case 0 => RollingMean(w)
        case 1 => RollingMax(w)
        case 2 => SeasonalRollingMean(2 + rnd.nextInt(2), 2)
      }
      val spec = FeatureSpec(lags = Seq(1, lag), lagTransforms = Map(lag -> Seq(tfm)))
      // echo the window feature itself: the streamed kernel IS the prediction
      val models = Seq(Models.naive, FeatureEcho("echo_t", spec.featureNames.last))
      val mlf = MLForecast(models, Freq.IntFreq(1), spec)

      val n = 36
      val y = Array.fill(3 * n)(rnd.nextInt(100).toDouble)
      def rows(ids: Seq[String], from: Int, until: Int) =
        for (id <- ids; t <- from until until)
          yield (id, t.toLong, y((Seq("a", "b", "c").indexOf(id)) * n + t))

      // a, b fit in batch; c arrives entirely through the stream
      val fitted = mlf.fit(PanelFrame(
        rows(Seq("a", "b"), 0, 30).toDF("unique_id", "ds", "y"),
        freq = Freq.IntFreq(1)))

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Double)]
      val fc = graft.streaming.StreamingForecast.attach(
        fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 3)
      val sink = s"sweep_sink_$seed"
      val q = fc.writeStream.outputMode("append").format("memory")
        .queryName(sink).start()
      try {
        input.addData(rows(Seq("a", "b"), 30, 33) ++ rows(Seq("c"), 0, 15))
        q.processAllAvailable()
        input.addData(rows(Seq("a", "b"), 33, n) ++ rows(Seq("c"), 15, n))
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark.sql(
        s"SELECT unique_id, ds, naive, echo_t FROM $sink WHERE ds > ${n - 1} ORDER BY unique_id, ds")
        .collect().toSeq
      val full = mlf.fit(PanelFrame(
        rows(Seq("a", "b", "c"), 0, n).toDF("unique_id", "ds", "y"),
        freq = Freq.IntFreq(1))).predict(3)
        .select(col("unique_id"), col("ds"), col("naive"), col("echo_t"))
        .orderBy("unique_id", "ds").collect().toSeq
      assert(streamed == full, s"seed=$seed spec=$spec")
    }
  }

  test("streaming forecast handles month frequency via month-ordinal encoding") {
    val start = java.time.LocalDate.of(2023, 1, 1)
    def d(i: Int) = java.sql.Date.valueOf(start.plusMonths(i.toLong))
    def rows(ids: Seq[String], from: Int, until: Int) =
      for (id <- ids; t <- from until until)
        yield (id, d(t), (t % 5).toDouble + (if (id == "b") 10.0 else 0.0))
    // month date feature echoed as a model: the forecast VALUES prove the
    // month-ordinal -> LocalDate mapping (incl. the December year rollover)
    val spec = FeatureSpec(lags = Seq(1),
      lagTransforms = Map(1 -> Seq(RollingMean(3))),
      dateFeatures = Seq("month"))
    val mlf = MLForecast(Seq(Models.naive, FeatureEcho("mth", "month")),
      Freq.Month, spec)
    val fitted = mlf.fit(PanelFrame(
      rows(Seq("a", "b"), 0, 21).toDF("unique_id", "ds", "y"), freq = Freq.Month))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Date, Double)]
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 3)
    val q = fc.writeStream.outputMode("append").format("memory")
      .queryName("month_sink").start()
    try {
      // batch-1 forecasts (origin = month 21) reach month 24 at most, so
      // filtering on ds > month 24 leaves only the final-state forecasts
      input.addData(rows(Seq("a", "b"), 21, 22))
      q.processAllAvailable()
      input.addData(rows(Seq("a", "b"), 22, 25))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql(
      s"SELECT unique_id, ds, naive, mth FROM month_sink WHERE ds > '${d(24)}' ORDER BY unique_id, ds")
      .collect().toSeq
    val full = mlf.fit(PanelFrame(
      rows(Seq("a", "b"), 0, 25).toDF("unique_id", "ds", "y"), freq = Freq.Month))
      .predict(3)
      .select(col("unique_id"), col("ds"), col("naive"), col("mth"))
      .orderBy("unique_id", "ds").collect().toSeq
    assert(streamed.nonEmpty && streamed == full)
    // forecast months cross the year boundary: Feb/Mar/Apr 2025
    assert(streamed.map(_.getAs[java.sql.Date]("ds").toLocalDate.getMonthValue).distinct
      .sorted == Seq(2, 3, 4))

    // mid-month seed panels are rejected (decode would shift their dates)
    val bad = PanelFrame(
      Seq(("x", java.sql.Date.valueOf("2023-01-15"), 1.0),
        ("x", java.sql.Date.valueOf("2023-02-15"), 2.0)).toDF("unique_id", "ds", "y"),
      freq = Freq.Month)
    val badFit = MLForecast(Seq(Models.naive), Freq.Month,
      FeatureSpec(lags = Seq(1))).fit(bad)
    val err = intercept[IllegalArgumentException] {
      graft.streaming.StreamingForecast.attach(
        badFit, input.toDF.toDF("unique_id", "ds", "y"), h = 1)
    }
    assert(err.getMessage.contains("month-start"))
  }

  test("streaming forecast hops weekends under business-day frequency") {
    val b = Freq.BusinessDayFreq(1)
    val start = java.time.LocalDate.of(2024, 7, 1) // a Monday
    def bd(i: Int) = { // i-th business day from start
      val weeks = i / 5
      java.sql.Date.valueOf(start.plusDays(weeks * 7L + (i % 5)))
    }
    val rows = for (t <- 0 until 14) yield ("s", bd(t), t.toDouble)
    val mlf = MLForecast(Seq(Models.naive), b, FeatureSpec(lags = Seq(1)))
    val fitted = mlf.fit(PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = b))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Date, Double)]
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 3)
    val q = fc.writeStream.outputMode("append").format("memory")
      .queryName("bday_sink").start()
    try {
      input.addData(Seq(("s", bd(14), 99.0))) // Friday 2024-07-19
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT ds, naive FROM bday_sink ORDER BY ds").collect()
    // forecasts from Friday bd(14)=2024-07-19: Mon 22, Tue 23, Wed 24
    assert(bd(14).toString == "2024-07-19")
    assert(out.map(_.getDate(0).toString).toSeq ==
      Seq("2024-07-22", "2024-07-23", "2024-07-24"))
    assert(out.forall(_.getDouble(1) == 99.0))
  }

  test("streaming forecast runs on a millisecond grid (epoch-milli encoding)") {
    val f = Freq.MilliFreq(250L)
    val base = 1704067200000L // 2024-01-01T00:00:00Z epoch millis
    def ts(i: Int) = new java.sql.Timestamp(base + i.toLong * 250L)
    val rows = for (t <- 0 until 12) yield ("s", ts(t), t.toDouble)
    val mlf = MLForecast(Seq(Models.naive), f, FeatureSpec(lags = Seq(1)))
    val fitted = mlf.fit(PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = f))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 3)
    val q = fc.writeStream.outputMode("append").format("memory")
      .queryName("ms_sink").start()
    try {
      input.addData(Seq(("s", ts(12), 99.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT ds, naive FROM ms_sink ORDER BY ds").collect()
    // forecasts advance 250 ms per step with exact sub-second timestamps
    assert(out.map(_.getTimestamp(0).getTime).toSeq ==
      Seq(13, 14, 15).map(i => base + i.toLong * 250L))
    assert(out.forall(_.getDouble(1) == 99.0))
    // stream == batch parity
    val full = mlf.fit(PanelFrame(
      (rows :+ (("s", ts(12), 99.0))).toDF("unique_id", "ds", "y"), freq = f))
      .predict(3).select(col("ds"), col("naive")).orderBy("ds").collect()
    assert(out.map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq ==
      full.map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq)
  }

  test("streaming forecast serves the native GBDT (scorer path) == batch") {
    val rows = for (id <- Seq("a", "b"); t <- 0 until 40)
      yield (id, t.toLong, ((t * 7 + (if (id == "a") 0 else 5)) % 23).toDouble)
    val mlf = MLForecast(
      Seq(graft.forecast.GraftGbm(numRounds = 6, numLeaves = 7, maxDepth = 3,
        minDataInLeaf = 2), Models.naive),
      Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1, 2), lagTransforms = Map(1 -> Seq(RollingMean(3)))))
    val fitted = mlf.fit(PanelFrame(rows.toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1)))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 3)
    val q = fc.writeStream.outputMode("append").format("memory")
      .queryName("ggbm_sink").start()
    try {
      input.addData(Seq(("a", 40L, 9.0), ("b", 40L, 4.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      "SELECT unique_id, ds, ggbm, naive FROM ggbm_sink ORDER BY unique_id, ds")
      .collect().toSeq
    val full = mlf.fit(PanelFrame(
      (rows ++ Seq(("a", 40L, 9.0), ("b", 40L, 4.0))).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))).predict(3)
      .select(col("unique_id"), col("ds"), col("ggbm"), col("naive"))
      .orderBy("unique_id", "ds").collect().toSeq
    // the GBM is trained on the seed panel in both paths? No: batch refit
    // sees the appended rows too, so compare the SCORING contract instead —
    // stream scores with the fitted (seed-trained) model; batch twin must
    // use the same trained model via update()
    val updated = fitted.update(
      Seq(("a", 40L, 9.0), ("b", 40L, 4.0)).toDF("unique_id", "ds", "y"))
      .predict(3)
      .select(col("unique_id"), col("ds"), col("ggbm"), col("naive"))
      .orderBy("unique_id", "ds").collect().toSeq
    assert(streamed.nonEmpty && streamed == updated)
    assert(full.size == streamed.size) // shape sanity on the refit twin
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

  test("streaming dedup: first document per fingerprint wins across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF.toDF("doc_id", "text")
    val deduped = graft.streaming.StreamingDedup.firstSeen(docs, "doc_id", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_sink").start()
    try {
      // within-batch dup: 2 is doc 1 reformatted (same normalized content)
      input.addData(
        (1L, "hello world foo"),
        (2L, "Hello, world FOO!"),
        (3L, "unique text one"))
      q.processAllAvailable()
      // cross-batch dup: 4 repeats doc 1; 5 is new
      input.addData(
        (4L, "hello world foo"),
        (5L, "brand new doc"))
      q.processAllAvailable()
      // numeric winner order: 9 must beat 10 even though "10" < "9"
      input.addData(
        (10L, "double digit tie"),
        (9L, "double digit tie"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT id FROM dedup_sink ORDER BY CAST(id AS BIGINT)")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("1", "3", "5", "9"), s"got $out")
    // the emitted rows carry the content fingerprint for downstream joins
    val fps = spark.sql("SELECT DISTINCT fingerprint FROM dedup_sink").count()
    assert(fps == 4L)
  }

  test("streaming near-dup: claim-free first batch leaves usable state") {
    implicit val sqlCtx = spark.sqlContext
    val statePath = java.nio.file.Files.createTempDirectory("neardup_empty").toString + "/buckets"
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = graft.streaming.StreamingDedup.nearFirstSeen(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", statePath) {
      (batchId, survivors) =>
        collected(batchId) = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    try {
      // batch 0: nothing shingles -> zero bucket claims, but the state dir
      // is created; batch 1 must still read it as empty state, not crash
      input.addData((1L, "x"), (2L, "y"))
      q.processAllAvailable()
      input.addData(
        (3L, "alpha beta gamma delta epsilon zeta"),
        (4L, "alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    assert(collected(0L) == Set(1L, 2L))
    assert(collected(1L) == Set(3L), s"got ${collected(1L)}")
  }

  test("streaming near-dup: LSH bucket claims match a driver-side replay") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    implicit val sqlCtx = spark.sqlContext
    val (shingleSize, numHashes, bands) = (2, 8, 4)
    val rpb = numHashes / bands

    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val batches = Seq(
      Seq(1L -> base,
          2L -> base,                                      // exact dup of 1 (same batch)
          3L -> "completely different words in this doc"),
      Seq(4L -> base,                                      // exact dup of 1 (prior batch)
          5L -> "another brand new unique document text",
          6L -> (base.split(' ').dropRight(1).mkString(" ") + " omega"), // near-dup of 1
          7L -> "x"),                                      // too short to shingle: survives
    )

    // driver-side replay of the documented claim semantics, using the same
    // JVM kernels (minhashJvm + Spark's xxhash64 chaining)
    def bhash(b: Int, members: String): Long = {
      val seed = XXH64.hashInt(b, 42L)
      val u = UTF8String.fromString(members)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
    }
    def keys(text: String): Seq[(Int, Long)] = {
      val sig = graft.operators.Dedup.minhashJvm(text, shingleSize, numHashes)
      if (sig == null) Seq.empty
      else (0 until bands).map(b => (b, bhash(b, sig.slice(b * rpb, b * rpb + rpb).mkString(","))))
    }
    val state = scala.collection.mutable.Set[(Int, Long)]()
    val expected = batches.map { docs =>
      val ks = docs.map { case (id, t) => id -> keys(t) }.toMap
      val minClaim = ks.toSeq.flatMap { case (id, kk) => kk.map(_ -> id) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      val surv = docs.collect { case (id, _)
        if !ks(id).exists(k => state.contains(k) || minClaim(k) < id) => id }
      ks.values.foreach(state ++= _)
      surv.toSet
    }
    // sanity on the fixture itself: exact dups collide in every band, and
    // the one-word edit still collides in at least one band (else the
    // "near-dup" case would be vacuous at these parameters)
    assert(keys(base).toSet == keys(batches(0)(1)._2).toSet)
    assert(keys(batches(1)(2)._2).toSet.intersect(keys(base).toSet).nonEmpty)

    val statePath = java.nio.file.Files.createTempDirectory("neardup_state").toString + "/buckets"
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = graft.streaming.StreamingDedup.nearFirstSeen(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", statePath,
      shingleSize, numHashes, bands) { (batchId, survivors) =>
      collected(batchId) = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    try {
      input.addData(batches(0): _*); q.processAllAvailable()
      input.addData(batches(1): _*); q.processAllAvailable()
    } finally q.stop()

    assert(collected(0L) == expected(0), s"batch 0: ${collected(0L)} vs ${expected(0)}")
    assert(collected(1L) == expected(1), s"batch 1: ${collected(1L)} vs ${expected(1)}")
    // the short doc always survives; the exact dups never do
    assert(collected(1L).contains(7L) && !collected(1L).contains(4L) && !collected(0L).contains(2L))
  }

  test("streaming benchmark screen: winnow-contaminated docs flagged, batch == stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (100L, "what is the capital of france paris of course"),
      (101L, "name the largest planet jupiter obviously"),
    ).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "an article about the capital of france paris and its museums"), // shares bench 100 span
      (1L, "a clean document about spark window aggregates"),
      (2L, "name the largest planet jupiter obviously"),                      // verbatim bench 101
      (3L, "short"),
    )
    // batch application (same code path — the operator is stateless)
    val batchOut = graft.streaming.StreamingDedup.benchmarkScreen(
        docs.toDF("doc_id", "text"), "text", bench, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_shared_fps")).toMap
    assert(batchOut(0L) > 0, s"substring overlap must share a fingerprint: $batchOut")
    assert(batchOut(2L) > 0)
    assert(batchOut(1L) == 0 && batchOut(3L) == 0)
    // verbatim copy shares every bench-101 fingerprint
    val fp101 = graft.operators.Dedup.winnowJvm(
      "name the largest planet jupiter obviously", 5, 4).map(_._2).distinct.length
    assert(batchOut(2L) == fp101)
    // streaming application produces identical annotations
    val input = MemoryStream[(Long, String)]
    val screened = graft.streaming.StreamingDedup.benchmarkScreen(
      input.toDF.toDF("doc_id", "text"), "text", bench, "doc_id", "text")
    val q = screened.writeStream.format("memory").queryName("bench_screen")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamOut = spark.table("bench_screen")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_shared_fps")).toMap
      assert(streamOut == batchOut, s"$streamOut vs $batchOut")
    } finally q.stop()
    // drop mode removes the contaminated rows only
    val kept = graft.streaming.StreamingDedup.benchmarkScreen(
        docs.toDF("doc_id", "text"), "text", bench, "doc_id", "text",
        drop = true)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 3L), kept)
  }

  test("streaming asof enrich matches batch asofJoin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // dimension stream (right): per-key state revisions
    val rights = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (2L, ts("2024-01-01 10:30:00"), 99.0))
    // event stream (left), spread over two batches; 1@10:00 must match the
    // 09:00 revision ARRIVED IN AN EARLIER BATCH (state carries it over)
    val leftsB1 = Seq((1L, ts("2024-01-01 10:00:00"), 0.1))
    val leftsB2 = Seq(
      (1L, ts("2024-01-01 11:00:00"), 0.2),   // exact match at 11:00
      (1L, ts("2024-01-01 12:00:00"), 0.3),
      (2L, ts("2024-01-01 10:00:00"), 0.4),   // before key 2's only revision
      (3L, ts("2024-01-01 12:00:00"), 0.5))   // keyless

    val lIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = graft.streaming.StreamingAsof.asofEnrichStream(
      lIn.toDF.toDF("k", "ts", "lv"), rIn.toDF.toDF("k", "rts", "rv"),
      keys = Seq("k"), leftTimeCol = "ts", rightTimeCol = "rts",
      payload = Seq("rts" -> "mrts", "rv" -> "mrv"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_sink").start()
    try {
      rIn.addData(rights: _*)
      lIn.addData(leftsB1: _*)
      q.processAllAvailable()
      lIn.addData(leftsB2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT k, ts, lv, mrts, mrv FROM asof_sink")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[java.sql.Timestamp]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq.sortBy(r => (r._1, r._2.getTime, r._3))

    // batch twin over the union of everything that was streamed
    val batch = graft.operators.TemporalJoin.asofJoin(
        (leftsB1 ++ leftsB2).toDF("k", "ts", "lv")
          .select($"k", $"ts", $"lv", unix_micros($"ts").as("tus")),
        rights.toDF("k", "rts", "rv")
          .select($"k", $"rts", $"rv", unix_micros($"rts").as("rtus")),
        keys = Seq("k"), leftTime = "tus", rightTime = "rtus",
        payload = Seq("rts" -> "mrts", "rv" -> "mrv"))
      .select($"k", $"ts", $"lv", $"mrts", $"mrv")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[java.sql.Timestamp]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq.sortBy(r => (r._1, r._2.getTime, r._3))

    assert(streamed == batch, s"\n$streamed\nvs\n$batch")
    // spot-check the semantics the parity rests on
    val m = streamed.map(r => (r._1, r._3) -> (r._4.map(_.toString), r._5)).toMap
    assert(m((1L, 0.1))._2.contains(10.0))   // cross-batch state
    assert(m((1L, 0.2))._2.contains(20.0))   // exact match included
    assert(m((2L, 0.4))._2.isEmpty)          // nothing at-or-before
    assert(m((3L, 0.5))._2.isEmpty)          // unseen key
  }

  test("streaming sessionization matches batch sessionize on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two users; 30-minute gap. u1: (10:00, 10:10, 10:35) one session
    // (chained gaps < 30m), then 12:00 alone. u2: 10:05 alone.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 10:35:00")), (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 10:05:00")))

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = graft.streaming.StreamingSessions.sessionAggStream(
      input.toDF.toDF("user_id", "ts"), Seq("user_id"), "ts",
      gap = "30 minutes", watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("session_sink").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close every session
      input.addData((99L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
        "SELECT user_id, session_start, n_events FROM session_sink WHERE user_id < 99")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L, r.getLong(2)))
      .toSeq.sorted

    // batch twin on the microsecond axis: session_window's strict
    // diff < 30min == sessionize's diff <= 30min - 1us
    val batch = graft.operators.Sessions.sessionize(
        events.toDF("user_id", "ts")
          .select($"user_id", unix_micros($"ts").as("tus")),
        Seq("user_id"), "tus", gap = 30L * 60 * 1000000 - 1)
      .groupBy($"user_id", $"session_id")
      .agg(min($"tus").as("start"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

    assert(streamed == batch, s"$streamed vs $batch")
    assert(streamed.map(_._3).sum == events.length)
    assert(streamed.count(_._1 == 1L) == 2)
  }

  test("streaming hampel gate is bit-equal to the batch trailing filter") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two series with planted spikes, ingested in event-time order
    val all = for (id <- Seq("a", "b"); t <- 0 until 40) yield {
      val base = if (id == "a") 10.0 + (t % 5) else 50.0 - (t % 7)
      val y = if (t == 17 || t == 31) base * 8 else base
      (id, t.toLong, y)
    }
    val input = MemoryStream[(String, Long, Double)]
    val gated = graft.streaming.StreamingOutliers.hampelGate(
      input.toDF.toDF("unique_id", "ds", "y"), "unique_id", "ds", "y", k = 3)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("hampel_sink").start()
    try {
      input.addData(all.filter(_._2 < 15)); q.processAllAvailable()
      input.addData(all.filter(r => r._2 >= 15 && r._2 < 30)); q.processAllAvailable()
      input.addData(all.filter(_._2 >= 30)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM hampel_sink").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5),
          r.getDouble(6))).toMap
    val batch = graft.operators.Outliers.hampelTrailing(
      PanelFrame(all.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1)), k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Boolean]("is_outlier"), r.getAs[Double]("y_hampel"))).toMap
    assert(streamed.keySet == batch.keySet && streamed.size == 80)
    streamed.foreach { case (key, v) =>
      assert(v == batch(key), s"$key: stream $v vs batch ${batch(key)}")
    }
    // the planted spikes are flagged; their neighbors are not
    assert(streamed(("a", 17L))._4 && streamed(("b", 31L))._4)
    assert(!streamed(("a", 16L))._4 && !streamed(("b", 30L))._4)
  }

  test("streaming gates: randomized panels and batch splits keep batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // random panel: 6 series x 30 steps, 10% nulls, occasional spikes
    val rows = for (s <- 0 until 6; t <- 0 until 30) yield {
      val y: java.lang.Double =
        if (rng.nextInt(10) == 0) null
        else java.lang.Double.valueOf(
          (rng.nextInt(12) + (if (rng.nextInt(15) == 0) 90 else 0)).toDouble)
      (s"s$s", t.toLong, y)
    }
    // random event-time-ordered batch boundaries
    val cuts = Seq(0L) ++ Seq.fill(3)(rng.nextInt(29).toLong + 1).sorted ++ Seq(30L)
    def batchesOf[T](data: Seq[(String, Long, T)]) =
      cuts.sliding(2).map { case Seq(lo, hi) =>
        data.filter(r => r._2 >= lo && r._2 < hi)
      }.filter(_.nonEmpty).toSeq

    // ffill gate vs batch fillForward
    val fIn = MemoryStream[(String, Long, Option[Double])]
    val fq = graft.streaming.StreamingImpute.ffillGate(
      fIn.toDF.toDF("unique_id", "ds", "y"), "unique_id", "ds", "y")
      .writeStream.outputMode("append").format("memory")
      .queryName("sweep_ffill").start()
    try {
      batchesOf(rows.map(r => (r._1, r._2, Option(r._3).map(_.doubleValue))))
        .foreach { b => fIn.addData(b); fq.processAllAvailable() }
    } finally fq.stop()
    val fStream = spark.sql("SELECT * FROM sweep_ffill").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)))).toMap
    val fBatch = PanelFrame(rows.toDF("unique_id", "ds", "y"),
        freq = Freq.IntFreq(1)).fillForward(Seq("y")).df.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    assert(fStream == fBatch)

    // hampel gate vs batch trailing filter (null targets dropped by both)
    val nonNull = rows.collect { case (id, t, y) if y != null => (id, t, y.doubleValue) }
    val hIn = MemoryStream[(String, Long, Double)]
    val hq = graft.streaming.StreamingOutliers.hampelGate(
      hIn.toDF.toDF("unique_id", "ds", "y"), "unique_id", "ds", "y", k = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("sweep_hampel").start()
    try {
      batchesOf(nonNull).foreach { b => hIn.addData(b); hq.processAllAvailable() }
    } finally hq.stop()
    val hStream = spark.sql("SELECT * FROM sweep_hampel").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getDouble(6))).toMap
    val hBatch = graft.operators.Outliers.hampelTrailing(
      PanelFrame(nonNull.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1)), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Boolean]("is_outlier"), r.getAs[Double]("y_hampel"))).toMap
    assert(hStream == hBatch)

    // cusum drift gate vs batch walk (reference mean = first-half mean)
    val ref = nonNull.filter(_._2 < 15).groupBy(_._1).toSeq
      .map { case (k, v) => (k, v.map(_._3).sum / v.length) }
      .toDF("unique_id", "mu")
    val dIn = MemoryStream[(String, Long, Double)]
    val dq = graft.streaming.StreamingDrift.cusumGate(
      dIn.toDF.toDF("unique_id", "ds", "y"), ref,
      "unique_id", "ds", "y", "mu", k = 1.0, h = 10.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("sweep_drift").start()
    try {
      batchesOf(nonNull).foreach { b => dIn.addData(b); dq.processAllAvailable() }
    } finally dq.stop()
    val dStream = spark.sql("SELECT * FROM sweep_drift").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    val dBatch = graft.operators.Stats.pageCusum(
      nonNull.toDF("unique_id", "ds", "y"), ref,
      "unique_id", "ds", "y", "mu", k = 1.0, h = 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(dStream == dBatch && dStream.nonEmpty)
  }

  test("streaming cusum drift gate is bit-equal to the batch walk") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // series a drifts upward mid-stream; series b stays on its mean;
    // series x has no reference and must not be monitored
    val rows = (for (id <- Seq("a", "b", "x"); t <- 0 until 12) yield
      (id, t.toLong,
        if (id == "a" && t >= 6) 14.0 + 0.5 * t
        else if (id == "b") 5.0 + (t % 2)
        else 10.0 + t))
    val ref = Seq(("a", 10.0), ("b", 5.5)).toDF("unique_id", "mu")
    val input = MemoryStream[(String, Long, Double)]
    val gated = graft.streaming.StreamingDrift.cusumGate(
      input.toDF.toDF("unique_id", "ds", "y"), ref,
      "unique_id", "ds", "y", "mu", k = 1.0, h = 6.0)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("drift_sink").start()
    try {
      input.addData(rows.filter(_._2 < 4)); q.processAllAvailable()
      input.addData(rows.filter(r => r._2 >= 4 && r._2 < 8)); q.processAllAvailable()
      input.addData(rows.filter(_._2 >= 8)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM drift_sink").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    val batch = graft.operators.Stats.pageCusum(
      rows.toDF("unique_id", "ds", "y"), ref,
      "unique_id", "ds", "y", "mu", k = 1.0, h = 6.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(streamed.keySet == batch.keySet && streamed.size == 24)
    streamed.foreach { case (k2, v) =>
      assert(v == batch(k2), s"$k2: stream $v vs batch ${batch(k2)}")
    }
    // the drifting series alarms; the stable one never does; the
    // unreferenced one is absent entirely
    assert(streamed.exists { case (k2, v) => k2._1 == "a" && v._4 })
    assert(streamed.forall { case (k2, v) => k2._1 != "b" || !v._4 })
    assert(!streamed.keySet.exists(_._1 == "x"))
  }

  test("streaming ACI gate is bit-equal to the batch alpha walk") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val calib = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 0.5), ("b", 1.5))
      .toDF("unique_id", "score")
    // series a drifts away from its constant prediction (misses mount),
    // series b stays inside its band
    val rows = for (id <- Seq("a", "b"); t <- 0 until 12) yield
      (id, t.toLong,
        if (id == "a") 10.0 + 0.8 * t else 5.0 + 0.1 * t,
        if (id == "a") 10.0 else 5.0)
    val input = MemoryStream[(String, Long, Double, Double)]
    val gated = graft.streaming.StreamingConformal.aciGate(
      input.toDF.toDF("unique_id", "ds", "y", "yhat"), calib,
      "unique_id", "ds", "y", "yhat", "score", alpha = 0.2, gamma = 0.1)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("aci_sink").start()
    try {
      input.addData(rows.filter(_._2 < 5)); q.processAllAvailable()
      input.addData(rows.filter(r => r._2 >= 5 && r._2 < 9)); q.processAllAvailable()
      input.addData(rows.filter(_._2 >= 9)); q.processAllAvailable()
    } finally q.stop()
    def keyOf(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    def valsOf(r: org.apache.spark.sql.Row) =
      (2 to 8).map(i => r.getDouble(i)).toSeq
    val streamed = spark.sql("SELECT * FROM aci_sink").collect()
      .map(r => keyOf(r) -> valsOf(r)).toMap
    val batch = graft.forecast.Conformal.aciPath(calib,
      rows.toDF("unique_id", "ds", "y", "yhat"),
      "unique_id", "ds", "y", "yhat", "score", alpha = 0.2, gamma = 0.1)
      .collect().map(r => keyOf(r) -> valsOf(r)).toMap
    assert(streamed.keySet == batch.keySet && streamed.size == 24)
    streamed.foreach { case (k2, v) =>
      assert(v == batch(k2), s"$k2: stream $v vs batch ${batch(k2)}")
    }
    // the drifting series accumulated misses; its alpha ends lower (wider
    // bands) than the fully-covered series' (vals = y,yhat,alpha,qhat,err,lo,hi)
    assert(streamed.count { case (k2, v) => k2._1 == "a" && v(4) == 1.0 } >= 2)
    assert(streamed(("a", 11L))(2) < streamed(("b", 11L))(2))
  }

  test("ACI gate task closure is O(1): no calibration rides the binary") {
    // before r10 the whole per-series calibration map was captured in the
    // task closure (every task deserialized every series' scores — wrong
    // shape at 10^7 series). Calibration now lives per key in the state
    // store; the keyed update function captures only the two scalar knobs,
    // so its serialized form must stay tiny no matter the catalog
    val f = graft.streaming.StreamingConformal.aciFunc(0.2, 0.1)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(f); oos.close()
    assert(bos.size() < 4096,
      s"ACI update closure serialized to ${bos.size()} bytes — calibration " +
        "state leaked back into the task binary")
  }

  test("streaming ffill gate carries last non-null across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long, Option[Double])]
    val filled = graft.streaming.StreamingImpute.ffillGate(
      input.toDF.toDF("unique_id", "ds", "y"), "unique_id", "ds", "y")
    val q = filled.writeStream.outputMode("append").format("memory")
      .queryName("ffill_sink").start()
    try {
      input.addData(("a", 0L, None), ("a", 1L, Some(5.0)), ("a", 2L, None))
      q.processAllAvailable()
      // carry crosses the batch boundary; series b starts mid-stream
      input.addData(("a", 3L, None), ("a", 4L, Some(7.0)),
        ("b", 0L, Some(1.0)), ("b", 1L, None))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT * FROM ffill_sink").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
      .toMap
    assert(out(("a", 0L)) == null)      // leading null stays null
    assert(out(("a", 2L)) == 5.0 && out(("a", 3L)) == 5.0) // carried, cross-batch
    assert(out(("a", 4L)) == 7.0 && out(("b", 1L)) == 1.0)
    // parity with the batch fill on the same rows
    val batchRows = Seq(("a", 0L, None), ("a", 1L, Some(5.0)), ("a", 2L, None),
      ("a", 3L, None), ("a", 4L, Some(7.0)), ("b", 0L, Some(1.0)), ("b", 1L, None))
      .map { case (i, d, y) => (i, d, y.map(java.lang.Double.valueOf).orNull) }
    val batch = PanelFrame(batchRows.toDF("unique_id", "ds", "y"),
        freq = Freq.IntFreq(1)).fillForward(Seq("y")).df.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))
      .toMap
    assert(out == batch)
  }

  test("streaming NB quality gate is bit-equal to the batch scorer") {
    import graft.operators.Corpus
    import graft.streaming.StreamingQuality
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pos = docs.filter($"lang" === "en")
    val neg = docs.filter(not($"lang" <=> "en"))
    val model = StreamingQuality.trainNb(pos, neg, "text")
    val batch = Corpus.nbQualityScore(pos, neg, docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val scored = StreamingQuality.attachNbScore(
      input.toDS().toDF("doc_id", "text"), "text", model)
    val q = scored.writeStream.format("memory").queryName("nbq")
      .outputMode("append").start()
    try {
      val rows = docs.select($"doc_id", $"text").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("nbq")
        .select($"doc_id", $"n_tokens", $"n_oov", $"nb_score", $"label")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
      assert(streamed.size == batch.size)
      // DOUBLE equality: the kernel must replay the batch fold bit-for-bit
      assert(streamed == batch)
      // the gate keeps exactly the label=true docs (batch path, same code)
      val kept = StreamingQuality.filterQuality(
        docs.select($"doc_id", $"text"), "text", model).count()
      assert(kept == batch.values.count(_._4))
    } finally q.stop()
  }

  test("asof enrich: micros payload precision and null keys match batch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val micro = ts("2024-01-01 09:00:00.123456")
    val lIn = MemoryStream[(java.lang.Long, java.sql.Timestamp, Double)]
    val rIn = MemoryStream[(java.lang.Long, java.sql.Timestamp, Double)]
    val out = graft.streaming.StreamingAsof.asofEnrichStream(
      lIn.toDF.toDF("k", "ts", "lv"), rIn.toDF.toDF("k", "rts", "rv"),
      keys = Seq("k"), leftTimeCol = "ts", rightTimeCol = "rts",
      payload = Seq("rts" -> "mrts", "rv" -> "mrv"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_guard_sink").start()
    try {
      rIn.addData((1L, micro, 10.0),
        (null.asInstanceOf[java.lang.Long], ts("2024-01-01 09:30:00"), 99.0))
      lIn.addData((1L, ts("2024-01-01 10:00:00"), 0.1),
        (null.asInstanceOf[java.lang.Long], ts("2024-01-01 11:00:00"), 0.2))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT k, lv, mrts, mrv FROM asof_guard_sink")
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        (r.getDouble(1), Option(r.get(2)), Option(r.get(3)))).toMap
    // the sub-millisecond timestamp payload round-trips EXACTLY
    assert(rows(Some(1L))._2.contains(micro), s"got ${rows(Some(1L))._2}")
    assert(rows(Some(1L))._3.contains(10.0))
    // a null-key left is emitted unmatched (batch left-join semantics) —
    // it must NOT pick up the null-key right's payload
    assert(rows(Some(1L)) != null && rows.contains(None))
    assert(rows(None)._2.isEmpty && rows(None)._3.isEmpty)
    // a binary payload column is rejected loudly (lossy through JSON)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingAsof.asofEnrichStream(
        lIn.toDF.toDF("k", "ts", "lv"),
        rIn.toDF.toDF("k", "rts", "rv")
          .withColumn("blob", encode(lit("x"), "utf-8")),
        keys = Seq("k"), leftTimeCol = "ts", rightTimeCol = "rts",
        payload = Seq("blob" -> "mblob"))
    }
    assert(e.getMessage.contains("round-trip"))
  }

  test("streaming gates survive null timestamps instead of poisoning the query") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.lang.Long, java.lang.Double)]
    val gated = graft.streaming.StreamingOutliers.hampelGate(
      input.toDF.toDF("unique_id", "ds", "y"),
      "unique_id", "ds", "y", k = 3)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("nullds_sink").start()
    try {
      input.addData(("a", 1L, 5.0), ("a", null.asInstanceOf[java.lang.Long], 6.0),
        ("a", 2L, 7.0))
      q.processAllAvailable() // a null ds row must drop, not kill the query
    } finally q.stop()
    val n = spark.sql("SELECT count(*) FROM nullds_sink").collect().head.getLong(0)
    assert(n == 2L, s"expected the two valid rows, got $n")
  }

  test("idWins is a total order: numerically-equal distinct ids tie-break") {
    import graft.streaming.StreamingDedup.idWins
    assert(idWins("07", "7") && !idWins("7", "07")) // exactly one direction
    assert(idWins("9", "10") && !idWins("10", "9")) // numeric, not lexical
    assert(idWins("a", "b") && !idWins("b", "a"))
    assert(!idWins("7", "7"))
  }

  test("near-dup dedup refuses a claimed statePath without a checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val statePath =
      java.nio.file.Files.createTempDirectory("neardup_restart").toString + "/buckets"
    val input = MemoryStream[(Long, String)]
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val q = graft.streaming.StreamingDedup.nearFirstSeen(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", statePath) { (_, _) => () }
    try {
      input.addData((1L, text))
      q.processAllAvailable()
    } finally q.stop()
    // state now holds batch-0 claims; re-attaching without a checkpoint
    // would restart batch ids at 0 and clobber them -> loud refusal
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.nearFirstSeen(
        input.toDF.toDF("doc_id", "text"), "doc_id", "text", statePath) { (_, _) => () }
    }
    assert(e.getMessage.contains("checkpoint"))
  }

  test("streaming forecast: maxAheadSteps drops corrupt far-future rows") {
    def rows(ts: Seq[Int]) = for (t <- ts) yield ("a", t.toLong, 1.0 * t)
    val initial = PanelFrame(rows(0 until 10).toDF("unique_id", "ds", "y"),
      freq = Freq.IntFreq(1))
    val fitted = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1))).fit(initial)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val fc = graft.streaming.StreamingForecast.attach(
      fitted, input.toDF.toDF("unique_id", "ds", "y"), h = 1,
      maxAheadSteps = 1000L)
    val q = fc.writeStream.outputMode("append")
      .format("memory").queryName("ahead_sink").start()
    try {
      // fat-fingered timestamp: dropped, the series anchor must NOT advance
      input.addData(("a", 999_999_999L, 777.0))
      q.processAllAvailable()
      // the next legitimate observation still lands and forecasts
      input.addData(("a", 10L, 42.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT ds, naive FROM ahead_sink ORDER BY ds").collect()
    assert(out.length == 1 && out(0).getLong(0) == 11L &&
      out(0).getDouble(1) == 42.0, out.mkString(","))
  }
}
