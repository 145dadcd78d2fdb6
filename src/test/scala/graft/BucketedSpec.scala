package graft

import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.sources.Bucketed

/** Bucketed panel storage: the write-once-shuffle-never layout. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def panel(n: Int = 6, len: Int = 40): PanelFrame = {
    val rows = for (id <- 0 until n; t <- 0 until len)
      yield (s"s$id", t.toLong, id * 100.0 + t)
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  test("bucketed round-trip preserves the panel") {
    val p = panel()
    Bucketed.writePanel(p, "bk_panel_rt", buckets = 4)
    val back = Bucketed.readPanel(spark, "bk_panel_rt", freq = Freq.IntFreq(1))
    assert(back.df.collect().toSet == p.df.collect().toSet)
    // parquet relaxes nullability; names and types must survive
    assert(back.df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      p.df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("bucket-key aggregate and same-bucket join plan zero shuffles") {
    val p = panel()
    Bucketed.writePanel(p, "bk_panel_a", buckets = 4)
    val a = spark.table("bk_panel_a")

    // contrast: the un-bucketed frame shuffles for the same aggregate
    assert(Bucketed.shuffleExchangeCount(
      p.df.groupBy("unique_id").agg(sum("y"))) > 0)
    // bucket-key aggregate: distribution satisfied by the table layout
    assert(Bucketed.shuffleExchangeCount(
      a.groupBy("unique_id").agg(sum("y"))) == 0)

    // disable broadcast so the joins must prove the SORT-MERGE path is
    // shuffle-free via the bucket distribution (the 100 TB shape, where
    // neither side broadcasts)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // panel x per-series statics (an aggregate of the same table): both
      // sides inherit the bucket distribution -> shuffle-free join
      val statics = a.groupBy("unique_id").agg(max("y").as("peak"))
      assert(Bucketed.shuffleExchangeCount(
        a.join(statics, Seq("unique_id"))) == 0)

      // two independently-written tables with the same bucket count,
      // joined ON the bucket key (a join on extra keys would re-shuffle:
      // Spark requires the clustering keys to match the join keys)
      Bucketed.writePanel(panel(), "bk_panel_b", buckets = 4)
      val b = spark.table("bk_panel_b")
      val bAgg = b.groupBy("unique_id").agg(avg("y").as("mean_b"))
      assert(Bucketed.shuffleExchangeCount(
        a.join(bAgg, Seq("unique_id"))) == 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("pipeline runs off the bucketed table unchanged") {
    import graft.forecast.{MLForecast, Models}
    import graft.operators.FeatureSpec
    Bucketed.writePanel(panel(), "bk_panel_c", buckets = 2)
    val back = Bucketed.readPanel(spark, "bk_panel_c", freq = Freq.IntFreq(1))
    val preds = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1))).fit(back).predict(2)
    assert(preds.count() == 6 * 2)
    // y is linear per series: naive's 1-step prediction = last value
    val r = preds.filter(col("unique_id") === "s0" && col("ds") === 40).collect()
    assert(r.head.getAs[Double]("naive") == 39.0)
  }
}
