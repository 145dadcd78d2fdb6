package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, LocalStandardScaler, MLForecast}
import graft.functions.{RollingMax, RollingMean, RollingMin}
import graft.operators.FeatureSpec
import graft.sources.{Bucketed, Panels}

/** Bucketed-source benchmark lane (r8 VERDICT #5): materialize the SF panel
  * ONCE as a bucketed catalog table (bucketBy(unique_id), sortBy(id, ds)),
  * run the headline panel workloads against BOTH the plain-parquet source
  * and the bucketed table, and report wall time plus the planned
  * shuffle-Exchange count per (workload, source). The point at 100 TB: a
  * training pipeline re-reads its panel per model / CV window / boosting
  * round, and bucketing pays the id-shuffle once at write instead of once
  * per read.
  *
  * Emits one `[bucketed-json]` line; the builder commits it as
  * bench_bucketed.json and summarizes in SCALING.md.
  */
object BucketedBench {

  private def preprocessConf: MLForecast = MLForecast(
    models = Nil,
    freq = Freq.Day,
    spec = FeatureSpec(
      lags = Seq(1, 7, 14, 28),
      lagTransforms = Map(
        1 -> Seq(RollingMean(7), RollingMin(7), RollingMax(7)),
        7 -> Seq(RollingMean(7), RollingMin(7), RollingMax(7)),
        14 -> Seq(RollingMean(7)),
        28 -> Seq(RollingMean(7))),
      dateFeatures = Seq("dayofweek", "month", "year", "day")),
    targetTransforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler()))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-bucketed-bench-${ProcessHandle.current().pid()}")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the join lane simulates the 100 TB case where neither side
      // broadcasts — otherwise the tiny local stats side auto-broadcasts
      // and hides the shuffle the bucketing exists to remove
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(df: => DataFrame): (Double, Int) = {
      System.gc()
      val d = df
      val ex = Bucketed.shuffleExchangeCount(d)
      val t0 = System.nanoTime()
      mat(d)
      ((System.nanoTime() - t0) / 1e9, ex)
    }

    // sources: plain parquet-derived panel vs the bucketed catalog table
    def plainPanel: PanelFrame =
      PanelFrame(Panels.lineitemDaily(spark, sfDir), freq = Freq.Day)
    val t0 = System.nanoTime()
    Bucketed.writePanel(plainPanel, "bench_panel_bucketed", buckets = cpus.toInt)
    val writeSec = (System.nanoTime() - t0) / 1e9
    def bucketedPanel: PanelFrame =
      Bucketed.readPanel(spark, "bench_panel_bucketed", freq = Freq.Day)

    // per-id statics relation, bucketed the same way for the join lane
    plainPanel.df.groupBy("unique_id")
      .agg(avg(col("y")).as("mean_y"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(cpus.toInt, "unique_id")
      .sortBy("unique_id")
      .format("parquet")
      .saveAsTable("bench_stats_bucketed")

    val workloads: Seq[(String, PanelFrame => DataFrame)] = Seq(
      // window-heavy preprocess: per-id WindowExec wants clustering on id —
      // the bucketed scan already provides it
      "preprocess_13feat" -> { p => preprocessConf.preprocess(p) },
      // bucket-key aggregate: expect ZERO shuffle exchanges on the
      // bucketed source (partial+final collapse into the scan partitioning)
      "per_id_stats_agg" -> { p =>
        p.df.groupBy(col(p.idCol))
          .agg(count(lit(1)).as("n"), min(col(p.timeCol)).as("first_ds"),
            max(col(p.timeCol)).as("last_ds"), sum(col("y")).as("sum_y"))
      },
      // same-bucket equi-join: expect ZERO shuffle exchanges when both
      // sides are bucketed on the join key
      "panel_join_stats" -> { p =>
        val bucketedSide =
          p.df.queryExecution.logical.toString.contains("bench_panel_bucketed")
        val stats =
          if (bucketedSide) spark.table("bench_stats_bucketed")
          else plainPanel.df.groupBy("unique_id")
            .agg(avg(col("y")).as("mean_y"))
        p.df.join(stats, "unique_id")
          .select(col("unique_id"), col("ds"), col("y"), col("mean_y"))
      })

    val rows = workloads.flatMap { case (name, run) =>
      // the whole workload (warm + both timed runs) shares one guard: a
      // pipeline that fails in warm-up would fail identically in the timed
      // re-execution two lines later, so a half-guarded body only delayed
      // the crash and lost every remaining workload plus the JSON artifact
      try {
        mat(run(plainPanel)); mat(run(bucketedPanel)) // warm both sources
        val (pw, pex) = timed(run(plainPanel))
        val (bw, bex) = timed(run(bucketedPanel))
        println(f"[bucketed] $name%-20s plain ${pw}%6.2f s / $pex exch | " +
          f"bucketed ${bw}%6.2f s / $bex exch")
        Seq(name -> (pw, pex, bw, bex))
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bucketed] $name failed: ${e.getMessage}")
        Nil
      }
    }
    val json = rows.map { case (n, (pw, pex, bw, bex)) =>
      f""""$n": {"plain_sec": $pw%.2f, "plain_exchanges": $pex, "bucketed_sec": $bw%.2f, "bucketed_exchanges": $bex}"""
    }.mkString("{", ", ", s""", "bucketed_write_sec": ${f"$writeSec%.2f"}}""")
    println(s"[bucketed-json] $json")
    spark.stop()
  }
}
