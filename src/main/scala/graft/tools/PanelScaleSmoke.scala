package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, FeatureEcho, GraftGbm, LocalStandardScaler, MLForecast, Models, SparkLinearRegression}
import graft.functions.{Pooling, RollingMax, RollingMean, RollingMin}
import graft.operators.FeatureSpec

/** sf1.0-equivalent smoke for the headline FORECAST families (r7 VERDICT
  * #4): the sf0.1 lineitem panel salted to 10× the series (≈ sf1.0 row
  * count — there is no driver-generated sf1.0 parquet, and inventing new
  * data would change the y-distribution; salting multiplies series while
  * preserving per-series shape, which is what a bigger catalog looks
  * like). Each family runs at 1× and 10× and reports the wall ratio.
  * The sf0.1 bench thesis is that the local[32] job floor dominates those
  * numbers; if that's true, 10× the rows must cost well under 10× the
  * wall — a family whose ratio approaches 10 is genuinely row-bound and
  * its absolute sf0.1 number is real work, not floor.
  *
  *   sbt "runMain graft.tools.PanelScaleSmoke /root/testdata/sf0.1 10"
  */
object PanelScaleSmoke {

  def saltedPanel(spark: SparkSession, sfDir: String, copies: Int): DataFrame = {
    val base = graft.sources.Panels.lineitemDaily(spark, sfDir)
    (0 until copies).map { c =>
      base.select((col("unique_id") + lit(c * 10000000L)).as("unique_id"),
        col("ds"), col("y"))
    }.reduce(_ unionByName _)
  }

  def saltedDense(spark: SparkSession, sfDir: String, copies: Int): DataFrame = {
    val base = graft.sources.Panels.lineitemDense(spark, sfDir)
      .select(col("unique_id"), col("ord").as("ds"), col("y"))
    (0 until copies).map { c =>
      base.select((col("unique_id") + lit(c * 10000000L)).as("unique_id"),
        col("ds"), col("y"))
    }.reduce(_ unionByName _)
  }

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
          28 -> Seq(RollingMean(7))),
        dateFeatures = Seq("dayofweek", "month", "year", "day")),
      targetTransforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler()))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // at 100x (53M rows) cpus-many shuffle partitions are ~1.6M rows each —
    // the production sizing rule (partitions ~ data / 100MB) says hundreds;
    // overridable so the smoke can measure the sizing effect itself
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val guard = PlanGuard.install(spark, maxRows = 0L)

    // one full execution per timed run: the noop write materializes the
    // whole pipeline; a second count() here would double-execute inside the
    // timed section and distort the 1x-vs-Nx ratios (r8 ADVICE)
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // pin the blocked GLOBAL evaluation for the families whose thesis is
    // the distributed shape itself; the route is decided while the plan is
    // BUILT (globalUnboundedParts reads the conf + counts the pinned comps
    // at construction), so scoping the set/unset around the builder holds
    def withBlockedGlobalScan(body: => DataFrame): DataFrame = {
      spark.conf.set("spark.graft.globalScanSequentialMax", "0")
      try body finally spark.conf.unset("spark.graft.globalScanSequentialMax")
    }

    val families: Seq[(String, Int => DataFrame)] = Seq(
      "preprocess_13feat" -> { k =>
        workloadConf(Nil).preprocess(
          PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day))
      },
      "predict_h14" -> { k =>
        workloadConf(Seq(SparkLinearRegression(), Models.seasonalNaive(7)))
          .fit(PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day))
          .predict(14)
      },
      "pooled_groupby_rmean_predict" -> { k =>
        val fname = "groupby_unique_id_rolling_mean_lag1_window_size7"
        MLForecast(
          models = Seq(FeatureEcho("prm", fname)),
          freq = Freq.IntFreq(1),
          spec = FeatureSpec(lagTransforms = Map(1 ->
            Seq(RollingMean(7, pooling = Pooling(groupby = Seq("unique_id")))))))
          .fit(PanelFrame(saltedDense(spark, sfDir, k), freq = Freq.IntFreq(1)))
          .predict(3)
      },
      // fused transform-CV kernel (r13 KernelTransforms, r14 VERDICT #8):
      // interval CV re-fits the diff+scaler chain per (series, cutoff)
      // INSIDE one mapPartitions pass over the id-partitioned panel —
      // salting multiplies series, so the ratio measures the kernel's own
      // scaling (per-task state stays one series' history + chain state).
      // The driver-loop alternative this replaced would add nWindows x h
      // blocking jobs regardless of scale.
      "cv_intervals_tfm_kernel" -> { k =>
        MLForecast(
          models = Seq(Models.seasonalNaive(7)),
          freq = Freq.Day,
          spec = FeatureSpec(lags = Seq(7)),
          targetTransforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler()))
          .fit(PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day))
          .crossValidationWithIntervals(nWindows = 2, h = 7, levels = Seq(80))
      },
      // pure-global UNBOUNDED expanding stats: r10 moved these off
      // GlobalScan's single-task fold onto the blocked two-pass (block-
      // partitioned running windows + a carry fold over the tiny block
      // summary). Salting multiplies the rows feeding the per-ordinal
      // collapse and the join-back; a serializing fold would pin the ratio
      // to the single-task wall instead of scaling with the cluster.
      // sequentialMax=0 pins the BLOCKED path at both scales (r13 routes
      // small calendars onto the single-task fold — this row measures the
      // 100 TB shape's own scaling, same stance as ggbm_dist below)
      "global_expanding_featurize" -> { k =>
        import graft.functions.{ExpandingMean, ExpandingStd}
        withBlockedGlobalScan {
          graft.operators.Featurizer.addFeatures(
            PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day),
            FeatureSpec(lagTransforms = Map(1 -> Seq(
              ExpandingMean(pooling = Pooling(global = true)),
              ExpandingStd(pooling = Pooling(global = true))))))
        }
      },
      // pure-global EWM: r12 moved this off the single-task ordered fold
      // onto GlobalScan.blockedEwm (affine-map block composition). Same
      // serialization thesis (and the same blocked-path pin) as the
      // expanding row above.
      "global_ewm_featurize" -> { k =>
        import graft.functions.ExponentiallyWeightedMean
        withBlockedGlobalScan {
          graft.operators.Featurizer.addFeatures(
            PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day),
            FeatureSpec(lagTransforms = Map(1 -> Seq(
              ExponentiallyWeightedMean(0.3, pooling = Pooling(global = true))))))
        }
      },
      "ggbm_fit_predict_h14" -> { k =>
        workloadConf(Seq(GraftGbm(
          numRounds = 20, numLeaves = 15, maxDepth = 4, minDataInLeaf = 20)))
          .fit(PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day))
          .predict(14)
      },
      // driverFitMaxRows = 0 pins the DISTRIBUTED histogram machinery at
      // both scales: the default-routing row above measures what users get
      // (driver-local under the byte-gated cap), this row measures the
      // 100 TB path's own scaling with no local-fit handoff in the ratio
      "ggbm_dist_fit_predict_h14" -> { k =>
        workloadConf(Seq(GraftGbm(
          numRounds = 20, numLeaves = 15, maxDepth = 4, minDataInLeaf = 20,
          driverFitMaxRows = 0)))
          .fit(PanelFrame(saltedPanel(spark, sfDir, k), freq = Freq.Day))
          .predict(14)
      })

    if (!args.lift(2).contains("flagship")) {
      val rows1 = saltedPanel(spark, sfDir, 1).count()
      val rowsK = saltedPanel(spark, sfDir, mult).count()
      println(f"[panel-scale] rows: 1x=$rows1%,d ${mult}x=$rowsK%,d")
    }
    // {wall, process-CPU} per measurement: wall on a loaded box inflates
    // with whatever else the machine runs, CPU barely moves — the CPU ratio
    // is the load-invariant scaling signal (same rationale as Bench)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(label: String)(body: => Unit): (Double, Double) = {
      System.gc()
      guard.label = label
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      body
      val res = ((System.nanoTime() - t0) / 1e9,
        (osBean.getProcessCpuTime - c0) / 1e9)
      // listener callbacks are async; drain (untimed) BEFORE clearing the
      // label or this run's PlanGuard violations would be dropped and the
      // exit-3 enforcement would never fire (same contract as Bench.time)
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      guard.label = null
      res
    }
    // ---- flagship mode (r10 VERDICT #6): the two headline families at
    // 1x / 10x / <mult>x over a PINNED base, so the per-decade growth of
    // the actual pipeline is the measurement. Per-decade wall ratio well
    // under 10 at 53M rows = the sf0.1 absolute numbers are still mostly
    // job floor; the CPU column is the load-invariant cross-check.
    //   sbt "runMain graft.tools.PanelScaleSmoke /root/testdata/sf0.1 100 flagship"
    if (args.lift(2).contains("flagship")) {
      // fixed-work calibration spin (same loop as Bench's): absolute
      // seconds vs the committed spin_quiet make the table's "quiet box"
      // claim machine-checkable instead of builder testimony
      def spin(): Double = {
        var x = 0x9E3779B97F4A7C15L
        val t0 = System.nanoTime()
        var i = 0L
        while (i < 400000000L) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        if (x == 42L) System.err.println("")
        (System.nanoTime() - t0) / 1e9
      }
      val spinStartW = spin()
      val scales = Seq(1, 10, mult).distinct
      // ONE pinned base built (and counted) OUTSIDE every timed region:
      // building it inside would charge each measurement a constant C
      // (base aggregation + eager checkpoint) that biases the per-decade
      // ratios low — the generator must not be part of the measurement
      val basePinned = graft.sources.Panels.lineitemDaily(spark, sfDir)
        .localCheckpoint()
      def salted(copies: Int): DataFrame =
        (0 until copies).map { c =>
          basePinned.select(
            (col("unique_id") + lit(c * 10000000L)).as("unique_id"),
            col("ds"), col("y"))
        }.reduce(_ unionByName _)
      val flagships: Seq[(String, Int => DataFrame)] = Seq(
        "preprocess_13feat" -> { k =>
          workloadConf(Nil).preprocess(
            PanelFrame(salted(k), freq = Freq.Day))
        },
        "predict_h14" -> { k =>
          workloadConf(Seq(SparkLinearRegression(), Models.seasonalNaive(7)))
            .fit(PanelFrame(salted(k), freq = Freq.Day))
            .predict(14)
        })
      val rowsBase = basePinned.count()
      println(f"[panel-scale] flagship rows: 1x=$rowsBase%,d ... ${mult}x=${rowsBase * mult}%,d")
      val fout = flagships.map { case (name, run) =>
        guard.label = null
        mat(run(1)) // warm
        val ms = scales.map { k =>
          val (t, c) = timed(s"$name@${k}x") { mat(run(k)) }
          println(f"[panel-scale] $name%-22s ${k}%3dx wall $t%7.2f s cpu $c%8.2f s")
          (k, t, c)
        }
        val decades = ms.sliding(2).map { case Seq((k1, t1, c1), (k2, t2, c2)) =>
          f""""${k1}x->${k2}x": {"wall_ratio": ${t2 / t1}%.2f, "cpu_ratio": ${c2 / c1}%.2f}"""
        }.mkString(", ")
        println(f"[panel-scale] $name per-decade: $decades")
        s""""$name": {${ms.map { case (k, t, c) =>
          f""""${k}x": [$t%.2f, $c%.2f]""" }.mkString(", ")}, $decades}"""
      }
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      guard.violations.foreach(v => println(s"[panel-scale][guard] $v"))
      val spinEndW = spin()
      println(f"""[panel-scale-flagship-json] {"spins": [$spinStartW%.3f, $spinEndW%.3f], ${fout.mkString(", ")}}""")
      spark.stop()
      if (guard.violations.nonEmpty) sys.exit(3)
      return
    }

    // optional third arg (when not "flagship"): comma-separated family
    // filter for targeted smokes, e.g. `... 16 global_ewm_featurize`.
    // A typo'd name must fail loudly, not run zero families and exit 0.
    val famFilter: Option[Set[String]] =
      args.lift(2).filterNot(_ == "flagship").map(_.split(",").toSet)
    famFilter.foreach { f =>
      val unknown = f -- families.map(_._1).toSet
      require(unknown.isEmpty,
        s"unknown famil${if (unknown.size == 1) "y" else "ies"} " +
          s"${unknown.mkString(", ")}; known: ${families.map(_._1).mkString(", ")}")
    }
    val out = families.collect {
      case (name, run) if famFilter.forall(_.contains(name)) =>
      guard.label = null
      mat(run(1)) // warm
      val (t1, c1) = timed(s"$name@1x") { mat(run(1)) }
      val (tk, ck) = timed(s"$name@${mult}x") { mat(run(mult)) }
      println(f"[panel-scale] $name%-30s 1x ${t1}%6.2f s (cpu $c1%6.2f) | " +
        f"${mult}x ${tk}%6.2f s (cpu $ck%6.2f) -> wall ratio ${tk / t1}%.2f, " +
        f"cpu ratio ${ck / c1}%.2f (rows x$mult)")
      (name, t1, tk, c1, ck)
    }
    org.apache.spark.sql.graft.bridge.waitForListeners(spark)
    guard.violations.foreach(v => println(s"[panel-scale][guard] $v"))
    val json = out.map { case (n, t1, tk, c1, ck) =>
      s""""$n": {"1x": ${f"$t1%.2f"}, "${mult}x": ${f"$tk%.2f"}, "ratio": ${f"${tk / t1}%.2f"}, """ +
        s""""cpu_1x": ${f"$c1%.2f"}, "cpu_${mult}x": ${f"$ck%.2f"}, "cpu_ratio": ${f"${ck / c1}%.2f"}}"""
    }.mkString("{", ", ", "}")
    println(s"[panel-scale-json] $json")
    spark.stop()
    if (guard.violations.nonEmpty) sys.exit(3)
  }
}
