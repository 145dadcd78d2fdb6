package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, not, unix_micros}

import graft.core.{Freq, PanelFrame}
import graft.forecast.{Differences, LocalStandardScaler, MLForecast, Models, SparkLinearRegression}
import graft.functions.{RollingMax, RollingMean, RollingMin, RollingQuantile}
import graft.operators.FeatureSpec
import graft.sources.Panels

/** Phase-level timing for the BASELINE workload shapes — splits fit /
  * predict / inverse so bench regressions can be localized. Not part of the
  * driver contract; run with `runMain graft.tools.Profile [sfDir]`.
  */
object Profile {
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
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warmup mirrors Bench
    mat(Panels.densePanel(spark, sfDir).df)
    val panel = PanelFrame(Panels.lineitemDaily(spark, sfDir), freq = Freq.Day)
    val conf = MLForecast(
      models = Seq(SparkLinearRegression(), Models.seasonalNaive(7)),
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

    // one untimed full pass (class loading / codegen), then timed phases
    time("first full fit+predict") { mat(conf.fit(panel).predict(14)) }
    val fitted = time("fit") { conf.fit(panel) }
    time("predict h=14") { mat(fitted.predict(14)) }
    time("predict h=14 again") { mat(fitted.predict(14)) }
    time("fit again") { conf.fit(panel) }
    time("preprocess only") { mat(conf.preprocess(panel)) }

    // Plan audit (SCALING.md evidence): operator counts in the physical
    // plans of the fused predict and a pooled groupby feature query.
    def audit(label: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      def n(op: String) = plan.linesIterator.count(_.contains(op))
      // pre-AQE plan string: codegen collapse happens per-stage at runtime,
      // so only exchange/sort/join shape is meaningful here
      println(s"[profile] plan[$label]: exchanges=${n("Exchange")} sorts=${n("Sort ")} " +
        s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")}")
    }
    audit("fused predict h=14", fitted.predict(14))
    // without target transforms: the bare fused loop (no inverse-state joins)
    val bare = MLForecast(conf.models, conf.freq, conf.spec).fit(panel)
    audit("fused predict, no target tfms", bare.predict(14))
    val pooled = graft.operators.Featurizer.addFeatures(
      PanelFrame(Panels.lineitemDaily(spark, sfDir), freq = Freq.Day,
        staticCols = Seq()).copy(df = Panels.densePanel(spark, sfDir).df),
      graft.operators.FeatureSpec(lagTransforms = Map(1 -> Seq(
        RollingMean(7, pooling = graft.functions.Pooling(groupby = Seq("unique_id")))))))
    audit("pooled groupby rolling_mean", pooled)

    // Unpartitioned-window audit: every `Window.orderBy` with NO partition
    // key must sit over a collapsed relation (an aggregate / distinct —
    // calendar-sized, one row per ordinal or per bucket×ordinal). Those are
    // the benign "WindowExec: No Partition Defined" warnings in the bench
    // tail; an unpartitioned window over RAW rows would funnel the panel
    // through one task and is a scale bug this audit fails on.
    def auditGlobalWindows(label: String, df: DataFrame): Unit = {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct, GlobalLimit, Window => LWindow}
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      // a GlobalLimit child is bounded by construction (top-k results)
      val bad = wins.filterNot(_.child.collectFirst {
        case _: Aggregate => (); case _: Distinct => (); case _: Deduplicate => ()
        case _: GlobalLimit => ()
      }.isDefined)
      println(s"[profile] global-windows[$label]: total=${wins.size} " +
        s"overCollapsed=${wins.size - bad.size}")
      require(bad.isEmpty,
        s"unpartitioned window over a raw relation in [$label]:\n${bad.headOption}")
    }
    val denseP = PanelFrame(Panels.densePanel(spark, sfDir).df, freq = Freq.IntFreq(1))
    auditGlobalWindows("global pooled rolling_mean (aggregate fast path)",
      graft.operators.Featurizer.addFeatures(denseP,
        graft.operators.FeatureSpec(lagTransforms = Map(1 -> Seq(
          RollingMean(7, pooling = graft.functions.Pooling(global = true)))))))
    auditGlobalWindows("global time_agg collapse",
      graft.operators.Featurizer.addFeatures(denseP,
        graft.operators.FeatureSpec(lagTransforms = Map(1 -> Seq(
          RollingMean(4, pooling = graft.functions.Pooling(global = true,
            timeAgg = Some("sum"))))))))
    auditGlobalWindows("global bounded row-level (blocked evaluation)",
      graft.operators.Featurizer.addFeatures(denseP,
        graft.operators.FeatureSpec(lagTransforms = Map(1 -> Seq(
          RollingQuantile(0.5, 4, pooling = graft.functions.Pooling(global = true)))))))
    auditGlobalWindows("local spec has no global windows at all",
      graft.operators.Featurizer.addFeatures(denseP,
        graft.operators.FeatureSpec(lags = Seq(1, 7))))
    val scan = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 10).select("l_orderkey", "l_quantity")
    println("[profile] pushdown: " +
      scan.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim.take(160)).mkString(" | "))

    // k-NN join plan audit: the query side must broadcast (one linear
    // corpus pass, BroadcastNestedLoopJoin), the grouped top-k must run as
    // a partial-then-final ObjectHashAggregate (map-side k-bounded heaps),
    // and nothing may sort-merge or shuffle the N*Q scored pairs.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val knn = graft.operators.Similarity.knnJoin(emb,
      emb.filter(col("vec_id") % 100 === 0),
      "vec_id", "embedding", "vec_id", "embedding", k = 3)
    val knnPlan = knn.queryExecution.executedPlan.toString
    def knnN(op: String) = knnPlan.linesIterator.count(_.contains(op))
    println(s"[profile] plan[knn join]: bnlj=${knnN("BroadcastNestedLoopJoin")} " +
      s"objHashAgg=${knnN("ObjectHashAggregate")} smj=${knnN("SortMergeJoin")} " +
      s"exchanges=${knnN("Exchange")}")
    require(knnN("BroadcastNestedLoopJoin") == 1 && knnN("ObjectHashAggregate") == 2
      && knnN("SortMergeJoin") == 0,
      s"knn join plan regressed:\n$knnPlan")

    // Corpus-prep plan audit: the packing/mixture operators must stay
    // single-shuffle (one hash exchange on the stream/domain key feeding a
    // sorted window scan), and no corpus operator may plan a cartesian
    // product or funnel raw rows through an unpartitioned window.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def planOf(df: DataFrame) = df.queryExecution.executedPlan.toString
    val packPlan = planOf(graft.operators.Corpus.packSequences(
      docs, "doc_id", "text", capacity = 1024, nStreams = 64, salt = "audit"))
    val mixPlan = planOf(graft.operators.Corpus.sampleToTokenBudget(
      docs, "doc_id", "text", "source", Map("src0" -> 1000L), "audit"))
    def nIn(plan: String, op: String) = plan.linesIterator.count(_.contains(op))
    println(s"[profile] plan[pack sequences]: exchanges=${nIn(packPlan, "Exchange")}")
    println(s"[profile] plan[token-budget mixture]: exchanges=${nIn(mixPlan, "Exchange")}")
    require(nIn(packPlan, "Exchange") == 1 && nIn(packPlan, "CartesianProduct") == 0,
      s"packSequences must be single-shuffle:\n$packPlan")
    require(nIn(mixPlan, "Exchange") == 1 && nIn(mixPlan, "CartesianProduct") == 0,
      s"sampleToTokenBudget must be single-shuffle:\n$mixPlan")
    for ((label, df) <- Seq(
        "keyword stats" -> graft.operators.Corpus.keywordStats(docs, "doc_id", "text", 3),
        "bigram lm score" -> graft.operators.Corpus.bigramLmScore(docs, docs, "doc_id", "text"),
        "bpe pair counts" -> graft.operators.Bpe.bpePairCounts(docs, "text"))) {
      val p = planOf(df)
      println(s"[profile] plan[$label]: exchanges=${nIn(p, "Exchange")} " +
        s"cartesian=${nIn(p, "CartesianProduct")}")
      require(nIn(p, "CartesianProduct") == 0, s"$label plans a cartesian:\n$p")
    }

    // Retrieval / association / bucketing plan audit: the top-k operators
    // must end in TakeOrderedAndProject (per-partition heaps, no global
    // sort-exchange of the scored relation), quantile bucketing must plan
    // NO window at all (the ntile spelling would), and the winnowing
    // kernel must be a pure narrow map+explode — zero exchanges.
    val bm25Plan = planOf(graft.operators.Corpus.bm25TopK(
      docs, "doc_id", "text", Seq("spark", "window"), k = 10))
    val collocPlan = planOf(graft.operators.Corpus.collocationTopK(
      docs, "text", k = 15, minCount = 3L))
    val bucketPlan = planOf(graft.operators.Corpus.quantileBuckets(
      graft.operators.Corpus.lexicalDiversityStats(docs, "doc_id", "text"),
      "simpson", Seq(0.5), Seq("lo", "hi")))
    val winnowPlan = planOf(graft.operators.Dedup.winnowFingerprints(
      docs, "doc_id", "text"))
    println(s"[profile] plan[bm25 top-k]: takeOrdered=${nIn(bm25Plan, "TakeOrderedAndProject")} " +
      s"exchanges=${nIn(bm25Plan, "Exchange")}")
    println(s"[profile] plan[collocations]: takeOrdered=${nIn(collocPlan, "TakeOrderedAndProject")}")
    println(s"[profile] plan[quantile buckets]: windows=${nIn(bucketPlan, "Window")} " +
      s"broadcast=${nIn(bucketPlan, "BroadcastExchange") + nIn(bucketPlan, "BroadcastNestedLoopJoin")}")
    println(s"[profile] plan[winnow fingerprints]: exchanges=${nIn(winnowPlan, "Exchange")}")
    require(nIn(bm25Plan, "TakeOrderedAndProject") == 1 && nIn(bm25Plan, "SortMergeJoin") == 0,
      s"bm25TopK must end in per-partition heaps with no sort-merge join:\n$bm25Plan")
    require(nIn(collocPlan, "TakeOrderedAndProject") == 1,
      s"collocationTopK must end in per-partition heaps:\n$collocPlan")
    require(nIn(bucketPlan, "Window") == 0 && nIn(bucketPlan, "CartesianProduct") == 0,
      s"quantileBuckets must not plan a window or cartesian:\n$bucketPlan")
    require(nIn(winnowPlan, "Exchange") == 0 && nIn(winnowPlan, "CartesianProduct") == 0,
      s"winnowFingerprints must be a narrow map+explode:\n$winnowPlan")

    // Temporal-operator plan audit: the whole point of asofJoin /
    // rangeJoinBinned is refusing the inequality-join formulation, so the
    // audit FAILS if Catalyst ever plans a nested loop or cartesian for
    // them; sessionize must stay a single keyed window (one exchange).
    val ev = graft.sources.Panels.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"), col("event_type"), col("value"))
    val asofPlan = planOf(graft.operators.TemporalJoin.asofJoin(
      ev.filter(col("event_type") =!= "error"),
      ev.filter(col("event_type") === "error").select(col("user_id"), col("tus"), col("value")),
      keys = Seq("user_id"), leftTime = "tus", rightTime = "tus",
      payload = Seq("tus" -> "mt", "value" -> "mv"), tolerance = Some(7200000000L)))
    val rangePlan = planOf(graft.operators.TemporalJoin.rangeJoinBinned(
      ev.filter(col("event_type") =!= "error").select(col("user_id"), col("tus"), col("value")),
      ev.filter(col("event_type") === "error").select(col("event_id").as("win_id"),
        col("user_id"), col("tus").as("ws"), (col("tus") + 1800000000L).as("we")),
      keys = Seq("user_id"), pointCol = "tus", startCol = "ws", endCol = "we",
      binWidth = 1800000000L))
    val sessPlan = planOf(graft.operators.Sessions.sessionize(
      ev.select(col("user_id"), col("tus")), Seq("user_id"), "tus", gap = 1800000000L))
    println(s"[profile] plan[asof join]: exchanges=${nIn(asofPlan, "Exchange")} " +
      s"windows=${nIn(asofPlan, "Window")} bnlj=${nIn(asofPlan, "BroadcastNestedLoopJoin")}")
    println(s"[profile] plan[range join]: exchanges=${nIn(rangePlan, "Exchange")} " +
      s"bnlj=${nIn(rangePlan, "BroadcastNestedLoopJoin")}")
    println(s"[profile] plan[sessionize]: exchanges=${nIn(sessPlan, "Exchange")} " +
      s"windows=${nIn(sessPlan, "Window")}")
    require(nIn(asofPlan, "BroadcastNestedLoopJoin") == 0 && nIn(asofPlan, "CartesianProduct") == 0
        && nIn(asofPlan, "Window") == 1,
      s"asofJoin must be one keyed window, no nested loop:\n$asofPlan")
    require(nIn(rangePlan, "BroadcastNestedLoopJoin") == 0 && nIn(rangePlan, "CartesianProduct") == 0,
      s"rangeJoinBinned must plan an equi-join, never a nested loop:\n$rangePlan")
    // (two Window nodes — lag frame + cumsum frame — share ONE exchange
    // and one sort; the invariant is the single shuffle, not node count)
    require(nIn(sessPlan, "Exchange") == 1 && nIn(sessPlan, "Sort") == 1,
      s"sessionize must be a single keyed shuffle+sort:\n$sessPlan")

    // DSIR plan audit: the bucket log-ratio lut must reach the per-doc
    // weight join as a broadcast (it is <= `buckets` rows), the selection
    // must be TakeOrderedAndProject heaps (no global sort-exchange of the
    // full corpus), and nothing may plan a cartesian. The rank window sits
    // over the k-row limit — bounded, covered by the GlobalLimit rule in
    // auditGlobalWindows.
    val dsir = graft.operators.Corpus.dsirSample(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text",
      k = 50, buckets = 1024)
    val dsirPlan = planOf(dsir)
    println(s"[profile] plan[dsir sample]: bhj=${nIn(dsirPlan, "BroadcastHashJoin")} " +
      s"takeOrdered=${nIn(dsirPlan, "TakeOrderedAndProject")} " +
      s"cartesian=${nIn(dsirPlan, "CartesianProduct")}")
    require(nIn(dsirPlan, "BroadcastHashJoin") >= 1
        && nIn(dsirPlan, "TakeOrderedAndProject") == 1
        && nIn(dsirPlan, "CartesianProduct") == 0,
      s"dsirSample must broadcast the lut and select via heaps:\n$dsirPlan")
    auditGlobalWindows("dsir sample (rank over top-k limit)", dsir)

    // NB classifier plan audit: scoring is occurrence-to-weight equi-joins
    // plus per-doc aggregates — no cartesian, no global window; the
    // token-count relations may broadcast or shuffle (Catalyst sizes them),
    // but nothing may nested-loop.
    val nb = graft.operators.Corpus.nbQualityScore(
      docs.filter(col("lang") === "en"),
      docs.filter(not(col("lang") <=> "en")), docs, "doc_id", "text")
    val nbPlan = planOf(nb)
    println(s"[profile] plan[nb quality]: cartesian=${nIn(nbPlan, "CartesianProduct")} " +
      s"bnlj=${nIn(nbPlan, "BroadcastNestedLoopJoin")}")
    require(nIn(nbPlan, "CartesianProduct") == 0
        && nIn(nbPlan, "BroadcastNestedLoopJoin") == 0,
      s"nbQualityScore must stay equi-join only:\n$nbPlan")
    auditGlobalWindows("nb quality score", nb)

    // Cluster-balanced sample plan audit: ONE cluster-partitioned window
    // (the per-cluster rank), no unpartitioned window over raw rows, no
    // cartesian.
    val embT = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = graft.operators.Similarity.clusterBalancedSample(
      embT, "embedding", "vec_id", k = 16, perCluster = 5,
      iters = 3, samplePermille = 500)
    val cbsPlan = planOf(cbs)
    println(s"[profile] plan[cluster sample]: window=${nIn(cbsPlan, "Window")} " +
      s"cartesian=${nIn(cbsPlan, "CartesianProduct")}")
    require(nIn(cbsPlan, "CartesianProduct") == 0,
      s"clusterBalancedSample must not plan a cartesian:\n$cbsPlan")
    auditGlobalWindows("cluster-balanced sample", cbs)

    // PQ plan audit: ADC query-side must read ONLY the codes column (the
    // whole point — raw vectors out of the scan) and end in
    // TakeOrderedAndProject heaps; label-centroid scoring must broadcast
    // the centroid relation (the corpus itself never shuffles).
    val (pqBooks, pqEnc0) = graft.operators.Similarity.pqBuild(
      embT, "embedding", "vec_id", m = 4, ksub = 8, iters = 2,
      samplePermille = 500)
    // columnar round-trip so the query plan starts from a pruned scan, the
    // serving deployment shape (the index relation is written once)
    val pqDir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    pqEnc0.select(col("vec_id"), col("__codes")).write.mode("overwrite").parquet(pqDir)
    val pqEnc = spark.read.parquet(pqDir)
    val q0 = embT.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0)
    val pqQuery = graft.operators.Similarity.pqTopK(pqEnc, pqBooks, q0, 5, "vec_id")
    val pqPlan = planOf(pqQuery)
    println(s"[profile] plan[pq adc top-k]: takeOrdered=${nIn(pqPlan, "TakeOrderedAndProject")} " +
      s"exchanges=${nIn(pqPlan, "Exchange")} readsRawVecs=${pqPlan.contains("embedding")}")
    require(nIn(pqPlan, "TakeOrderedAndProject") == 1 && !pqPlan.contains("embedding"),
      s"pqTopK must heap-select over the codes column only:\n$pqPlan")
    val lcs = graft.operators.Similarity.labelCentroidScores(
      embT, "embedding", "vec_id", "label")
    val lcsPlan = planOf(lcs)
    println(s"[profile] plan[label centroids]: broadcast=${nIn(lcsPlan, "BroadcastExchange")} " +
      s"cartesian=${nIn(lcsPlan, "CartesianProduct")}")
    require(nIn(lcsPlan, "BroadcastExchange") >= 1 && nIn(lcsPlan, "CartesianProduct") == 0,
      s"labelCentroidScores must broadcast the centroids:\n$lcsPlan")

    // Panel diagnostics audit: imputation, Hampel, winsorize and the
    // decomposition all stay on the single id partition — no global
    // windows over raw rows, no cartesian.
    val dpanel = graft.sources.Panels.densePanel(spark, sfDir)
    auditGlobalWindows("fillForward + interpolate",
      dpanel.fillForward(Seq("y")).interpolateLinear("y").df)
    auditGlobalWindows("hampel k=3", graft.operators.Outliers.hampel(dpanel, 3))
    auditGlobalWindows("winsorize", graft.operators.Stats.winsorize(dpanel))
    val decPlan = planOf(graft.operators.Stats.decompose(dpanel, 7))
    println(s"[profile] plan[decompose]: cartesian=${nIn(decPlan, "CartesianProduct")}")
    require(nIn(decPlan, "CartesianProduct") == 0,
      s"decompose must not plan a cartesian:\n$decPlan")
    auditGlobalWindows("seasonal decompose", graft.operators.Stats.decompose(dpanel, 7))
    auditGlobalWindows("rolling shape moments",
      graft.operators.Stats.rollingShape(dpanel, dpanel.timeCol, 14))
    auditGlobalWindows("cusum changepoints",
      graft.operators.Stats.cusumChangepoints(dpanel))
    // Page CUSUM: the walk collapses to one row per series before the
    // kernel — no cartesian; the only Window nodes come from the SOURCE
    // panel's ordinal construction (id-partitioned), checked by
    // auditGlobalWindows
    val pcMon = graft.operators.Stats.pageCusum(
      dpanel.df.select(col("unique_id"), col(dpanel.timeCol), col("y")),
      dpanel.df.groupBy(col("unique_id"))
        .agg(org.apache.spark.sql.functions.avg(col("y")).as("mu")),
      "unique_id", dpanel.timeCol, "y", "mu", k = 1.0, h = 5.0)
    val pcPlan = planOf(pcMon)
    println(s"[profile] plan[page cusum]: cartesian=${nIn(pcPlan, "CartesianProduct")} " +
      s"windows=${nIn(pcPlan, "Window")}")
    require(nIn(pcPlan, "CartesianProduct") == 0,
      s"pageCusum must not plan a cartesian:\n$pcPlan")
    auditGlobalWindows("page cusum", pcMon)
    spark.stop()
  }
}
