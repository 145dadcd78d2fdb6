package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tools.PlanGuard

/** The runtime scale guard must itself be verified: a guard that never
  * fires is indistinguishable from coverage. These tests drive real
  * executed plans through a registered guard and assert both directions —
  * it FIRES on the scale bugs it exists for and stays SILENT on the benign
  * shapes the engine legitimately produces.
  */
class PlanGuardSpec extends SparkSpec {
  import spark.implicits._

  private def drain(): Unit =
    org.apache.spark.sql.graft.bridge.waitForListeners(spark)

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("fires on an unpartitioned window over a raw relation") {
    val guard = PlanGuard.install(spark, maxRows = 1000)
    try {
      guard.label = "bad_window"
      run(spark.range(5000).select(col("id"),
        row_number().over(Window.orderBy(col("id"))).as("rn")))
      drain()
      guard.label = null
      assert(guard.violations.exists(v =>
        v.startsWith("bad_window") && v.contains("no partition spec")),
        s"guard silent; got ${guard.violations}")
    } finally spark.listenerManager.unregister(guard)
  }

  test("stays silent on partitioned windows and small global windows") {
    val guard = PlanGuard.install(spark, maxRows = 1000)
    try {
      guard.label = "ok"
      // partitioned window over many rows: fine
      run(spark.range(5000).select(col("id"), (col("id") % 8).as("g"))
        .select(col("id"),
          row_number().over(Window.partitionBy(col("g")).orderBy(col("id"))).as("rn")))
      // unpartitioned window over a COLLAPSED (sub-threshold) relation: fine
      run(spark.range(5000).select((col("id") % 50).as("g"))
        .groupBy("g").count()
        .select(col("g"), row_number().over(Window.orderBy(col("g"))).as("rn")))
      drain()
      guard.label = null
      assert(guard.violations.isEmpty, s"false positives: ${guard.violations}")
    } finally spark.listenerManager.unregister(guard)
  }

  test("fires on a large cartesian product, not on broadcast all-pairs") {
    val guard = PlanGuard.install(spark, maxRows = 1000)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      guard.label = "bad_cartesian"
      // tiny sides would auto-broadcast into a BNLJ; disable the threshold
      // so the planner produces the CartesianProductExec the guard targets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(3000).select(col("id").as("a"))
      val big2 = spark.range(3000).select(col("id").as("b"))
      run(big.crossJoin(big2).filter(col("a") + col("b") === 5999))
      drain() // async callbacks must land before the label changes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      guard.label = "ok_broadcast"
      // 1-row broadcast side: the legit scalar-attach shape
      val one = spark.range(3000).agg(count(lit(1)).as("n"))
      run(spark.range(3000).crossJoin(broadcast(one)))
      drain()
      guard.label = null
      val v = guard.violations
      assert(v.exists(_.startsWith("bad_cartesian")), s"cartesian missed: $v")
      assert(!v.exists(_.startsWith("ok_broadcast")), s"broadcast flagged: $v")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.listenerManager.unregister(guard)
    }
  }

  test("broadcast build sides count zero toward window input rows") {
    // r7 ADVICE: summing ALL child branches over-counts broadcast joins —
    // the build side is not part of the streamed input. Drive a real
    // broadcast join and assert (a) the guard recognizes its exchange /
    // query-stage nodes and (b) a sub-threshold probe side with an
    // over-threshold broadcast side stays silent.
    val guard = PlanGuard.install(spark, maxRows = 1000)
    try {
      guard.label = "ok_bhj_window"
      val probe = spark.range(300).select(col("id").as("k"))
      val build = spark.range(5000).select(col("id").as("k"), lit(1).as("v"))
      val joined = probe.join(broadcast(build), Seq("k"))
      run(joined.select(col("k"),
        row_number().over(Window.orderBy(col("k"))).as("rn")))
      drain()
      guard.label = null
      assert(!guard.violations.exists(_.startsWith("ok_bhj_window")),
        s"broadcast build side tripped the window guard: ${guard.violations}")
      // the plan really contained a broadcast branch the guard zero-costs
      val plan = joined.queryExecution.executedPlan
      joined.collect()
      val bcastNodes = guard.nodes(plan).filter(guard.isBroadcastBranch)
      assert(bcastNodes.nonEmpty, s"no broadcast node recognized in:\n$plan")
    } finally spark.listenerManager.unregister(guard)
  }

  test("preprocess stays a single pipeline: one scan, no joins (r8 rewrites)") {
    // locks the round-8 duplicate-lineage fix: the diff+scaler+feature
    // stack must plan as ONE pipeline — a single leaf scan and zero joins.
    // A reintroduced aggregate+join-back (the old scaler shape) doubles the
    // leaf count and fails here before it ever reaches a benchmark.
    import graft.core.{Freq, PanelFrame}
    import graft.forecast.{Differences, LocalStandardScaler, MLForecast, Models}
    import graft.functions.{RollingMax, RollingMean, RollingMin}
    import graft.operators.FeatureSpec
    val panel = PanelFrame(
      spark.range(400).select(
        (col("id") % 8).cast("string").as("unique_id"),
        (col("id") / 8).cast("long").as("ds"),
        ((col("id") * 37) % 97).cast("double").as("y")),
      freq = Freq.IntFreq(1))
    val conf = MLForecast(Seq(Models.naive), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1, 7),
        lagTransforms = Map(
          1 -> Seq(RollingMean(7), RollingMin(7), RollingMax(7)),
          7 -> Seq(RollingMean(7)))),
      targetTransforms = Seq(Differences(Seq(1, 7)), LocalStandardScaler()))
    val plan = conf.preprocess(panel).queryExecution.sparkPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(nodes)
    val ns = nodes(plan)
    val leaves = ns.count(_.children.isEmpty)
    val joins = ns.count(_.nodeName.toLowerCase.contains("join"))
    val exchanges = ns.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(leaves == 1, s"preprocess grew duplicate lineage: $leaves leaf scans\n$plan")
    assert(joins == 0, s"preprocess grew a join: \n$plan")
    assert(exchanges <= 1, s"preprocess reshuffles: $exchanges exchanges\n$plan")
  }

  test("warmup (null label) executions are ignored") {
    val guard = PlanGuard.install(spark, maxRows = 1000)
    try {
      run(spark.range(5000).select(col("id"),
        row_number().over(Window.orderBy(col("id"))).as("rn")))
      drain()
      assert(guard.violations.isEmpty)
    } finally spark.listenerManager.unregister(guard)
  }
}
