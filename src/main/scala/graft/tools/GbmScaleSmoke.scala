package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.forecast.GraftGbm

/** Scale smoke for the native histogram GBDT: trains the same config on
  * 1× and K× copies of the sf panel (ids salted so series multiply, not
  * lengthen) and reports wall time per stage. The histogram passes are one
  * narrow scan + fixed-size partials per round, so fit time should scale
  * ~linearly in rows while driver traffic stays FLAT (fixed-topology
  * reduction: ≤ fanIn partials per process regardless of partitions).
  *
  *   sbt "runMain graft.tools.GbmScaleSmoke /root/testdata/sf0.1 8"
  */
object GbmScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // lag features off the dense panel: 4 lags + y, one frame
    def featurized(copies: Int): DataFrame = {
      val base = graft.sources.Panels.densePanel(spark, sfDir).df
      val panel = (0 until copies).map { c =>
        base.select((col("unique_id") + lit(c * 1000000)).as("unique_id"),
          col("ds"), col("y"))
      }.reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("unique_id")).orderBy(col("ds"))
      panel
        .withColumn("lag1", lag(col("y"), 1).over(w))
        .withColumn("lag7", lag(col("y"), 7).over(w))
        .withColumn("lag14", lag(col("y"), 14).over(w))
        .withColumn("lag28", lag(col("y"), 28).over(w))
        .na.drop()
    }
    val feats = Seq("lag1", "lag7", "lag14", "lag28")
    // driverFitMaxRows = 0: this smoke measures the DISTRIBUTED histogram
    // path's scaling — the auto driver-local path would absorb these sizes
    val conf = GraftGbm(numRounds = 10, numLeaves = 15, maxDepth = 4,
      minDataInLeaf = 20, driverFitMaxRows = 0)

    def run(copies: Int): (Long, Double) = {
      val df = featurized(copies)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = df.count()
      val t0 = System.nanoTime()
      conf.fit(df, feats, "y", None)
      val sec = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      (rows, sec)
    }
    run(1) // warm classes/codegen, uncounted
    val (r1, t1) = run(1)
    val (rk, tk) = run(mult)
    println(f"[gbm-scale] 1x: $r1%,d rows ${t1}%6.2f s")
    println(f"[gbm-scale] ${mult}x: $rk%,d rows ${tk}%6.2f s")
    println(f"[gbm-scale] rows x${rk.toDouble / r1}%.1f -> time x${tk / t1}%.2f " +
      "(linear = matching multipliers; sublinear = fixed per-round overhead amortizing)")
    spark.stop()
  }
}
