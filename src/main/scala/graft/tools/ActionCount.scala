package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Driver-action auditor: runs named SparkEntry queries and reports, per
  * query, the number of distinct SQL executions (driver round-trips) and
  * raw scheduler jobs it issued. The quantity that matters for driver-loop
  * operators is EXECUTIONS — each is a blocking action; AQE multiplies
  * jobs per execution by a Spark-version constant.
  *
  *   sbt "runMain graft.tools.ActionCount /root/testdata/sf0.1 predict_bday_recursive ..."
  */
object ActionCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ActionCount <sfDir> <query>...")
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (js.properties != null) {
          Option(js.properties.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(js.properties.getProperty("spark.sql.execution.id")))
            .foreach(execs.add)
        }
      }
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      mat(fn(spark, sfDir)) // warm (classes/codegen) — uncounted
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      execs.clear(); jobs.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      mat(fn(spark, sfDir))
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[actions] $name%-36s executions=${execs.size}%4d " +
        f"jobs=${jobs.get}%4d warm_sec=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
