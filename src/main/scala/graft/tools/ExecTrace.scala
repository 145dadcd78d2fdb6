package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionStart, SparkListenerSQLExecutionEnd}
import org.apache.spark.scheduler.SparkListenerEvent

/** Per-execution trace for a named SparkEntry query: prints each SQL
  * execution's description and duration so driver-action stacks can be
  * localized. Diagnostic only — not part of the driver contract.
  *
  *   sbt "runMain graft.tools.ExecTrace /root/testdata/sf0.01 update_then_predict_diff_naive"
  */
object ExecTrace {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExecTrace <sfDir> <query>...")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, String, Double)]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case s: SparkListenerSQLExecutionStart =>
          starts.put(s.executionId, (s.description, s.time))
        case e: SparkListenerSQLExecutionEnd =>
          Option(starts.get(e.executionId)).foreach { case (d, t0) =>
            order.add((e.executionId, d, (e.time - t0) / 1e3))
          }
        case _ => ()
      }
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      mat(fn(spark, sfDir)) // warm — untraced
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      order.clear(); starts.clear()
      spark.sparkContext.addSparkListener(listener)
      mat(fn(spark, sfDir))
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      spark.sparkContext.removeSparkListener(listener)
      println(s"== $name")
      order.forEach { case (id, desc, sec) =>
        println(f"  [$id%3d] $sec%7.3f s  ${desc.linesIterator.next().take(110)}")
      }
    }
    spark.stop()
  }
}
