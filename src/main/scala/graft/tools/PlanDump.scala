package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named oracle queries — the
  * `.explain("formatted")` loop the scale doctrine prescribes, as a
  * runnable diagnostic: `runMain graft.tools.PlanDump <sfDir> <query>...`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // diagnostic conf passthrough (e.g. dump a conf-routed path's other
    // shape): SPARK_GRAFT_PLAN_CONF="k=v,k2=v2"
    sys.env.get("SPARK_GRAFT_PLAN_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    graft.OracleQueries.all.filter(q => names(q.name)).foreach { q =>
      println(s"== ${q.name}")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
