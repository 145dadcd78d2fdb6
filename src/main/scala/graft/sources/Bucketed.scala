package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PanelFrame

/** Bucketed panel storage — the co-located-join layout for panels that are
  * read repeatedly (training pipelines re-read the same panel per model /
  * window / round). `bucketBy(id)` + `sortBy(id, ds)` persists the panel
  * pre-shuffled on the series key with rows pre-ordered per bucket, so:
  *
  *  - equi-joins between two tables bucketed the same way (panel × statics,
  *    panel × predictions, train × actuals) plan with NO Exchange on either
  *    side — the shuffle is paid once at write, amortized over every read;
  *  - per-series aggregates and window features read each series entirely
  *    within one bucket file split.
  *
  * This is plain Spark bucketing on the session catalog (parquet tables
  * under `spark.sql.warehouse.dir`) — no Hive dependency; the same calls
  * target a production metastore unchanged. Bucket count is a write-time
  * choice: size it so a bucket's rows fit one task comfortably
  * (series_count / buckets × row_size ≲ 100 MB).
  */
object Bucketed {

  /** Persist the panel bucketed by series id, sorted by (id, ds) within
    * buckets. Overwrites the table.
    */
  def writePanel(panel: PanelFrame, table: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    panel.df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, panel.idCol)
      .sortBy(panel.idCol, panel.timeCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed panel back. The catalog carries the bucket spec, so
    * downstream joins/aggregations on the bucket key skip their shuffle.
    */
  def readPanel(spark: SparkSession, table: String,
                idCol: String = "unique_id", timeCol: String = "ds",
                targetCol: String = "y",
                freq: graft.core.Freq): PanelFrame =
    PanelFrame(spark.table(table), idCol = idCol, timeCol = timeCol,
      targetCol = targetCol, freq = freq)

  /** Number of SHUFFLE Exchange operators a query over bucketed inputs
    * actually plans — the write-once-shuffle-never audit hook (0 for a
    * same-bucket equi-join or a bucket-key aggregate). BroadcastExchange
    * is not counted: broadcasting a small side moves no partitioned data.
    */
  def shuffleExchangeCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange") &&
          // a ReusedExchange line RESTATES its child's "Exchange
          // hashpartitioning(...)" description but plans (and pays) no
          // second shuffle — counting it would overstate the audit
          !l.contains("ReusedExchange"))
}
