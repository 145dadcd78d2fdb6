package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dense time ordinals — the integer "period index" every window frame is
  * expressed over.
  *
  * The reference's SQL oracle defines the semantics exactly
  * (/root/reference/tests/test_pooled_sqlite_oracle.py:168-172):
  * `DENSE_RANK() OVER (PARTITION BY scope ORDER BY ds) - 1`. Pooled
  * partition_by modes derive the ordinal from the PARENT calendar (the
  * series' / group's / global distinct timestamps) so that timestamps absent
  * from a partition bucket leave holes (pooled.py:427-460
  * `_compute_time_index_from_parent`) — RANGE frames over the ordinal then
  * skip those holes naturally.
  */
object Ordinals {
  val OrdCol = "__ord"

  /** Attach a dense 0-based ordinal over `scope` (empty scope = global). */
  def withOrdinal(df: DataFrame, scope: Seq[String], timeCol: String,
                  ordCol: String = OrdCol): DataFrame = {
    val w =
      if (scope.isEmpty) Window.orderBy(col(timeCol))
      else Window.partitionBy(scope.map(col): _*).orderBy(col(timeCol))
    df.withColumn(ordCol, (dense_rank().over(w) - 1).cast("long"))
  }

  /** Global scope needs care: `Window.orderBy` with no partition is a single
    * task. For a global calendar at scale, rank the DISTINCT timestamps
    * (small: one row per period) and broadcast-join back.
    */
  def withGlobalOrdinalScalable(df: DataFrame, timeCol: String,
                                ordCol: String = OrdCol): DataFrame = {
    val cal = df.select(col(timeCol)).distinct()
      .withColumn(ordCol, (dense_rank().over(Window.orderBy(col(timeCol))) - 1).cast("long"))
    // null-SAFE join: a null timestamp must keep its row (dense_rank in the
    // single-task path ranks nulls), not silently vanish in an inner join
    df.join(broadcast(cal.withColumnRenamed(timeCol, "__cal_ts")),
        col(timeCol) <=> col("__cal_ts"))
      .drop("__cal_ts")
  }
}
