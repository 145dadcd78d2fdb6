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
    *
    * The rank itself deliberately avoids an unpartitioned WindowExec: the
    * distinct calendar is shuffled to ONE partition, sorted within it
    * (asc_nulls_first — dense_rank's default null order), and numbered with
    * `monotonically_increasing_id`, which on a single partition is exactly
    * the 0-based row index. Same single-task cost on a bounded relation,
    * but the plan contains no `WindowExec: No Partition Defined` — so that
    * warning class in logs always signals a REAL defect, and PlanGuard's
    * window rule never has benign hits to explain away.
    */
  def withGlobalOrdinalScalable(df: DataFrame, timeCol: String,
                                ordCol: String = OrdCol): DataFrame = {
    val cal = df.select(col(timeCol)).distinct()
      .repartition(1).sortWithinPartitions(asc(timeCol))
      .withColumn(ordCol, monotonically_increasing_id())
    // null-SAFE join: a null timestamp must keep its row (the sort ranks
    // nulls first), not silently vanish in an inner join
    df.join(broadcast(cal.withColumnRenamed(timeCol, "__cal_ts")),
        col(timeCol) <=> col("__cal_ts"))
      .drop("__cal_ts")
  }
}
