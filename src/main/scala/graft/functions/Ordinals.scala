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

  /** Attach a dense 0-based ordinal over `scope`. Empty scope = global,
    * which DELEGATES to [[withGlobalOrdinalScalable]]: a bare
    * `Window.orderBy` would plan the unpartitioned WindowExec this engine
    * bans outright (PlanGuard fails executed plans on it at any row
    * count), so the public API must not keep that plan one call away.
    */
  def withOrdinal(df: DataFrame, scope: Seq[String], timeCol: String,
                  ordCol: String = OrdCol): DataFrame =
    if (scope.isEmpty) withGlobalOrdinalScalable(df, timeCol, ordCol)
    else {
      val w = Window.partitionBy(scope.map(col): _*).orderBy(col(timeCol))
      df.withColumn(ordCol, (dense_rank().over(w) - 1).cast("long"))
    }

  /** Global scope needs care: `Window.orderBy` with no partition is a single
    * task. For a global calendar at scale, rank the DISTINCT timestamps
    * (one row per period) and broadcast-join back.
    *
    * The rank itself is DISTRIBUTED and WindowExec-free: the distinct
    * calendar is range-partitioned on the timestamp (asc_nulls_first —
    * dense_rank's default null order) and sorted within each partition, so
    * `monotonically_increasing_id` exposes both the partition id (upper 31
    * bits) and the 0-based row index within it (lower 33 bits). Per-
    * partition row counts — at most one row per range partition, never more
    * than `spark.sql.shuffle.partitions` rows — turn into exclusive prefix
    * offsets through a lazily-planned triangular broadcast self-join (no
    * driver action, no window), and `offset + index` is exactly
    * `dense_rank() - 1`. No task ever holds more than its ordinal range of
    * the calendar, and the plan contains no `WindowExec: No Partition
    * Defined` — so that warning class in logs always signals a REAL defect,
    * and PlanGuard's window rule never has benign hits to explain away.
    *
    * The broadcast join-back is sized for CALENDAR-bounded relations (one
    * row per period); millisecond-frequency global pooling, where the
    * calendar scales with the row count, is refused up-front by the
    * featurizer's MilliFreq guard.
    */
  def withGlobalOrdinalScalable(df: DataFrame, timeCol: String,
                                ordCol: String = OrdCol): DataFrame =
    attachCalendar(df, globalCalendar(df, timeCol, ordCol), timeCol)

  /** Null-safe broadcast join-back of a `(timeCol, ordCol)` calendar
    * relation (a null timestamp must keep its row — the rank sorts nulls
    * first — so an inner equi-join would silently drop it).
    */
  def attachCalendar(df: DataFrame, cal: DataFrame, timeCol: String): DataFrame =
    df.join(broadcast(cal.withColumnRenamed(timeCol, "__cal_ts")),
        col(timeCol) <=> col("__cal_ts"))
      .drop("__cal_ts")

  /** The distributed `(timeCol, ordCol)` global calendar rank itself —
    * exposed so callers with several pooled groups over the SAME panel can
    * build it once and attach it per group: one analyzed subtree lets
    * Spark's ReuseExchange deduplicate the distinct/rank work inside a
    * single executed plan instead of re-running it per group.
    */
  def globalCalendar(df: DataFrame, timeCol: String,
                     ordCol: String = OrdCol): DataFrame = {
    val indexed = df.select(col(timeCol)).distinct()
      .repartitionByRange(col(timeCol).asc_nulls_first)
      .sortWithinPartitions(col(timeCol).asc_nulls_first)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33).cast("int"))
      .withColumn("__idx", col("__mid").bitwiseAND((1L << 33) - 1))
      .drop("__mid")
    // The `indexed` subtree is evaluated TWICE (counts branch below and the
    // final join): the prefix offsets are only consistent with the row side
    // if both evaluations read the SAME range exchange. Spark's
    // ReuseExchange dedupes the identical subtrees inside one executed
    // plan, but range boundaries are SAMPLED, so if reuse is ever disabled
    // or defeated the two evaluations could cut the calendar differently
    // and the ordinals would go silently wrong. Rather than pinning
    // (localCheckpoint/persist would add an eager action or cache-lifetime
    // management to a deliberately lazy declaration), the counts branch
    // carries each partition's (min, max, hasNull) VALUE RANGE and the
    // join-back asserts every row's timestamp falls inside its partition's
    // recorded range. Range partitions are disjoint intervals over the
    // distinct timestamps, so ANY row landing in a different partition
    // than the counts evaluation saw falls outside that interval and
    // raises — divergence can corrupt nothing silently.
    val counts = indexed.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"),
      min(col(timeCol)).as("__pmn"), max(col(timeCol)).as("__pmx"),
      max(col(timeCol).isNull.cast("int")).as("__pnull"))
    // exclusive prefix sum over <= numShufflePartitions rows: a triangular
    // broadcast join stays fully lazy (collecting the counts would add a
    // driver action per featurize group and break action budgets)
    val offs = counts.as("a")
      .join(broadcast(counts.select(col("__pid").as("__bpid"),
        col("__cnt").as("__bcnt"))), col("__bpid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"), col("a.__cnt").as("__cnt"),
        col("a.__pmn").as("__pmn"), col("a.__pmx").as("__pmx"),
        col("a.__pnull").as("__pnull"))
      .agg(coalesce(sum(col("__bcnt")), lit(0L)).as("__off"))
    // LEFT join: an inner join would silently DROP rows landing in a
    // partition the counts evaluation saw as empty (offs has no row for
    // that pid) — the one divergence class the range check below cannot
    // reach. With the left join such rows carry a null __cnt and raise.
    val inRange = col("__cnt").isNotNull &&
      when(col(timeCol).isNull, col("__pnull") === 1)
        .otherwise(col("__idx") < col("__cnt") &&
          col(timeCol) >= col("__pmn") && col(timeCol) <= col("__pmx"))
    indexed.join(broadcast(offs), Seq("__pid"), "left")
      .withColumn(ordCol, when(inRange, col("__off") + col("__idx"))
        .otherwise(raise_error(lit(
          "Ordinals.globalCalendar: calendar rank divergence — a row landed " +
            "outside the partition range its prefix offsets were computed " +
            "on (range-exchange reuse defeated?)")).cast("long")))
      .drop("__pid", "__idx", "__off", "__cnt", "__pmn", "__pmx", "__pnull")
  }
}
