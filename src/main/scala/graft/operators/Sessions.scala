package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization and interval coalescing — the two standard
  * reductions from raw event streams to dwell structure. Both are one
  * hash-exchange + one sort per key (the same cost envelope as any
  * per-key window), never a self-join.
  *
  * Both are deliberately TIE-INVARIANT: when several rows share a
  * timestamp (or an identical interval), every intra-tie ordering yields
  * the same session/group assignment, so results are stable across
  * engines and across shuffles — a precondition for the DuckDB oracle
  * twins to hash-match.
  */
object Sessions {

  /** Assign 1-based per-key session ids: a new session starts when the
    * gap to the previous event strictly exceeds `gap` (equal-to-gap stays
    * in-session; ties at the same timestamp always share a session).
    * `timeCol` must be integral; `gap` is in its units. Adds `session_id`
    * (long) to the input columns.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      gap: Long,
      sessionCol: String = "session_id"): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key")
    require(gap >= 0, "gap must be non-negative")
    require(!df.columns.contains(sessionCol), s"column $sessionCol already exists")
    // a null timestamp has no position on the axis: drop the row. Nulls
    // sort first, and `ts - null > gap` is null -> every null-time row
    // would otherwise open its OWN session and shift every real session id
    val rows = df.filter(col(timeCol).isNotNull)
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol).asc)
    val prev = lag(col(timeCol), 1).over(ord)
    // tie-invariant: at equal timestamps the gap is 0 <= gap, so the break
    // bit can only sit on the first-ordered row of the tie group, and the
    // running ROWS sum gives every tied row the same session id.
    val brk = when(prev.isNull || col(timeCol) - prev > gap, 1L).otherwise(0L)
    rows.withColumn(sessionCol,
      sum(brk).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Coalesce per-key intervals: overlapping or within-`minGap` intervals
    * (inclusive: `next.start <= prev.end + minGap`) merge into one row of
    * (keys, `start`, `end`, `n_merged`). Start/end columns must be
    * integral. The classic sweep — order by (start, end), running max of
    * end, break where the running max can't reach — as one window pass.
    */
  def mergeIntervals(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      minGap: Long = 0L): DataFrame = {
    require(keys.nonEmpty, "mergeIntervals needs at least one key")
    require(minGap >= 0, "minGap must be non-negative")
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol).asc, col(endCol).asc)
    // max end over all STRICTLY previous rows: identical (start, end)
    // duplicates are symmetric under reordering, distinct ties are totally
    // ordered by the (start, end) sort — so the grouping is tie-invariant.
    val reach = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val brk = when(reach.isNull || col(startCol) > reach + minGap, 1L).otherwise(0L)
    val grouped = df.withColumn("__grp",
      sum(brk).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped.groupBy((keys :+ "__grp").map(col): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("__grp")
  }
}
