package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel joins Spark's relational algebra lacks as primitives: the
  * backward as-of join (each left row picks up the latest right row at or
  * before its timestamp) and the bounded range join (each point row meets
  * every window containing it).
  *
  * Both are implemented as SHUFFLE-ONCE plans rather than the naive
  * inequality join, which Catalyst can only execute as a broadcast
  * nested-loop or cartesian product — the classic 100-TB scale killer:
  *
  *  - `asofJoin` uses the tag-union-window trick: tag both sides, union,
  *    and take `last(right_payload, ignoreNulls)` over a window partitioned
  *    by the equality keys and ordered by (time, side). One hash exchange on
  *    the keys, one sort — the same cost as any per-key window, no
  *    replication, no nested loop, skew bounded by key cardinality.
  *  - `rangeJoinBinned` quantizes time into fixed-width bins: each window
  *    replicates to the bins it covers, each point maps to exactly one bin,
  *    and the match becomes an equi-join on (keys, bin) plus a residual
  *    BETWEEN filter. Work is |points| + |windows| x bins-per-window, with a
  *    loud `raise_error` guard on runaway spans — never |points| x |windows|.
  *
  * Semantics mirror pandas `merge_asof` (direction="backward", tolerance,
  * allow_exact_matches) / DuckDB `ASOF LEFT JOIN`; the reference feeds
  * aligned exogenous frames through exactly this kind of temporal alignment
  * (utils.py fill_gaps + merge usage in forecast.py).
  */
object TemporalJoin {

  /** Backward as-of join: for every row of `left`, attach `payload` columns
    * from the `right` row with the greatest `rightTime <= leftTime` (strict
    * `<` when `allowExactMatches = false`) among rows sharing `keys`.
    * Unmatched rows keep all left columns with null payload (left-outer).
    *
    * Determinism: when several right rows share (keys, time), the
    * lexicographically greatest payload tuple (field order = `payload`
    * order) wins — an explicit total order, not "last seen", so the result
    * is stable under repartitioning.
    *
    * `tolerance` (same units as the time columns, which must be integral
    * when it is set) null-outs matches older than `leftTime - tolerance`;
    * the bound is inclusive.
    *
    * @param payload (right column -> output name) pairs; output names must
    *                not collide with left columns. Include `rightTime`
    *                itself to surface the matched timestamp.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    val clash = payload.map(_._2).filter(leftCols.contains)
    require(clash.isEmpty, s"payload output names collide with left columns: $clash")

    // One row per (keys, rightTime): greatest payload tuple wins.
    val deduped = right
      .groupBy((keys :+ rightTime).map(col): _*)
      .agg(max(struct(payload.map { case (c, _) => col(c) }: _*)).as("__p"))

    // Unified shape for the union: keys, time, side, match struct (right
    // only), full left row struct (left only). Nulls need the concrete
    // struct types, which are schema-only lookups (no job).
    val matchExpr = struct(col(rightTime).as("__mt"), col("__p"))
    val matchType = deduped.select(matchExpr.as("m")).schema.head.dataType
    val lrowExpr  = struct(leftCols.map(col): _*)
    val lrowType  = left.select(lrowExpr.as("r")).schema.head.dataType

    // Sort order at equal timestamps decides exact-match inclusion: the
    // right row sorts at side 0; a left row at side 1 sees it (>=), at
    // side -1 it does not (strict >).
    val leftSide = if (allowExactMatches) 1 else -1
    val rSide = deduped.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        matchExpr.as("__match"), lit(null).cast(lrowType).as("__lrow")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(leftSide).as("__side"),
        lit(null).cast(matchType).as("__match"), lrowExpr.as("__lrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") =!= 0)

    val tolOk = tolerance match {
      case Some(t) => col("__m").isNotNull && (col("__t") - col("__m.__mt")) <= lit(t)
      case None    => col("__m").isNotNull
    }
    val outPayload = payload.map { case (c, out) =>
      when(tolOk, col(s"__m.__p.`$c`")).as(out)
    }
    withMatch.select(col("__lrow.*") +: outPayload: _*)
  }

  /** Bounded range join: every `points` row meets every `windows` row with
    * the same `keys` and `startCol <= pointCol <= endCol` (inclusive both
    * ends). All point columns and all window columns come out; apart from
    * `keys`, the two column sets must be disjoint.
    *
    * The three time columns must share an integral type; pick `binWidth`
    * near the typical window span so most windows land in 1-2 bins. Windows
    * wider than `maxBinsPerWindow * binWidth` fail the job loudly
    * (raise_error) instead of silently exploding the replication factor,
    * and inverted windows (start > end) fail the same way rather than
    * letting `sequence()` quietly iterate backwards.
    */
  def rangeJoinBinned(
      points: DataFrame,
      windows: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      maxBinsPerWindow: Int = 1024): DataFrame = {
    require(keys.nonEmpty, "rangeJoinBinned needs at least one equality key")
    require(binWidth > 0, "binWidth must be positive")
    val overlap = (points.columns.toSet & windows.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"points and windows share non-key columns: ${overlap.toSeq.sorted}")

    // Exact floor division on longs, negative-safe (pmod is non-negative;
    // long/long division in Spark SQL truncates toward zero, which would
    // mis-bin negative times).
    def binOf(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")

    // The guard feeds the sequence bound itself, so column pruning can
    // never optimize it away.
    val nBins = binOf(col(endCol)) - binOf(col(startCol)) + lit(1L)
    val guardedEnd = when(col(startCol) > col(endCol),
        raise_error(concat(lit("rangeJoinBinned: inverted window, start > end at start="),
          col(startCol).cast("string"))))
      .when(nBins > maxBinsPerWindow,
        raise_error(concat(lit(s"rangeJoinBinned: window spans more than $maxBinsPerWindow bins at start="),
          col(startCol).cast("string"))))
      .otherwise(binOf(col(endCol)))
      .cast("long")
    val wExp = windows
      .withColumn("__bin", explode(sequence(binOf(col(startCol)), guardedEnd)))

    points.withColumn("__bin", binOf(col(pointCol)))
      .join(wExp, keys :+ "__bin", "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
