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

  /** As-of join: for every row of `left`, attach `payload` columns from
    * the `right` row sharing `keys` that is, per `direction`:
    *
    *  - `"backward"` (default): greatest `rightTime <= leftTime`
    *    (strict `<` when `allowExactMatches = false`)
    *  - `"forward"`: smallest `rightTime >= leftTime` (strict `>` when
    *    `allowExactMatches = false`)
    *  - `"nearest"`: whichever of the two candidates has the smaller
    *    absolute gap; equal gaps resolve backward (and an exact match,
    *    gap 0, always wins through the backward arm)
    *
    * Unmatched rows keep all left columns with null payload (left-outer).
    * All three directions are the SAME single-sort plan: backward reads
    * `last(match)` over the preceding frame, forward reads `first(match)`
    * over the following frame, nearest reads both from one window sort.
    *
    * Determinism: when several right rows share (keys, time), the
    * lexicographically greatest payload tuple (field order = `payload`
    * order) wins — an explicit total order, not "last seen", so the result
    * is stable under repartitioning.
    *
    * `tolerance` (same units as the time columns, which must be integral
    * when it is set) null-outs matches with |gap| > tolerance; the bound
    * is inclusive.
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
      allowExactMatches: Boolean = true,
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    val clash = payload.map(_._2).filter(leftCols.contains)
    require(clash.isEmpty, s"payload output names collide with left columns: $clash")
    val dupOut = payload.map(_._2).diff(payload.map(_._2).distinct)
    require(dupOut.isEmpty,
      s"duplicate payload output names: ${dupOut.distinct} — the result " +
        "would carry ambiguous identically-named columns")

    // One row per (keys, rightTime): greatest payload tuple wins. A null
    // right time has no position on the axis (pandas merge_asof / SQL
    // ASOF would never match it) — without the filter it sorts FIRST and
    // becomes the spurious 'earliest' match of every otherwise-unmatched
    // backward left row.
    val deduped = right
      .filter(col(rightTime).isNotNull)
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
    // right row sorts at side 0. In a (time, side) sort a left row at
    // side +1 sits AFTER the same-t right (the preceding frame sees it,
    // the strictly-following frame does not); at side -1 the mirror
    // holds. The two arms need OPPOSITE tie sides in strict mode, so each
    // arm gets its own side column and its own window ordering — Catalyst
    // plans both orderings over ONE hash exchange (a second in-partition
    // sort for nearest, never a second shuffle).
    val sideB = if (allowExactMatches) 1 else -1  // backward arm's left side
    val sideF = -sideB                            // forward arm's left side
    val rSide = deduped.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__isL"),
        lit(0).as("__sb"), lit(0).as("__sf"),
        matchExpr.as("__match"), lit(null).cast(lrowType).as("__lrow")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__isL"),
        lit(sideB).as("__sb"), lit(sideF).as("__sf"),
        lit(null).cast(matchType).as("__match"), lrowExpr.as("__lrow")): _*)

    val part = Window.partitionBy(keys.map(col): _*)
    val backM = last(col("__match"), ignoreNulls = true)
      .over(part.orderBy(col("__t").asc, col("__sb").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwdM = first(col("__match"), ignoreNulls = true)
      .over(part.orderBy(col("__t").asc, col("__sf").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val unioned = lSide.unionByName(rSide)
    val withMatch = (direction match {
      case "backward" => unioned.withColumn("__m", backM)
      case "forward"  => unioned.withColumn("__m", fwdM)
      case "nearest"  =>
        val gapB = col("__t") - col("__b.__mt")
        val gapF = col("__f.__mt") - col("__t")
        unioned.withColumn("__b", backM).withColumn("__f", fwdM)
          .withColumn("__m",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(gapB <= gapF, col("__b")).otherwise(col("__f")))
    }).filter(col("__isL") === 1)

    val gap = direction match {
      case "backward" => col("__t") - col("__m.__mt")
      case "forward"  => col("__m.__mt") - col("__t")
      case "nearest"  => abs(col("__t") - col("__m.__mt"))
    }
    // a null LEFT time is emitted unmatched (left-join semantics): without
    // the __t guard a forward/nearest null-time left would sort first and
    // "match" the earliest right when no tolerance is set
    val tolOk = tolerance match {
      case Some(t) => col("__t").isNotNull && col("__m").isNotNull && gap <= lit(t)
      case None    => col("__t").isNotNull && col("__m").isNotNull
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

    // Exact floor division on longs, negative-safe (pmod is non-negative,
    // so c - pmod is an exact multiple of binWidth and integral `div`
    // truncation is exact for any sign). The `div` spelling matters: a
    // plain `/` is DOUBLE division, which mis-bins |t| >= 2^53 (e.g.
    // nanosecond epochs) and silently LOSES matches — the equi-join never
    // pairs the bins and the residual filter only removes, never recovers.
    def binOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
        .cast("long")

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
