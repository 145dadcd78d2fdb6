package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A long-format panel: one row per (series id, timestamp) with a target and
  * optional static / dynamic exogenous columns.
  *
  * Mirrors the reference's required triplet (/root/reference/mlforecast/
  * core.py:551 `validate_format`) but keeps everything a DataFrame: the
  * (id, ds)-sorted distributed relation IS the reference's `GroupedArray`
  * (grouped_array.py:60-68) — Spark's hash partitioning by id plus
  * within-partition sort gives the same per-series contiguous layout without
  * a bespoke container, and it scales past one node.
  *
  * At 100 TB the invariant that matters is: every window stage partitions by
  * `idCol` (or a pooled bucket), so a single up-front hash-partition by id is
  * reused by all window operators (Catalyst recognizes the child ordering
  * and partitioning and elides redundant exchanges).
  */
final case class PanelFrame(
    df: DataFrame,
    idCol: String = "unique_id",
    timeCol: String = "ds",
    targetCol: String = "y",
    freq: Freq = Freq.Day,
    staticCols: Seq[String] = Nil,
    weightCol: Option[String] = None,
) {
  // loud at construction: a calendar freq over a timestamp axis (etc.)
  // would silently truncate types in every advance/grid expression
  if (df.columns.contains(timeCol))
    Freq.requireAxisType(freq, df.schema(timeCol).dataType)

  def id: Column = col(idCol)
  def ds: Column = col(timeCol)
  def y: Column = col(targetCol)

  /** Columns that are neither id/time/target/static/weight: dynamic exog
    * (reference core.py:475-494 `_get_dynamic_exog_cols`).
    */
  def dynamicCols: Seq[String] = {
    val known = Set(idCol, timeCol, targetCol) ++ staticCols ++ weightCol
    df.columns.filterNot(known.contains).toSeq
  }

  /** Validate the required columns exist (reference core.py:551-554 is the
    * shape check; the null-target rejection runs at fit time through
    * `Validation.requireValid`, which fuses it with the continuity scans).
    */
  def validateFormat(): PanelFrame = {
    val missing = Seq(idCol, timeCol, targetCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    this
  }

  /** Hash-partition by id and sort within partitions by (id, ds): the
    * canonical layout every window stage reuses. `numPartitions` defaults to
    * spark.sql.shuffle.partitions so local tests and clusters both behave.
    */
  def canonicalize(): PanelFrame =
    copy(df = df.repartition(id).sortWithinPartitions(id, ds))

  /** Last observed timestamp per series (reference `last_dates`). */
  def lastDates: DataFrame =
    df.groupBy(id).agg(max(ds).as("last_date"))

  /** One row per series with its static feature values (first row's values;
    * invariance is checked separately by Validation.staticViolations).
    * `min_by(c, ds)` — not sort+first, which Spark does not guarantee
    * through the aggregation shuffle.
    */
  def statics: DataFrame = {
    val firstByDs = staticCols.map(c => min_by(col(c), ds).as(c))
    if (staticCols.isEmpty) df.select(id).distinct()
    else df.groupBy(id).agg(firstByDs.head, firstByDs.tail: _*)
  }

  /** Per-series tail trim: keep the last `n` rows of every series
    * (reference `keep_last_n`, grouped_array.py:189-198). Implemented as a
    * descending row_number filter — one shuffle-free window pass when the
    * frame is already canonical.
    */
  def keepLastN(n: Int): PanelFrame = {
    val w = Window.partitionBy(id).orderBy(ds.desc)
    copy(df = df
      .withColumn("__rn_from_end", row_number().over(w))
      .filter(col("__rn_from_end") <= n)
      .drop("__rn_from_end"))
  }

  /** Densify the panel onto the freq grid: one row per (id, ds) for every
    * grid step between each series' first and last observation (optionally
    * aligned to the GLOBAL min/max with `globalStart`/`globalEnd`, the
    * `fill_gaps(start=..., end=...)` knobs), with null target/exog on the
    * filled rows — the reference ecosystem's
    * `utilsforecast.preprocessing.fill_gaps` (see the TemporalJoin scaladoc
    * citation), required before window transforms on sparse event-derived
    * panels.
    *
    * Distributed shape: one per-series bounds aggregate (two scalars when
    * global alignment is on), sequence+explode onto the grid — no driver
    * loop — then one left equi-join of the grid to the observed rows on
    * (id, ds); at scale both sides hash-partition on id and the join
    * reuses the canonical layout.
    */
  def fillGaps(globalStart: Boolean = false, globalEnd: Boolean = false): PanelFrame = {
    val bounds0raw = df.groupBy(id).agg(min(ds).as("__lo"), max(ds).as("__hi"))
    // global bounds derive from the per-series bounds already computed —
    // min of mins / max of maxes over the id-sized relation, pinned so the
    // panel is scanned ONCE (each global flag previously cost its own
    // full-panel aggregation scan)
    val bounds0 =
      if (globalStart || globalEnd) bounds0raw.localCheckpoint() else bounds0raw
    val bounds1 =
      if (!globalStart) bounds0
      else bounds0.crossJoin(broadcast(bounds0.agg(min(col("__lo")).as("__glo"))))
        .withColumn("__lo", col("__glo")).drop("__glo")
    val bounds =
      if (!globalEnd) bounds1
      else bounds1.crossJoin(broadcast(bounds0.agg(max(col("__hi")).as("__ghi"))))
        .withColumn("__hi", col("__ghi")).drop("__ghi")
    val grid = bounds
      .select(id, col("__lo"),
        explode(sequence(lit(0L),
          freq.periodsBetween(col("__hi"), col("__lo")).cast("long"))).as("__step"))
      .select(id, freq.advance(col("__lo"), col("__step")).as(timeCol))
    copy(df = grid.join(df, Seq(idCol, timeCol), "left"))
  }

  /** Forward-fill nulls per series: every row takes the last non-null value
    * at or before it in (id, ds) order — pandas `ffill` / LOCF, the standard
    * companion to [[fillGaps]] for densified event panels. One window pass
    * that reuses the canonical id-partitioned layout (no extra shuffle when
    * the frame is already canonical); state per window frame is a single
    * running value, so the pass is safe at any series length.
    */
  /** pandas parity: NaN IS the missing marker there, so a floating column
    * folds NaN to null before any fill — otherwise a NaN row is treated as
    * a valid value/anchor and poisons the fill instead of being repaired.
    */
  private def missing(c: String): Column = df.schema(c).dataType match {
    case org.apache.spark.sql.types.DoubleType => nanvl(col(c), lit(null))
    case org.apache.spark.sql.types.FloatType =>
      nanvl(col(c).cast("double"), lit(null)).cast("float")
    case _ => col(c)
  }

  def fillForward(cols: Seq[String]): PanelFrame = {
    require(cols.nonEmpty, "fillForward needs at least one column")
    val w = Window.partitionBy(id).orderBy(ds)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    copy(df = cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(missing(c), ignoreNulls = true).over(w))
    })
  }

  /** Backward-fill nulls per series: the [[fillForward]] mirror (pandas
    * `bfill`) — every row takes the next non-null value at or after it.
    */
  def fillBackward(cols: Seq[String]): PanelFrame = {
    require(cols.nonEmpty, "fillBackward needs at least one column")
    val w = Window.partitionBy(id).orderBy(ds)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    copy(df = cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, first(missing(c), ignoreNulls = true).over(w))
    })
  }

  /** Linear interpolation of null runs per series on the frequency grid —
    * pandas `Series.interpolate(method="linear")` semantics: interior nulls
    * get the straight line between the surrounding non-null anchors
    * (fraction = grid steps since the previous anchor / steps between the
    * anchors), trailing nulls copy the last anchor (pandas' forward limit
    * direction), leading nulls stay null. Two window passes (previous /
    * next anchor) over the canonical layout; constant state per frame.
    */
  def interpolateLinear(c: String): PanelFrame = {
    val wPrev = Window.partitionBy(id).orderBy(ds)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(id).orderBy(ds)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = missing(c)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(when(v.isNotNull, ds), ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(when(v.isNotNull, ds), ignoreNulls = true).over(wNext)
    val frac = freq.periodsBetween(ds, prevT).cast("double") /
      freq.periodsBetween(nextT, prevT).cast("double")
    val filled = when(v.isNotNull, v)
      .when(prevV.isNull, lit(null).cast("double"))
      .when(nextV.isNull, prevV)
      .otherwise(prevV + (nextV - prevV) * frac)
    copy(df = df.withColumn(c, filled))
  }

  /** Future grid: one row per (id, ds) for ds in (last_date, last_date + h*freq]
    * (reference forecast.py:1425-1443 `make_future_dataframe`). Generated
    * distributed via sequence+explode — no driver loop.
    */
  def futureGrid(h: Int): DataFrame = {
    // sequence(1, 0) descends ([1, 0]) — h<=0 would emit two rows per
    // series, one of them an in-sample timestamp
    require(h >= 1, s"h must be a positive integer, got $h")
    lastDates
      .select(id, col("last_date"), explode(sequence(lit(1), lit(h))).as("__step"))
      .select(id, freq.advance(col("last_date"), col("__step")).as(timeCol))
  }
}
