package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Panel validation — continuity, duplicates, static invariance, update
  * start-dates. Mirrors /root/reference/mlforecast/data_validation.py and
  * core.py:216-236, re-expressed as pure DataFrame aggregations: each check
  * is a single partial+final hash aggregate keyed by id, which scales
  * linearly and broadcasts nothing.
  */
object Validation {

  /** Per-series continuity stats (reference data_validation.py:117-141):
    * duplicates when countDistinct(ds) != count, gaps when
    * max(ds) != min(ds) + (n_unique - 1) * freq.
    *
    * Returns one row per offending series with boolean flags; an empty
    * result means the panel is valid.
    */
  def continuityViolations(p: PanelFrame): DataFrame = {
    val stats = p.df.groupBy(p.id).agg(
      min(p.ds).as("min_ds"),
      max(p.ds).as("max_ds"),
      count(lit(1)).as("n_rows"),
      countDistinct(p.ds).as("n_unique"),
    )
    stats
      .withColumn("has_duplicates", col("n_rows") =!= col("n_unique"))
      .withColumn(
        "has_gaps",
        col("max_ds") =!= p.freq.advance(col("min_ds"), col("n_unique") - lit(1)))
      .filter(col("has_duplicates") || col("has_gaps"))
  }

  /** Rows whose timestamp is off the freq's day-of-week grid: business-day
    * panels with weekend rows, anchored weekly panels (W-MON …) off their
    * anchor day. Empty for frequencies without a day-of-week grid.
    */
  def gridViolations(p: PanelFrame): DataFrame = p.freq match {
    case Freq.BusinessDayFreq(_) =>
      p.df.filter(weekday(p.ds) > 4).select(p.id, p.ds)
    case Freq.WeekFreq(_, Some(a)) =>
      p.df.filter(weekday(p.ds) =!= a).select(p.id, p.ds)
    case _ =>
      p.df.filter(lit(false)).select(p.id, p.ds)
  }

  /** Throw if the panel has duplicate timestamps or gaps — or, for
    * day-of-week-gridded freqs, off-grid rows (a weekend row under
    * BusinessDayFreq aliases to the next Monday's business ordinal, so
    * continuity alone cannot catch it).
    */
  def requireContinuity(p: PanelFrame): Unit = {
    val bad = continuityViolations(p).limit(5).collect()
    require(bad.isEmpty,
      s"panel has continuity violations (first ${bad.length}): ${bad.mkString("; ")}")
    val offGrid = gridViolations(p).limit(5).collect()
    require(offGrid.isEmpty,
      s"panel has off-grid timestamps for ${p.freq} (first ${offGrid.length}): " +
        offGrid.mkString("; "))
  }

  /** Continuity + day-of-week grid + null-target checks FUSED into one
    * per-id aggregate and one driver action — the fit path runs this before
    * every pipeline, and the separate requireContinuity / gridViolations /
    * requireNoNullTarget actions cost three full panel scans where one
    * suffices. Same violation definitions as the standalone relations
    * (which remain the user-facing diagnostics).
    */
  def requireValid(p: PanelFrame): Unit = {
    val offGrid = p.freq match {
      case Freq.BusinessDayFreq(_)   => weekday(p.ds) > 4
      case Freq.WeekFreq(_, Some(a)) => weekday(p.ds) =!= a
      case _                         => lit(false)
    }
    val bad = p.df.groupBy(p.id).agg(
        min(p.ds).as("min_ds"),
        max(p.ds).as("max_ds"),
        count(lit(1)).as("n_rows"),
        countDistinct(p.ds).as("n_unique"),
        sum(when(p.y.isNull || isnan(p.y), 1L).otherwise(0L)).as("null_targets"),
        sum(when(offGrid, 1L).otherwise(0L)).as("offgrid_rows"))
      .withColumn("has_duplicates", col("n_rows") =!= col("n_unique"))
      .withColumn("has_gaps",
        col("max_ds") =!= p.freq.advance(col("min_ds"), col("n_unique") - lit(1)))
      .filter(col("has_duplicates") || col("has_gaps") ||
        col("null_targets") > 0 || col("offgrid_rows") > 0)
      .limit(5).collect()
    require(bad.isEmpty,
      s"panel fails validation (first ${bad.length} offending series; " +
        s"columns: id, min_ds, max_ds, n_rows, n_unique, null_targets, " +
        s"offgrid_rows@${p.freq}, has_duplicates, has_gaps): " +
        bad.mkString("; "))
  }

  /** Null targets are rejected (reference core.py:553-554). */
  def requireNoNullTarget(p: PanelFrame): Unit = {
    val n = p.df.filter(p.y.isNull || isnan(p.y)).limit(1).count()
    require(n == 0, s"target column ${p.targetCol} contains nulls/NaNs")
  }

  /** Static features must not change within a series: null-safe comparison of
    * first vs last row per series (reference core.py:216-236
    * `_static_feature_changes_over_time`). Returns offending (id, column).
    */
  def staticViolations(p: PanelFrame): DataFrame = {
    require(p.staticCols.nonEmpty, "no static columns declared")
    // A column is non-static within a series iff it has >1 distinct non-null
    // value, or mixes nulls and non-nulls (null-safe inequality, matching the
    // reference's null-safe first-vs-last compare).
    val aggs = p.staticCols.flatMap { c =>
      Seq(
        countDistinct(col(c)).as(s"__nd_$c"),
        count(col(c)).as(s"__nn_$c"),
      )
    } :+ count(lit(1)).as("__n")
    val st = p.df.groupBy(p.id).agg(aggs.head, aggs.tail: _*)
    def changed(c: String) =
      col(s"__nd_$c") > 1 || (col(s"__nn_$c") > 0 && col(s"__nn_$c") < col("__n"))
    val changedList = array(p.staticCols.map(c => when(changed(c), lit(c))): _*)
    st.filter(p.staticCols.map(changed).reduce(_ || _))
      .select(p.id, array_compact(changedList).as("changed_columns"))
  }

  /** Pooled-state update completeness (reference core.py:2035-2053): every
    * timestamp in the update must carry observations for ALL series (old ∪
    * new) — cross-series bucket state cannot advance with partial
    * timestamps. Returns offending (ds, n_ids, expected_ids) rows.
    */
  def updateCompletenessViolations(existing: PanelFrame, update: DataFrame): DataFrame = {
    // lazy scalar, broadcast-joined: no driver-side count action, the whole
    // check is one job whatever the panel size
    val expected = existing.df.select(existing.id)
      .union(update.select(existing.id))
      .agg(countDistinct(existing.id).as("expected_ids"))
    update.groupBy(existing.ds).agg(countDistinct(existing.id).as("n_ids"))
      .crossJoin(broadcast(expected))
      .filter(col("n_ids") =!= col("expected_ids"))
      .select(existing.ds, col("n_ids"), col("expected_ids"))
  }

  /** Update validation (reference data_validation.py:27-83 + 148-199): every
    * series present in `update` that already exists must start exactly at
    * last_date + freq. Returns offending series.
    */
  def updateStartViolations(existing: PanelFrame, update: DataFrame): DataFrame = {
    val newStarts = update.groupBy(existing.id).agg(min(existing.ds).as("new_start"))
    newStarts
      .join(existing.lastDates, Seq(existing.idCol), "inner")
      .withColumn("expected_start", existing.freq.advance(col("last_date"), lit(1)))
      .filter(col("new_start") =!= col("expected_start"))
  }
}
