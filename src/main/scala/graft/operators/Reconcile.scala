package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical forecast reconciliation — the relational core of the
  * reference ecosystem's hierarchicalforecast package (bottom-up /
  * top-down aggregation-consistency methods; Hyndman et al., "Optimal
  * combination forecasts for hierarchical time series" lineage): given
  * bottom-level forecasts and a child→parent mapping, produce parent
  * forecasts that ADD UP (bottom-up), or distribute parent-level
  * forecasts down by historical proportions (top-down), so every level of
  * the hierarchy tells one consistent story.
  *
  * Everything is expressed as aggregates and equi-joins on the hierarchy
  * keys — no per-node driver loops, and no FORCED broadcast of the
  * child→parent mapping (it has one row per leaf: Catalyst broadcasts it
  * below the threshold and shuffles it above, which is the right behavior
  * at 10⁸ leaves) — so a million-leaf hierarchy reconciles exactly like a
  * ten-leaf one. Float sums over forecasts fold
  * in child-id order (the repo's ordered-IEEE convention), so a SQL twin
  * replays results bit-for-bit. The ordered fold buffers ONE PARENT'S
  * children per (parent, time) group, so memory is fan-out-bounded, not
  * hierarchy-bounded; a degenerate root with 10⁸ direct children should
  * reconcile level-by-level ([[Reconcile.middleOut]]) like any deep
  * hierarchy.
  */
object Reconcile {

  /** Ordered-IEEE sum (see Losses/Stats): fold `term` in (key, term) sort
    * order so cross-engine sums agree in the last ulp. SQL-SUM-compatible
    * null algebra: null terms are SKIPPED (collect_list drops the
    * when-null struct), and a group whose terms are all null sums to null
    * — one null child forecast must not null a parent's whole sum.
    */
  private def orderedSum(key: Column, term: Column): Column = {
    val arr = array_sort(collect_list(when(term.isNotNull,
      struct(key.as("__k"), term.as("__t")))))
    when(size(arr) > 0,
      aggregate(transform(arr, s => s.getField("__t")),
        lit(0.0), (a, x) => a + x))
  }

  /** Bottom-up reconciliation: parent forecast = sum of its children's
    * forecasts per timestamp (folded in child-id order). `forecasts` has
    * one row per (child id, time) with the forecast in `valueCol`;
    * `mapping` is the (childCol, parentCol) relation — dimension-sized,
    * broadcastable.
    *
    * Returns (parentCol, timeCol, valueCol) — coherent by construction.
    */
  def bottomUp(forecasts: DataFrame, mapping: DataFrame,
               childCol: String, parentCol: String, timeCol: String,
               valueCol: String): DataFrame = {
    forecasts
      .join(mapping.select(col(childCol), col(parentCol)), Seq(childCol))
      .groupBy(col(parentCol), col(timeCol))
      .agg(orderedSum(col(childCol), col(valueCol).cast("double")).as(valueCol))
  }

  /** Historical proportions for top-down distribution (the
    * "average of historical proportions" variant, Gross–Sohl method F1 is
    * the ratio-of-sums spelling used here: share = Σy_child / Σy_parent
    * over the training panel — exact when the target is integer-valued).
    * Children of a zero-total parent get a null share (no history to
    * apportion by). EVERY child in `mapping` gets a row: a child with no
    * training history shares 0.0 of a parent whose siblings have history
    * (so topDown output still covers the full hierarchy and children
    * still sum to the parent), and null when the whole parent has none —
    * silently dropping the new child would make the reconciled set
    * incoherent with the hierarchy itself.
    *
    * Returns (childCol, parentCol, share).
    */
  def topDownShares(panel: DataFrame, mapping: DataFrame,
                    childCol: String, parentCol: String,
                    targetCol: String): DataFrame = {
    val withParent = panel
      .join(mapping.select(col(childCol), col(parentCol)), Seq(childCol))
    val childTot = withParent.groupBy(col(childCol), col(parentCol))
      .agg(sum(col(targetCol).cast("double")).as("__cs"))
    val parentTot = childTot.groupBy(col(parentCol))
      .agg(sum(col("__cs")).as("__ps"))
    mapping.select(col(childCol), col(parentCol)).distinct()
      .join(childTot, Seq(childCol, parentCol), "left")
      .join(parentTot, Seq(parentCol), "left")
      .select(col(childCol), col(parentCol),
        when(col("__ps") =!= 0.0,
          coalesce(col("__cs"), lit(0.0)) / col("__ps")).as("share"))
  }

  /** Top-down reconciliation: child forecast = parent forecast × the
    * child's historical share. `parentForecasts` has one row per
    * (parent id, time); `shares` is [[topDownShares]] output.
    *
    * Returns (childCol, timeCol, valueCol).
    */
  def topDown(parentForecasts: DataFrame, shares: DataFrame,
              childCol: String, parentCol: String, timeCol: String,
              valueCol: String): DataFrame = {
    parentForecasts
      .join(shares, Seq(parentCol))
      .select(col(childCol), col(timeCol),
        (col(valueCol).cast("double") * col("share")).as(valueCol))
  }

  /** Middle-out: bottom-up from the middle level to the top, top-down from
    * the middle level to the leaves — the standard compromise when the
    * middle level forecasts best. `midForecasts` is one row per (middle id,
    * time); `midToTop` maps middle→top; `leafShares` is [[topDownShares]]
    * over (leaf, middle).
    *
    * Returns (level, id, timeCol, valueCol) with level ∈ {top, middle,
    * bottom} and ids stringified (the levels' key types may differ).
    */
  def middleOut(midForecasts: DataFrame, midToTop: DataFrame,
                leafShares: DataFrame, midCol: String, topCol: String,
                leafCol: String, timeCol: String,
                valueCol: String): DataFrame = {
    val up = bottomUp(midForecasts, midToTop, midCol, topCol, timeCol, valueCol)
      .select(lit("top").as("level"), col(topCol).cast("string").as("id"),
        col(timeCol), col(valueCol).cast("double").as(valueCol))
    val mid = midForecasts
      .select(lit("middle").as("level"), col(midCol).cast("string").as("id"),
        col(timeCol), col(valueCol).cast("double").as(valueCol))
    val down = topDown(midForecasts, leafShares, leafCol, midCol, timeCol, valueCol)
      .select(lit("bottom").as("level"), col(leafCol).cast("string").as("id"),
        col(timeCol), col(valueCol).cast("double").as(valueCol))
    up.unionByName(mid).unionByName(down)
  }

  /** Coherence check: per (parent, time), the absolute gap between the
    * parent forecast and the ordered sum of its children's — zero rows =
    * the frame is aggregation-consistent (bottom-up output always is;
    * independently-fitted per-level forecasts rarely are, which is the
    * whole point of reconciling).
    *
    * Returns (parentCol, timeCol, parent_value, child_sum, abs_gap) for
    * rows where the gap exceeds `tol`.
    */
  def coherenceViolations(parentForecasts: DataFrame, childForecasts: DataFrame,
                          mapping: DataFrame, childCol: String,
                          parentCol: String, timeCol: String,
                          valueCol: String, tol: Double = 0.0): DataFrame = {
    val sums = bottomUp(childForecasts, mapping, childCol, parentCol,
      timeCol, valueCol).withColumnRenamed(valueCol, "child_sum")
    parentForecasts
      .select(col(parentCol), col(timeCol),
        col(valueCol).cast("double").as("parent_value"))
      .join(sums, Seq(parentCol, timeCol), "full_outer")
      .withColumn("abs_gap",
        abs(coalesce(col("parent_value"), lit(0.0)) -
          coalesce(col("child_sum"), lit(0.0))))
      .filter(col("abs_gap") > tol)
  }
}
