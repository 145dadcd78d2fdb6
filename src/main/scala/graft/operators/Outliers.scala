package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PanelFrame

/** Per-series outlier detection for panel hygiene — the cleaning step that
  * precedes feature engineering on real telemetry (spikes from backfills,
  * sensor glitches, double-counted events poison lag features and conformal
  * calibration alike).
  *
  * Two classical detectors, both expressed as pure Column windows over the
  * canonical id-partitioned layout (one shuffle on id, reused by every
  * subsequent window stage — the PanelFrame partitioning invariant):
  *
  *  - [[hampel]]: the Hampel identifier (Pearson 2002 lineage) — a centered
  *    rolling median/MAD filter, the robust standard for spike removal.
  *  - [[zscoreFlags]]: per-series global z-score flags from exact
  *    sum/count/sumsq moments.
  *
  * Exactness stance (same as every oracle in this repo): medians are
  * selections/half-sums of two elements and moments are integer-exact sums,
  * so a SQL twin reproduces results bit-for-bit.
  */
object Outliers {

  /** Interpolated median of a SORTED array column: middle element for odd
    * length, mean of the two middles for even — the quantile_cont(0.5)
    * convention shared by pandas, DuckDB and numpy.
    */
  private def medianOfSorted(arr: Column): Column = {
    val n = size(arr)
    val odd = element_at(arr, ((n + lit(1)) / lit(2)).cast("int"))
    val even = (element_at(arr, (n / lit(2)).cast("int")) +
      element_at(arr, (n / lit(2)).cast("int") + lit(1))) / lit(2.0)
    // n == 0 (window of only nulls) must not reach element_at(arr, 0),
    // which is an error under ANSI array indexing
    when(n === 0, lit(null).cast("double"))
      .when(n % 2 === 1, odd).otherwise(even)
  }

  /** JVM twin of [[medianOfSorted]] over a sorted non-empty array — the
    * same selection / half-sum arithmetic, so streaming kernels replay the
    * Column expression bit-for-bit.
    */
  private[graft] def medianOfSortedJvm(arr: Array[Double]): Double = {
    val n = arr.length
    if (n % 2 == 1) arr((n + 1) / 2 - 1)
    else (arr(n / 2 - 1) + arr(n / 2)) / 2.0
  }

  /** Hampel filter over a centered window of `2k+1` grid rows: flag rows
    * where |y − median| > nSigmas · 1.4826 · MAD (1.4826 is the Gaussian
    * consistency constant), and emit the filtered series with flagged rows
    * replaced by the window median.
    *
    * Returns (id, ds, y, med, mad, is_outlier, y_hampel).
    *
    * Scale shape: one collect_list window per row (O(w log w) work, w =
    * 2k+1 ≤ a few dozen in practice), per-series partitioning only — no
    * global state, no extra shuffle beyond the canonical id partition.
    * Window frames at series edges use the rows that exist (classic Hampel
    * edge behavior). Nulls never enter the window list (collect_list skips
    * them) and a null y is never flagged.
    */
  def hampel(p: PanelFrame, k: Int, nSigmas: Double = 3.0): DataFrame = {
    require(k >= 1, s"window half-width k must be >= 1, got $k")
    require(nSigmas > 0, s"nSigmas must be positive, got $nSigmas")
    hampelFrame(p, nSigmas, -k, k)
  }

  /** Trailing Hampel: the causal variant — each row scores against the
    * median/MAD of the last `2k+1` rows ENDING at it (itself included), so
    * no future data is consulted. This is the window an ingest-time gate
    * can maintain incrementally; `graft.streaming.StreamingOutliers`
    * replays it bit-for-bit with bounded keyed state.
    */
  def hampelTrailing(p: PanelFrame, k: Int, nSigmas: Double = 3.0): DataFrame = {
    require(k >= 1, s"window half-width k must be >= 1, got $k")
    require(nSigmas > 0, s"nSigmas must be positive, got $nSigmas")
    hampelFrame(p, nSigmas, -(2 * k), 0)
  }

  private def hampelFrame(p: PanelFrame, nSigmas: Double,
                          lo: Int, hi: Int): DataFrame = {
    val w = Window.partitionBy(p.id).orderBy(p.ds).rowsBetween(lo, hi)
    val y = p.y.cast("double")
    val arr = sort_array(collect_list(y).over(w))
    val base = p.df.withColumn("__arr", arr)
    val withMed = base.withColumn("med", medianOfSorted(col("__arr")))
    val dev = sort_array(transform(col("__arr"), x => abs(x - col("med"))))
    val withMad = withMed.withColumn("mad", medianOfSorted(dev))
    withMad
      .withColumn("is_outlier",
        // nanvl: Spark orders NaN ABOVE every real (NaN > thr is TRUE),
        // so a NaN target would flag as an outlier here while the
        // streaming twin's Java comparison (false both ways) passes it
        // through — fold NaN to null so both engines agree: not flagged,
        // y_hampel = y
        coalesce(abs(nanvl(y, lit(null)) - col("med")) >
          lit(nSigmas) * lit(1.4826) * col("mad"), lit(false)))
      .withColumn("y_hampel", when(col("is_outlier"), col("med")).otherwise(y))
      .drop("__arr")
  }

  /** Per-series global z-score flags: |y − mean| > nSigmas · std with the
    * mean/std computed from exact sum / count / sum-of-squares moments
    * (bit-reproducible on integer-valued targets, unlike streaming stddev
    * whose result depends on aggregation order). Series with fewer than two
    * points or zero variance flag nothing.
    *
    * Returns (id, ds, y, mean, std, is_outlier). One partition-only window
    * (no ordering) — a single id shuffle, then a map.
    */
  def zscoreFlags(p: PanelFrame, nSigmas: Double = 3.0): DataFrame = {
    require(nSigmas > 0, s"nSigmas must be positive, got $nSigmas")
    val w = Window.partitionBy(p.id)
    val y = p.y.cast("double")
    val n = count(y).over(w).cast("double")
    val s1 = sum(y).over(w)
    val s2 = sum(y * y).over(w)
    val mean = s1 / n
    val varExpr = (s2 - s1 * s1 / n) / (n - lit(1.0))
    // tiny negative from cancellation clamps to 0; n < 2 yields null std
    val std = when(n >= 2, sqrt(greatest(varExpr, lit(0.0))))
    p.df
      .withColumn("mean", mean)
      .withColumn("std", std)
      .withColumn("is_outlier",
        coalesce(abs(y - mean) > lit(nSigmas) * col("std"), lit(false)))
  }
}
