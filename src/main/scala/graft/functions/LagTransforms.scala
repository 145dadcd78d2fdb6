package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.plans.EwmExpr

/** Pooling mode of a lag transform — which rows form the window bucket and
  * which calendar defines the time ordinal.
  *
  * Mirrors the reference's constructor flags (`global_`, `groupby`,
  * `partition_by`, `time_agg`; /root/reference/mlforecast/lag_transforms.py
  * and pooled.py). Key semantics:
  *  - bucket = rows the statistic aggregates over;
  *  - ordinal calendar = distinct timestamps of the PARENT scope, so that in
  *    partition modes timestamps absent from a bucket leave holes
  *    (pooled.py:427-460) which RANGE frames then skip;
  *  - `timeAgg` collapses all rows sharing a (bucket, timestamp) to one
  *    aggregate value before windowing (pooled.py:221-330), after which
  *    `minSamples` counts timestamps instead of rows.
  */
final case class Pooling(
    global: Boolean = false,
    groupby: Seq[String] = Nil,
    partitionBy: Seq[String] = Nil,
    timeAgg: Option[String] = None,
) {
  require(!(global && groupby.nonEmpty), "`global` and `groupby` can't be used together")
  timeAgg.foreach { a =>
    require(Set("sum", "count", "mean", "min", "max")(a), s"unsupported time_agg: $a")
    require(global || groupby.nonEmpty,
      "time_agg requires global or groupby (reference lag_transforms.py _validate_time_agg)")
  }

  def isLocal: Boolean = !global && groupby.isEmpty && partitionBy.isEmpty

  /** Columns whose combination defines a window bucket. */
  def bucketCols(idCol: String): Seq[String] =
    if (global) partitionBy
    else if (groupby.nonEmpty) groupby ++ partitionBy
    else if (partitionBy.nonEmpty) idCol +: partitionBy
    else Seq(idCol)

  /** Scope whose distinct timestamps define the ordinal calendar. */
  def parentScope(idCol: String): Seq[String] =
    if (global) Nil
    else if (groupby.nonEmpty) groupby
    else Seq(idCol)

  /** Feature-name prefix, matching the reference naming contract
    * (lag_transforms.py:145-167 `_get_name`).
    */
  def prefix: String = {
    val g =
      if (global) "global_"
      else if (groupby.nonEmpty) s"groupby_${groupby.mkString("__")}_"
      else ""
    val p = if (partitionBy.nonEmpty) s"partby_${partitionBy.mkString("__")}_" else ""
    g + p
  }

  /** Name suffix for the explicit `time_agg` param, matching the reference's
    * changed-params naming (`lag_transforms.py:146-167`): two transforms
    * differing only in `time_agg` must not collide.
    */
  def suffix: String = timeAgg.map(a => s"_time_agg$a").getOrElse("")
}

/** Window-building context handed to transforms. The canonical semantics are
  * RANGE frames over a dense time ordinal (the reference oracle's frames);
  * for gap-free per-series panels ROWS frames ordered by the raw timestamp
  * are equivalent and skip the ordinal computation entirely.
  */
sealed trait WindowCtx {
  /** Frame covering ordinal distances [lower, upper] from the current row. */
  def range(lower: Long, upper: Long): WindowSpec
  def rangeToUnbounded(upper: Long): WindowSpec
  /** Running frame (unbounded..current) for recursive functions like EWM. */
  def spec: WindowSpec
  def partitionCols: Seq[Column]
  def orderCol: Column
}

/** RANGE over an integer ordinal — exact for ties (multiple rows per
  * timestamp) and holes (parent-calendar partition buckets).
  */
final case class RangeOrdCtx(partition: Seq[Column], ord: Column) extends WindowCtx {
  private def base: WindowSpec =
    if (partition.isEmpty) Window.orderBy(ord) else Window.partitionBy(partition: _*).orderBy(ord)
  def range(lower: Long, upper: Long): WindowSpec = base.rangeBetween(lower, upper)
  def rangeToUnbounded(upper: Long): WindowSpec =
    base.rangeBetween(Window.unboundedPreceding, upper)
  def spec: WindowSpec = base
  def partitionCols: Seq[Column] = partition
  def orderCol: Column = ord
}

/** ROWS over the raw time order — valid only when each partition has exactly
  * one row per period and no gaps (continuity-validated local panels).
  */
final case class RowsDenseCtx(partition: Seq[Column], time: Column) extends WindowCtx {
  private def base: WindowSpec = Window.partitionBy(partition: _*).orderBy(time)
  def range(lower: Long, upper: Long): WindowSpec = base.rowsBetween(lower, upper)
  def rangeToUnbounded(upper: Long): WindowSpec =
    base.rowsBetween(Window.unboundedPreceding, upper)
  def spec: WindowSpec = base
  def partitionCols: Seq[Column] = partition
  def orderCol: Column = time
}

/** Per-(bucket, ordinal) component aggregates — the Spark relation
  * equivalent of the reference's `_ts_aggs` cache (pooled.py:171-218):
  * sums / non-null counts / sums of squares / mins / maxs. Sum/count-based
  * window statistics over RAW rows decompose exactly over these components,
  * so the row-level pooled path can pre-collapse once and window over the
  * (much smaller) component relation — the aggregate fast path.
  */
final case class AggComponents(s: Column, c: Column, ss: Column, mn: Column, mx: Column)

/** A lag transform: a statistic of the target's history, evaluated `lag`
  * steps back. `stages` returns (helper columns, value column): helpers are
  * materialized in a first projection (needed when a window function must
  * feed another window function, e.g. EWM then shift), the value in a second.
  *
  * OPEN for extension (the reference's callable-transform surface,
  * core.py:193-213 `_parse_transforms`): subclass with any Column-expression
  * statistic. Custom subclasses run through the window featurizer everywhere;
  * the fused per-series predict falls back to the driver loop for specs
  * containing them (LocalLoop compiles only the built-ins), and
  * `updateSamples` is the contract that keeps predict-state trimming correct.
  */
abstract class LagTransform extends Serializable {
  def pooling: Pooling
  def name(lag: Int): String
  def stages(v: Column, lag: Int, w: WindowCtx, out: String): (Seq[(String, Column)], Column)
  /** Rows of per-bucket history needed to recompute the next value
    * incrementally; None = unbounded (reference `update_samples`).
    */
  def updateSamples(lag: Int): Option[Int]
  def isFiniteWindow: Boolean = updateSamples(1).isDefined
  /** Whether this transform's computation relation must be collapsed to one
    * row per (bucket, ordinal) even without `timeAgg` (EWM consumes
    * per-timestamp bucket means).
    */
  def forcedCollapse: Option[String] = pooling.timeAgg

  /** Aggregate fast path: compute the row-level statistic from component
    * aggregates instead of raw rows. None = no decomposition (quantiles);
    * the featurizer then falls back to the row-level pass.
    */
  def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx,
                           out: String): Option[(Seq[(String, Column)], Column)] = None
}

object LagTransforms {
  /** NaN-as-missing normalization: reference kernels skip NaNs, Spark
    * aggregates skip nulls — fold NaN into null once on the way in.
    */
  def cleanNaN(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  private[functions] def fmtParam(d: Double): String =
    if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

  /** Sample std from sum/sumsq/count, clamped at 0 — written as explicit
    * arithmetic (not stddev_samp) so results are bit-identical with any SQL
    * oracle using the same formula (reference kernel lag_transforms.py:721-742).
    */
  private[graft] def stdFromSums(s: Column, ss: Column, n: Column): Column =
    sqrt(greatest((ss - s * s / n) / (n - lit(1)), lit(0.0)))
}

import LagTransforms._

/** Plain lag: `lag{k}` columns. Uses a ROWS shift on the canonical dense
  * per-series layout (one row per (id, ds), continuity-validated).
  */
final case class Lag(pooling: Pooling = Pooling()) extends LagTransform {
  require(pooling.isLocal, "plain Lag is per-series; use LookupLag for buckets")
  def name(lag: Int): String = s"lag$lag"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) =
    (Nil, max(v).over(w.range(-lag, -lag)))
  def updateSamples(lag: Int): Option[Int] = Some(lag)
}

/** k-th previous occurrence of the target within a (id, partition) bucket —
  * reference LookupLag (lag_transforms.py:375-483). Row-based lag within the
  * bucket (occurrence counting, not calendar distance). The reference
  * counts occurrences in input-row order; a distributed engine has no input
  * order, so ties within a timestamp are broken by `tiebreak` columns —
  * callers with multi-row timestamps must supply them for deterministic
  * results.
  */
final case class LookupLag(pooling: Pooling = Pooling(),
                           tiebreak: Seq[String] = Nil) extends LagTransform {
  // reference naming: "{prefix}lookup_lag{lag}" (lag_transforms.py:409-414
  // _get_name) — no doubled "lag"
  def name(lag: Int): String = s"${pooling.prefix}lookup_lag$lag${pooling.suffix}"
  def stages(v: Column, lagK: Int, w: WindowCtx, out: String) = {
    val order = w.orderCol +: tiebreak.map(c => col(c))
    val spec =
      if (w.partitionCols.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(w.partitionCols: _*).orderBy(order: _*)
    (Nil, lag(v, lagK).over(spec))
  }
  def updateSamples(lag: Int): Option[Int] = None // occurrences, not rows
}

sealed abstract class RollingBase extends LagTransform {
  def windowSize: Int
  def minSamples: Option[Int]
  /** Reference `_resolve_min_samples` (lag_transforms.py:358-372). */
  final def resolvedMinSamples: Int = minSamples.getOrElse {
    if (pooling.partitionBy.nonEmpty && !pooling.global && pooling.groupby.isEmpty) 1
    else windowSize
  }
  protected def statName: String
  def name(lag: Int): String = {
    val ms = minSamples.map(m => s"_min_samples$m").getOrElse("")
    s"${pooling.prefix}rolling_${statName}_lag${lag}_window_size$windowSize$ms${pooling.suffix}"
  }
  def updateSamples(lag: Int): Option[Int] = Some(lag + windowSize)
  protected def frame(lag: Int, w: WindowCtx): WindowSpec =
    w.range(-(lag.toLong + windowSize - 1), -lag.toLong)
  protected def guarded(cnt: Column, stat: Column): Column = {
    val ms = resolvedMinSamples
    when(cnt >= ms && cnt > 0, stat)
  }
}

final case class RollingMean(windowSize: Int, minSamples: Option[Int] = None,
                             pooling: Pooling = Pooling()) extends RollingBase {
  protected def statName = "mean"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val cnt = count(v).over(f)
    (Nil, guarded(cnt, sum(v).over(f) / cnt))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val n = sum(comp.c).over(f)
    Some((Nil, guarded(n, sum(comp.s).over(f) / n)))
  }
}

final case class RollingStd(windowSize: Int, minSamples: Option[Int] = None,
                            pooling: Pooling = Pooling()) extends RollingBase {
  protected def statName = "std"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val cnt = count(v).over(f)
    val stat = stdFromSums(sum(v).over(f), sum(v * v).over(f), cnt)
    // std needs >= 2 observations (reference: NULL if count <= 1)
    (Nil, when(cnt >= resolvedMinSamples && cnt > 1, stat))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val n = sum(comp.c).over(f)
    Some((Nil, when(n >= resolvedMinSamples && n > 1,
      stdFromSums(sum(comp.s).over(f), sum(comp.ss).over(f), n))))
  }
}

final case class RollingMin(windowSize: Int, minSamples: Option[Int] = None,
                            pooling: Pooling = Pooling()) extends RollingBase {
  protected def statName = "min"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    (Nil, guarded(count(v).over(f), min(v).over(f)))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    Some((Nil, guarded(sum(comp.c).over(f), min(comp.mn).over(f))))
  }
}

final case class RollingMax(windowSize: Int, minSamples: Option[Int] = None,
                            pooling: Pooling = Pooling()) extends RollingBase {
  protected def statName = "max"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    (Nil, guarded(count(v).over(f), max(v).over(f)))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    Some((Nil, guarded(sum(comp.c).over(f), max(comp.mx).over(f))))
  }
}

final case class RollingQuantile(p: Double, windowSize: Int,
                                 minSamples: Option[Int] = None,
                                 pooling: Pooling = Pooling()) extends RollingBase {
  protected def statName = "quantile"
  override def name(lag: Int): String = {
    val ms = minSamples.map(m => s"_min_samples$m").getOrElse("")
    s"${pooling.prefix}rolling_quantile_lag${lag}_p${fmtParam(p)}_window_size$windowSize$ms${pooling.suffix}"
  }
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    (Nil, guarded(count(v).over(f), percentile(v, lit(p)).over(f)))
  }
}

sealed abstract class ExpandingBase extends LagTransform {
  protected def statName: String
  def name(lag: Int): String = s"${pooling.prefix}expanding_${statName}_lag$lag${pooling.suffix}"
  def updateSamples(lag: Int): Option[Int] = None
  protected def frame(lag: Int, w: WindowCtx): WindowSpec = w.rangeToUnbounded(-lag.toLong)
}

final case class ExpandingMean(pooling: Pooling = Pooling()) extends ExpandingBase {
  protected def statName = "mean"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val cnt = count(v).over(f)
    (Nil, when(cnt > 0, sum(v).over(f) / cnt))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val n = sum(comp.c).over(f)
    Some((Nil, when(n > 0, sum(comp.s).over(f) / n)))
  }
}

final case class ExpandingStd(pooling: Pooling = Pooling()) extends ExpandingBase {
  protected def statName = "std"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val cnt = count(v).over(f)
    (Nil, when(cnt > 1, stdFromSums(sum(v).over(f), sum(v * v).over(f), cnt)))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val f = frame(lag, w)
    val n = sum(comp.c).over(f)
    Some((Nil, when(n > 1, stdFromSums(sum(comp.s).over(f), sum(comp.ss).over(f), n))))
  }
}

final case class ExpandingMin(pooling: Pooling = Pooling()) extends ExpandingBase {
  protected def statName = "min"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) =
    (Nil, min(v).over(frame(lag, w)))
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) =
    Some((Nil, min(comp.mn).over(frame(lag, w))))
}

final case class ExpandingMax(pooling: Pooling = Pooling()) extends ExpandingBase {
  protected def statName = "max"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) =
    (Nil, max(v).over(frame(lag, w)))
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) =
    Some((Nil, max(comp.mx).over(frame(lag, w))))
}

final case class ExpandingQuantile(p: Double, pooling: Pooling = Pooling())
    extends ExpandingBase {
  protected def statName = "quantile"
  override def name(lag: Int): String =
    s"${pooling.prefix}expanding_quantile_lag${lag}_p${fmtParam(p)}${pooling.suffix}"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) =
    (Nil, percentile(v, lit(p)).over(frame(lag, w)))
}

/** Seasonal rolling statistic: stat over {t - lag - i*season : 0 <= i < w}.
  *
  * Implemented as w single-ordinal RANGE frames combined arithmetically —
  * all frames share one partition+order, so Spark evaluates them in a single
  * WindowExec pass (one sort). This formulation is exact for row-level
  * buckets (each frame aggregates every row at that timestamp) AND for
  * parent-calendar holes (an absent timestamp contributes nothing), which a
  * phase-partition trick could not express when lag % season != 0.
  * Reference: lag_transforms.py:995-1181.
  */
sealed abstract class SeasonalRollingBase extends RollingBase {
  def seasonLength: Int
  override def name(lag: Int): String = {
    val ms = minSamples.map(m => s"_min_samples$m").getOrElse("")
    s"${pooling.prefix}seasonal_rolling_${statName}_lag${lag}_season_length${seasonLength}_window_size$windowSize$ms${pooling.suffix}"
  }
  override def updateSamples(lag: Int): Option[Int] = Some(lag + seasonLength * windowSize)
  protected def seasonalFrames(lag: Int, w: WindowCtx): Seq[WindowSpec] =
    (0 until windowSize).map { i =>
      val off = lag.toLong + i.toLong * seasonLength
      w.range(-off, -off)
    }
  protected def totalCnt(v: Column, fs: Seq[WindowSpec]): Column =
    fs.map(f => coalesce(count(v).over(f), lit(0L))).reduce(_ + _)

  /** Dense fast path: on the per-series row layout each seasonal frame holds
    * exactly one row, so a lag chain (offset window functions — no per-frame
    * RANGE aggregate buffering) yields the identical per-frame scalars.
    * None on ordinal contexts, where a frame genuinely aggregates ties.
    */
  protected def frameScalars(v: Column, lagN: Int, w: WindowCtx): Option[Seq[Column]] =
    w match {
      case RowsDenseCtx(_, _) =>
        Some((0 until windowSize).map(i =>
          org.apache.spark.sql.functions.lag(v, lagN + i * seasonLength).over(w.spec)))
      case _ => None
    }
  protected def scalarCnt(ls: Seq[Column]): Column =
    ls.map(l => when(l.isNotNull, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
}

final case class SeasonalRollingMean(seasonLength: Int, windowSize: Int,
                                     minSamples: Option[Int] = None,
                                     pooling: Pooling = Pooling()) extends SeasonalRollingBase {
  protected def statName = "mean"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = frameScalars(v, lag, w) match {
    case Some(ls) =>
      val cnt = scalarCnt(ls)
      val tot = ls.map(l => coalesce(l, lit(0.0))).reduce(_ + _)
      (Nil, guarded(cnt, tot / cnt))
    case None =>
      val fs = seasonalFrames(lag, w)
      val cnt = totalCnt(v, fs)
      val tot = fs.map(f => coalesce(sum(v).over(f), lit(0.0))).reduce(_ + _)
      (Nil, guarded(cnt, tot / cnt))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val fs = seasonalFrames(lag, w)
    val cnt = fs.map(f => coalesce(sum(comp.c).over(f), lit(0L))).reduce(_ + _)
    val tot = fs.map(f => coalesce(sum(comp.s).over(f), lit(0.0))).reduce(_ + _)
    Some((Nil, guarded(cnt, tot / cnt)))
  }
}

final case class SeasonalRollingStd(seasonLength: Int, windowSize: Int,
                                    minSamples: Option[Int] = None,
                                    pooling: Pooling = Pooling()) extends SeasonalRollingBase {
  protected def statName = "std"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = frameScalars(v, lag, w) match {
    case Some(ls) =>
      val cnt = scalarCnt(ls)
      val s = ls.map(l => coalesce(l, lit(0.0))).reduce(_ + _)
      val ss = ls.map(l => coalesce(l * l, lit(0.0))).reduce(_ + _)
      (Nil, when(cnt >= resolvedMinSamples && cnt > 1, stdFromSums(s, ss, cnt)))
    case None =>
      val fs = seasonalFrames(lag, w)
      val cnt = totalCnt(v, fs)
      val s = fs.map(f => coalesce(sum(v).over(f), lit(0.0))).reduce(_ + _)
      val ss = fs.map(f => coalesce(sum(v * v).over(f), lit(0.0))).reduce(_ + _)
      (Nil, when(cnt >= resolvedMinSamples && cnt > 1, stdFromSums(s, ss, cnt)))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val fs = seasonalFrames(lag, w)
    val n = fs.map(f => coalesce(sum(comp.c).over(f), lit(0L))).reduce(_ + _)
    val s = fs.map(f => coalesce(sum(comp.s).over(f), lit(0.0))).reduce(_ + _)
    val ss = fs.map(f => coalesce(sum(comp.ss).over(f), lit(0.0))).reduce(_ + _)
    Some((Nil, when(n >= resolvedMinSamples && n > 1, stdFromSums(s, ss, n))))
  }
}

final case class SeasonalRollingMin(seasonLength: Int, windowSize: Int,
                                    minSamples: Option[Int] = None,
                                    pooling: Pooling = Pooling()) extends SeasonalRollingBase {
  protected def statName = "min"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = frameScalars(v, lag, w) match {
    case Some(ls) =>
      (Nil, guarded(scalarCnt(ls), array_min(array_compact(array(ls: _*)))))
    case None =>
      val fs = seasonalFrames(lag, w)
      val m = array_min(array_compact(array(fs.map(f => min(v).over(f)): _*)))
      (Nil, guarded(totalCnt(v, fs), m))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val fs = seasonalFrames(lag, w)
    val n = fs.map(f => coalesce(sum(comp.c).over(f), lit(0L))).reduce(_ + _)
    val m = array_min(array_compact(array(fs.map(f => min(comp.mn).over(f)): _*)))
    Some((Nil, guarded(n, m)))
  }
}

final case class SeasonalRollingMax(seasonLength: Int, windowSize: Int,
                                    minSamples: Option[Int] = None,
                                    pooling: Pooling = Pooling()) extends SeasonalRollingBase {
  protected def statName = "max"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = frameScalars(v, lag, w) match {
    case Some(ls) =>
      (Nil, guarded(scalarCnt(ls), array_max(array_compact(array(ls: _*)))))
    case None =>
      val fs = seasonalFrames(lag, w)
      val m = array_max(array_compact(array(fs.map(f => max(v).over(f)): _*)))
      (Nil, guarded(totalCnt(v, fs), m))
  }
  override def stagesFromComponents(comp: AggComponents, lag: Int, w: WindowCtx, out: String) = {
    val fs = seasonalFrames(lag, w)
    val n = fs.map(f => coalesce(sum(comp.c).over(f), lit(0L))).reduce(_ + _)
    val m = array_max(array_compact(array(fs.map(f => max(comp.mx).over(f)): _*)))
    Some((Nil, guarded(n, m)))
  }
}

/** Seasonal rolling quantile: exact quantile over the flattened seasonal
  * window values (collect_list per frame, concat, interpolate).
  */
final case class SeasonalRollingQuantile(p: Double, seasonLength: Int, windowSize: Int,
                                         minSamples: Option[Int] = None,
                                         pooling: Pooling = Pooling()) extends SeasonalRollingBase {
  protected def statName = "quantile"
  override def name(lag: Int): String = {
    val ms = minSamples.map(m => s"_min_samples$m").getOrElse("")
    s"${pooling.prefix}seasonal_rolling_quantile_lag${lag}_p${fmtParam(p)}_season_length${seasonLength}_window_size$windowSize$ms${pooling.suffix}"
  }
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val vals = frameScalars(v, lag, w) match {
      case Some(ls) => array_sort(array_compact(array(ls: _*)))
      case None =>
        val fs = seasonalFrames(lag, w)
        array_sort(flatten(array(fs.map(f =>
          coalesce(collect_list(v).over(f), array())): _*)))
    }
    val n = size(vals)
    // linear interpolation at rank p*(n-1), matching percentile()
    val pos = lit(p) * (n - 1).cast("double")
    val lo = floor(pos).cast("int")
    val hi = ceil(pos).cast("int")
    val frac = pos - lo.cast("double")
    val q = element_at(vals, lo + 1) * (lit(1.0) - frac) + element_at(vals, hi + 1) * frac
    (Nil, when(n >= resolvedMinSamples && n > 0, q))
  }
}

/** Exponentially weighted mean — reference lag_transforms.py:1502-1699.
  *
  * Two window passes over the (collapsed) bucket series: a running EWM via
  * the custom Catalyst `EwmUpdate` window function, then a hole-safe shift:
  * the value at t is the EWM state after consuming every observed timestamp
  * <= t - lag (`last(.., ignoreNulls)` over RANGE(unbounded, -lag)).
  */
final case class ExponentiallyWeightedMean(alpha: Double,
                                           pooling: Pooling = Pooling()) extends LagTransform {
  // fail at spec construction, not plan time (EwmUpdate re-enforces)
  require(alpha > 0.0 && alpha <= 1.0,
    s"ExponentiallyWeightedMean alpha must be in (0, 1], got $alpha")
  def name(lag: Int): String =
    s"${pooling.prefix}exponentially_weighted_mean_lag${lag}_alpha${alpha}$ewmSuffix"
  /** The reference omits time_agg from the name when it equals the
    * transform's DEFAULT — "mean" is EWM's default (lag_transforms.py:1549,
    * changed-params naming 159-167) and Some("mean") is semantically
    * identical to None here (forcedCollapse getOrElse "mean"), so both
    * spell the same column name.
    */
  private def ewmSuffix: String =
    if (pooling.timeAgg.contains("mean")) "" else pooling.suffix
  override def forcedCollapse: Option[String] = Some(pooling.timeAgg.getOrElse("mean"))
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val helper = s"__${out}_raw"
    val raw = EwmExpr.ewm(v, alpha, w.partitionCols, w.orderCol)
    val shifted = last(col(s"`$helper`"), ignoreNulls = true).over(w.rangeToUnbounded(-lag.toLong))
    (Seq(helper -> raw), shifted)
  }
  def updateSamples(lag: Int): Option[Int] = None
}

/** Apply `inner` shifted `n` extra steps (reference Offset, L:1702-1763).
  * Negative `n` is allowed like the reference; what must hold is the
  * EFFECTIVE lag `lag + n >= 1` (an effective lead is target leakage, and
  * the fused kernels would index past their buffers) — validated where the
  * lag is known, exactly like the reference's `_set_core_tfm`
  * (lag_transforms.py:1724-1729).
  */
final case class Offset(inner: LagTransform, n: Int) extends LagTransform {
  private def checkedLag(lag: Int): Int = {
    require(lag + n >= 1,
      s"Offset(n=$n) applied to lag $lag produces an effective lag of " +
        s"${lag + n}; the effective lag must be at least 1")
    lag + n
  }
  def pooling: Pooling = inner.pooling
  def name(lag: Int): String = inner.name(checkedLag(lag))
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) =
    inner.stages(v, checkedLag(lag), w, out)
  // delegate the aggregate fast path too: without this an Offset-wrapped
  // expanding stat under global pooling is hard-rejected as
  // "non-decomposable" while the equivalent bare transform at lag+n works
  override def stagesFromComponents(comp: AggComponents, lag: Int,
                                    w: WindowCtx, out: String) =
    inner.stagesFromComponents(comp, checkedLag(lag), w, out)
  def updateSamples(lag: Int): Option[Int] = inner.updateSamples(checkedLag(lag))
  override def forcedCollapse: Option[String] = inner.forcedCollapse
}

/** Binary combination of two transforms (reference Combine, L:1766-1885).
  *
  * DOCUMENTED DIVERGENCE: the reference additionally allows combining
  * transforms that differ only in `time_agg` (each inner hook re-aggregates
  * independently, lag_transforms.py:1802-1804); this engine computes ONE
  * collapsed relation per pooled group, so mixed time_aggs inside one
  * Combine are rejected loudly — compute the two features separately and
  * combine the columns, which costs one extra window pass over the same
  * exchange.
  */
final case class Combine(t1: LagTransform, t2: LagTransform, op: String) extends LagTransform {
  require(Set("add", "sub", "mul", "truediv")(op), s"unsupported op: $op")
  require(t1.pooling == t2.pooling,
    "Combine requires matching pooling modes (including time_agg: this " +
      "engine shares one collapsed relation per pooled group — compute the " +
      "two features separately and combine the columns to mix time_aggs)")
  def pooling: Pooling = t1.pooling
  def name(lag: Int): String = s"${t1.name(lag)}_${op}_${t2.name(lag)}"
  def stages(v: Column, lag: Int, w: WindowCtx, out: String) = {
    val (h1, v1) = t1.stages(v, lag, w, s"${out}_lhs")
    val (h2, v2) = t2.stages(v, lag, w, s"${out}_rhs")
    val combined = op match {
      case "add"     => v1 + v2
      case "sub"     => v1 - v2
      case "mul"     => v1 * v2
      case "truediv" => v1 / v2
    }
    (h1 ++ h2, combined)
  }
  def updateSamples(lag: Int): Option[Int] =
    for (a <- t1.updateSamples(lag); b <- t2.updateSamples(lag)) yield math.max(a, b)
  override def forcedCollapse: Option[String] = {
    require(t1.forcedCollapse == t2.forcedCollapse,
      "Combine with differing collapse modes is not supported")
    t1.forcedCollapse
  }
}
