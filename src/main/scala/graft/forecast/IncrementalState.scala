package graft.forecast

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PanelFrame
import graft.functions._
import graft.operators.FeatureSpec
import graft.plans.EwmExpr

/** The reference's `updates_only` contract (grouped_array.py:94-122) for the
  * recursive predict loop: unbounded per-series transforms whose next value
  * follows from carried aggregates (the expanding family and EWM) are
  * evaluated from a per-series STATE relation instead of re-windowing the
  * full history every step. The state is one row per series: running
  * sum/count/sumsq/min/max/EWM over the prefix up to (latest - lag), plus a
  * ring of the last (lag - 1) values not yet absorbed. Each step reads the
  * feature straight off the state, then absorbs the step's own prediction —
  * step cost is flat in both history length and horizon.
  */
private[forecast] object IncrementalState {

  sealed trait Kind
  case object KMean extends Kind
  case object KStd extends Kind
  case object KMin extends Kind
  case object KMax extends Kind
  final case class KEwm(alpha: Double) extends Kind

  final case class IncSpec(outName: String, lag: Int, kind: Kind, idx: Int)

  /** Partition a feature spec: unbounded LOCAL expanding/EWM transforms are
    * carried incrementally; everything else (bounded windows, quantiles,
    * pooled transforms, custom extensions) stays in the window featurizer.
    */
  def split(spec: FeatureSpec): (Seq[IncSpec], FeatureSpec) = {
    def unwrap(t: LagTransform, lag: Int): (LagTransform, Int) = t match {
      case o: Offset => unwrap(o.inner, lag + o.n)
      case _         => (t, lag)
    }
    def kindOf(t: LagTransform): Option[Kind] = t match {
      case e: ExpandingMean if e.pooling.isLocal             => Some(KMean)
      case e: ExpandingStd if e.pooling.isLocal              => Some(KStd)
      case e: ExpandingMin if e.pooling.isLocal              => Some(KMin)
      case e: ExpandingMax if e.pooling.isLocal              => Some(KMax)
      case e: ExponentiallyWeightedMean if e.pooling.isLocal => Some(KEwm(e.alpha))
      case _                                                 => None
    }
    val inc = Seq.newBuilder[IncSpec]
    var idx = 0
    val kept = spec.lagTransforms.map { case (l, ts) =>
      l -> ts.filter { t =>
        val (base, effLag) = unwrap(t, l)
        kindOf(base) match {
          case Some(k) =>
            inc += IncSpec(spec.nameOf(l, t), effLag, k, idx); idx += 1; false
          case None => true
        }
      }
    }.filter(_._2.nonEmpty)
    (inc.result(), spec.copy(lagTransforms = kept))
  }

  private def ringCol(l: Int) = s"__ring_$l"

  /** Initial state from the full (transformed) history: aggregates over the
    * prefix ending `lag` rows before the next timestamp, ring = the last
    * (lag - 1) values. One groupBy(id) aggregate (EWM needs one window
    * helper pass first).
    */
  def init(p: PanelFrame, specs: Seq[IncSpec]): DataFrame = {
    val v = LagTransforms.cleanNaN(p.y.cast("double"))
    var df = p.df.select(p.id, p.ds, v.as("__v"))
      .withColumn("__rne", row_number().over(
        Window.partitionBy(p.id).orderBy(p.ds.desc)))
    for (s <- specs) s.kind match {
      case KEwm(alpha) =>
        df = df.withColumn(s"__ewmraw_${s.idx}",
          EwmExpr.ewm(col("__v"), alpha, Seq(p.id), p.ds))
      case _ =>
    }
    val pv = (l: Int) => when(col("__rne") >= l, col("__v"))
    val ringAggs = specs.map(_.lag).distinct.map { l =>
      transform(
        sort_array(collect_list(when(col("__rne") < l,
          struct(p.ds.as("o"), col("__v").as("x"))))),
        e => e.getField("x")).as(ringCol(l))
    }
    val stateAggs = specs.flatMap { s =>
      val l = s.lag
      s.kind match {
        case KMean => Seq(
          coalesce(sum(pv(l)), lit(0.0)).as(s"__inc${s.idx}_s"),
          count(pv(l)).as(s"__inc${s.idx}_c"))
        case KStd => Seq(
          coalesce(sum(pv(l)), lit(0.0)).as(s"__inc${s.idx}_s"),
          count(pv(l)).as(s"__inc${s.idx}_c"),
          coalesce(sum(pv(l) * pv(l)), lit(0.0)).as(s"__inc${s.idx}_ss"))
        case KMin => Seq(min(pv(l)).as(s"__inc${s.idx}_m"))
        case KMax => Seq(max(pv(l)).as(s"__inc${s.idx}_m"))
        case KEwm(_) => Seq(
          max(when(col("__rne") === l, col(s"__ewmraw_${s.idx}"))).as(s"__inc${s.idx}_e"))
      }
    }
    val aggs = ringAggs ++ stateAggs
    df.groupBy(p.id).agg(aggs.head, aggs.tail: _*)
  }

  /** State column names (everything except the id). */
  def stateCols(specs: Seq[IncSpec]): Seq[String] =
    specs.map(_.lag).distinct.map(ringCol) ++ specs.flatMap { s =>
      s.kind match {
        case KMean   => Seq(s"__inc${s.idx}_s", s"__inc${s.idx}_c")
        case KStd    => Seq(s"__inc${s.idx}_s", s"__inc${s.idx}_c", s"__inc${s.idx}_ss")
        case KMin    => Seq(s"__inc${s.idx}_m")
        case KMax    => Seq(s"__inc${s.idx}_m")
        case KEwm(_) => Seq(s"__inc${s.idx}_e")
      }
    }

  /** The feature value for the NEXT step, straight off the state — formulas
    * mirror the window transforms' guards exactly.
    */
  def valueExprs(specs: Seq[IncSpec]): Seq[Column] = specs.map { s =>
    val c = s.kind match {
      case KMean =>
        val (sm, cnt) = (col(s"__inc${s.idx}_s"), col(s"__inc${s.idx}_c"))
        when(cnt > 0, sm / cnt)
      case KStd =>
        val (sm, cnt, ss) =
          (col(s"__inc${s.idx}_s"), col(s"__inc${s.idx}_c"), col(s"__inc${s.idx}_ss"))
        when(cnt > 1, LagTransforms.stdFromSums(sm, ss, cnt))
      case KMin | KMax => col(s"__inc${s.idx}_m")
      case KEwm(_)     => col(s"__inc${s.idx}_e")
    }
    c.as(s.outName)
  }

  /** Updated state after absorbing the step's prediction `pred`: push into
    * each lag's ring; when the ring is at capacity (lag - 1 carried values)
    * the oldest value exits the lag zone and is absorbed into the
    * aggregates. A still-growing ring (series shorter than lag - 1) keeps
    * everything and absorbs nothing — absorbing early would fold values
    * into the prefix aggregates before they leave the window's lag gap.
    */
  def updateExprs(specs: Seq[IncSpec], pred: Column): Seq[Column] = {
    val lags = specs.map(_.lag).distinct
    def pushed(l: Int) = concat(col(ringCol(l)), array(pred))
    def full(l: Int) = size(col(ringCol(l))) === (l - 1)
    def head(l: Int) = when(full(l), element_at(pushed(l), 1))
    val ringUpdates = lags.map { l =>
      when(full(l), slice(pushed(l), 2, l - 1)).otherwise(pushed(l)).as(ringCol(l))
    }
    val aggUpdates = specs.flatMap { s =>
      val x = head(s.lag)
      s.kind match {
        case KMean => Seq(
          (col(s"__inc${s.idx}_s") + coalesce(x, lit(0.0))).as(s"__inc${s.idx}_s"),
          (col(s"__inc${s.idx}_c") +
            when(x.isNotNull, lit(1L)).otherwise(lit(0L))).as(s"__inc${s.idx}_c"))
        case KStd => Seq(
          (col(s"__inc${s.idx}_s") + coalesce(x, lit(0.0))).as(s"__inc${s.idx}_s"),
          (col(s"__inc${s.idx}_c") +
            when(x.isNotNull, lit(1L)).otherwise(lit(0L))).as(s"__inc${s.idx}_c"),
          (col(s"__inc${s.idx}_ss") + coalesce(x * x, lit(0.0))).as(s"__inc${s.idx}_ss"))
        case KMin =>
          val m = col(s"__inc${s.idx}_m")
          Seq(when(x.isNull, m).when(m.isNull, x).otherwise(least(m, x)).as(s"__inc${s.idx}_m"))
        case KMax =>
          val m = col(s"__inc${s.idx}_m")
          Seq(when(x.isNull, m).when(m.isNull, x).otherwise(greatest(m, x)).as(s"__inc${s.idx}_m"))
        case KEwm(alpha) =>
          val e = col(s"__inc${s.idx}_e")
          Seq(when(x.isNull, e).when(e.isNull, x)
            .otherwise(lit(alpha) * x + lit(1.0 - alpha) * e).as(s"__inc${s.idx}_e"))
      }
    }
    ringUpdates ++ aggUpdates
  }
}
