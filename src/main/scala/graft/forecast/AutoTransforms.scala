package graft.forecast

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PanelFrame

/** Auto target transforms: per-series automatic differencing / seasonality
  * detection / Box-Cox λ — reference target_transforms.py:185-375 (backed
  * there by compiled coreforecast kernels; re-derived here from the
  * published recipes: KPSS ndiffs [Kwiatkowski et al. 1992], the
  * Wang-Smith-Hyndman seasonal-strength heuristic, Box-Cox profile
  * log-likelihood).
  *
  * Execution model: the DECISION is a per-series kernel (one series in
  * memory — the same contract as the reference's GroupedArray kernels), run
  * inside a collect_list aggregate keyed by id: one shuffle, series-parallel
  * across the cluster, no driver involvement. The decided state (per-series
  * diff counts / lags / tails / λ) lives in small DataFrames; the INVERSE
  * on predictions is pure window arithmetic like Differences.
  */
private[forecast] object AutoKernels {

  /** KPSS level-stationarity statistic: Bartlett-kernel long-run variance
    * with l = ⌊3√n/13⌋ lags. NaN when the series is constant (zero
    * variance) — treated as "stationary, stop differencing".
    */
  def kpss(y: Array[Double]): Double = {
    val n = y.length
    if (n < 3) return Double.NaN
    val mean = y.sum / n
    val e = y.map(_ - mean)
    var s = 0.0; var etaSum = 0.0
    e.foreach { x => s += x; etaSum += s * s }
    val eta = etaSum / (n.toDouble * n)
    val l = (3.0 * math.sqrt(n.toDouble) / 13.0).toInt
    var s2 = e.map(x => x * x).sum / n
    var j = 1
    while (j <= l) {
      var cov = 0.0; var t = j
      while (t < n) { cov += e(t) * e(t - j); t += 1 }
      s2 += 2.0 * (1.0 - j / (l + 1.0)) * cov / n
      j += 1
    }
    eta / s2
  }

  /** 5% critical value of the KPSS level test. */
  val KpssCrit = 0.463

  /** Seasonal strength = max(0, 1 - var(remainder)/var(detrended)) from a
    * centered-MA decomposition (Wang, Smith & Hyndman; the FPP nsdiffs
    * heuristic, threshold 0.64).
    */
  def seasonalStrength(y: Array[Double], m: Int): Double = {
    val n = y.length
    if (m < 2 || n < 2 * m + 1) return 0.0
    // centered MA of window m (m even -> 2x(m) MA)
    val half = m / 2
    val trend = new Array[Double](n)
    java.util.Arrays.fill(trend, Double.NaN)
    var t = half
    while (t < n - half) {
      var acc = 0.0
      if (m % 2 == 1) {
        var k = -half
        while (k <= half) { acc += y(t + k); k += 1 }
        trend(t) = acc / m
      } else {
        acc = 0.5 * y(t - half) + 0.5 * y(t + half)
        var k = -half + 1
        while (k <= half - 1) { acc += y(t + k); k += 1 }
        trend(t) = acc / m
      }
      t += 1
    }
    val det = y.indices.map(i => y(i) - trend(i)).toArray
    val valid = det.indices.filter(i => !det(i).isNaN)
    if (valid.isEmpty) return 0.0
    val phaseSum = new Array[Double](m); val phaseCnt = new Array[Int](m)
    valid.foreach { i => phaseSum(i % m) += det(i); phaseCnt(i % m) += 1 }
    val rem = valid.map { i =>
      val ph = i % m
      det(i) - (if (phaseCnt(ph) > 0) phaseSum(ph) / phaseCnt(ph) else 0.0)
    }.toArray
    def variance(xs: Array[Double]): Double = {
      if (xs.length < 2) return 0.0
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
    }
    val vDet = variance(valid.map(det).toArray)
    if (vDet <= 0.0) 0.0 else math.max(0.0, 1.0 - variance(rem) / vDet)
  }

  val SeasonalStrengthCrit = 0.64

  def diff(y: Array[Double], d: Int): Array[Double] =
    y.indices.map(i => if (i < d) Double.NaN else y(i) - y(i - d)).toArray

  /** Season-length inference: ACF argmax over lags [2, maxSeasonLength]
    * requiring at least nSeasons full cycles of data; 1 (no season) when no
    * candidate has positive autocorrelation.
    */
  def inferSeason(y: Array[Double], maxSeasonLength: Int, nSeasons: Int): Int = {
    val n = y.length
    if (n < 4) return 1
    val mean = y.sum / n
    val e = y.map(_ - mean)
    val c0 = e.map(x => x * x).sum
    if (c0 <= 0.0) return 1
    var best = 1; var bestAcf = 0.0
    var lagC = 2
    while (lagC <= maxSeasonLength && lagC * nSeasons <= n) {
      var acc = 0.0; var t = lagC
      while (t < n) { acc += e(t) * e(t - lagC); t += 1 }
      val acf = acc / c0
      if (acf > bestAcf) { bestAcf = acf; best = lagC }
      lagC += 1
    }
    best
  }

  /** Box-Cox λ by profile log-likelihood, golden-section search on
    * [lower, upper] (reference method="loglik", lower=0.0). Positive
    * values only contribute to the likelihood.
    */
  /** λ maximizing the Box-Cox profile log-likelihood on a FIXED two-stage
    * grid over [lower, upper] (the coreforecast `method="loglik", lower=0`
    * stance): a 40-interval coarse pass, then a 40-interval fine pass (one
    * twentieth the step) centered on the coarse winner, ties to the lower
    * λ. Unlike golden-section, every evaluated λ is a pure function of grid
    * indices — the whole decision replays term-by-term in any SQL engine
    * (the boxcox_lambda_decisions oracle) — and the 2.5e-3 final resolution
    * sits far inside the flat top of the profile likelihood. All sums fold
    * in time order (the repo's ordered-fold convention).
    */
  def boxCoxLambda(y: Array[Double], lower: Double = 0.0, upper: Double = 2.0): Double = {
    val pos = y.filter(v => v > 0.0 && !v.isNaN)
    if (pos.length < 2) return 1.0
    val n = pos.length
    val sumLog = pos.map(math.log).sum
    def llf(lam: Double): Double = {
      val tr =
        if (math.abs(lam) < 1e-10) pos.map(math.log)
        else pos.map(v => (math.pow(v, lam) - 1.0) / lam)
      val mu = tr.sum / n
      val v = tr.map(x => (x - mu) * (x - mu)).sum / n
      if (v <= 0.0) Double.NegativeInfinity
      else -n / 2.0 * math.log(v) + (lam - 1.0) * sumLog
    }
    def argmax(cands: Iterator[Double]): Double = {
      var bestLam = 1.0; var bestV = Double.NegativeInfinity
      cands.foreach { lam =>
        if (lam >= lower && lam <= upper) {
          val v = llf(lam)
          if (v > bestV) { bestV = v; bestLam = lam }
        }
      }
      bestLam
    }
    val step = (upper - lower) / 40.0
    val coarse = argmax((0 to 40).iterator.map(i => lower + i * step))
    val fine = step / 20.0
    argmax((0 to 40).iterator.map(j => coarse + (j - 20) * fine))
  }

  def boxCoxTransform(v: Double, lam: Double): Double =
    if (math.abs(lam) < 1e-10) math.log(v) else (math.pow(v, lam) - 1.0) / lam
}

private[forecast] case class TailEntry(stage: Int, phase: Int, tail: Double)
private[forecast] case class AutoDiffResult(vals: Seq[Double], nDiffs: Int,
                                            lag: Int, tails: Seq[TailEntry])

/** Shared machinery for the three auto-differencing transforms: a kernel
  * decides (nDiffs, lag) per series and emits transformed values + stage
  * tails; inverse is the Differences phase-cumsum generalized to per-series
  * diff counts and lags.
  */
private[forecast] abstract class AutoDiffBase extends TargetTransform {
  def maxDiffs: Int

  /** Per-series decision + transform. `frozen` >= 0 pins the diff count and
    * `frozenLag` >= 1 pins the differencing lag (update path: the fit-time
    * decision — including an inferred season length — is frozen; only the
    * tails advance). Both are -1 on the fit path.
    */
  protected def kernel(vals: Seq[Double], frozen: Int, frozenLag: Int): AutoDiffResult

  protected def applyDiffs(vals: Seq[Double], lag: Int, n: Int): AutoDiffResult = {
    var cur = vals.toArray
    val tails = Seq.newBuilder[TailEntry]
    var s = 0
    while (s < n) {
      val len = cur.length
      var p = math.max(0, len - lag)
      while (p < len) {
        tails += TailEntry(s, (lag - (len - p)) % lag, cur(p))
        p += 1
      }
      cur = AutoKernels.diff(cur, lag)
      s += 1
    }
    AutoDiffResult(cur.toSeq, n, lag, tails.result())
  }

  def fit(p: PanelFrame): FittedTargetTransform = fitWith(p, None)

  private def fitWith(p: PanelFrame, frozen: Option[DataFrame]): FittedTargetTransform = {
    val kf = kernel _
    val theUdf = udf { (vs: Seq[Double], fr: Int, frLag: Int) => kf(vs, fr, frLag) }
    val rows = p.df
      // null targets fold to NaN BEFORE the Seq[Double] kernel boundary —
      // the decision kernels already filterNot(_.isNaN), while a null
      // element would fail the non-nullable encoder and kill the fit
      .select(p.id, struct(p.ds.as("t"),
        coalesce(p.y.cast("double"), lit(Double.NaN)).as("v")).as("__r"))
      .groupBy(p.id).agg(sort_array(collect_list(col("__r"))).as("__rows"))
    val withFrozen = frozen match {
      case Some(meta) =>
        rows.join(meta.select(col(p.idCol), col("n_diffs"), col("lag")), Seq(p.idCol))
      case None => rows.withColumn("n_diffs", lit(-1)).withColumn("lag", lit(-1))
    }
    // localCheckpoint (not cache): materialized once, lineage cut, blocks
    // released when the reference is collected — repeated fit/update cycles
    // don't accumulate session-lifetime cached blocks.
    val out = withFrozen
      .withColumn("__res", theUdf(col("__rows.v"), col("n_diffs"), col("lag")))
      .select(p.id, col("__rows"), col("__res"))
      .localCheckpoint()

    val transformed = out
      .select(p.id, col("__rows.t").as("__ts"),
        posexplode(col("__res.vals")).as(Seq("__pos", "__v")))
      .select(p.id, element_at(col("__ts"), col("__pos") + 1).as(p.timeCol),
        when(isnan(col("__v")), lit(null)).otherwise(col("__v")).as("__newy"))
    val newDf = p.df.join(transformed, Seq(p.idCol, p.timeCol))
      .withColumn(p.targetCol, col("__newy")).drop("__newy")

    val meta = out.select(p.id, col("__res.nDiffs").as("n_diffs"), col("__res.lag").as("lag"))
    val tails = out.select(p.id, explode(col("__res.tails")).as("__t"))
      .select(p.id, col("__t.stage").as("stage"), col("__t.phase").as("phase"),
        col("__t.tail").as("tail"))
    AutoDiffFitted(p.copy(df = newDf), p, this, meta, tails, maxDiffs)
  }

  private[forecast] def refreeze(p: PanelFrame, meta: DataFrame): FittedTargetTransform =
    fitWith(p, Some(meta))

  // persisted frozen decisions (per-series n_diffs + season lag): re-apply
  // them to the saved panel instead of re-running the statistical tests
  override def restore(p: PanelFrame, state: Seq[DataFrame]): FittedTargetTransform =
    refreeze(p, state.head)
}

final case class AutoDiffFitted(
    transformed: PanelFrame, orig: PanelFrame, conf: AutoDiffBase,
    meta: DataFrame, tails: DataFrame, maxStages: Int) extends FittedTargetTransform {
  override def state: Seq[DataFrame] = Seq(meta)

  // Differencing family: the in-sample subtracted history is orig - transformed
  // at the row's own timestamp, whatever per-series (nDiffs, lag) was chosen.
  def inverseFitted(df: DataFrame, idCol: String, timeCol: String,
                    valueCols: Seq[String]): DataFrame =
    FittedInverse.addDelta(df, orig, transformed, idCol, timeCol, valueCols)

  def inverse(preds: DataFrame, idCol: String, stepIdx: Column,
              valueCols: Seq[String]): DataFrame = {
    var out = preds.join(broadcast(meta.withColumnRenamed(meta.columns.head, idCol)),
      Seq(idCol), "left")
    for (stage <- maxStages - 1 to 0 by -1) {
      val stTails = tails.filter(col("stage") === stage)
        .select(col(tails.columns.head).as("__tid"), col("phase").as("__tphase"),
          col("tail").as("__tail"))
      val phase = (stepIdx % col("lag")).cast("int")
      val joined = out.withColumn("__phase", phase)
        .join(broadcast(stTails),
          col(idCol) === col("__tid") && col("__phase") === col("__tphase"), "left")
      val w = Window.partitionBy(col(idCol), col("__phase"))
        .orderBy(stepIdx).rowsBetween(Window.unboundedPreceding, 0)
      val upd = valueCols.map { c =>
        // no coalesce-to-0 on a missing tail: same fabrication hazard as
        // DiffFitted.inverse — null propagates honestly
        c -> when(col("n_diffs") > stage,
          sum(col(s"`$c`")).over(w) + col("__tail"))
          .otherwise(col(s"`$c`"))
      }
      out = joined.withColumns(upd.toMap)
        .drop("__phase", "__tid", "__tphase", "__tail")
    }
    out.drop("n_diffs", "lag")
  }

  // Frozen update: the per-series diff decision stays; re-applying the same
  // diffs over the appended panel advances the tails (diff is a pure
  // function of history).
  def update(p: PanelFrame): FittedTargetTransform = conf.refreeze(p, meta)
}

/** KPSS-driven automatic first-differencing (reference AutoDifferences,
  * target_transforms.py:185): difference while the KPSS level statistic
  * exceeds the 5% critical value, up to maxDiffs.
  */
final case class AutoDifferences(maxDiffs: Int) extends AutoDiffBase {
  require(maxDiffs >= 1)
  protected def kernel(vals: Seq[Double], frozen: Int, frozenLag: Int): AutoDiffResult = {
    if (frozen >= 0) return applyDiffs(vals, 1, frozen)
    var cur = vals.toArray
    var d = 0
    var stop = false
    while (d < maxDiffs && !stop) {
      val stat = AutoKernels.kpss(cur.filterNot(_.isNaN))
      if (stat.isNaN || stat < AutoKernels.KpssCrit) stop = true
      else { cur = AutoKernels.diff(cur, 1); d += 1 }
    }
    applyDiffs(vals, 1, d)
  }
}

/** Seasonal-strength-driven seasonal differencing (reference
  * AutoSeasonalDifferences, target_transforms.py:302): seasonally
  * difference while strength > 0.64, up to maxDiffs.
  */
final case class AutoSeasonalDifferences(seasonLength: Int, maxDiffs: Int) extends AutoDiffBase {
  require(seasonLength >= 2 && maxDiffs >= 1)
  protected def kernel(vals: Seq[Double], frozen: Int, frozenLag: Int): AutoDiffResult = {
    if (frozen >= 0) return applyDiffs(vals, seasonLength, frozen)
    var cur = vals.toArray
    var d = 0
    var stop = false
    while (d < maxDiffs && !stop) {
      val strength = AutoKernels.seasonalStrength(cur.filterNot(_.isNaN), seasonLength)
      if (strength > AutoKernels.SeasonalStrengthCrit) {
        cur = AutoKernels.diff(cur, seasonLength); d += 1
      } else stop = true
    }
    applyDiffs(vals, seasonLength, d)
  }
}

/** Infer each series' season length (ACF argmax with an n-seasons data
  * requirement), then apply seasonal-strength differencing at that lag
  * (reference AutoSeasonalityAndDifferences, target_transforms.py:340).
  */
final case class AutoSeasonalityAndDifferences(maxSeasonLength: Int, maxDiffs: Int,
                                               nSeasons: Int = 2) extends AutoDiffBase {
  require(maxSeasonLength >= 2 && maxDiffs >= 1 && nSeasons >= 1)
  protected def kernel(vals: Seq[Double], frozen: Int, frozenLag: Int): AutoDiffResult = {
    // Update path: reuse the fit-time season length verbatim — re-inferring
    // from the appended panel could flip the ACF argmax and difference new
    // rows (and invert predictions) at a lag the models never saw.
    if (frozen >= 0) return applyDiffs(vals, math.max(frozenLag, 1), frozen)
    val clean = vals.toArray.filterNot(_.isNaN)
    val season = AutoKernels.inferSeason(clean, maxSeasonLength, nSeasons)
    if (season < 2) return applyDiffs(vals, 1, 0)
    var cur = clean
    var d = 0
    var stop = false
    while (d < maxDiffs && !stop) {
      val strength = AutoKernels.seasonalStrength(cur.filterNot(_.isNaN), season)
      if (strength > AutoKernels.SeasonalStrengthCrit) {
        cur = AutoKernels.diff(cur, season); d += 1
      } else stop = true
    }
    applyDiffs(vals, season, d)
  }
}

/** Per-series Box-Cox with λ from profile log-likelihood on [0, 2]
  * (reference LocalBoxCox, target_transforms.py:426-432).
  */
final case class LocalBoxCox() extends TargetTransform {
  // persisted frozen per-series lambdas
  override def restore(p: PanelFrame, state: Seq[DataFrame]): FittedTargetTransform =
    BoxCoxFitted(applyForward(p, state.head), state.head, p.idCol)
  def fit(p: PanelFrame): FittedTargetTransform = {
    val lambdaUdf = udf { (vs: Seq[Double]) => AutoKernels.boxCoxLambda(vs.toArray) }
    // time-sorted values: collect_list order depends on partitioning, and
    // the λ-likelihood folds FP sums over the array — pin the order so the
    // fitted λ is bit-stable under repartitioning (the repo's ordered-fold
    // convention)
    val lambdas = p.df
      // null -> NaN before the kernel boundary (boxCoxLambda filters NaN;
      // a null element would fail the non-nullable array encoder)
      .select(p.id, p.ds.as("__t"),
        coalesce(p.y.cast("double"), lit(Double.NaN)).as("__v"))
      .groupBy(p.id).agg(
        transform(array_sort(collect_list(struct(col("__t"), col("__v")))),
          s => s.getField("__v")).as("__vs"))
      .select(p.id, lambdaUdf(col("__vs")).as("__lambda"))
    BoxCoxFitted(applyForward(p, lambdas), lambdas, p.idCol)
  }

  private[forecast] def applyForward(p: PanelFrame, lambdas: DataFrame): PanelFrame = {
    val joined = p.df.join(broadcast(lambdas.withColumnRenamed(lambdas.columns.head, p.idCol)),
      Seq(p.idCol))
    val lam = col("__lambda")
    val tf = joined.withColumn(p.targetCol,
      when(abs(lam) < 1e-10, log(p.y))
        .otherwise((pow(p.y, lam) - 1.0) / lam))
      .drop("__lambda")
    p.copy(df = tf)
  }
}

final case class BoxCoxFitted(transformed: PanelFrame,
                              lambdas: DataFrame,
                              fitIdCol: String) extends FittedTargetTransform {
  override def state: Seq[DataFrame] = Seq(lambdas)
  def inverse(preds: DataFrame, idCol: String, stepIdx: Column,
              valueCols: Seq[String]): DataFrame = {
    val joined = preds.join(
      broadcast(lambdas.withColumnRenamed(fitIdCol, idCol)), Seq(idCol), "left")
    val lam = col("__lambda")
    val inv = valueCols.map { c =>
      c -> when(abs(lam) < 1e-10, exp(col(s"`$c`")))
        .otherwise(pow(lam * col(s"`$c`") + 1.0, lit(1.0) / lam))
    }
    joined.withColumns(inv.toMap).drop("__lambda")
  }

  // Pointwise per-series λ: step-independent, same as the future inverse.
  def inverseFitted(df: DataFrame, idCol: String, timeCol: String,
                    valueCols: Seq[String]): DataFrame =
    inverse(df, idCol, lit(0L), valueCols)

  // Frozen update: new rows transformed with the fit-time lambdas.
  def update(p: PanelFrame): FittedTargetTransform =
    BoxCoxFitted(LocalBoxCox().applyForward(p, lambdas), lambdas, fitIdCol)
}
