package graft.forecast

import graft.core.PanelFrame

/** A search-space dimension for [[TpeMLForecast]]. Every dimension samples
  * and models densities in a transformed coordinate (log for
  * [[LogUniformDim]]), the standard TPE treatment.
  */
sealed trait ParamDim {
  def name: String
}
/** Continuous uniform on [lo, hi]. */
final case class UniformDim(name: String, lo: Double, hi: Double) extends ParamDim {
  require(hi > lo, s"$name: hi must exceed lo")
}
/** Continuous log-uniform on [lo, hi], lo > 0. */
final case class LogUniformDim(name: String, lo: Double, hi: Double) extends ParamDim {
  require(lo > 0 && hi > lo, s"$name: need 0 < lo < hi")
}
/** Integer uniform on [lo, hi] inclusive (sampled continuously, rounded). */
final case class IntDim(name: String, lo: Int, hi: Int) extends ParamDim {
  require(hi >= lo, s"$name: hi must be >= lo")
}
/** Categorical over indices 0 until n. */
final case class ChoiceDim(name: String, n: Int) extends ParamDim {
  require(n >= 1, s"$name: need at least one choice")
}

/** Deterministic Tree-structured Parzen Estimator (Bergstra et al. 2011,
  * "Algorithms for Hyper-Parameter Optimization"; the sampler family behind
  * the reference's optuna search, auto.py:251-603). Pure driver-side math
  * over (params, loss) history — no Spark dependency — so the proposal
  * logic is unit-testable without a cluster.
  *
  * Shape: observed trials split at the `gamma` loss quantile into good/bad;
  * per dimension, both sets induce Parzen mixtures (truncated normal
  * kernels at the observed coordinates plus one range-wide prior kernel;
  * categorical dims use add-one weighted counts). `nEI` candidates are
  * drawn from the good-density and the one maximizing l(x)/g(x) — the EI
  * surrogate — is proposed. All randomness flows from the caller's seeded
  * RNG, so a fixed seed replays the identical search.
  */
object Tpe {

  /** Transformed coordinate for density modeling. */
  private def toZ(d: ParamDim, v: Double): Double = d match {
    case LogUniformDim(_, _, _) => math.log(v)
    case _                      => v
  }
  private def fromZ(d: ParamDim, z: Double): Double = d match {
    case LogUniformDim(_, lo, hi) =>
      math.min(hi, math.max(lo, math.exp(z)))
    case UniformDim(_, lo, hi) => math.min(hi, math.max(lo, z))
    case IntDim(_, lo, hi) =>
      math.min(hi, math.max(lo, math.round(z).toDouble))
    case ChoiceDim(_, n) =>
      math.min(n - 1, math.max(0, math.round(z).toDouble))
  }
  private def zRange(d: ParamDim): (Double, Double) = d match {
    case UniformDim(_, lo, hi)    => (lo, hi)
    case LogUniformDim(_, lo, hi) => (math.log(lo), math.log(hi))
    case IntDim(_, lo, hi)        => (lo.toDouble, hi.toDouble)
    case ChoiceDim(_, n)          => (0.0, (n - 1).toDouble)
  }

  /** Uniform draw in the dimension's native coordinates. */
  def sampleUniform(d: ParamDim, rng: scala.util.Random): Double = d match {
    case UniformDim(_, lo, hi)    => lo + rng.nextDouble() * (hi - lo)
    case LogUniformDim(_, lo, hi) =>
      math.exp(math.log(lo) + rng.nextDouble() * (math.log(hi) - math.log(lo)))
    case IntDim(_, lo, hi)  => (lo + rng.nextInt(hi - lo + 1)).toDouble
    case ChoiceDim(_, n)    => rng.nextInt(n).toDouble
  }

  /** Parzen mixture density at z: truncated-normal kernels on the observed
    * points plus one prior kernel spanning the range (weight 1 point).
    */
  private def parzen(z: Double, obs: Seq[Double], range: (Double, Double)): Double = {
    val (lo, hi) = range
    val span = math.max(hi - lo, 1e-12)
    // Silverman-flavor bandwidth on the observation count, floored so a
    // cluster of identical points keeps finite density
    val bw = math.max(span / math.max(1.0, math.sqrt(obs.size.toDouble)), span * 0.01)
    def kernel(mu: Double, b: Double): Double =
      math.exp(-0.5 * ((z - mu) / b) * ((z - mu) / b)) / (b * math.sqrt(2 * math.Pi))
    val prior = kernel((lo + hi) / 2, span)
    (obs.map(kernel(_, bw)).sum + prior) / (obs.size + 1)
  }

  /** Categorical density: add-one smoothed counts. */
  private def catDensity(idx: Int, obs: Seq[Double], n: Int): Double = {
    val c = obs.count(_.round.toInt == idx)
    (c + 1.0) / (obs.size + n)
  }

  /** Propose the next trial from history (params in native coordinates →
    * loss; lower is better). Infinite/NaN losses sort worst.
    */
  def propose(space: Seq[ParamDim],
              history: Seq[(Map[String, Double], Double)],
              rng: scala.util.Random,
              gamma: Double = 0.25, nEI: Int = 24): Map[String, Double] = {
    require(space.nonEmpty, "empty search space")
    if (history.isEmpty) return space.map(d => d.name -> sampleUniform(d, rng)).toMap
    val sorted = history.sortBy { case (_, l) =>
      if (l.isNaN) Double.PositiveInfinity else l
    }
    val nGood = math.max(1, math.ceil(gamma * sorted.size).toInt)
    val good = sorted.take(nGood)
    val bad = if (sorted.size > nGood) sorted.drop(nGood) else sorted
    val candidates = (0 until nEI).map { _ =>
      // draw each dim from the good-density: pick a good observation's
      // coordinate and perturb within bandwidth (categorical: weighted draw)
      space.map { d =>
        val gObs = good.map(t => toZ(d, t._1(d.name)))
        val z = d match {
          case ChoiceDim(_, n) =>
            // draw from add-one counts over the good set
            val w = (0 until n).map(i => catDensity(i, gObs, n))
            val u = rng.nextDouble() * w.sum
            var acc = 0.0
            var pick = n - 1
            var i = 0
            while (i < n && pick == n - 1) {
              acc += w(i)
              if (u <= acc) pick = i
              i += 1
            }
            pick.toDouble
          case _ =>
            val (lo, hi) = zRange(d)
            val span = math.max(hi - lo, 1e-12)
            val bw = math.max(span / math.max(1.0, math.sqrt(gObs.size.toDouble)),
              span * 0.01)
            val mu = gObs(rng.nextInt(gObs.size))
            mu + rng.nextGaussian() * bw
        }
        d.name -> fromZ(d, z)
      }.toMap
    }
    candidates.maxBy { c =>
      space.map { d =>
        val z = toZ(d, c(d.name))
        val gObs = good.map(t => toZ(d, t._1(d.name)))
        val bObs = bad.map(t => toZ(d, t._1(d.name)))
        d match {
          case ChoiceDim(_, n) =>
            math.log(catDensity(z.round.toInt, gObs, n)) -
              math.log(catDensity(z.round.toInt, bObs, n))
          case _ =>
            math.log(parzen(z, gObs, zRange(d))) -
              math.log(parzen(z, bObs, zRange(d)))
        }
      }.sum
    }
  }
}

/** TPE-driven configuration search: the adaptive counterpart of
  * [[AutoMLForecast]]'s candidate grid, for spaces too large to enumerate.
  * `build` maps a sampled parameter point to a named [[MLForecast]]; each
  * trial scores it by sliding-window CV exactly as the grid search does
  * (shared scorer). Trials are sequential — TPE conditions every proposal
  * on all previous losses — but each trial's CV fans out across the
  * cluster, which is where the time goes at scale. A fixed `seed` replays
  * the identical search; duplicate proposals are scored from cache rather
  * than re-evaluated.
  */
final case class TpeMLForecast(
    space: Seq[ParamDim],
    build: Map[String, Double] => MLForecast,
    h: Int,
    nTrials: Int,
    nStartup: Int = 8,
    nWindows: Int = 2,
    metric: String = "smape",
    refit: Boolean = true,
    gamma: Double = 0.25,
    nEI: Int = 24,
    seed: Long = 42L,
) {
  require(nTrials >= 1, "nTrials must be >= 1")
  require(space.map(_.name).distinct.size == space.size, "dim names must be distinct")

  private def keyOf(p: Map[String, Double]): String =
    space.map(d => s"${d.name}=${p(d.name)}").mkString(",")

  def fit(panel: PanelFrame): AutoMLForecastResult = {
    val pinned = panel.copy(df = MLForecast.pin(panel.df))
    val rng = new scala.util.Random(seed)
    val scorer = AutoMLForecast(
      candidates = Seq("tpe" -> build(space.map(d =>
        d.name -> Tpe.sampleUniform(d, new scala.util.Random(seed))).toMap)),
      h = h, nWindows = nWindows, metric = metric, refit = refit)
    val history = scala.collection.mutable.ArrayBuffer.empty[(Map[String, Double], Double)]
    val trials = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    val cache = scala.collection.mutable.HashMap.empty[String, (String, Double)]
    var best: Option[(String, MLForecast, String, Double)] = None
    for (t <- 1 to nTrials) {
      val params =
        if (t <= nStartup) space.map(d => d.name -> Tpe.sampleUniform(d, rng)).toMap
        else Tpe.propose(space, history.toSeq, rng, gamma, nEI)
      val key = keyOf(params)
      val (bestModel, loss) = cache.getOrElseUpdate(key, {
        val conf = build(params)
        val s = scorer.score(pinned, Seq(key -> conf), nWindows).head
        // strict-less on the CANDIDATE side: a NaN incumbent (belt and
        // braces — score() already maps NaN to +Inf) can still be
        // displaced, where `incumbent > candidate` never fires on NaN
        if (best.forall(b => s._4 < b._4 || b._4.isNaN))
          best = Some((key, conf, s._3, s._4))
        (s._3, s._4)
      })
      history += ((params, loss))
      trials += ((s"trial$t:$key", bestModel, loss))
    }
    val w = best.get
    AutoMLForecastResult(
      bestConfig = w._1,
      bestModel = w._3,
      losses = trials.toSeq,
      fitted = w._2.fit(pinned))
  }
}

/** The reference's default per-model-family tuning spaces (auto.py:91-144:
  * linear_regression_space, ridge_space, lasso_space, elastic_net_space)
  * re-expressed as [[TpeMLForecast]] dimensions with matching `build`
  * mappers. The LightGBM-family space lives on [[GraftGbm.tpeSpace]].
  */
object AutoSpaces {
  /** fit_intercept only (auto.py linear_regression_space). */
  val linearRegression: Seq[ParamDim] = Seq(ChoiceDim("fit_intercept", 2))

  def buildLinearRegression(p: Map[String, Double]): SparkLinearRegression =
    SparkLinearRegression(fitIntercept = math.round(p("fit_intercept")).toInt == 1)

  /** alpha in [0.001, 10] + fit_intercept (auto.py ridge_space). */
  val ridge: Seq[ParamDim] = Seq(
    UniformDim("alpha", 0.001, 10.0), ChoiceDim("fit_intercept", 2))

  def buildRidge(p: Map[String, Double]): SparkLinearRegression =
    SparkLinearRegression(name = "ridge", regParam = p("alpha"),
      elasticNetParam = 0.0,
      fitIntercept = math.round(p("fit_intercept")).toInt == 1)

  /** Same dims as ridge; L1 penalty (auto.py lasso_space). */
  val lasso: Seq[ParamDim] = ridge

  def buildLasso(p: Map[String, Double]): SparkLinearRegression =
    SparkLinearRegression(name = "lasso", regParam = p("alpha"),
      elasticNetParam = 1.0,
      fitIntercept = math.round(p("fit_intercept")).toInt == 1)

  /** alpha + l1_ratio + fit_intercept (auto.py elastic_net_space). */
  val elasticNet: Seq[ParamDim] = Seq(
    UniformDim("alpha", 0.001, 10.0), UniformDim("l1_ratio", 0.0, 1.0),
    ChoiceDim("fit_intercept", 2))

  def buildElasticNet(p: Map[String, Double]): SparkLinearRegression =
    SparkLinearRegression(name = "enet", regParam = p("alpha"),
      elasticNetParam = p("l1_ratio"),
      fitIntercept = math.round(p("fit_intercept")).toInt == 1)
}
