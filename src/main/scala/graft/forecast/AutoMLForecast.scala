package graft.forecast

import org.apache.spark.sql.DataFrame

import graft.core.PanelFrame

/** Search strategy for [[AutoMLForecast]]. */
sealed trait AutoSearch

/** Score every candidate at the full window budget (the default). */
case object GridSearch extends AutoSearch

/** Deterministic successive halving (the Jamieson–Talwalkar / Hyperband
  * rung structure without the RNG): rung 0 scores EVERY candidate on a
  * cheap backtest of `minWindows` windows; each rung keeps the best
  * ceil(size/eta) candidates and multiplies the window budget by `eta`
  * until the survivors are scored at the full `nWindows`. This is the
  * adaptive-search counterpart of the reference's optuna sampler
  * (auto.py:251-603) re-expressed for a cluster: bad configs cost one cheap
  * rung, promising ones earn the full budget, every rung's candidates run
  * as concurrent independent job chains, and selection is reproducible (no
  * sampler state; ties break by candidate order).
  */
final case class SuccessiveHalving(eta: Int = 3, minWindows: Int = 1) extends AutoSearch {
  require(eta >= 2, "eta must be >= 2")
  require(minWindows >= 1, "minWindows must be >= 1")
}

/** Configuration search by backtest loss — the Spark-native counterpart of
  * the reference's AutoMLForecast (auto.py: optuna over model params +
  * feature configs; here DETERMINISTIC search over explicit candidate
  * configs, scored by sliding-window CV — a zero-egress cluster has no
  * optuna, and reproducible selection is the idiomatic Spark shape: every
  * candidate's CV is an independent job chain). `search` picks the
  * strategy: exhaustive [[GridSearch]] or adaptive [[SuccessiveHalving]].
  *
  * Scoring mirrors optimization.py's objective: the per-config loss is the
  * chosen metric of its best model over the evaluated backtest windows.
  */
final case class AutoMLForecast(
    candidates: Seq[(String, MLForecast)],
    h: Int,
    nWindows: Int = 2,
    metric: String = "smape",
    refit: Boolean = true,
    /** Custom loss (reference auto.py custom loss functions): given the CV
      * frame (id, ds, cutoff, y, <model preds...>) and the model names,
      * return one pooled loss per model; lower is better. Overrides
      * `metric` when set.
      */
    customLoss: Option[(DataFrame, Seq[String]) => Seq[(String, Double)]] = None,
    search: AutoSearch = GridSearch,
) {
  require(candidates.nonEmpty, "need at least one candidate config")
  require(candidates.map(_._1).distinct.size == candidates.size,
    "candidate names must be distinct (they key the search bookkeeping)")

  /** Score `pool` over `w` backtest windows. Fits/CV constructions run with
    * a bounded overlap (Par); for the built-in metric path the pooled
    * losses of EVERY candidate evaluate in ONE action over a tagged union
    * of the per-candidate loss frames — each rung pays one job floor
    * instead of one per candidate (the per-candidate aggregation plans are
    * unchanged, so the loss values are bit-identical to per-candidate
    * collects). Results come back in candidate order. Shared with the TPE
    * searcher ([[TpeMLForecast]]), which scores one trial at a time.
    */
  private[forecast] def score(pinned: PanelFrame, pool: Seq[(String, MLForecast)],
                              w: Int): Seq[(String, MLForecast, String, Double)] = {
    import org.apache.spark.sql.functions.{col, lit}
    customLoss match {
      case Some(lossFn) =>
        // the user's loss function takes each candidate's CV frame and may
        // run its own actions — keep the per-candidate shape (bounded)
        Par.run(pool.map { case (name, conf) =>
          () => {
            val cv = conf.fit(pinned).crossValidation(w, h, refit = refit)
            val names = conf.models.map(_.name)
            val losses = lossFn(cv, names).toMap
            val missing = names.filterNot(losses.contains)
            require(missing.isEmpty,
              s"customLoss for candidate '$name' returned no loss for: ${missing.mkString(", ")}")
            val perModel = names.map { m =>
              val l = losses(m)
              m -> (if (l.isNaN) Double.PositiveInfinity else l)
            }
            val best = perModel.minBy(_._2)
            (name, conf, best._1, best._2)
          }
        })
      case None =>
        // fit + CV plan construction per candidate (fits may run jobs for
        // Spark-ML models; data-free models construct lazily)
        val cvs: Seq[(String, MLForecast, DataFrame)] =
          pool.zip(Par.run(pool.map { case (_, conf) =>
            () => conf.fit(pinned).crossValidation(w, h, refit = refit)
          })).map { case ((name, conf), cv) => (name, conf, cv) }
        // long-format (candidate, model, loss) union — ONE collect
        val lossUnion = cvs.map { case (name, conf, cv) =>
          val names = conf.models.map(_.name)
          val one = Losses.overall(cv, pinned.idCol, pinned.targetCol, names, metric)
          names.map(m => one.select(lit(name).as("__cand"), lit(m).as("__model"),
              col(s"`$m`").cast("double").as("__loss")))
            .reduce(_ unionByName _)
        }.reduce(_ unionByName _)
        val lookup: Map[(String, String), Double] = lossUnion.collect().map { r =>
          (r.getString(0), r.getString(1)) ->
            (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
        }.toMap
        cvs.map { case (name, conf, _) =>
          // A null OR NaN pooled loss (mape over all-zero targets, a
          // degenerate model emitting NaN predictions) means the candidate
          // is degenerate for this metric — it loses, not crashes, and it
          // must not poison best-trial tracking (every NaN comparison is
          // false, so a NaN 'best' would never be displaced).
          val perModel = conf.models.map(_.name).map { m =>
            val v = lookup((name, m))
            m -> (if (v.isNaN) Double.PositiveInfinity else v)
          }
          val best = perModel.minBy(_._2)
          (name, conf, best._1, best._2)
        }
    }
  }

  /** Search the candidates, pick the winner, refit it on the full panel. */
  def fit(panel: PanelFrame): AutoMLForecastResult = {
    // score once, share across candidates: each candidate re-reading the
    // panel lineage would multiply the source scans
    val pinned = panel.copy(df = MLForecast.pin(panel.df))
    val order = candidates.map(_._1).zipWithIndex.toMap
    val (finalScored, allLosses) = search match {
      case GridSearch =>
        val s = score(pinned, candidates, nWindows)
        (s, s.map { case (n, _, m, l) => (n, m, l) })
      case SuccessiveHalving(eta, minW) =>
        var pool = candidates
        var w = math.min(minW, nWindows)
        // every candidate's LAST evaluated loss (eliminated configs keep
        // the loss of the rung that eliminated them)
        val lastLoss = scala.collection.mutable.LinkedHashMap[String, (String, Double)]()
        var cur = score(pinned, pool, w)
        cur.foreach { case (n, _, m, l) => lastLoss(n) = (m, l) }
        while (w < nWindows) {
          if (pool.size > 1) {
            val keep = math.max(1, math.ceil(pool.size.toDouble / eta).toInt)
            pool = cur.sortBy(t => (t._4, order(t._1))).take(keep)
              .map(t => (t._1, t._2))
          }
          w = math.min(nWindows.toLong, w.toLong * eta).toInt
          cur = score(pinned, pool, w)
          cur.foreach { case (n, _, m, l) => lastLoss(n) = (m, l) }
        }
        (cur, candidates.flatMap { case (n, _) =>
          lastLoss.get(n).map { case (m, l) => (n, m, l) } })
    }
    val winner = finalScored.minBy(t => (t._4, order(t._1)))
    AutoMLForecastResult(
      bestConfig = winner._1,
      bestModel = winner._3,
      losses = allLosses,
      fitted = winner._2.fit(pinned))
  }
}

object AutoMLForecast {
  import graft.core.Freq
  import graft.functions.{ExponentiallyWeightedMean, RollingMean}
  import graft.operators.FeatureSpec

  /** Seasonality-derived candidate grid — the reference's
    * `_seasonality_based_config` (auto.py:308-420) feature space as a
    * DETERMINISTIC candidate list instead of optuna categorical sampling:
    * the same target-transform / lags / lag-transform / date-feature
    * candidates, enumerated diagonal-first so `take(n)` (via
    * `maxCandidates`) explores every dimension early. `minSamples` is the
    * shortest series length, `minValue` the panel's minimum target (log1p
    * variants only when non-negative).
    */
  def seasonalCandidates(models: Seq[ForecastModel], freq: Freq,
                         seasonLength: Int, h: Int, minSamples: Int,
                         minValue: Double,
                         maxCandidates: Int = 24): Seq[(String, MLForecast)] = {
    require(seasonLength >= 1, "seasonLength must be >= 1")
    val scaler = LocalStandardScaler()
    var targ: Vector[Seq[TargetTransform]] = Vector(
      Nil, Seq(scaler), Seq(Differences(Seq(1)), scaler))
    if (minValue >= 0)
      targ ++= Vector(
        Seq(GlobalFuncTransform("log1p"), scaler),
        Seq(GlobalFuncTransform("log1p"), Differences(Seq(1)), scaler))
    // leave two seasonal periods for the features and model
    if (seasonLength > 1 && minSamples > 3 * seasonLength + 1) {
      targ :+= Seq(Differences(Seq(1, seasonLength)), scaler)
      if (minValue >= 0)
        targ :+= Seq(GlobalFuncTransform("log1p"),
          Differences(Seq(1, seasonLength)), scaler)
    }

    var lags: Vector[Seq[Int]] = Vector(Nil, Seq(seasonLength))
    lags ++= (seasonLength match {
      case 7  => Vector(Seq(7, 14), Seq(7, 28))
      case 12 => Vector(1 to 12)
      case 24 => Vector(1 to 24, 24 to 24 * 7 by 24)
      case 52 => Vector(4 to 52 by 4)
      case _  => Vector.empty
    })
    if (h >= 2 * seasonLength)
      lags ++= Vector(seasonLength to h by seasonLength, Seq(h), Seq(seasonLength, h))

    // merge by lag: a Map literal would silently DROP colliding keys when
    // seasonLength == 1 or h == 1
    def tfms(pairs: (Int, Seq[graft.functions.LagTransform])*): Map[Int, Seq[graft.functions.LagTransform]] =
      pairs.groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
    var lagTfms: Vector[Map[Int, Seq[graft.functions.LagTransform]]] = Vector(
      Map.empty, tfms(1 -> Seq(ExponentiallyWeightedMean(0.9))))
    if (seasonLength > 1)
      lagTfms :+= tfms(
        1 -> Seq(ExponentiallyWeightedMean(0.9)),
        seasonLength -> Seq(RollingMean(seasonLength, minSamples = Some(1))))
    if (seasonLength != h)
      lagTfms :+= tfms(
        1 -> Seq(ExponentiallyWeightedMean(0.9)),
        seasonLength -> Seq(RollingMean(seasonLength, minSamples = Some(1))),
        h -> Seq(RollingMean(seasonLength, minSamples = Some(1))))

    val dateFeatures = freq match {
      case Freq.IntFreq(_) => Nil
      case _ => seasonLength match {
        case 1  => Seq("year")
        case 4  => Seq("quarter", "year")
        case 7  => Seq("dayofweek", "month", "year")
        case 12 => Seq("month", "year")
        case 24 => Seq("hour", "dayofweek", "month", "year")
        case 52 => Seq("week", "year")
        case 60 => Seq("dayofweek", "hour", "second")
        case _  => Nil
      }
    }

    val all = for {
      ti <- targ.indices; li <- lags.indices; fi <- lagTfms.indices
      // a candidate needs at least one feature column
      if lags(li).nonEmpty || lagTfms(fi).nonEmpty || dateFeatures.nonEmpty
    } yield (ti, li, fi)
    all.sortBy { case (ti, li, fi) => (ti + li + fi, ti, li, fi) }
      .take(maxCandidates)
      .map { case (ti, li, fi) =>
        s"t${ti}_l${li}_f$fi" -> MLForecast(
          models = models, freq = freq,
          spec = FeatureSpec(lags = lags(li), lagTransforms = lagTfms(fi),
            dateFeatures = dateFeatures),
          targetTransforms = targ(ti))
      }.toSeq
  }
}

final case class AutoMLForecastResult(
    bestConfig: String,
    bestModel: String,
    /** (config name, best model in config, loss) per candidate. */
    losses: Seq[(String, String, Double)],
    /** The winning config refit on the full panel. */
    fitted: FittedMLForecast,
) {
  def predict(h: Int, xDf: Option[DataFrame] = None): DataFrame = fitted.predict(h, xDf)
}
