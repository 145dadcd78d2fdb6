package graft.forecast

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PanelFrame

/** Transfer / weighted conformal prediction — the fork's signature feature
  * set (reference /root/reference/mlforecast/conformal_prediction.py).
  *
  * Everything is relational and pooled-per-horizon-step, matching the
  * reference's transfer semantics (all calibration points pooled globally
  * per step, CP:480-560): the weighted quantile is a windowed
  * cumsum + first-crossing search (the distributed form of Tibshirani et
  * al. 2019 Eq. 1's sort + cumsum + searchsorted, CP:437-469), per-series
  * scales are two hash aggregates (CP:124-196), and the IQR scale ratio is
  * a pair of scalar aggregates broadcast back (CP:815-839). No driver-side
  * loops; score relations of any size stay distributed.
  */
object ConformalTransfer {

  /** Signed conformity scores (y - yhat) per (id, window, step) from a CV
    * frame — reference `compute_conformity_scores(..., signed=True)`
    * (CP:758-786). Signed residuals let a systematically biased model SHIFT
    * the interval instead of merely widening it.
    */
  def signedScores(cv: DataFrame, idCol: String, timeCol: String,
                   targetCol: String, modelNames: Seq[String],
                   freq: Option[graft.core.Freq] = None): DataFrame =
    Conformal.scoresImpl(cv, idCol, timeCol, targetCol, modelNames, freq,
      signed = true)

  /** Per-series scale estimates on first differences (trend-invariant) —
    * reference `_compute_series_scales` (CP:124-196). `method` is "mad"
    * (median |Δy - median Δy|) or "std" (sample std of Δy). Fallbacks: no
    * diffs → mean |y| (1.0 if null); std of a single diff → |Δy|. A
    * data-relative floor (floorFactor × global median of raw scales,
    * absolute backstop 1e-8) prevents zero-scale collapse.
    * Returns (id, scale).
    */
  def seriesScales(p: PanelFrame, method: String,
                   floorFactor: Double = 1e-3): DataFrame = {
    require(Set("mad", "std")(method), s"scale estimator must be mad|std, got $method")
    val w = Window.partitionBy(p.id).orderBy(p.ds)
    val base = p.df.select(p.id, p.ds, p.y.cast("double").as("__y"))
      .withColumn("__dy", col("__y") - lag(col("__y"), 1).over(w))

    // std via explicit moment sums rather than stddev_samp: on the
    // integer-valued targets this engine canonicalizes to, Σdy and Σdy² are
    // exact whatever the partition merge order, so the result is a pure
    // function of the data (stddev_samp's central-moment merges are not).
    val scaleAgg = method match {
      case "mad" => percentile(abs(col("__dy") - col("__med")), lit(0.5))
      case "std" =>
        val n = count(col("__dy")).cast("double")
        val s = sum(col("__dy"))
        val s2 = sum(col("__dy") * col("__dy"))
        when(count(col("__dy")) >= 2,
          sqrt(greatest(s2 - s * s / n, lit(0.0)) / (n - lit(1.0))))
    }
    val withMed =
      if (method == "mad") {
        // per-id WINDOW median instead of an aggregate joined back onto its
        // own source (which executes the diff pipeline twice); Percentile
        // accumulates a value-count map, so the window form is bit-identical
        base.withColumn("__med",
          percentile(col("__dy"), lit(0.5)).over(Window.partitionBy(p.id)))
      } else base.withColumn("__med", lit(0.0))

    val stats = withMed.groupBy(p.id).agg(
      scaleAgg.as("__scale"),
      count(col("__dy")).as("__n_dy"),
      avg(abs(col("__y"))).as("__abs_mean"),
      max(abs(col("__dy"))).as("__max_abs_dy"))

    val raw = stats.withColumn("__raw",
      when(col("__n_dy") === 0, coalesce(col("__abs_mean"), lit(1.0)))
        .when(lit(method == "std") && col("__n_dy") === 1, col("__max_abs_dy"))
        .otherwise(col("__scale")))

    val globalMed = raw.agg(
      coalesce(percentile(col("__raw"), lit(0.5)), lit(1.0)).as("__gmed"))
    raw.crossJoin(broadcast(globalMed))
      .withColumn("scale",
        greatest(col("__raw"), greatest(lit(floorFactor) * col("__gmed"), lit(1e-8))))
      .select(p.id, col("scale"))
  }

  /** Distributed Tibshirani weighted quantiles (CP:437-469): per group, the
    * smallest value whose normalized cumulative weight reaches the target —
    * exactly numpy's `searchsorted(cum_w, 1 - alpha, side='left')` (the
    * appended (+inf, w_test) entry becomes the null→Infinity fallback; the
    * first-crossing min is tie-order invariant). `wTest` is the test-point
    * weight column (constant within a group). Returns groupCols plus one
    * `<outPrefix>_<i>` column per cut.
    */
  def weightedQuantiles(scores: DataFrame, groupCols: Seq[String],
                        valueCol: String, weightCol: String, wTest: Column,
                        cuts: Seq[Double], outPrefix: String = "__q"): DataFrame = {
    val grp = groupCols.map(c => col(s"`$c`"))
    val part = Window.partitionBy(grp: _*)
    val ord = part.orderBy(col(s"`$valueCol`"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = sum(col(s"`$weightCol`")).over(part) + wTest
    val withCum = scores
      .withColumn("__cumw", sum(col(s"`$weightCol`") / total).over(ord))
    val aggs = cuts.zipWithIndex.map { case (cut, i) =>
      // the 1 - (1 - cut) round-trip mirrors the reference's float rounding
      // (alphas = 1 - cuts; target = 1 - alphas), load-bearing at tie
      // boundaries
      val target = 1.0 - (1.0 - cut)
      coalesce(
        min(when(col("__cumw") >= lit(target), col(s"`$valueCol`"))),
        lit(Double.PositiveInfinity)).as(s"${outPrefix}_$i")
    }
    withCum.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Global robust scale ratio IQR(|tgt|)/IQR(|src|) with std and constant
    * fallbacks — reference `_robust_scale_ratio` (CP:815-839). Returns a
    * 1-row frame with column `ratio` (broadcast-join it; never collected).
    */
  def robustScaleRatio(src: DataFrame, tgt: DataFrame, valueCol: String): DataFrame = {
    def agg(df: DataFrame, p: String) = df.agg(
      (percentile(abs(col(s"`$valueCol`")), lit(0.75)) -
        percentile(abs(col(s"`$valueCol`")), lit(0.25))).as(s"${p}_iqr"),
      coalesce(stddev_pop(col(s"`$valueCol`")), lit(0.0)).as(s"${p}_std"),
      count(lit(1)).as(s"${p}_n"))
    agg(src, "src").crossJoin(agg(tgt, "tgt"))
      .select(
        when(col("src_iqr") >= 1e-10 && col("tgt_iqr") >= 1e-10,
          col("tgt_iqr") / col("src_iqr"))
          .when(when(col("src_n") > 1, col("src_std")).otherwise(lit(0.0)) >= 1e-10,
            when(col("tgt_n") > 1, col("tgt_std")).otherwise(lit(0.0)) /
              greatest(col("src_std"), lit(1e-10)))
          .otherwise(lit(1.0)).as("ratio"))
  }

  private def stepCol(preds: DataFrame, idCol: String, timeCol: String,
                      freq: Option[graft.core.Freq] = None): DataFrame =
    preds.withColumn("__step",
      Conformal.stepExpr(preds, idCol, timeCol, freq))

  /** Asymmetric intervals from SIGNED scores, pooled per step across all
    * calibration series (transfer semantics): lo = yhat + q((100-lv)/200),
    * hi = yhat + q(1-(100-lv)/200) — reference `_add_signed_transfer_
    * intervals` (CP:343-436). Used by the `recalibrate` transfer method.
    */
  def addSignedIntervals(preds: DataFrame, scores: DataFrame, idCol: String,
                         timeCol: String, modelNames: Seq[String],
                         levels: Seq[Int],
                         freq: Option[graft.core.Freq] = None): DataFrame = {
    val loCuts = levels.map(lv => ((100.0 - lv) / 100.0) / 2.0)
    val hiCuts = levels.map(lv => 1.0 - ((100.0 - lv) / 100.0) / 2.0)
    val qAggs = for {
      m <- modelNames
      (cut, nm) <- loCuts.zip(levels.map(l => s"lo_$l")) ++
        hiCuts.zip(levels.map(l => s"hi_$l"))
    } yield percentile(col(s"`__score_$m`"), lit(cut)).as(s"__q_${m}_$nm")
    val qs = scores.groupBy(col("__step")).agg(qAggs.head, qAggs.tail: _*)
    val withStep = stepCol(preds, idCol, timeCol, freq)
    val joined = withStep.join(broadcast(qs), Seq("__step"), "left")
    val bounds = for {
      m <- modelNames; l <- levels
      suffix <- Seq("lo", "hi")
    } yield s"$m-$suffix-$l" -> (col(s"`$m`") + col(s"__q_${m}_${suffix}_$l"))
    joined.withColumns(bounds.toMap)
      .drop("__step" +: (for (m <- modelNames; l <- levels; s <- Seq("lo", "hi"))
        yield s"__q_${m}_${s}_$l"): _*)
  }

  /** Symmetric conformal_error intervals from |scores| pooled per step
    * (transfer pooling, CP:498-509), optionally weighted (Tibshirani) when
    * `weightCol` is set, optionally rescaled per target series when
    * `targetScales` is set (scale_aligned's σ̂_tgt multiplication).
    */
  def addPooledErrorIntervals(preds: DataFrame, scores: DataFrame,
                              idCol: String, timeCol: String,
                              modelNames: Seq[String], levels: Seq[Int],
                              weightCol: Option[String] = None,
                              targetScales: Option[DataFrame] = None,
                              freq: Option[graft.core.Freq] = None): DataFrame = {
    val cuts = levels.map(_ / 100.0)
    val qs = weightCol match {
      case None =>
        val aggs = for { m <- modelNames; (c, l) <- cuts.zip(levels) }
          yield percentile(col(s"`__score_$m`"), lit(c)).as(s"__q_${m}_$l")
        scores.groupBy(col("__step")).agg(aggs.head, aggs.tail: _*)
      case Some(wc) =>
        // w_test = global mean weight (reference CP:528): one scalar,
        // broadcast-joined, never collected
        val wTest = scores.agg(avg(col(s"`$wc`")).as("__wtest"))
        val withW = scores.crossJoin(broadcast(wTest))
        modelNames.map { m =>
          weightedQuantiles(withW, Seq("__step"), s"__score_$m", wc,
            col("__wtest"), cuts, s"__wq_$m")
            .select(col("__step") +: cuts.indices.map(i =>
              col(s"__wq_${m}_$i").as(s"__q_${m}_${levels(i)}")): _*)
        }.reduce(_.join(_, Seq("__step")))
    }
    val withStep = stepCol(preds, idCol, timeCol, freq)
    var joined = withStep.join(broadcast(qs), Seq("__step"), "left")
    val scaleCol = targetScales match {
      case Some(ts) =>
        // "__scale": the bare name would collide with (and then drop) a
        // user prediction column called "scale"
        joined = joined.join(
          broadcast(ts.withColumnRenamed(ts.columns.head, idCol)
            .withColumnRenamed("scale", "__scale")),
          Seq(idCol), "left")
        coalesce(col("__scale"), lit(1.0))
      case None => lit(1.0)
    }
    val bounds = for {
      m <- modelNames; l <- levels
      (suffix, sign) <- Seq("lo" -> -1, "hi" -> 1)
    } yield s"$m-$suffix-$l" ->
      (col(s"`$m`") + lit(sign) * col(s"__q_${m}_$l") * scaleCol)
    joined.withColumns(bounds.toMap)
      .drop("__step" +: (for (m <- modelNames; l <- levels) yield s"__q_${m}_$l"): _*)
      .drop((if (targetScales.isDefined) Seq("__scale") else Seq.empty[String]): _*)
  }

  /** conformal_distribution intervals from ± score paths pooled per step
    * (transfer pooling, CP:570-605), optionally weighted (each path
    * direction carries the source weight, CP:585-605).
    */
  def addPooledDistributionIntervals(preds: DataFrame, scores: DataFrame,
                                     idCol: String, timeCol: String,
                                     modelNames: Seq[String], levels: Seq[Int],
                                     weightCol: Option[String] = None): DataFrame = {
    val alphas = levels.map(100 - _)
    val cuts = alphas.reverse.map(_ / 200.0) ++ alphas.map(a => 1.0 - a / 200.0)
    // lo col for level lv ↔ cut (100-lv)/200; hi ↔ 1-(100-lv)/200
    val cutName = alphas.reverse.zip(levels.reverse).map { case (_, lv) => s"lo_$lv" } ++
      levels.map(lv => s"hi_$lv")

    val wSel = weightCol.map(wc => col(s"`$wc`").as("__w")).toSeq
    val sym = scores.select(
      (col("__step") +: modelNames.map(m => col(s"`__score_$m`"))) ++ wSel: _*)
    val paths = sym.select((col("__step") +:
        modelNames.map(m => (-col(s"`__score_$m`")).as(s"__score_$m"))) ++ wSel: _*)
      .unionByName(sym.select((col("__step") +:
        modelNames.map(m => col(s"`__score_$m`"))) ++ wSel: _*))

    val qs = weightCol match {
      case None =>
        val aggs = for { m <- modelNames; (c, nm) <- cuts.zip(cutName) }
          yield percentile(col(s"`__score_$m`"), lit(c)).as(s"__q_${m}_$nm")
        paths.groupBy(col("__step")).agg(aggs.head, aggs.tail: _*)
      case Some(_) =>
        val wTest = sym.agg(avg(col("__w")).as("__wtest"))
        val withW = paths.crossJoin(broadcast(wTest))
        modelNames.map { m =>
          weightedQuantiles(withW, Seq("__step"), s"__score_$m", "__w",
            col("__wtest"), cuts, s"__wq_$m")
            .select(col("__step") +: cuts.indices.map(i =>
              col(s"__wq_${m}_$i").as(s"__q_${m}_${cutName(i)}")): _*)
        }.reduce(_.join(_, Seq("__step")))
    }
    val withStep = stepCol(preds, idCol, timeCol)
    val joined = withStep.join(broadcast(qs), Seq("__step"), "left")
    val bounds = for {
      m <- modelNames; l <- levels
      suffix <- Seq("lo", "hi")
    } yield s"$m-$suffix-$l" -> (col(s"`$m`") + col(s"__q_${m}_${suffix}_$l"))
    joined.withColumns(bounds.toMap)
      .drop("__step" +: (for (m <- modelNames; nm <- cutName) yield s"__q_${m}_$nm"): _*)
  }

  /** error_scaled transfer (CP:1043-1079): multiply source |scores| by the
    * global IQR(|target errors|)/IQR(|source errors|) ratio, then pooled
    * symmetric intervals.
    */
  def errorScaled(preds: DataFrame, sourceScores: DataFrame,
                  targetScores: DataFrame, idCol: String, timeCol: String,
                  modelNames: Seq[String], levels: Seq[Int],
                  freq: Option[graft.core.Freq] = None): DataFrame = {
    val scaled = modelNames.foldLeft(sourceScores) { (df, m) =>
      val ratio = robustScaleRatio(
        sourceScores.select(col(s"`__score_$m`")),
        targetScores.select(col(s"`__score_$m`")), s"__score_$m")
        .withColumnRenamed("ratio", s"__ratio_$m")
      df.crossJoin(broadcast(ratio))
        .withColumn(s"__score_$m", col(s"`__score_$m`") * col(s"__ratio_$m"))
        .drop(s"__ratio_$m")
    }
    addPooledErrorIntervals(preds, scaled, idCol, timeCol, modelNames,
      levels, freq = freq)
  }

  /** scale_aligned transfer (CP:952-1040): normalize source scores by the
    * per-series source scale, take pooled quantiles, multiply half-widths
    * back by each target series' scale — zero-shot interval transfer across
    * domains with different magnitudes.
    */
  def scaleAligned(preds: DataFrame, sourceScores: DataFrame,
                   sourcePanel: PanelFrame, targetPanel: PanelFrame,
                   scaleEstimator: String, idCol: String, timeCol: String,
                   modelNames: Seq[String], levels: Seq[Int],
                   weightCol: Option[String] = None,
                   freq: Option[graft.core.Freq] = None): DataFrame = {
    val srcScales = seriesScales(sourcePanel, scaleEstimator)
      .withColumnRenamed("scale", "__src_scale")
    val tgtScales = seriesScales(targetPanel, scaleEstimator)
    val normalized = sourceScores
      .join(broadcast(srcScales), Seq(sourcePanel.idCol))
      .select((col("__step") +: modelNames.map(m =>
        (col(s"`__score_$m`") / col("__src_scale")).as(s"__score_$m"))) ++
        weightCol.map(wc => col(s"`$wc`")).toSeq: _*)
    addPooledErrorIntervals(preds, normalized, idCol, timeCol, modelNames,
      levels, weightCol = weightCol, targetScales = Some(tgtScales),
      freq = freq)
  }

  /** weighted_conformal transfer (CP:630-738 + 1082-1110): density-ratio
    * weights w(x) = p_tgt(x)/p_src(x) from a source-vs-target classifier on
    * the calibration rows' features, then Tibshirani-weighted pooled
    * intervals — calibration points that look like the target domain count
    * more. `sourceScores` must carry the `featureCols` alongside the
    * per-model `__score_` columns; `targetFeatures` is any frame of target-
    * domain rows with the same feature columns.
    */
  def weightedConformal(preds: DataFrame, sourceScores: DataFrame,
                        targetFeatures: DataFrame, featureCols: Seq[String],
                        idCol: String, timeCol: String,
                        modelNames: Seq[String], levels: Seq[Int],
                        clipQuantile: Double = 0.99,
                        freq: Option[graft.core.Freq] = None): DataFrame = {
    val weighted = estimateDensityRatio(sourceScores, targetFeatures,
      featureCols, clipQuantile)
    addPooledErrorIntervals(preds, weighted, idCol, timeCol, modelNames,
      levels, weightCol = Some("weight"), freq = freq)
  }

  /** Transfer-method registry (reference spec registry + predict wiring,
    * forecast.py:1553-1857): one spec value per published method, each
    * declaring what it needs via `TransferInputs`; `transfer` dispatches.
    */
  sealed trait TransferSpec { def name: String }
  /** Signed pooled quantiles of TARGET-domain scores (needs targetScores). */
  case object Recalibrate extends TransferSpec { val name = "recalibrate" }
  /** Source scores rescaled by the target/source IQR ratio (needs targetScores). */
  case object ErrorScaled extends TransferSpec { val name = "error_scaled" }
  /** Zero-shot per-series scale alignment (needs source+target panels). */
  final case class ScaleAligned(estimator: String = "mad") extends TransferSpec {
    val name = "scale_aligned"
  }
  /** Scale alignment with per-point calibration weights (needs panels +
    * a weight column on sourceScores). */
  final case class ScaleAlignedWeighted(estimator: String = "mad",
                                        weightCol: String = "weight") extends TransferSpec {
    val name = "scale_aligned_weighted"
  }
  /** Density-ratio-weighted pooled intervals (needs targetFeatures and
    * featureCols present on sourceScores). */
  final case class WeightedConformal(featureCols: Seq[String],
                                     clipQuantile: Double = 0.99) extends TransferSpec {
    val name = "weighted_conformal"
  }
  /** Same method trained by the frozen-replay GD path
    * ([[estimateDensityRatioReplay]]): deterministic, engine-replicable
    * weights — the variant the DuckDB oracle checks end-to-end. Needs
    * integer-valued featureCols and orderCols on sourceScores, and the
    * same featureCols on targetFeatures. */
  final case class WeightedConformalReplay(featureCols: Seq[String],
                                           orderCols: Seq[String],
                                           iters: Int = 4, lr: Double = 0.5,
                                           clipTopFrac: Double = 0.01) extends TransferSpec {
    val name = "weighted_conformal_replay"
  }

  /** Inputs a transfer method may draw on; specs require only their subset. */
  final case class TransferInputs(
      preds: DataFrame,
      sourceScores: DataFrame,
      idCol: String,
      timeCol: String,
      modelNames: Seq[String],
      levels: Seq[Int],
      targetScores: Option[DataFrame] = None,
      sourcePanel: Option[PanelFrame] = None,
      targetPanel: Option[PanelFrame] = None,
      targetFeatures: Option[DataFrame] = None,
      /** Enables calendar-step interval alignment when `preds` carries a
        * `cutoff` column (see Conformal.stepExpr) — required for sparse
        * direct-horizon prediction frames. */
      freq: Option[graft.core.Freq] = None,
  )

  /** Dispatch a transfer spec (the reference's predict-time wiring). */
  def transfer(spec: TransferSpec, in: TransferInputs): DataFrame = {
    def need[A](o: Option[A], what: String): A =
      o.getOrElse(throw new IllegalArgumentException(
        s"${spec.name} requires $what"))
    spec match {
      case Recalibrate =>
        addSignedIntervals(in.preds, need(in.targetScores, "targetScores"),
          in.idCol, in.timeCol, in.modelNames, in.levels, freq = in.freq)
      case ErrorScaled =>
        errorScaled(in.preds, in.sourceScores, need(in.targetScores, "targetScores"),
          in.idCol, in.timeCol, in.modelNames, in.levels, freq = in.freq)
      case ScaleAligned(est) =>
        scaleAligned(in.preds, in.sourceScores,
          need(in.sourcePanel, "sourcePanel"), need(in.targetPanel, "targetPanel"),
          est, in.idCol, in.timeCol, in.modelNames, in.levels, freq = in.freq)
      case ScaleAlignedWeighted(est, wc) =>
        scaleAligned(in.preds, in.sourceScores,
          need(in.sourcePanel, "sourcePanel"), need(in.targetPanel, "targetPanel"),
          est, in.idCol, in.timeCol, in.modelNames, in.levels,
          weightCol = Some(wc), freq = in.freq)
      case WeightedConformal(featureCols, clip) =>
        weightedConformal(in.preds, in.sourceScores,
          need(in.targetFeatures, "targetFeatures"), featureCols,
          in.idCol, in.timeCol, in.modelNames, in.levels, clip, freq = in.freq)
      case WeightedConformalReplay(featureCols, orderCols, iters, lr, clip) =>
        val weighted = estimateDensityRatioReplay(in.sourceScores,
          need(in.targetFeatures, "targetFeatures"), featureCols, orderCols,
          iters, lr, clip)
        addPooledErrorIntervals(in.preds, weighted, in.idCol, in.timeCol,
          in.modelNames, in.levels, weightCol = Some("weight"), freq = in.freq)
    }
  }

  /** Frozen-replay density-ratio estimation — the ORACLE-REPLICABLE twin of
    * [[estimateDensityRatio]] (reference `estimate_density_ratio`,
    * conformal_prediction.py:630-738, cv=2 cross-fitting): a logistic
    * classifier trained by EXACTLY `iters` full-batch gradient steps with
    * the rational link σ(z) = 0.5 + 0.5·z/(1+|z|) (no exp — IEEE
    * +,−,×,÷,| | are correctly rounded, so every engine computes the same
    * bits), 2-fold cross-fitting pinned by md5 parity of the first order
    * column, gradient sums folded in (label, orderCols) order (the SQL twin
    * replays them with `list_reduce(list(... ORDER BY ...))`), and the
    * weight clip at an EXACT top-k order statistic instead of an
    * interpolated quantile. Feature columns must be INTEGER-VALUED so the
    * standardization moments are exact in FP and order-independent.
    *
    * Training is driver-local over the collected calibration rows — a
    * bounded control-plane read (conformal calibration sets are CV
    * outputs), guarded by `maxRows`; the returned weights join back to
    * `source` distributed. Use [[estimateDensityRatio]] (Spark ML, LBFGS)
    * when cross-engine bit-replay is not required.
    */
  def estimateDensityRatioReplay(source: DataFrame, target: DataFrame,
                                 featureCols: Seq[String],
                                 orderCols: Seq[String],
                                 iters: Int = 4, lr: Double = 0.5,
                                 clipTopFrac: Double = 0.01,
                                 maxRows: Long = 500000L): DataFrame = {
    require(featureCols.nonEmpty && orderCols.nonEmpty)
    val d = featureCols.length
    def rowsOf(df: DataFrame, label: Double): Array[(Array[Long], Array[Double], Double)] = {
      val cols = orderCols.map(c => col(s"`$c`").cast("long")) ++
        featureCols.map(c => col(s"`$c`").cast("double"))
      // the cap is enforced ON the collect (limit maxRows+1, then check the
      // combined size below): an unconditional collect would OOM the driver
      // on an oversized calibration set BEFORE the guard could fire, and a
      // separate count() would add a Spark action per call
      df.select(cols: _*).limit(maxRows.toInt + 1).collect().map { r =>
        // loud on a null cell: a bare getLong/getDouble would NPE with no
        // context, unlike every other input invariant this trainer enforces
        (0 until orderCols.length + d).foreach { i =>
          require(!r.isNullAt(i),
            s"estimateDensityRatioReplay: null value in column " +
              s"'${(orderCols ++ featureCols)(i)}' — calibration rows must " +
              "be fully populated (drop or impute nulls upstream)")
        }
        (Array.tabulate(orderCols.length)(i => r.getLong(i)),
          Array.tabulate(d)(j => r.getDouble(orderCols.length + j)), label)
      }
    }
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"estimateDensityRatioReplay: bad maxRows=$maxRows")
    val src = rowsOf(source, 0.0)
    val tgt = rowsOf(target, 1.0)
    require(src.length + tgt.length <= maxRows,
      s"estimateDensityRatioReplay: ${src.length + tgt.length}+ calibration rows " +
        s"exceed maxRows=$maxRows — sample the calibration set (the replay " +
        "trainer is a bounded driver-local fold by design)")
    require(src.nonEmpty,
      "estimateDensityRatioReplay: empty SOURCE calibration set (the clip " +
        "order statistic needs at least one source weight)")
    // total order: label, then the order columns lexicographically (ties
    // carry identical feature vectors by construction, so fold order among
    // them is moot)
    val all = (src ++ tgt).sortWith { (a, b) =>
      if (a._3 != b._3) a._3 < b._3
      else {
        val (ka, kb) = (a._1, b._1)
        var i = 0
        while (i < ka.length && ka(i) == kb(i)) i += 1
        i < ka.length && ka(i) < kb(i)
      }
    }
    val n = all.length
    require(n > 0, "estimateDensityRatioReplay: empty calibration set")
    // The "ties are moot" claim above is an INPUT invariant, not a fact of
    // this code: duplicate (label, orderCols) keys with DIFFERENT feature
    // vectors would make the gradient fold order among them — and the
    // bykey.toMap pick below — depend on collect/partition order, silently
    // nondeterministic weights. Enforce it loudly (adjacent rows after the
    // total-order sort; Arrays.equals compares doubles by bits, so NaN
    // duplicates compare equal instead of tripping the check).
    locally {
      var i = 1
      while (i < n) {
        val (ka, xa, la) = all(i - 1); val (kb, xb, lb) = all(i)
        if (la == lb && java.util.Arrays.equals(ka, kb))
          require(java.util.Arrays.equals(xa, xb),
            s"estimateDensityRatioReplay: duplicate (label=$lb, " +
              s"${orderCols.mkString(",")}=${kb.mkString("[", ",", "]")}) key " +
              "with differing feature vectors — fold order over duplicates is " +
              "undefined, so the trained weights would be nondeterministic. " +
              "Deduplicate the calibration rows or extend orderCols to a " +
              "unique key.")
        i += 1
      }
    }

    // standardization moments: feature columns are integer-valued, so the
    // sums are exact and order-independent (the SQL twin uses plain SUM)
    val mean = new Array[Double](d); val std = new Array[Double](d)
    for (j <- 0 until d) {
      var s = 0.0; var ss = 0.0
      all.foreach { case (_, x, _) => s += x(j); ss += x(j) * x(j) }
      mean(j) = s / n
      val v = if (n > 1) math.max((ss - s * s / n) / (n - 1L), 0.0) else 0.0
      std(j) = if (v > 0) math.sqrt(v) else 1.0
    }
    def xStd(x: Array[Double], j: Int): Double = (x(j) - mean(j)) / std(j)

    // md5-parity fold of the FIRST order column's decimal string — the same
    // bytes every engine hashes
    def foldOf(ks: Array[Long]): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(ks(0).toString.getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) < 8) 0 else 1
    }

    def sigma(z: Double): Double = 0.5 + 0.5 * z / (1 + math.abs(z))
    // one weight vector per fold, trained on the OTHER fold's rows
    val models: Array[Array[Double]] = Array.tabulate(2) { f =>
      val train = all.filter { case (ks, _, _) => foldOf(ks) != f }
      val nt = train.length.toLong
      val w = new Array[Double](d + 1) // features then intercept
      require(nt > 0, s"estimateDensityRatioReplay: fold $f has no training rows")
      for (_ <- 0 until iters) {
        val grad = new Array[Double](d + 1)
        // left fold in sorted order — list_reduce semantics: accumulate
        // gradient sums sequentially, one term per row
        train.foreach { case (_, x, lab) =>
          var z = 0.0
          for (j <- 0 until d) z += w(j) * xStd(x, j)
          z += w(d)
          val p = sigma(z)
          for (j <- 0 until d) grad(j) += (p - lab) * xStd(x, j)
          grad(d) += (p - lab)
        }
        for (j <- 0 to d) w(j) = w(j) - lr * grad(j) / nt
      }
      w
    }

    def rawWeight(ks: Array[Long], x: Array[Double]): Double = {
      val w = models(foldOf(ks))
      var z = 0.0
      for (j <- 0 until d) z += w(j) * xStd(x, j)
      z += w(d)
      val p = sigma(z)
      p / (1 - p)
    }
    val srcW = src.map { case (ks, x, _) => (ks, rawWeight(ks, x)) }
    // exact order-statistic clip: the k-th largest raw weight,
    // k = max(1, ceil(clipTopFrac * n_src))
    val k = math.max(1L, math.ceil(clipTopFrac * srcW.length).toLong).toInt
    val clip = srcW.map(_._2).sorted(Ordering.Double.TotalOrdering.reverse)
      .apply(k - 1)
    val bykey = srcW.map { case (ks, w) => (ks.toSeq, math.min(w, clip)) }
      .toMap
    val spark = source.sparkSession
    val weightRows = bykey.toSeq.map { case (ks, w) => Row.fromSeq(ks :+ w) }
    val schema = org.apache.spark.sql.types.StructType(
      orderCols.map(c => org.apache.spark.sql.types.StructField(
        s"__k_$c", org.apache.spark.sql.types.LongType)) :+
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.DoubleType))
    val wdf = spark.createDataFrame(
      spark.sparkContext.parallelize(weightRows.toSeq, 1), schema)
    val cond = orderCols.map(c =>
      col(s"`$c`").cast("long") === col(s"`__k_$c`")).reduce(_ && _)
    source.join(broadcast(wdf), cond)
      .drop(orderCols.map(c => s"__k_$c"): _*)
  }

  /** Density-ratio estimation w(x) = p_tgt(x)/p_src(x) via a Spark ML
    * logistic classifier on standardized features (reference
    * `estimate_density_ratio`, CP:646-738; in-sample scoring — the cv=0
    * path — since Spark ML has no stratified k-fold out of the box).
    * Returns the source rows with a `weight` column (odds ratio, clipped
    * at `clipQuantile` of the weight distribution).
    */
  def estimateDensityRatio(source: DataFrame, target: DataFrame,
                           featureCols: Seq[String],
                           clipQuantile: Double = 0.99): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
    import org.apache.spark.ml.functions.vector_to_array
    val src = source.withColumn("__label", lit(0.0))
    val tgt = target.select(featureCols.map(c => col(s"`$c`")): _*)
      .withColumn("__label", lit(1.0))
    val both = src.select((featureCols.map(c => col(s"`$c`")) :+ col("__label")): _*)
      .unionByName(tgt)
    val assembled = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__rawf").setHandleInvalid("skip").transform(both)
    val scaler = new StandardScaler().setInputCol("__rawf").setOutputCol("__features")
      .setWithMean(true).setWithStd(true).fit(assembled)
    val clf = new LogisticRegression().setFeaturesCol("__features")
      .setLabelCol("__label").setMaxIter(100)
      .fit(scaler.transform(assembled))

    val srcAssembled = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__rawf").setHandleInvalid("keep").transform(source)
    val scored = clf.setProbabilityCol("__prob")
      .transform(scaler.transform(srcAssembled))
    val p1 = element_at(vector_to_array(col("__prob")), 2)
    val p0 = greatest(element_at(vector_to_array(col("__prob")), 1), lit(1e-10))
    val withW = scored.withColumn("__w_raw", greatest(p1 / p0, lit(1e-10)))
      .drop("__rawf", "__features", "__prob", "rawPrediction", "prediction", "__label")
    val clip = withW.agg(percentile(col("__w_raw"), lit(clipQuantile)).as("__clip"))
    withW.crossJoin(broadcast(clip))
      .withColumn("weight", least(col("__w_raw"), col("__clip")))
      .drop("__w_raw", "__clip")
  }
}
