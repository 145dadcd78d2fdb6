package graft.forecast

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PanelFrame

/** Conformal prediction intervals — reference
  * /root/reference/mlforecast/conformal_prediction.py.
  *
  * Scores come from a refit=False cross validation; intervals per
  * (series, horizon-step) are exact quantiles over the CV windows' scores:
  *  - `conformal_error`: quantile of |err|, symmetric around the prediction
  *    (CP:298-339);
  *  - `conformal_distribution`: quantile over the union of (yhat - s,
  *    yhat + s) paths (CP:247-295).
  * All relational: one join of the (small) score frame to predictions plus a
  * groupBy-percentile; no per-series driver work.
  */
object Conformal {

  /** Conformity scores per (id, step, model) from CV output
    * (reference CP:758-786): step is the 1-based horizon position within
    * each window. With `freq` the step is computed from the (cutoff, ds)
    * distance — robust to actuals rows missing mid-window, where a
    * row_number would silently shift every later step's score to the wrong
    * horizon. Without it (unknown freq) row_number is the fallback.
    */
  def conformityScores(cv: DataFrame, idCol: String, timeCol: String,
                       targetCol: String, modelNames: Seq[String],
                       freq: Option[graft.core.Freq] = None): DataFrame =
    scoresImpl(cv, idCol, timeCol, targetCol, modelNames, freq, signed = false)

  /** One definition of the CV score computation for both the absolute
    * (conformityScores) and signed (ConformalTransfer.signedScores)
    * variants — the step logic is load-bearing and must not fork.
    */
  private[forecast] def scoresImpl(cv: DataFrame, idCol: String,
                                   timeCol: String, targetCol: String,
                                   modelNames: Seq[String],
                                   freq: Option[graft.core.Freq],
                                   signed: Boolean): DataFrame = {
    val step = freq match {
      case Some(f) => f.periodsBetween(col(timeCol), col("cutoff")).cast("int")
      case None =>
        row_number().over(
          Window.partitionBy(col(idCol), col("cutoff")).orderBy(col(timeCol)))
    }
    val withStep = cv.withColumn("__step", step)
    val scoreCols = modelNames.map { m =>
      val err = col(targetCol) - col(s"`$m`")
      (if (signed) err else abs(err)).as(s"__score_$m")
    }
    withStep.select(col(idCol) +: col("__step") +: scoreCols: _*)
  }

  /** Prediction-step column for interval attachment: the calendar distance
    * from the window cutoff when the frame carries one and the freq is
    * known — the SAME convention as the scores, robust to actuals rows
    * missing mid-window (a row_number would silently shift every later
    * row's band to the wrong horizon) — with the dense-grid row_number as
    * the fallback (predict()'s future grid is contiguous by construction).
    */
  private[forecast] def stepExpr(preds: DataFrame, idCol: String,
                                 timeCol: String,
                                 freq: Option[graft.core.Freq]): Column =
    freq match {
      case Some(f) if preds.columns.contains("cutoff") =>
        f.periodsBetween(col(timeCol), col("cutoff")).cast("int")
      case _ => row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col(timeCol)))
    }

  /** Add `<model>-lo-<level>` / `<model>-hi-<level>` columns to a prediction
    * frame using per-(id, step) score quantiles.
    */
  def addIntervals(preds: DataFrame, scores: DataFrame, idCol: String,
                   timeCol: String, modelNames: Seq[String],
                   levels: Seq[Int], method: String = "conformal_error",
                   freq: Option[graft.core.Freq] = None): DataFrame = {
    require(Set("conformal_error", "conformal_distribution")(method))
    val withStep =
      preds.withColumn("__step", stepExpr(preds, idCol, timeCol, freq))

    method match {
      case "conformal_error" =>
        // per-(id, step) quantiles of |err| across CV windows
        val qAggs = for {
          m <- modelNames; l <- levels
        } yield percentile(col(s"`__score_$m`"), lit(l / 100.0)).as(s"__q_${m}_$l")
        val qs = scores.groupBy(col(idCol), col("__step")).agg(qAggs.head, qAggs.tail: _*)
        val joined = withStep.join(qs, Seq(idCol, "__step"), "left")
        val bounds = for {
          m <- modelNames; l <- levels
          (suffix, sign) <- Seq("lo" -> -1, "hi" -> 1)
        } yield s"$m-$suffix-$l" -> (col(s"`$m`") + lit(sign) * col(s"__q_${m}_$l"))
        joined.withColumns(bounds.toMap)
          .drop("__step" +: (for (m <- modelNames; l <- levels) yield s"__q_${m}_$l"): _*)

      case "conformal_distribution" =>
        addDistributionIntervals(withStep, scores, idCol, timeCol, modelNames, levels)
    }
  }

  private def addDistributionIntervals(withStep: DataFrame, scores: DataFrame,
                                       idCol: String, timeCol: String,
                                       modelNames: Seq[String], levels: Seq[Int]): DataFrame = {
    val joined = withStep.join(scores, Seq(idCol, "__step"), "left")
    // per (id, ds): collect +/- paths per model across windows, take quantiles
    val aggs = for {
      m <- modelNames
    } yield flatten(collect_list(array(
      col(s"`$m`") - col(s"`__score_$m`"),
      col(s"`$m`") + col(s"`__score_$m`")))).as(s"__paths_$m")
    val keyCols = withStep.columns.filterNot(c => c == "__step" || c.startsWith("__score_"))
    val grouped = joined.groupBy(keyCols.map(c => col(s"`$c`")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val bounds = for {
      m <- modelNames; l <- levels
      alpha = (100 - l) / 200.0
      (suffix, q) <- Seq("lo" -> alpha, "hi" -> (1.0 - alpha))
    } yield s"$m-$suffix-$l" -> quantileOfArray(col(s"__paths_$m"), q)
    grouped.withColumns(bounds.toMap)
      .drop(modelNames.map(m => s"__paths_$m"): _*)
  }

  /** Adaptive Conformal Inference (Gibbs & Candès 2021, "Adaptive
    * conformal inference under distribution shift"): per series, walk the
    * test rows in time order updating the miscoverage target
    * αₜ₊₁ = clamp₀¹(αₜ + γ(α − errₜ)), where errₜ = 1 when the actual
    * falls outside the split-conformal band [ŷ ± q̂(αₜ)] and q̂(αₜ) is the
    * ⌈(1−αₜ)(n+1)⌉-th order statistic of the series' calibration scores
    * (degenerate targets: αₜ = 1 → zero-width band; ⌈..⌉ > n → infinite
    * band — both self-correct through the update). The online coverage
    * guarantee holds under arbitrary distribution shift, which the frozen
    * attach-time bands cannot claim.
    *
    * Exactness: the walk is a fixed-order scalar fold per series (one
    * double of state), so a SQL twin replays it bit-for-bit as a
    * recursive CTE over the step index.
    *
    * Scale shape: calibration scores and test rows collapse to one row
    * per series (sorted arrays), the walk is a compiled kernel inside the
    * aggregate's task, and results explode back — one id shuffle, state
    * bounded by series length (the repo's per-series-fits-a-task stance).
    *
    * `calib` = (idCol, scoreCol) nonconformity scores; `test` = (idCol,
    * timeCol, targetCol, predCol) time-ordered evaluation rows. Returns
    * (idCol, timeCol, y, yhat, alpha_t, qhat, err, lo, hi).
    */
  def aciPath(calib: DataFrame, test: DataFrame, idCol: String,
              timeCol: String, targetCol: String, predCol: String,
              scoreCol: String, alpha: Double, gamma: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(gamma > 0, s"gamma must be positive, got $gamma")
    val cal = calib.groupBy(col(idCol))
      .agg(sort_array(collect_list(col(scoreCol).cast("double"))).as("__cal"))
    // a null actual or prediction cannot produce a coverage error; drop it
    // rather than NPE inside the walk (the streaming gate filters the same)
    val rows = test
      .filter(col(targetCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        col(timeCol).as("__t"), col(targetCol).cast("double").as("__y"),
        col(predCol).cast("double").as("__p")))).as("__rows"))
    val alpha0 = alpha; val g = gamma
    val walk = udf { (calArr: Seq[Double], rs: Seq[Row]) =>
      var a = alpha0
      rs.map { r =>
        val y = r.getDouble(1); val p = r.getDouble(2)
        val (q, err, aNext) = aciStep(calArr, a, y, p, alpha0, g)
        val out = (a, q, err, p - q, p + q)
        a = aNext
        out
      }
    }
    rows.join(cal, Seq(idCol), "left")
      .select(col(idCol), col("__rows"),
        walk(col("__cal"), col("__rows")).as("__walk"))
      .select(col(idCol),
        explode(arrays_zip(col("__rows"), col("__walk"))).as("__z"))
      .select(col(idCol),
        col("__z.__rows.__t").as(timeCol),
        col("__z.__rows.__y").as("y"),
        col("__z.__rows.__p").as("yhat"),
        col("__z.__walk._1").as("alpha_t"),
        col("__z.__walk._2").as("qhat"),
        col("__z.__walk._3").as("err"),
        col("__z.__walk._4").as("lo"),
        col("__z.__walk._5").as("hi"))
  }

  /** One ACI step: (band half-width, coverage error, next alpha) — the
    * shared kernel between the batch walk ([[aciPath]]) and the streaming
    * gate (`StreamingConformal.aciGate`), so the two are bit-equal by
    * construction. `calArr` must be ASCENDING-sorted; null counts as
    * empty (infinite bands until alpha drifts to 1).
    */
  private[graft] def aciStep(calArr: Seq[Double], a: Double, y: Double,
                             p: Double, alpha0: Double,
                             gamma: Double): (Double, Double, Double) = {
    val n = if (calArr == null) 0 else calArr.length
    val k = math.ceil((1.0 - a) * (n + 1)).toLong
    val q =
      if (k <= 0L) 0.0
      else if (k > n) Double.PositiveInfinity
      else calArr((k - 1).toInt)
    val err = if (math.abs(y - p) > q) 1.0 else 0.0
    val aNext = math.min(1.0, math.max(0.0, a + gamma * (alpha0 - err)))
    (q, err, aNext)
  }

  /** Exact linear-interpolation quantile of an array column (same
    * interpolation as `percentile`).
    */
  private[forecast] def quantileOfArray(arr: Column, q: Double): Column = {
    val sorted = array_sort(arr)
    val n = size(sorted)
    val pos = lit(q) * (n - 1).cast("double")
    val lo = floor(pos).cast("int")
    val hi = ceil(pos).cast("int")
    val frac = pos - lo.cast("double")
    when(n > 0,
      element_at(sorted, lo + 1) * (lit(1.0) - frac) +
        element_at(sorted, hi + 1) * frac)
  }
}
