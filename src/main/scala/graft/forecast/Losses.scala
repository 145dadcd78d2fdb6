package graft.forecast

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation losses over a CV / prediction-vs-actual frame — reference
  * lgb_cv.py:27-68 (_mape/_rmse) plus the standard smape/mae companions.
  * Per-series means first, then a (weighted) mean across series — the
  * reference's grouped formulation, as two hash aggregates.
  */
object Losses {

  private def perIdAgg(metric: String, y: Column, yhat: Column): Column = metric match {
    // try_divide: a zero-valued target yields a null ratio (skipped by avg)
    // instead of an ANSI divide-by-zero error
    case "mape"  => avg(try_divide(abs(y - yhat), abs(y)))
    case "smape" => avg(try_divide(abs(y - yhat), (abs(y) + abs(yhat)) / 2))
    case "mae"   => avg(abs(y - yhat))
    case "rmse"  => avg((y - yhat) * (y - yhat)) // mse per id; sqrt after pooling
    case other   => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** One row per (id, model) metric value. rmse is reported per-id as the
    * root of the per-id mse.
    */
  def byId(df: DataFrame, idCol: String, targetCol: String,
           modelNames: Seq[String], metric: String): DataFrame = {
    val aggs = modelNames.map { m =>
      val v = perIdAgg(metric, col(targetCol).cast("double"), col(s"`$m`").cast("double"))
      (if (metric == "rmse") sqrt(v) else v).as(m)
    }
    df.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Scalar loss per model: mean over per-series values (weighted by
    * per-series weight sums when `weightCol` is set, reference
    * lgb_cv.py:31-45). For rmse the pooling happens on mse then sqrt
    * (lgb_cv.py:47-66).
    */
  def overall(df: DataFrame, idCol: String, targetCol: String,
              modelNames: Seq[String], metric: String,
              weightCol: Option[String] = None): DataFrame = {
    val perId = {
      val aggs = modelNames.map { m =>
        perIdAgg(metric, col(targetCol).cast("double"), col(s"`$m`").cast("double")).as(s"__v_$m")
      } ++ weightCol.map(w => sum(col(s"`$w`")).as("__w")).toSeq
      df.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    }
    val finals = modelNames.map { m =>
      val pooled = weightCol match {
        // Mask the denominator with the value's nullness: a series whose
        // per-id metric is null (e.g. all-zero y under mape) must not leave
        // its weight in the denominator, or the pooled loss biases to zero.
        case Some(_) =>
          sum(col(s"__v_$m") * col("__w")) /
            sum(when(col(s"__v_$m").isNotNull, col("__w")))
        case None => avg(col(s"__v_$m"))
      }
      (if (metric == "rmse") sqrt(pooled) else pooled).as(m)
    }
    perId.agg(finals.head, finals.tail: _*)
  }

  /** [[overall]] per group of `byCol`, in ONE aggregation pass over the
    * union instead of one job per group: per-(by, id) metric means, then
    * the mean across ids within each by-group (same grouped formulation;
    * rmse pools mse then roots). One row per byCol value — the eval shape
    * LightGBMCV's staged walk collects once per eval step instead of once
    * per (window, eval).
    */
  def overallBy(df: DataFrame, byCol: String, idCol: String, targetCol: String,
                modelNames: Seq[String], metric: String): DataFrame = {
    val perId = {
      val aggs = modelNames.map { m =>
        perIdAgg(metric, col(targetCol).cast("double"), col(s"`$m`").cast("double")).as(s"__v_$m")
      }
      df.groupBy(col(s"`$byCol`"), col(idCol)).agg(aggs.head, aggs.tail: _*)
    }
    val finals = modelNames.map { m =>
      val pooled = avg(col(s"__v_$m"))
      (if (metric == "rmse") sqrt(pooled) else pooled).as(m)
    }
    perId.groupBy(col(s"`$byCol`")).agg(finals.head, finals.tail: _*)
  }

  /** Long-format evaluation over a CV / prediction-vs-actual frame — the
    * evaluate() shape the reference ecosystem standardizes on: one row per
    * (series, metric) with a column per model, metrics stacked by name.
    * Built on [[byId]], so each metric keeps its grouped per-series
    * formulation (rmse = root of the per-id mse).
    */
  def evaluate(df: DataFrame, idCol: String, targetCol: String,
               modelNames: Seq[String], metrics: Seq[String],
               timeCol: String = "ds", train: Option[DataFrame] = None,
               season: Int = 1, baseline: Option[String] = None): DataFrame = {
    require(metrics.nonEmpty, "at least one metric is needed")
    metrics.map {
      case "mase" =>
        val tr = train.getOrElse(throw new IllegalArgumentException(
          "metric 'mase' needs the training panel (train = Some(...))"))
        maseById(df, tr, idCol, timeCol, targetCol, modelNames, season)
          .select(col(idCol) +: lit("mase").as("metric") +:
            modelNames.map(n => col(s"`$n`")): _*)
      case "rmae" =>
        val b = baseline.getOrElse(throw new IllegalArgumentException(
          "metric 'rmae' needs a baseline model name (baseline = Some(...))"))
        rmaeById(df, idCol, timeCol, targetCol, modelNames, b)
          .select(col(idCol) +: lit("rmae").as("metric") +:
            modelNames.map(n => col(s"`$n`")): _*)
      case m =>
        byId(df, idCol, targetCol, modelNames, m)
          .select(col(idCol) +: lit(m).as("metric") +:
            modelNames.map(n => col(s"`$n`")): _*)
    }.reduce(_ unionByName _)
  }

  /** MASE per (id, model) — Hyndman & Koehler (2006), the reference
    * ecosystem's `mase` loss: the forecast's per-series MAE scaled by the
    * TRAINING panel's in-sample seasonal-naive MAE at `season`, making
    * errors scale-free and comparable across series. Both means are
    * ordered-IEEE folds ([[orderedMean]]) so a SQL twin replays them
    * bit-for-bit; the ratio is one division. Series with no seasonal
    * diffs in training (history shorter than season+1) or zero scale
    * (constant seasonal pattern) emit null rather than infinity.
    */
  def maseById(cv: DataFrame, train: DataFrame, idCol: String,
               timeCol: String, targetCol: String, modelNames: Seq[String],
               season: Int): DataFrame = {
    require(season >= 1, s"season must be positive, got $season")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(timeCol))
    val scale = train
      .select(col(idCol), col(timeCol), col(targetCol).cast("double").as("__y"))
      .withColumn("__lag", lag(col("__y"), season).over(w))
      .filter(col("__lag").isNotNull)
      .groupBy(col(idCol))
      .agg(orderedMean(col(timeCol), abs(col("__y") - col("__lag"))).as("__scale"))
    val maes = {
      val aggs = modelNames.map { m =>
        orderedMean(col(timeCol),
          abs(col(targetCol).cast("double") - col(s"`$m`").cast("double")))
          .as(s"__mae_$m")
      }
      cv.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    }
    maes.join(scale, Seq(idCol), "left")
      .select(col(idCol) +: modelNames.map(m =>
        try_divide(col(s"__mae_$m"), col("__scale")).as(m)): _*)
  }

  /** Relative MAE per id — the reference ecosystem's `rmae(models,
    * baseline)`: each model's per-series MAE divided by a baseline model's
    * MAE on the same frame (< 1 = beats the baseline). Same ordered-fold
    * and zero->null division contract as [[maseById]].
    */
  def rmaeById(cv: DataFrame, idCol: String, timeCol: String,
               targetCol: String, modelNames: Seq[String],
               baseline: String): DataFrame = {
    val all = (modelNames :+ baseline).distinct
    val aggs = all.map { m =>
      orderedMean(col(timeCol),
        abs(col(targetCol).cast("double") - col(s"`$m`").cast("double")))
        .as(s"__mae_$m")
    }
    cv.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol) +: modelNames.map(m =>
        try_divide(col(s"__mae_$m"), col(s"__mae_$baseline")).as(m)): _*)
  }

  /** Ordered-IEEE mean: fold the per-row terms in (orderKey, term) sort
    * order, then one division — the repo's convention for float statistics
    * that must replay bit-for-bit in a SQL twin (`list_reduce(list_prepend
    * (0.0, list(term ORDER BY key, term)), (a,x) -> a+x) / COUNT(*)`).
    * A plain `avg` sums in partition-arrival order, which differs from any
    * SQL engine's scan order in the last ulp.
    */
  private def orderedMean(orderKey: Column, term: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(orderKey.as("__k"),
        term.as("__t")))), s => s.getField("__t")),
      lit(0.0), (a, x) => a + x) / count(lit(1))

  /** Interval-evaluation metrics per series over a frame carrying
    * `<model>-lo-<level>` / `<model>-hi-<level>` columns (the
    * predictWithIntervals / crossValidationWithIntervals output shape):
    * empirical coverage (fraction of actuals inside the band), mean band
    * width, and the Winkler (1972) interval score
    * `width + (2/alpha)·(lo−y)·1[y<lo] + (2/alpha)·(y−hi)·1[y>hi]` with
    * alpha = (100−level)/100 — the proper score for central intervals
    * (Gneiting & Raftery 2007). One row per id with
    * `<model>-{coverage,width,winkler}-<level>` columns. `timeCol` orders
    * the per-series folds (coverage is a 0/1 mean — exact in any order).
    *
    * 2/alpha is computed as Column arithmetic (2.0 / ((100.0 − l) /
    * 100.0)), NOT a pre-simplified Scala constant: for level 80 the IEEE
    * result is 9.999999999999998, and spelling the same ops keeps any SQL
    * twin bit-identical.
    */
  def intervalMetricsById(df: DataFrame, idCol: String, timeCol: String,
                          targetCol: String, modelNames: Seq[String],
                          levels: Seq[Int]): DataFrame = {
    val y = col(targetCol).cast("double")
    val aggs = for {
      m <- modelNames; l <- levels
      lo = col(s"`$m-lo-$l`").cast("double")
      hi = col(s"`$m-hi-$l`").cast("double")
      penalty = lit(2.0) / ((lit(100.0) - lit(l.toDouble)) / lit(100.0))
      (name, a) <- Seq(
        s"$m-coverage-$l" ->
          // rows with a null bound or target are NOT coverage misses —
          // they are unevaluable and must stay out of the average like
          // they stay out of the (null-propagating) width/winkler means
          avg(when(lo.isNull || hi.isNull || y.isNull,
            lit(null).cast("double"))
            .when(y >= lo && y <= hi, lit(1.0)).otherwise(lit(0.0))),
        s"$m-width-$l" -> orderedMean(col(timeCol), hi - lo),
        s"$m-winkler-$l" -> orderedMean(col(timeCol), (hi - lo) +
          when(y < lo, (lo - y) * penalty).otherwise(lit(0.0)) +
          when(y > hi, (y - hi) * penalty).otherwise(lit(0.0))))
    } yield a.as(name)
    df.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Pooled interval metrics: ordered mean over the per-series values
    * (id order), one row.
    */
  def intervalMetricsOverall(df: DataFrame, idCol: String, timeCol: String,
                             targetCol: String, modelNames: Seq[String],
                             levels: Seq[Int]): DataFrame = {
    val perId = intervalMetricsById(df, idCol, timeCol, targetCol,
      modelNames, levels)
    val cols = perId.columns.filterNot(_ == idCol)
    val aggs = cols.map(c => orderedMean(col(idCol), col(s"`$c`")).as(c))
    perId.agg(aggs.head, aggs.tail: _*)
  }

  /** Pinball / quantile loss per series for pre-computed quantile columns:
    * `QL_q = mean(max(q·(y−ŷ_q), (q−1)·(y−ŷ_q)))` (Koenker & Bassett
    * 1978; the proper score for quantile forecasts, Gneiting 2011).
    * `quantileCols` maps q → the column holding the q-quantile forecast —
    * e.g. a conformal `-lo-80` column is the 0.1 quantile. Output: one row
    * per id with a `<column>-ql` column per entry plus `mqloss`, the mean
    * across the listed quantiles. Folds are ordered by `timeCol`.
    */
  def quantileLossById(df: DataFrame, idCol: String, timeCol: String,
                       targetCol: String,
                       quantileCols: Seq[(Double, String)]): DataFrame = {
    require(quantileCols.nonEmpty, "at least one quantile column is needed")
    require(quantileCols.forall { case (q, _) => q > 0 && q < 1 },
      "quantiles must be in (0, 1)")
    val y = col(targetCol).cast("double")
    val aggs = quantileCols.map { case (q, c) =>
      val e = y - col(s"`$c`").cast("double")
      orderedMean(col(timeCol), greatest(lit(q) * e, (lit(q) - lit(1.0)) * e))
        .as(s"$c-ql")
    }
    val perId = df.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val mq = quantileCols.map { case (_, c) => col(s"`$c-ql`") }
      .reduce(_ + _) / lit(quantileCols.size.toDouble)
    perId.withColumn("mqloss", mq)
  }

  /** Per-series champion selection — the "pick the winner per series from
    * the backtest" ensembling step (forecast combination by selection):
    * the model with the smallest [[byId]] loss per series. Ties and null
    * losses resolve to the EARLIEST listed model, so the choice is
    * deterministic and replays cross-engine.
    *
    * Returns (id, champion, champion_loss).
    */
  def championByLoss(cv: DataFrame, idCol: String, targetCol: String,
                     modelNames: Seq[String], metric: String): DataFrame = {
    require(modelNames.nonEmpty, "championByLoss needs at least one model")
    val losses = byId(cv, idCol, targetCol, modelNames, metric)
    var bestName: Column = lit(modelNames.head)
    var bestLoss: Column = col(s"`${modelNames.head}`")
    modelNames.tail.foreach { m =>
      val c = col(s"`$m`")
      val wins = c.isNotNull && (bestLoss.isNull || c < bestLoss)
      bestName = when(wins, lit(m)).otherwise(bestName)
      bestLoss = when(wins, c).otherwise(bestLoss)
    }
    losses.select(col(idCol), bestName.as("champion"),
      bestLoss.as("champion_loss"))
  }

  /** Per-series inverse-loss ensemble weights — the combination
    * counterpart of [[championByLoss]] (Bates–Granger 1969 style): weight
    * wₘ ∝ 1/(lossₘ + ε) over the models with a defined backtest loss,
    * normalized per series (ε = 1e−9 keeps a perfect model finite and
    * dominant). Null-loss models get a null weight (excluded from the
    * total); a series where every loss is null gets all-null weights.
    *
    * Returns (id, w_<model>...). Fixed fold order over the listed models
    * keeps the normalization bit-reproducible cross-engine.
    */
  def inverseLossWeights(cv: DataFrame, idCol: String, targetCol: String,
                         modelNames: Seq[String], metric: String): DataFrame = {
    require(modelNames.nonEmpty, "inverseLossWeights needs at least one model")
    val losses = byId(cv, idCol, targetCol, modelNames, metric)
    val raws = modelNames.map { m =>
      when(col(s"`$m`").isNotNull, lit(1.0) / (col(s"`$m`") + lit(1.0e-9)))
    }
    val tot = raws.map(r => coalesce(r, lit(0.0))).reduce(_ + _)
    val withTot = losses.withColumn("__tot", tot)
    val weights = modelNames.zip(raws).map { case (m, r) =>
      when(r.isNotNull && col("__tot") > 0, r / col("__tot")).as(s"w_$m")
    }
    withTot.select(col(idCol) +: weights: _*)
  }

  /** Weighted ensemble combination: every row emits the per-series
    * weighted average of its model predictions. Models with a null weight
    * contribute zero; a null PREDICTION under a positive weight nulls the
    * combination (strict — a silently partial average would misreport),
    * and a series with no weighted model at all is null, not a fake zero.
    */
  def combineWeighted(preds: DataFrame, weights: DataFrame, idCol: String,
                      modelNames: Seq[String],
                      out: String = "ensemble_pred"): DataFrame = {
    val terms = modelNames.map { m =>
      when(col(s"`w_$m`").isNotNull,
        col(s"`w_$m`") * col(s"`$m`").cast("double")).otherwise(lit(0.0))
    }
    val anyW = modelNames.map(m => col(s"`w_$m`").isNotNull).reduce(_ || _)
    preds.join(weights, Seq(idCol), "left")
      .withColumn(out, when(anyW, terms.reduce(_ + _)))
  }

  /** Route a prediction frame through per-series champions: every row
    * emits its own series' champion model prediction plus the champion
    * name. The champion relation is one row per series — Catalyst
    * broadcasts it below the threshold and shuffles it above, both
    * correct at 10⁸ series.
    */
  def routeChampion(preds: DataFrame, champions: DataFrame, idCol: String,
                    modelNames: Seq[String],
                    out: String = "champion_pred"): DataFrame = {
    val routed = modelNames.foldLeft(lit(null).cast("double")) { (acc, m) =>
      when(col("champion") === m, col(s"`$m`").cast("double")).otherwise(acc)
    }
    preds.join(champions.select(col(idCol), col("champion")), Seq(idCol), "left")
      .withColumn(out, routed)
  }
}
