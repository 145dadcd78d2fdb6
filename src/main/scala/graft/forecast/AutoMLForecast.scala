package graft.forecast

import org.apache.spark.sql.DataFrame

import graft.core.PanelFrame

/** Configuration search by backtest loss — the Spark-native counterpart of
  * the reference's AutoMLForecast (auto.py: optuna over model params +
  * feature configs; here a DETERMINISTIC grid over explicit candidate
  * configs, scored by sliding-window CV — a zero-egress cluster has no
  * optuna, and a reproducible grid is the idiomatic Spark shape: every
  * candidate's CV is an independent job chain).
  *
  * Scoring mirrors optimization.py's objective: the per-config loss is the
  * chosen metric of its best model over `nWindows` backtest windows.
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
) {
  require(candidates.nonEmpty, "need at least one candidate config")

  /** CV-score every candidate, pick the winner, refit it on the full panel.
    * Candidates are independent job chains, so they are submitted
    * concurrently and overlap on free executors (the selection stays
    * deterministic: results are collected in candidate order).
    */
  def fit(panel: PanelFrame): AutoMLForecastResult = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // score once, share across candidates: each candidate re-reading the
    // panel lineage would multiply the source scans
    val pinned = panel.copy(df = MLForecast.pin(panel.df))
    val futures = candidates.map { case (name, conf) =>
      Future {
        val cv = conf.fit(pinned).crossValidation(nWindows, h, refit = refit)
        val names = conf.models.map(_.name)
        val perModel = customLoss match {
          case Some(lossFn) =>
            val losses = lossFn(cv, names).toMap
            val missing = names.filterNot(losses.contains)
            require(missing.isEmpty,
              s"customLoss for candidate '$name' returned no loss for: ${missing.mkString(", ")}")
            names.map { m =>
              val l = losses(m)
              m -> (if (l.isNaN) Double.PositiveInfinity else l)
            }
          case None =>
            val row = Losses.overall(cv, panel.idCol, panel.targetCol, names, metric)
              .collect().head
            // A null pooled loss (e.g. mape over all-zero targets) means the
            // candidate is degenerate for this metric — it loses, not crashes.
            names.zipWithIndex.map { case (m, i) =>
              m -> (if (row.isNullAt(i)) Double.PositiveInfinity else row.getDouble(i))
            }
        }
        val best = perModel.minBy(_._2)
        (name, conf, best._1, best._2)
      }
    }
    val scored = futures.map(f => Await.result(f, Duration.Inf))
    val winner = scored.minBy(_._4)
    AutoMLForecastResult(
      bestConfig = winner._1,
      bestModel = winner._3,
      losses = scored.map { case (n, _, m, l) => (n, m, l) },
      fitted = scored.find(_._1 == winner._1).get._2.fit(pinned))
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
