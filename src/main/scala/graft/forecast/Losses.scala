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
}
