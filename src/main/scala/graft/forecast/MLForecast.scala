package graft.forecast

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.core.{Freq, PanelFrame, Validation}
import graft.operators.{FeatureSpec, Featurizer}

/** The pipeline engine: feature preprocessing, model training, recursive /
  * direct multi-step prediction, cross-validation — the Spark-native
  * counterpart of the reference's `MLForecast` + `TimeSeries`
  * (/root/reference/mlforecast/forecast.py, core.py).
  *
  * Design stance (SURVEY §7): state is DataFrames; the recursive h-step loop
  * is driver-orchestrated — each step is a narrow window pass over bounded
  * per-series tails plus a model scoring job. Step predictions (one row per
  * series) are collected and re-injected via a small union, so plan lineage
  * stays depth-2 regardless of horizon. Pooled transforms work unmodified at
  * predict because every series advances in lockstep — the cross-series
  * limitation of the reference's own distributed mode (distributed/
  * forecast.py:128-146) disappears.
  */
final case class MLForecast(
    models: Seq[ForecastModel],
    freq: Freq,
    spec: FeatureSpec,
    targetTransforms: Seq[TargetTransform] = Nil,
    staticFeatures: Seq[String] = Nil,
    validate: Boolean = false,
) {
  def featureCols: Seq[String] = spec.featureNames ++ staticFeatures

  /** Fit transforms + features, dropna, train every model. */
  def fit(panel: PanelFrame): FittedMLForecast = {
    val (p, fitted, featurized, train) = prepare(panel)
    val trained = models.map { m =>
      m.name -> m.fit(train, featureCols, p.targetCol, panel.weightCol)
    }
    FittedMLForecast(this, panel, p, fitted, trained, featurized)
  }

  /** Rebuild predict state from history with pre-trained models — the
    * reference's `history_warmup` / `new_df` path (core.py:1234-1305).
    */
  def warmup(panel: PanelFrame, trained: Seq[(String, TrainedModel)]): FittedMLForecast = {
    val (p, fitted, featurized, _) = prepare(panel)
    FittedMLForecast(this, panel, p, fitted, trained, featurized)
  }

  private def prepare(panel: PanelFrame) = {
    if (validate) {
      Validation.requireContinuity(panel)
      Validation.requireNoNullTarget(panel)
    }
    var p = panel
    val fitted = targetTransforms.map { t =>
      val f = t.fit(p); p = f.transformed; f
    }
    val featurized = Featurizer.addFeatures(p, spec)
    val train = featurized.na.drop(spec.featureNames :+ p.targetCol)
    (p, fitted, featurized, train)
  }

  /** Convenience: preprocess only (the reference's `preprocess`). */
  def preprocess(panel: PanelFrame): DataFrame = {
    var p = panel
    targetTransforms.foreach { t => p = t.fit(p).transformed }
    Featurizer.addFeatures(p, spec)
  }
}

final case class FittedMLForecast(
    conf: MLForecast,
    rawPanel: PanelFrame,
    transformedPanel: PanelFrame,
    fittedTransforms: Seq[FittedTargetTransform],
    trained: Seq[(String, TrainedModel)],
    featurized: DataFrame,
) {
  private def spark: SparkSession = transformedPanel.df.sparkSession
  import transformedPanel.{idCol, timeCol, targetCol}

  /** Recursive h-step prediction for every model. Returns one row per
    * (id, future ds) with a prediction column per model, inverse target
    * transforms applied.
    */
  def predict(h: Int, xDf: Option[DataFrame] = None): DataFrame = {
    require(h > 0)
    // Trim carried history when every transform is finite-window
    // (reference keep_last_n inference, core.py:404-425).
    val baseState = conf.spec.updateSamplesBound match {
      case Some(bound) => transformedPanel.keepLastN(bound + 1).df
      case None        => transformedPanel.df
    }
    val statics = transformedPanel.copy(staticCols = conf.staticFeatures).statics
    val stateCols = Seq(idCol, timeCol, targetCol) ++ conf.staticFeatures
    val base = baseState.select(stateCols.map(col): _*).cache()
    base.count() // materialize once; every step reuses it

    val lastDates = transformedPanel.lastDates.cache()

    val perModel = trained.map { case (name, model) =>
      name -> recursiveLoop(model, name, h, base, statics, lastDates, xDf)
    }
    base.unpersist(); lastDates.unpersist()

    // join per-model prediction frames on (id, ds)
    var out = perModel.head._2
    for ((_, df) <- perModel.tail) out = out.join(df, Seq(idCol, timeCol))
    // inverse target transforms, reverse order
    val stepIdx = row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col(timeCol))).cast("long") - 1
    val valueCols = perModel.map(_._1)
    fittedTransforms.reverse.foldLeft(out) { (df, t) =>
      t.inverse(df, idCol, stepIdx, valueCols)
    }
  }

  private def recursiveLoop(model: TrainedModel, name: String, h: Int,
                            base: DataFrame, statics: DataFrame,
                            lastDates: DataFrame, xDf: Option[DataFrame]): DataFrame = {
    val sess = spark
    var appended: Seq[Row] = Vector.empty
    val appendSchema = StructType(Seq(
      base.schema(idCol), base.schema(timeCol), StructField(targetCol, DoubleType)))

    def stateNow: DataFrame = {
      if (appended.isEmpty) base
      else {
        val extra = sess.createDataFrame(
            sess.sparkContext.parallelize(appended, 1), appendSchema)
          .join(statics.withColumnRenamed(transformedPanel.idCol, idCol), Seq(idCol), "left")
          .select(base.columns.map(c => col(c).cast(base.schema(c).dataType)): _*)
        base.unionByName(extra)
      }
    }

    var preds: Seq[Row] = Vector.empty
    for (step <- 1 to h) {
      val nextDs = conf.freq.advance(col("last_date"), lit(step))
      var placeholder = lastDates
        .select(col(idCol), nextDs.as(timeCol))
        .join(statics, Seq(idCol), "left")
        .withColumn(targetCol, lit(null).cast(DoubleType))
      xDf.foreach { x => placeholder = placeholder.join(x, Seq(idCol, timeCol), "left") }
      val unioned = stateNow.unionByName(placeholder, allowMissingColumns = true)

      val p = transformedPanel.copy(df = unioned)
      val feats = Featurizer.addFeatures(p, conf.spec)
      val stepFeats = feats.join(
        lastDates.select(col(idCol), nextDs.as("__next")), Seq(idCol))
        .filter(col(timeCol) === col("__next"))
      val scored = model.predict(stepFeats, conf.featureCols, "__yhat")
        .select(col(idCol), col(timeCol), col("__yhat").cast(DoubleType))
      val rows = scored.collect().toVector
      appended = appended ++ rows.map(r => Row(r.get(0), r.get(1), r.get(2)))
      preds = preds ++ rows
    }
    val predSchema = StructType(Seq(
      base.schema(idCol), base.schema(timeCol), StructField(name, DoubleType)))
    sess.createDataFrame(sess.sparkContext.parallelize(preds, 1), predSchema)
  }

  /** Sliding-window cross validation (reference forecast.py:1859-2077).
    * Returns (id, ds, cutoff, y, <model preds...>).
    */
  def crossValidation(nWindows: Int, h: Int, stepSize: Option[Int] = None,
                      refit: Boolean = true): DataFrame =
    MLForecastCV.run(conf, rawPanel, nWindows, h, stepSize.getOrElse(h), refit)
}

private object MLForecastCV {
  def run(conf: MLForecast, panel: PanelFrame, nWindows: Int, h: Int,
          stepSize: Int, refit: Boolean): DataFrame = {
    import panel.{idCol, timeCol, targetCol}
    val lastDates = panel.lastDates
    var firstFit: Option[FittedMLForecast] = None
    val frames = (0 until nWindows).map { i =>
      val offset = h + (nWindows - 1 - i) * stepSize
      // Both bounds are single hops from last_date: composed calendar
      // arithmetic (advance(advance(d, -offset), h)) clamps month-end dates
      // and would silently drop the last horizon's actuals for month freqs.
      val cutoffs = lastDates.select(col(idCol),
        panel.freq.advance(col("last_date"), lit(-offset)).as("__cutoff"),
        panel.freq.advance(col("last_date"), lit(h - offset)).as("__bound"))
      val trainDf = panel.df.join(broadcast(cutoffs), Seq(idCol))
        .filter(col(timeCol) <= col("__cutoff")).drop("__cutoff", "__bound")
      val trainPanel = panel.copy(df = trainDf)
      val fitted =
        if (refit || firstFit.isEmpty) {
          val f = conf.fit(trainPanel)
          if (firstFit.isEmpty) firstFit = Some(f)
          f
        } else {
          // frozen models, state rebuilt on this window's history
          conf.warmup(trainPanel, firstFit.get.trained)
        }
      val preds = fitted.predict(h)
      val actuals = panel.df.join(broadcast(cutoffs), Seq(idCol))
        .filter(col(timeCol) > col("__cutoff") && col(timeCol) <= col("__bound"))
        .select(col(idCol), col(timeCol), col("__cutoff").as("cutoff"),
          col(targetCol).cast("double").as(targetCol))
      actuals.join(preds, Seq(idCol, timeCol))
    }
    frames.reduce(_ unionByName _)
  }
}
