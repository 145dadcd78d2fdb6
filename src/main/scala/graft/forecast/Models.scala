package graft.forecast

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model abstraction: anything that fits on a feature frame and scores one.
  * The reference accepts any sklearn-style fit/predict object
  * (/root/reference/mlforecast/core.py:157); here the natural citizens are
  * Spark ML estimators (trained data-parallel on the cluster — same stance
  * as the reference's own Spark branch, distributed/forecast.py:408-418)
  * plus closed-form baselines that need no training at all.
  */
trait ForecastModel extends Serializable {
  def name: String
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel

  /** True when `fit` ignores the training data (closed-form baselines):
    * refitting per CV window is then a no-op, which lets the fused CV fast
    * path run even under refit=true.
    */
  def dataFree: Boolean = false

  /** Closed-form per-series fit, executable inside an executor task: given
    * ONE series' featurized training rows (feature arrays in `featureCols`
    * order and labels — dropna-surviving rows only, ascending time), return
    * a scorer with the [[TrainedModel.scorer]] contract. Present = the fused
    * CV loop can refit this model per window inside the kernel, which makes
    * refit=true / refitEvery / inputSize schedules fusible for per-series
    * models (the reference's own per-worker refit stance,
    * /root/reference/mlforecast/distributed/forecast.py:520-577).
    */
  def localFitter(featureCols: Seq[String]): Option[ForecastModel.LocalFit] = None
}

object ForecastModel {
  /** (featureRows, labels) for one series' training rows → local scorer. */
  type LocalFit = (Array[Array[Double]], Array[Double]) => (Array[Double] => java.lang.Double)
}

trait TrainedModel extends Serializable {
  /** Add prediction column `out` to a feature frame. */
  def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame

  /** Cluster-side state relations (one row per series and the like) to
    * persist as PARQUET at save time — the same sidecar contract the target
    * transforms use — instead of riding the java-serialized blob through a
    * driver collect, which caps state at driver memory. Models whose whole
    * state fits the blob (coefficients, trees) return Nil.
    */
  def state: Seq[DataFrame] = Nil

  /** Rebuild this model from reloaded `state` frames (same order). */
  def restoreState(frames: Seq[DataFrame]): TrainedModel = this

  /** Optional executor-local scoring function over a feature array in
    * `featureCols` order (NaN = missing, mirroring VectorAssembler
    * handleInvalid="keep"); null result = SQL NULL prediction. Enables the
    * fused per-series recursive predict (LocalLoop); None falls back to the
    * driver-orchestrated loop.
    */
  def scorer(featureCols: Seq[String]): Option[Array[Double] => java.lang.Double] = None

  /** Per-series CONSTANT-forecast state, when this model's prediction is a
    * single value per series (SES / Croston / TSB levels): the (levels
    * frame with columns (keyCol, `__level`), keyCol) pair. Lets the fused
    * recursive loop join the level onto the panel once and emit it for
    * every step instead of falling back to the h-job driver loop — the
    * state stays a DataFrame (never a driver-collected map, so any number
    * of series works).
    */
  def seriesLevels: Option[(DataFrame, String)] = None
}

private object Features {
  /** `keep` (NaN entries) rather than the default `error`: recursive predict
    * scores placeholder rows whose features can be null for series shorter
    * than the longest window — the reference propagates NaN predictions
    * there instead of failing mid-horizon.
    */
  def assembler(featureCols: Seq[String]): VectorAssembler =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("__features")
      .setHandleInvalid("keep")

  // VectorAssembler resolves input names through struct-field parsing, so
  // feature names containing dots (`...alpha0.5`) break it; rename to a
  // sanitized alias around assembly.
  private def sanitize(c: String): String = c.replace(".", "_DOT_")

  def withVector(df: DataFrame, featureCols: Seq[String]): DataFrame = {
    var d = df
    featureCols.filter(_.contains(".")).foreach { c =>
      d = d.withColumnRenamed(c, sanitize(c))
    }
    assembler(featureCols.map(sanitize)).transform(d)
  }

  def renameBack(df: DataFrame, featureCols: Seq[String]): DataFrame = {
    var d = df
    featureCols.filter(_.contains(".")).foreach { c =>
      d = d.withColumnRenamed(sanitize(c), c)
    }
    d
  }
}

/** Spark ML linear regression (normal-equation solver: deterministic, one
  * pass, no iteration — right for the modest feature counts here).
  */
final case class SparkLinearRegression(name: String = "lr",
                                       regParam: Double = 0.0,
                                       elasticNetParam: Double = 0.0,
                                       fitIntercept: Boolean = true) extends ForecastModel {
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    val assembled = Features.withVector(train, featureCols)
    val est = new LinearRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setRegParam(regParam).setElasticNetParam(elasticNetParam)
      .setFitIntercept(fitIntercept)
      // the closed-form solver only supports L2; an L1/elastic-net penalty
      // needs the iterative (OWL-QN) path
      .setSolver(if (elasticNetParam == 0.0) "normal" else "auto")
    weightCol.foreach(est.setWeightCol)
    val m = est.fit(assembled)
    MLlibTrained(m)
  }
}

final case class SparkGBT(name: String = "gbt", maxIter: Int = 20,
                          maxDepth: Int = 5, stepSize: Double = 0.1,
                          seed: Long = 0L,
                          /** GBTRegressor loss: "squared" or "absolute"
                            * (the l1 twin of GraftGbm's objective="l1"). */
                          lossType: String = "squared") extends ForecastModel {
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    val assembled = Features.withVector(train, featureCols)
    val est = new GBTRegressor()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setStepSize(stepSize).setSeed(seed)
      .setLossType(lossType)
    weightCol.foreach(est.setWeightCol)
    MLlibTrained(est.fit(assembled))
  }
}

final case class SparkRandomForest(name: String = "rf", numTrees: Int = 50,
                                   maxDepth: Int = 8, seed: Long = 0L) extends ForecastModel {
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    val assembled = Features.withVector(train, featureCols)
    val est = new RandomForestRegressor()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
    weightCol.foreach(est.setWeightCol)
    MLlibTrained(est.fit(assembled))
  }
}

private final case class MLlibTrained[M <: org.apache.spark.ml.PredictionModel[org.apache.spark.ml.linalg.Vector, M]](m: M)
    extends TrainedModel {
  /** Per-call private copy of the model. spark.ml param setters MUTATE the
    * instance's ParamMap (a scala mutable.Map): calling
    * `m.setPredictionCol(out)` on the SHARED trained model races against
    * the java-serialization of earlier task closures that captured the
    * same instance — AQE materializes query stages on async threads, so a
    * driver-loop predict can mutate the map mid-write and kill an
    * unrelated job with "Task not serializable: Illegal size N of
    * collection, expected N+1". Every path below freezes its own copy
    * BEFORE the plan is built; nothing mutates a published instance.
    */
  private def frozen: M = m.copy(org.apache.spark.ml.param.ParamMap.empty)

  def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame = {
    val assembled = Features.withVector(df, featureCols)
    Features.renameBack(
      frozen.setPredictionCol(out).transform(assembled).drop("__features"),
      featureCols)
  }

  /** Same code path as transform(): PredictionModel.predict on a dense
    * vector (NaN entries = assembler handleInvalid="keep" missing values).
    */
  override def scorer(featureCols: Seq[String]): Option[Array[Double] => java.lang.Double] = {
    val mc = frozen
    Some(arr => java.lang.Double.valueOf(
      mc.predict(org.apache.spark.ml.linalg.Vectors.dense(arr.clone()))))
  }
}

/** Predicts a single feature column verbatim — `Naive` is `lag1`,
  * `SeasonalNaive(s)` is `lag{s}`. Closed-form (no training), which makes
  * full recursive pipelines expressible in plain SQL for oracle checking.
  */
final case class FeatureEcho(name: String, featureName: String) extends ForecastModel {
  override def dataFree: Boolean = true
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    require(featureCols.contains(featureName),
      s"FeatureEcho($featureName) needs that feature in the spec; have $featureCols")
    val echoed = featureName
    new TrainedModel {
      def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame =
        df.withColumn(out, col(s"`$echoed`").cast("double"))

      // a NaN feature array entry is a null column value (the echo column is
      // null there, never NaN, because the featurizer folds NaN to null)
      override def scorer(featureCols: Seq[String]): Option[Array[Double] => java.lang.Double] = {
        val idx = featureCols.indexOf(echoed)
        if (idx < 0) None
        else Some { arr =>
          val v = arr(idx)
          if (v.isNaN) null else java.lang.Double.valueOf(v)
        }
      }
    }
  }
}

/** Per-series training-mean model (the closed-form analog of sklearn's
  * DummyRegressor): fit snapshots sum(y)/count(y) per series, predict
  * broadcast-joins the constant back by id. Unlike the feature echoes this
  * is genuinely data-DEPENDENT — CV refit schedules (refit=false /
  * refitEvery=k) are observable through it, because a frozen model keeps
  * predicting an older window's mean.
  */
final case class SeriesMean(name: String = "series_mean",
                            keyCol: String = "unique_id") extends ForecastModel {
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    // ForecastModel.fit doesn't receive the panel's id column, so the key
    // must be configured; fail loudly rather than with an AnalysisException.
    require(train.columns.contains(keyCol),
      s"SeriesMean groups by '$keyCol' but the training frame has [${train.columns.mkString(", ")}]; " +
        "pass SeriesMean(keyCol = <your id column>)")
    val means = train.groupBy(col(keyCol))
      .agg((sum(col(s"`$labelCol`")) / count(col(s"`$labelCol`"))).as("__series_mean"))
    new SeriesMeanTrained(means, keyCol,
      train.schema(keyCol).dataType)
  }

  /** In-kernel refit: the mean of the series' surviving training labels
    * (sum/count — null when the series has no surviving rows, matching the
    * missing-key left join of the driver path).
    */
  override def localFitter(featureCols: Seq[String]): Option[ForecastModel.LocalFit] =
    Some { (_, labels) =>
      if (labels.isEmpty) { _ => null }
      else {
        var s = 0.0; var i = 0
        while (i < labels.length) { s += labels(i); i += 1 }
        val m = java.lang.Double.valueOf(s / labels.length)
        _ => m
      }
    }
}

/** Per-series means: the state is a one-row-per-series DataFrame that never
  * transits the driver — predict is a plain equi-join (Catalyst broadcasts
  * it when it fits the threshold and shuffles it when it doesn't, which is
  * the right behavior at 10^8 series), and save/load moves it as a parquet
  * sidecar via the [[TrainedModel.state]] contract rather than a
  * collect-into-the-blob.
  */
final class SeriesMeanTrained(@transient private val means: DataFrame,
                              val keyCol: String,
                              val keyType: org.apache.spark.sql.types.DataType)
    extends TrainedModel {

  def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame = {
    require(means != null,
      "SeriesMeanTrained has no state in this session; load it via MLForecastIO " +
        "(restoreState) instead of deserializing the blob directly")
    df.join(means, Seq(keyCol), "left")
      .withColumn(out, col("__series_mean"))
      .drop("__series_mean")
  }

  override def state: Seq[DataFrame] = Seq(means)

  override def restoreState(frames: Seq[DataFrame]): TrainedModel =
    new SeriesMeanTrained(frames.head, keyCol, keyType)
}

/** Per-series constant-forecast state: one (key, level) row per series.
  * Same contract as [[SeriesMeanTrained]] — predict is a plain equi-join
  * (Catalyst picks broadcast vs shuffle), save/load moves the state as a
  * parquet sidecar, nothing transits the driver.
  */
private final class PerSeriesLevelTrained(@transient private val levels: DataFrame,
                                          val keyCol: String)
    extends TrainedModel {
  def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame = {
    require(levels != null,
      "per-series level model has no state in this session; load it via " +
        "MLForecastIO (restoreState) instead of deserializing the blob directly")
    df.join(levels, Seq(keyCol), "left")
      .withColumn(out, col("__level"))
      .drop("__level")
  }
  override def state: Seq[DataFrame] = Seq(levels)
  override def restoreState(frames: Seq[DataFrame]): TrainedModel =
    new PerSeriesLevelTrained(frames.head, keyCol)
  override def seriesLevels: Option[(DataFrame, String)] =
    Option(levels).map(_ -> keyCol)
}

/** Per-series closed-form level models built from ONE compiled fold over
  * the series' dropna-surviving training labels in time order: the fit
  * aggregates each series to a sorted label array and runs the same JVM
  * kernel the fused-CV `localFitter` uses, so driver-path and in-kernel
  * refits are bit-identical by construction.
  */
private[forecast] trait LabelFoldModel extends ForecastModel {
  def keyCol: String
  def timeCol: String
  /** The per-series statistic; null = no forecast (e.g. no demand). */
  private[forecast] def levelOf(labels: Array[Double]): java.lang.Double

  /** Closed-form-model convention (shared with SeriesMean): sample weights
    * are IGNORED — SES/Croston/TSB folds are defined on the raw label
    * sequence, and a weighted variant has no reference semantics. A passed
    * `weightCol` logs a warning (not an error: MLForecast hands the same
    * weightCol to every model in a mixed fit, where the trainable models do
    * honor it).
    */
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    weightCol.foreach { w =>
      System.err.println(s"[graft] $name ignores sample weights " +
        s"(weightCol='$w'): closed-form per-series folds are unweighted")
    }
    require(train.columns.contains(keyCol) && train.columns.contains(timeCol),
      s"$name folds per-series labels over ('$keyCol', '$timeCol') but the " +
        s"training frame has [${train.columns.mkString(", ")}]")
    val lvlUdf = udf { (vals: Seq[Double]) => levelOf(vals.toArray) }
    val ordered = transform(
      array_sort(collect_list(struct(col(timeCol).as("__k"),
        col(s"`$labelCol`").cast("double").as("__t")))),
      s => s.getField("__t"))
    // the level folds over OBSERVED labels: a null label row (anything
    // other than MLForecast's dropna'd train frame) would fail the
    // Seq[Double] encoder and kill the fit
    val levels = train.filter(col(s"`$labelCol`").isNotNull)
      .groupBy(col(keyCol))
      .agg(lvlUdf(ordered).as("__level"))
    new PerSeriesLevelTrained(levels, keyCol)
  }

  override def localFitter(featureCols: Seq[String]): Option[ForecastModel.LocalFit] =
    Some { (_, labels) =>
      val v = levelOf(labels)
      _ => v
    }
}

/** Simple exponential smoothing (Brown 1956; the statsforecast `SES`
  * baseline) as a closed-form per-series model: level l₁ = y₁,
  * lₜ = α·yₜ + (1−α)·lₜ₋₁ over the training labels, flat forecast = l for
  * every horizon.
  */
final case class Ses(alphaS: Double, name: String = "ses",
                     keyCol: String = "unique_id",
                     timeCol: String = "ds") extends LabelFoldModel {
  require(alphaS > 0 && alphaS <= 1, s"alpha must be in (0,1], got $alphaS")
  private val oneMinus = 1.0 - alphaS
  private[forecast] def levelOf(labels: Array[Double]): java.lang.Double = {
    if (labels.isEmpty) return null
    var l = labels(0); var i = 1
    while (i < labels.length) { l = alphaS * labels(i) + oneMinus * l; i += 1 }
    java.lang.Double.valueOf(l)
  }
}

/** Croston's method (Croston 1972), classic variant — the intermittent-
  * demand standard: SES (same α, SES-seeded with the first observation)
  * over the NONZERO demand sizes and over the inter-demand intervals
  * (first interval = the 1-based position of the first demand), flat
  * forecast = z/p. A series with no nonzero demand forecasts null (no
  * demand signal — loud, not a silent zero).
  */
final case class CrostonClassic(alphaS: Double = 0.1, name: String = "croston",
                                keyCol: String = "unique_id",
                                timeCol: String = "ds") extends LabelFoldModel {
  require(alphaS > 0 && alphaS <= 1, s"alpha must be in (0,1], got $alphaS")
  private val oneMinus = 1.0 - alphaS
  private[forecast] def levelOf(labels: Array[Double]): java.lang.Double = {
    var z = 0.0; var p = 0.0; var started = false
    var sinceLast = 0; var i = 0
    while (i < labels.length) {
      sinceLast += 1
      if (labels(i) != 0.0) {
        if (!started) { z = labels(i); p = sinceLast.toDouble; started = true }
        else {
          z = alphaS * labels(i) + oneMinus * z
          p = alphaS * sinceLast.toDouble + oneMinus * p
        }
        sinceLast = 0
      }
      i += 1
    }
    if (!started) null else java.lang.Double.valueOf(z / p)
  }
}

/** TSB (Teunter–Syntetos–Babai 2011) intermittent-demand model: the
  * demand PROBABILITY updates every period (pₜ = β·dₜ + (1−β)·pₜ₋₁,
  * dₜ = 1 when demand occurred, seeded with d₁) while the demand SIZE
  * updates only on demand periods (SES with α over the nonzero sizes,
  * seeded with the first size); forecast = p·z. Unlike Croston, TSB
  * decays toward zero through demand-free stretches — the obsolescence
  * case. A series with no demand at all forecasts null.
  */
final case class Tsb(alphaS: Double = 0.1, beta: Double = 0.1,
                     name: String = "tsb", keyCol: String = "unique_id",
                     timeCol: String = "ds") extends LabelFoldModel {
  require(alphaS > 0 && alphaS <= 1, s"alpha must be in (0,1], got $alphaS")
  require(beta > 0 && beta <= 1, s"beta must be in (0,1], got $beta")
  private val oneMinusA = 1.0 - alphaS
  private val oneMinusB = 1.0 - beta
  private[forecast] def levelOf(labels: Array[Double]): java.lang.Double = {
    if (labels.isEmpty) return null
    var z = 0.0; var started = false
    var p = if (labels(0) != 0.0) 1.0 else 0.0
    var i = 0
    while (i < labels.length) {
      val d = if (labels(i) != 0.0) 1.0 else 0.0
      if (i > 0) p = beta * d + oneMinusB * p
      if (d == 1.0) {
        if (!started) { z = labels(i); started = true }
        else z = alphaS * labels(i) + oneMinusA * z
      }
      i += 1
    }
    if (!started) null else java.lang.Double.valueOf(p * z)
  }
}

object Models {
  def naive: ForecastModel = FeatureEcho("naive", "lag1")
  def ses(alpha: Double): ForecastModel = Ses(alpha)
  def croston(alpha: Double = 0.1): ForecastModel = CrostonClassic(alpha)
  def tsb(alpha: Double = 0.1, beta: Double = 0.1): ForecastModel = Tsb(alpha, beta)
  def seasonalNaive(season: Int): ForecastModel =
    FeatureEcho(s"seasonal_naive$season", s"lag$season")
  def seriesMean: ForecastModel = SeriesMean()
}
