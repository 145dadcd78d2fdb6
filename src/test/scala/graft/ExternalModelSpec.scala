package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast._
import graft.operators.FeatureSpec

/** Stand-in for a vendor booster handle: opaque, serializable, predicts
  * from a primitive feature array (what LightGBM's Booster / XGBoost's
  * Booster.predict expose).
  */
private[graft] final class ProbeBooster(val bias: Double, val w: Array[Double])
    extends Serializable {
  def predictRow(feat: Array[Double]): Double =
    bias + w.iterator.zip(feat.iterator).map { case (a, b) => a * b }.sum
}

/** External-binding-shaped estimator: fit trains the booster through the
  * vendor path (here: a closed-form ridge-free least squares on a driver
  * sample, standing in for LightGBMRegressor.fit), predict goes through
  * the booster handle both frame-level and row-level.
  */
private[graft] final case class ProbeExternalBooster(name: String = "ext_booster")
    extends ForecastModel {
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    // vendor trainers consume the frame their own way; the probe uses a
    // 1-feature mean-ratio fit so predictions are hand-checkable
    val f0 = featureCols.head
    val row = train.select(
      avg(col(s"`$labelCol`").cast("double")).as("my"),
      avg(col(s"`$f0`").cast("double")).as("mx")).collect().head
    val slope = if (row.isNullAt(1) || row.getDouble(1) == 0.0) 0.0
      else row.getDouble(0) / row.getDouble(1)
    val booster = new ProbeBooster(0.0,
      slope +: Array.fill(featureCols.size - 1)(0.0))
    new TrainedModel {
      def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame = {
        // frame path = binding's model.transform + rename; expressed
        // relationally so it stays codegen-friendly
        val expr = featureCols.zip(booster.w).map { case (c, wi) =>
          col(s"`$c`").cast("double") * lit(wi)
        }.reduce(_ + _) + lit(booster.bias)
        df.withColumn(out, expr)
      }
      // local booster handle → fused recursive predict / fused CV
      override def scorer(featureCols: Seq[String]): Option[Array[Double] => java.lang.Double] =
        Some { arr =>
          if (arr.exists(_.isNaN)) null
          else java.lang.Double.valueOf(booster.predictRow(arr))
        }
    }
  }
}


/** The external-booster integration point (SCALING.md "External boosters"):
  * the reference wraps real LightGBM/XGBoost/CatBoost estimators
  * (reference distributed/models/spark/lgb.py:25-33, auto.py:147-185);
  * those bindings are absent offline, so this spec pins the CONTRACT with
  * a probe estimator shaped exactly like one — an opaque booster handle
  * trained outside Spark ML, a frame-level transform for scoring, and a
  * local scorer over a feature array — and proves the untouched MLForecast
  * machinery (fit, fused recursive predict, CV, save/load) accepts it.
  * A real binding is the probe with its math swapped for the vendor calls.
  */
class ExternalModelSpec extends SparkSpec {
  import spark.implicits._

  private def panel(): PanelFrame = {
    val rows = for {
      (id, base) <- Seq("a" -> 10.0, "b" -> 20.0)
      t <- 0 until 30
    } yield (id, t.toLong, base + t)
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))
  }

  private def conf = MLForecast(
    models = Seq(ProbeExternalBooster()),
    freq = Freq.IntFreq(1),
    spec = FeatureSpec(lags = Seq(1)))

  test("an external-binding-shaped estimator runs fit + fused predict untouched") {
    val fitted = conf.fit(panel())
    val preds = fitted.predict(3).collect()
    assert(preds.length == 2 * 3)
    // slope = mean(y)/mean(lag1) over dropna rows; recursive feedback uses
    // the scorer (fused loop), so step 2 reads step 1's prediction
    assert(preds.forall(r => !r.isNullAt(r.fieldIndex("ext_booster"))))
    val a1 = preds.filter(r => r.getString(0) == "a")
      .minBy(_.getAs[Long]("ds")).getAs[Double]("ext_booster")
    // vs hand fit: ys 11..39 over lags 10..38 (id a) + 21..49 over 20..48
    val ys = ((11 to 39).map(_.toDouble) ++ (21 to 49).map(_.toDouble))
    val xs = ((10 to 38).map(_.toDouble) ++ (20 to 48).map(_.toDouble))
    val slope = ys.sum / ys.size / (xs.sum / xs.size)
    assert(math.abs(a1 - slope * 39.0) < 1e-9)
  }

  test("a data-free seriesLevels-only model falls back to the driver CV loop") {
    // scorer=None + seriesLevels=Some: the fused PREDICT path serves it
    // (level join), but the fused CV kernel cannot — the data-free CV fast
    // path must decline (scorer required) and fall back to the driver
    // loop instead of throwing inside the kernel
    val p = panel()
    val levels = p.df.select(col("unique_id")).distinct()
      .withColumn("__level", lit(42.0))
      .localCheckpoint()
    val levelOnly = new ForecastModel {
      val name = "const_level"
      override def dataFree = true
      def fit(train: org.apache.spark.sql.DataFrame, featureCols: Seq[String],
              labelCol: String, weightCol: Option[String]): TrainedModel =
        new TrainedModel {
          def predict(df: org.apache.spark.sql.DataFrame,
                      featureCols: Seq[String], out: String): org.apache.spark.sql.DataFrame =
            df.join(levels, Seq("unique_id"), "left")
              .withColumn(out, col("__level")).drop("__level")
          override def seriesLevels: Option[(org.apache.spark.sql.DataFrame, String)] =
            Some(levels -> "unique_id")
        }
    }
    val cv = MLForecast(Seq(levelOnly), Freq.IntFreq(1),
      FeatureSpec(lags = Seq(1))).fit(p).crossValidation(nWindows = 2, h = 2)
    val rows = cv.collect()
    assert(rows.length == 2 * 2 * 2)
    assert(rows.forall(_.getAs[Double]("const_level") == 42.0))
  }

  test("external estimator: CV and save/load round-trip work unmodified") {
    val fitted = conf.fit(panel())
    val cv = fitted.crossValidation(nWindows = 2, h = 2)
    assert(cv.count() == 2 * 2 * 2)
    assert(cv.columns.contains("ext_booster"))
    val path = s"/tmp/graft_ext_probe_${java.util.UUID.randomUUID}"
    MLForecastIO.save(fitted, path)
    val reloaded = MLForecastIO.load(spark, path)
    val a = fitted.predict(2).orderBy("unique_id", "ds").collect()
    val b = reloaded.predict(2).orderBy("unique_id", "ds").collect()
    assert(a.sameElements(b))
  }
}
