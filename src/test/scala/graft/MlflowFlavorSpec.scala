package graft

import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.forecast.{MLForecast, MlflowFlavor, Models}
import graft.operators.FeatureSpec

/** MLflow-flavor packaging (reference mlforecast/flavor.py:64-349): the
  * saved directory follows MLflow's documented model layout and the
  * config-frame serving wrapper replays the reference pyfunc wrapper's
  * dispatch + validation semantics.
  */
class MlflowFlavorSpec extends SparkSpec {
  import spark.implicits._

  private def panel(shift: Double = 0.0) = PanelFrame(
    (for (id <- Seq("a", "b"); t <- 0L until 40L)
      yield (id, t, ((t * 3 + (if (id == "a") 1 else 5)) % 17).toDouble + shift))
      .toDF("unique_id", "ds", "y"),
    freq = Freq.IntFreq(1))

  private def fitted = MLForecast(
    Seq(Models.naive, Models.seasonalNaive(4)),
    Freq.IntFreq(1), FeatureSpec(lags = Seq(1, 4))).fit(panel())

  test("saveModel writes the MLflow layout; loadModel round-trips predictions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-flavor").toString
    val f = fitted
    MlflowFlavor.saveModel(f, dir,
      inputExample = Some(Seq((7L, Seq(80))).toDF("h", "level")))
    val mlmodel = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/MLmodel")), "UTF-8")
    assert(mlmodel.contains("graft_mlforecast:"), mlmodel)
    assert(mlmodel.contains("model_data: mlforecast-model"))
    assert(mlmodel.contains("signature:"))
    // MLflow's documented ColSpec shape: {"type": ..., "name": ...}; arrays
    // as {"type": "array", "items": {"type": ...}} with required: false
    assert(mlmodel.contains(""""type": "double", "name": "naive""""))
    assert(mlmodel.contains(
      """{"type": "array", "items": {"type": "integer"}, "name": "level", "required": false}"""))
    assert(mlmodel.contains(
      """{"type": "array", "items": {"type": "string"}, "name": "ids", "required": false}"""))
    // names are escaped before embedding: JSON specials in the model /
    // column name can't malform the JSON, YAML quotes can't break the scalar
    assert(MlflowFlavor.jsonEscape("""he said "hi"\n""") == """he said \"hi\"\\n""")
    assert(MlflowFlavor.yamlSingleQuote("it's") == "'it''s'")
    assert(MlflowFlavor.mlflowType(org.apache.spark.sql.types.TimestampType) == "datetime")
    assert(MlflowFlavor.mlflowType(org.apache.spark.sql.types.IntegerType) == "integer")
    assert(mlmodel.contains("saved_input_example_info:"))
    assert(new java.io.File(s"$dir/input_example.json").exists())
    assert(new java.io.File(s"$dir/mlforecast-model/params.json").exists())

    val back = MlflowFlavor.loadModel(spark, dir)
    val a = f.predict(5).orderBy("unique_id", "ds").collect().toSeq
    val b = back.predict(5).orderBy("unique_id", "ds").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString), "load/predict round-trip drifted")
  }

  test("config-frame wrapper: dispatch and validation match the reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-flavor2").toString
    MlflowFlavor.saveModel(fitted, dir)
    val w = MlflowFlavor.loadPyfunc(spark, dir)

    // plain h predict
    val preds = w.predict(Seq(Tuple1(3L)).toDF("h"))
    assert(preds.count() == 2 * 3 && preds.columns.contains("naive"))

    // ids subset
    val sub = w.predict(Seq((3L, Seq("a"))).toDF("h", "ids"))
    assert(sub.select("unique_id").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))

    // level adds lo/hi interval columns (and ids restricts output)
    val iv = w.predict(Seq((3L, Seq(80), Seq("b"))).toDF("h", "level", "ids"))
    assert(iv.columns.contains("naive-lo-80") && iv.columns.contains("naive-hi-80"))
    assert(iv.select("unique_id").distinct().collect().map(_.getString(0)).toSeq == Seq("b"))

    // transfer: new_df routes through warmup and predicts the NEW panel
    val shifted = panel(shift = 100.0)
    val tr = w.predict(Seq(Tuple1(2L)).toDF("h"), newDf = Some(shifted))
    val direct = w.fitted.conf
      .warmup(shifted, w.fitted.trained, w.fitted.directTrained).predict(2)
    assert(tr.orderBy("unique_id", "ds").collect().toSeq.map(_.toString) ==
      direct.orderBy("unique_id", "ds").collect().toSeq.map(_.toString))

    // validations: multi-row config, missing h, level + new_df conflict
    val multi = intercept[IllegalArgumentException](
      w.predict(Seq(Tuple1(1L), Tuple1(2L)).toDF("h")))
    assert(multi.getMessage.contains("Only 1 row should be supplied"))
    val noH = intercept[IllegalArgumentException](
      w.predict(Seq(Tuple1(Seq(80))).toDF("level")))
    assert(noH.getMessage.contains("`h` parameter is required"))
    val both = intercept[IllegalArgumentException](
      w.predict(Seq((2L, Seq(80))).toDF("h", "level"), newDf = Some(shifted)))
    assert(both.getMessage.contains("not supported in transfer learning"))
  }
}
