package graft.forecast

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PanelFrame

/** MLflow-flavor packaging for a fitted pipeline — the reference's
  * `mlforecast.flavor` (flavor.py:64-349) re-expressed Spark-first with no
  * MLflow dependency: the saved directory follows MLflow's PUBLIC documented
  * model layout (an `MLmodel` YAML declaring the flavor, a model-data
  * subpath, a signature, an optional input example), so an MLflow
  * deployment can register it as a custom flavor, while save/load run
  * entirely on the Hadoop FS API (s3://... works like file://...) and the
  * model data is the existing [[MLForecastIO]] sink (panel + state
  * parquet + config blob — never a driver-collected pickle).
  *
  * The serving surface mirrors the reference's pyfunc wrapper
  * (flavor.py:309-349): a ONE-ROW config frame drives predict —
  * `h` (required), `level` (interval levels), `ids` (series subset) — with
  * the same validation errors; transfer to a new panel (`new_df`) is the
  * [[MLForecast.warmup]] path and is mutually exclusive with `level`,
  * exactly like the reference.
  */
object MlflowFlavor {

  val FlavorName = "graft_mlforecast"
  val ModelDataSubpath = "mlforecast-model"

  private def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readText(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** JSON string-literal escaping for names embedded in the signature. */
  private[graft] def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** YAML single-quoted scalar: internal single quotes are doubled. */
  private[graft] def yamlSingleQuote(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** Spark SQL type → MLflow signature scalar type name (MLflow's
    * documented DataType enum: boolean/integer/long/float/double/string/
    * binary/datetime).
    */
  private[graft] def mlflowType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType | IntegerType => "integer"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType | _: DecimalType => "double"
      case StringType => "string"
      case BinaryType => "binary"
      case DateType | TimestampType | TimestampNTZType => "datetime"
      case other => throw new IllegalArgumentException(
        s"column type ${other.simpleString} has no MLflow signature type")
    }
  }

  private def colSpec(name: String, tpe: String, required: Boolean = true): String = {
    val req = if (required) "" else """, "required": false"""
    s"""{"type": "$tpe", "name": "${jsonEscape(name)}"$req}"""
  }

  private def arraySpec(name: String, itemType: String): String =
    s"""{"type": "array", "items": {"type": "$itemType"}, """ +
      s""""name": "${jsonEscape(name)}", "required": false}"""

  /** The model signature: the config-frame input schema and the forecast
    * output schema (id, ds, one double column per model), as the
    * JSON-schema strings MLflow embeds in MLmodel — MLflow's documented
    * format (scalar ColSpec `{"type": ..., "name": ..., "required": ...}`,
    * arrays as `{"type": "array", "items": {...}}`, supported since
    * MLflow 2.10). Column and model names are JSON-escaped.
    */
  private[forecast] def signature(fitted: FittedMLForecast): (String, String) = {
    val idType = mlflowType(fitted.rawPanel.df.schema(fitted.rawPanel.idCol).dataType)
    val dsType = mlflowType(fitted.rawPanel.df.schema(fitted.rawPanel.timeCol).dataType)
    val models = (fitted.trained.map(_._1) ++ fitted.directTrained.map(_._1)).distinct
    val inputs = Seq(
      colSpec("h", "long"),
      arraySpec("level", "integer"),
      arraySpec("ids", "string")).mkString("[", ", ", "]")
    val outputs = (Seq(
      colSpec(fitted.rawPanel.idCol, idType),
      colSpec(fitted.rawPanel.timeCol, dsType)) ++
      models.map(m => colSpec(m, "double")))
      .mkString("[", ", ", "]")
    (inputs, outputs)
  }

  /** Save the fitted pipeline as an MLflow-layout model directory. */
  def saveModel(fitted: FittedMLForecast, path: String,
                inputExample: Option[DataFrame] = None): Unit = {
    val spark = fitted.rawPanel.df.sparkSession
    MLForecastIO.save(fitted, s"$path/$ModelDataSubpath")
    val (inputs, outputs) = signature(fitted)
    val exampleFile = inputExample.map { ex =>
      val rows = ex.toJSON.collect().mkString("[", ",\n ", "]")
      writeText(spark, s"$path/input_example.json", rows)
      "input_example.json"
    }
    val mlmodel = new StringBuilder
    mlmodel ++= "flavors:\n"
    mlmodel ++= s"  $FlavorName:\n"
    mlmodel ++= s"    model_data: $ModelDataSubpath\n"
    mlmodel ++= s"    serialization_format: graft-io\n"
    mlmodel ++= s"    graft_version: 0.7.0\n"
    mlmodel ++= "  graft_function:\n"
    mlmodel ++= s"    loader: graft.forecast.MlflowFlavor.loadPyfunc\n"
    mlmodel ++= s"    model_path: $ModelDataSubpath\n"
    exampleFile.foreach { f =>
      mlmodel ++= "saved_input_example_info:\n"
      mlmodel ++= s"  artifact_path: $f\n"
      mlmodel ++= "  type: dataframe\n"
    }
    mlmodel ++= "signature:\n"
    mlmodel ++= s"  inputs: ${yamlSingleQuote(inputs)}\n"
    mlmodel ++= s"  outputs: ${yamlSingleQuote(outputs)}\n"
    writeText(spark, s"$path/MLmodel", mlmodel.result())
  }

  /** Load the fitted pipeline back from an MLflow-layout directory (the
    * flavor's declared model_data subpath; fails loudly when the MLmodel
    * is missing or declares a different flavor).
    */
  def loadModel(spark: SparkSession, path: String): FittedMLForecast = {
    val mlmodel = readText(spark, s"$path/MLmodel")
    require(mlmodel.contains(s"$FlavorName:"),
      s"$path/MLmodel does not declare the $FlavorName flavor")
    val dataPath = mlmodel.linesIterator
      .collectFirst { case l if l.trim.startsWith("model_data:") =>
        l.trim.stripPrefix("model_data:").trim }
      .getOrElse(ModelDataSubpath)
    MLForecastIO.load(spark, s"$path/$dataPath")
  }

  /** Load the serving wrapper (the `_load_pyfunc` analogue). */
  def loadPyfunc(spark: SparkSession, path: String): ConfigPredictor =
    new ConfigPredictor(loadModel(spark, path))

  /** The pyfunc wrapper analogue: predict driven by a ONE-ROW config frame
    * (flavor.py `_MLForecastModelWrapper.predict`). `newDf` is the
    * transfer-learning panel (the reference's `new_df`), `xDf` the future
    * exog frame.
    */
  final class ConfigPredictor(val fitted: FittedMLForecast) {
    def predict(configDf: DataFrame, xDf: Option[DataFrame] = None,
                newDf: Option[PanelFrame] = None): DataFrame = {
      val rows = configDf.collect()
      require(rows.length == 1,
        s"The provided prediction DataFrame contains ${rows.length} rows. " +
          "Only 1 row should be supplied.")
      val row = rows(0)
      val cols = configDf.columns.toSet
      def opt[T](name: String): Option[T] =
        if (cols.contains(name) && !row.isNullAt(row.fieldIndex(name)))
          Some(row.getAs[T](name))
        else None
      val h = opt[Number]("h").map(_.intValue).getOrElse(
        throw new IllegalArgumentException(
          "The `h` parameter is required to make forecasts."))
      val level = opt[scala.collection.Seq[Any]]("level")
        .map(_.map(_.asInstanceOf[Number].intValue).toSeq).filter(_.nonEmpty)
      val ids = opt[scala.collection.Seq[Any]]("ids").map(_.toSeq).filter(_.nonEmpty)
      (newDf, level) match {
        case (Some(_), Some(_)) =>
          throw new IllegalArgumentException(
            "Prediction intervals are not supported in transfer learning. " +
              "Please provide either `level` or `new_df`, but not both.")
        case (Some(panel), None) =>
          fitted.conf.warmup(panel, fitted.trained, fitted.directTrained)
            .predict(h, xDf, ids)
        case (None, Some(levels)) =>
          val out = fitted.predictWithIntervals(h, levels, xDf = xDf)
          ids match {
            case Some(subset) =>
              // interval calibration is per (id, step); restricting the
              // OUTPUT matches the reference's ids-with-level semantics
              val present = fitted.rawPanel.df
                .select(col(fitted.rawPanel.idCol))
                .filter(col(fitted.rawPanel.idCol).isin(subset: _*))
                .distinct().count()
              require(present == subset.distinct.length,
                s"${subset.distinct.length - present} of the requested ids " +
                  "are not in the panel")
              out.filter(col(fitted.rawPanel.idCol).isin(subset: _*))
            case None => out
          }
        case (None, None) =>
          fitted.predict(h, xDf, ids)
      }
    }
  }
}
