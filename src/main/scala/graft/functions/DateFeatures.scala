package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar features with pandas conventions (reference
  * /root/reference/mlforecast/utils.py:44-79 and core.py:807-840):
  * `dayofweek` is 0=Monday (Spark's `dayofweek` is 1=Sunday), `week` is ISO
  * week, month/quarter starts and ends are booleans cast to int.
  */
object DateFeatures {

  def feature(name: String, ds: Column): Column = name match {
    case "year"         => year(ds)
    case "month"        => month(ds)
    case "day"          => dayofmonth(ds)
    case "hour"         => hour(ds)
    case "minute"       => minute(ds)
    case "second"       => second(ds)
    case "dayofyear"    => dayofyear(ds)
    case "dayofweek"    => (dayofweek(ds) + 5) % 7 // pandas: 0=Monday
    case "week"         => weekofyear(ds)          // ISO week, matches pandas
    case "quarter"      => quarter(ds)
    case "daysinmonth"  => dayofmonth(last_day(ds))
    case "is_month_start"   => (dayofmonth(ds) === 1).cast("int")
    case "is_month_end"     => (ds.cast("date") === last_day(ds)).cast("int")
    case "is_quarter_start" => (dayofmonth(ds) === 1 && (month(ds) - 1) % 3 === 0).cast("int")
    case "is_quarter_end"   => (ds.cast("date") === last_day(ds) && month(ds) % 3 === 0).cast("int")
    case "is_year_start"    => (dayofyear(ds) === 1).cast("int")
    case "is_year_end"      => (month(ds) === 12 && dayofmonth(ds) === 31).cast("int")
    case other => throw new IllegalArgumentException(s"unknown date feature: $other")
  }

  def add(df: DataFrame, ds: Column, names: Seq[String]): DataFrame =
    if (names.isEmpty) df
    else df.withColumns(names.map(n => n -> feature(n, ds)).toMap)

  /** Fixed one-hot vocabularies (reference utils.py:26-41
    * `_DUMMY_FEATURE_VALUES`): no fit step needed, the vocab is the calendar.
    */
  val dummyVocab: Map[String, Range] = Map(
    "dayofweek" -> (0 until 7),
    "month"     -> (1 to 12),
    "quarter"   -> (1 to 4),
    "week"      -> (1 to 53),
    "hour"      -> (0 until 24),
    "day"       -> (1 to 31),
    "dayofyear" -> (1 to 366),
  )

  /** One-hot expansion with the fixed vocabulary (utils.py:82-123). */
  def addDummies(df: DataFrame, ds: Column, names: Seq[String]): DataFrame = {
    val cols = for {
      n <- names
      vocab = dummyVocab.getOrElse(n,
        throw new IllegalArgumentException(s"no dummy vocab for: $n"))
      v <- vocab
    } yield s"${n}_$v" -> when(feature(n, ds) === v, 1).otherwise(0)
    if (cols.isEmpty) df else df.withColumns(cols.toMap)
  }
}
