package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Freq, PanelFrame}

/** Panels derived from the driver's TPC-H-ish testdata (FIXTURES.md §F6).
  * These are the inputs every oracle-checked query shares; the SQL CTE
  * equivalents live next to the queries in SparkEntry.
  */
object Panels {

  /** supplier × ship-date → total quantity; integer-valued y. */
  def lineitemDaily(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_suppkey").as("unique_id"),
        to_date(col("l_shipdate")).as("ds"))
      .agg(sum("l_quantity").as("y"))

  /** Gap-free variant: per-series observation ordinal as the time axis
    * (every oracle window query runs on `ord`).
    */
  def lineitemDense(spark: SparkSession, dir: String): DataFrame =
    lineitemDaily(spark, dir).withColumn("ord",
      (row_number().over(Window.partitionBy("unique_id").orderBy("ds")) - 1).cast("long"))

  def densePanel(spark: SparkSession, dir: String): PanelFrame =
    PanelFrame(lineitemDense(spark, dir).select(col("unique_id"), col("ord").as("ds"), col("y")),
      freq = Freq.IntFreq(1))

  /** Shared SQL CTE prefix for DuckDB oracles over the same panel. */
  val panelSql: String =
    """WITH panel AS (
      |  SELECT l_suppkey AS unique_id, CAST(l_shipdate AS DATE) AS ds, SUM(l_quantity) AS y
      |  FROM lineitem GROUP BY 1, 2
      |), dense AS (
      |  SELECT unique_id, ds,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) - 1 AS BIGINT) AS ord,
      |         y
      |  FROM panel
      |)""".stripMargin

  /** Row-level panel: one row per lineitem row — ties per (supplier, date),
    * time-varying partition column (returnflag). Exercises row-level pooled
    * semantics.
    */
  def lineitemRows(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey").as("unique_id"),
        to_date(col("l_shipdate")).as("ds"),
        col("l_quantity").as("y"),
        col("l_returnflag").as("rflag"),
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("lineno"))

  val rowsSql: String =
    """WITH rows_panel AS (
      |  SELECT l_suppkey AS unique_id, CAST(l_shipdate AS DATE) AS ds,
      |         l_quantity AS y, l_returnflag AS rflag,
      |         l_orderkey AS okey, l_linenumber AS lineno
      |  FROM lineitem
      |)""".stripMargin

  /** Supplier statics (nation as a group column for pooled groupby). */
  def supplierStatics(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("unique_id"),
        col("s_nationkey").cast("long").as("nation"))

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read with nanosAsLong and convert via integral division
    * (`div`, not `/`, which would go through double and lose precision at
    * nanosecond magnitudes).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Scope the legacy flag to this read: set, infer the schema, restore.
    // (The nanos→long conversion is baked into the relation at read time, so
    // later parquet reads in the session are unaffected.)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val df =
      try spark.read.parquet(s"$dir/events.parquet")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Deterministic synthetic daily panel — the reference's
    * `generate_daily_series` (/root/reference/mlforecast/utils.py:128-180)
    * re-expressed distributed: `spark.range(nSeries)` → per-series length
    * from a seeded hash → sequence+explode for the time axis → target =
    * weekly seasonal level + trend + hash-derived noise. No driver loops;
    * fully reproducible for a given seed.
    */
  def syntheticDailySeries(spark: SparkSession, nSeries: Int,
                           minLength: Int = 50, maxLength: Int = 500,
                           seed: Long = 0L,
                           startDate: String = "2020-01-01"): DataFrame = {
    val span = math.max(1, maxLength - minLength)
    spark.range(nSeries.toLong)
      .select(col("id").as("unique_id"),
        (lit(minLength) + pmod(xxhash64(col("id"), lit(seed)), lit(span))).as("__len"))
      .select(col("unique_id"),
        explode(sequence(lit(0), col("__len") - 1)).as("__t"))
      .select(col("unique_id"),
        date_add(to_date(lit(startDate)), col("__t").cast("int")).as("ds"),
        // weekly seasonal level (scaled per series) + mild trend +
        // deterministic uniform noise in [0, 1)
        ((pmod(col("unique_id"), lit(10)) + 1) *
          (pmod(dayofweek(date_add(to_date(lit(startDate)), col("__t").cast("int"))).cast("long"), lit(7)) + 1) +
          col("__t") * 0.01 +
          pmod(xxhash64(col("unique_id"), col("__t"), lit(seed)), lit(1000)) / 1000.0
        ).as("y"))
  }

  /** Price catalog for a daily panel — reference utils.py:226-246
    * (generate_prices_for_series): one price row per (series, day) from
    * each series' own start through the common end + `horizon`, covering
    * both training rows and the prediction range (the dynamic-exog X_df
    * use case). Requires equal series ends, like the reference.
    * Deterministic uniform prices in [0, 1) from the xxhash64 chain
    * instead of NumPy's RandomState stream — distributed and
    * repartition-stable.
    */
  def syntheticPricesForSeries(series: DataFrame, horizon: Int = 7,
                               seed: Long = 0L): DataFrame = {
    // pinned: the equal-ends guard action below AND the returned plan both
    // read spans — without the pin the input series (often itself a
    // generated plan) is scanned twice
    val spans = series.groupBy(col("unique_id"))
      .agg(min(col("ds")).as("__start"), max(col("ds")).as("__end"))
      .localCheckpoint()
    val distinctEnds = spans.agg(countDistinct(col("__end"))).first().getLong(0)
    require(distinctEnds <= 1, "series must have equal ends.")
    spans.select(col("unique_id"),
        col("__start"),
        explode(sequence(lit(0),
          datediff(col("__end"), col("__start")) + lit(horizon))).as("__t"))
      .select(
        date_add(col("__start"), col("__t").cast("int")).as("ds"),
        col("unique_id"),
        (pmod(xxhash64(col("unique_id"), col("__t"), lit(seed)), lit(1000000L))
          .cast("double") / 1000000.0).as("price"))
  }

  /** events → user × day activity panel (count + 2dp-rounded value sum —
    * exact: true sums are multiples of 0.01, so rounding erases fp
    * accumulation-order noise).
    */
  def eventsDaily(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id").as("unique_id"), to_date(col("ts")).as("ds"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("y"))
}
