package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Frequency of a panel's time axis.
  *
  * The reference treats `freq` as either a pandas offset alias or an integer
  * (/root/reference/mlforecast/core.py:152 `Freq = Union[int, str]`); integer
  * timestamps are first-class (tests/test_m4.py:141,159). We model the same
  * two worlds plus calendar months, as expressions over the time column so
  * that advancing dates / building future grids stays fully distributed.
  */
sealed trait Freq {
  /** `time + steps * freq` as a Column expression. */
  def advance(time: Column, steps: Column): Column

  /** Number of whole periods between two time values (a - b) / freq. */
  def periodsBetween(a: Column, b: Column): Column
}

object Freq {
  /** Integer time axis with stride `n` (M4-style `freq=1`). */
  final case class IntFreq(n: Long = 1L) extends Freq {
    require(n > 0, s"freq stride must be positive, got $n")
    def advance(time: Column, steps: Column): Column = time + steps * lit(n)
    def periodsBetween(a: Column, b: Column): Column = (a - b) / lit(n)
  }

  /** Calendar days with stride `n` (pandas "D"/"2D"...). Works for DateType
    * and TimestampType columns.
    */
  final case class DayFreq(n: Int = 1) extends Freq {
    require(n > 0, s"freq stride must be positive, got $n")
    def advance(time: Column, steps: Column): Column =
      date_add(time, (steps * lit(n)).cast("int"))
    def periodsBetween(a: Column, b: Column): Column =
      datediff(a, b) / lit(n)
  }

  /** Calendar weeks: 7-day stride. `anchor` carries the pandas W-<DOW>
    * anchor as a `weekday()` index (Monday = 0, Sunday = 6): arithmetic is
    * unaffected — every 7-day grid advances the same way — but the anchor
    * defines which day-of-week the grid lives on
    * (`Validation.gridViolations` checks it).
    */
  final case class WeekFreq(n: Int = 1, anchor: Option[Int] = None) extends Freq {
    require(anchor.forall(a => a >= 0 && a <= 6), s"anchor must be 0..6, got $anchor")
    private val days = DayFreq(7 * n)
    def advance(time: Column, steps: Column): Column = days.advance(time, steps)
    def periodsBetween(a: Column, b: Column): Column = days.periodsBetween(a, b)
  }

  /** Business days (pandas "B"): the Monday–Friday grid. Grid dates are
    * weekdays; `advance` steps over weekends with pure column arithmetic
    * (`weekday()`: Monday = 0), so future grids and recursive predict skip
    * Saturday/Sunday exactly like the pandas offset.
    */
  final case class BusinessDayFreq(n: Int = 1) extends Freq {
    require(n > 0, s"freq stride must be positive, got $n")
    def advance(time: Column, steps: Column): Column = {
      // position within the week + signed step count, re-split into whole
      // weeks (floor handles negatives) and a 0..4 remainder
      val w = weekday(time).cast("long")
      val total = w + steps.cast("long") * lit(n.toLong)
      val weeks = floor(total.cast("double") / 5.0).cast("long")
      val rem = total - weeks * 5L
      date_add(time, (weeks * 7L + rem - w).cast("int"))
    }
    def periodsBetween(a: Column, b: Column): Column = {
      // business ordinal: Monday-of-week (epoch day −3 = Monday) in weeks ×5
      // + weekday. Exact for grid (weekday) dates.
      def bord(c: Column) = {
        val w = weekday(c).cast("long")
        floor((unix_date(c).cast("long") - w + lit(3L)).cast("double") / 7.0)
          .cast("long") * 5L + w
      }
      (bord(a) - bord(b)) / lit(n.toLong)
    }
  }

  /** Calendar month starts (pandas "MS"). */
  final case class MonthFreq(n: Int = 1) extends Freq {
    require(n > 0, s"freq stride must be positive, got $n")
    def advance(time: Column, steps: Column): Column =
      add_months(time, (steps * lit(n)).cast("int"))
    def periodsBetween(a: Column, b: Column): Column =
      (months_between(a, b) / lit(n)).cast("long")
  }

  /** Calendar month ENDS (pandas "M"/"ME"): every grid point is the last
    * day of its month, so a bare `add_months` (which CLAMPS — Jan 31 + 1
    * month = Feb 29, Feb 29 + 1 = Mar 29, off-grid) is re-snapped with
    * `last_day`. Quarters/years of the end family ("Q", "Y"/"A") are month
    * multiples of this. `months_between` treats two last-of-month dates as
    * whole months, so periodsBetween is exact on the grid.
    */
  final case class MonthEndFreq(n: Int = 1) extends Freq {
    require(n > 0, s"freq stride must be positive, got $n")
    def advance(time: Column, steps: Column): Column =
      last_day(add_months(time, (steps * lit(n)).cast("int")))
    def periodsBetween(a: Column, b: Column): Column =
      (months_between(a, b) / lit(n)).cast("long")
  }

  /** Sub-day fixed intervals expressed in seconds (pandas "H", "30T", "S"). */
  final case class SecondFreq(seconds: Long) extends Freq {
    require(seconds > 0, s"freq stride must be positive, got $seconds")
    def advance(time: Column, steps: Column): Column =
      timestamp_seconds(unix_timestamp(time) + steps.cast("long") * lit(seconds))
    def periodsBetween(a: Column, b: Column): Column =
      (unix_timestamp(a) - unix_timestamp(b)) / lit(seconds)
  }

  /** Sub-second fixed intervals in milliseconds (pandas "ms"/"L").
    * Arithmetic runs on epoch MICROS — exact long arithmetic at timestamp
    * precision, no unix_timestamp second truncation.
    */
  final case class MilliFreq(millis: Long = 1L) extends Freq {
    require(millis > 0, s"freq stride must be positive, got $millis")
    def advance(time: Column, steps: Column): Column =
      timestamp_micros(unix_micros(time) + steps.cast("long") * lit(millis * 1000L))
    def periodsBetween(a: Column, b: Column): Column =
      (unix_micros(a) - unix_micros(b)) / lit(millis * 1000L)
  }

  val Hour: Freq = SecondFreq(3600L)
  val Day: Freq = DayFreq(1)
  val Week: Freq = WeekFreq(1)
  val Month: Freq = MonthFreq(1)

  /** Loudly reject a (freq, time-column type) pairing whose Column
    * arithmetic silently changes type: `date_add`/`add_months` TRUNCATE a
    * TimestampType to DateType, so a timestamp-typed daily panel's
    * fillGaps grid would join back to nothing and silently wipe the data
    * (and requireValid would flag valid panels as gapped); the sub-day
    * freqs need a timestamp axis; IntFreq needs an integral one.
    */
  def requireAxisType(freq: Freq,
                      dsType: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    val ok = freq match {
      case _: IntFreq => Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(dsType)
      case _: SecondFreq | _: MilliFreq => dsType == TimestampType
      case _ => dsType == DateType // calendar freqs
    }
    require(ok,
      s"freq $freq cannot run on a ${dsType.catalogString} time axis: " +
        "calendar freqs (D/W/B/MS/M/...) need DATE (date_add/add_months " +
        "silently truncate timestamps), sub-day freqs need TIMESTAMP, " +
        "integer freqs need an integral column. Migration: cast the time " +
        "column before constructing the panel, e.g. " +
        """df.withColumn("ds", col("ds").cast("date")) for midnight """ +
        "timestamps under a daily freq, or use SecondFreq(86400) to keep " +
        "a TIMESTAMP axis with fixed 24h steps")
  }

  /** Parse a pandas-style offset alias; integer strings become IntFreq. */
  def parse(s: String): Freq = {
    val P = raw"(\d*)\s*([A-Za-z]+.*)".r
    s.trim match {
      case v if v.matches(raw"-?\d+") => IntFreq(v.toLong)
      case P(mult, alias) =>
        val n = if (mult.isEmpty) 1 else mult.toInt
        // pandas "ms" = milliseconds and is CASE-SENSITIVE: uppercasing
        // would silently collide it with "MS" (month start) — a ~2.6e9x
        // timescale error. Only the exact lowercase "ms" (or "L") is the
        // millisecond alias; mixed casings are rejected loudly because a
        // one-character case typo of "MS" must not silently change scale.
        if (alias == "ms") return MilliFreq(n.toLong)
        if (alias == "Ms" || alias == "mS")
          throw new IllegalArgumentException(
            s"ambiguous freq alias '$alias': use lowercase 'ms' (or 'L') " +
              "for milliseconds, uppercase 'MS' for month start")
        val dows = Map("MON" -> 0, "TUE" -> 1, "WED" -> 2, "THU" -> 3,
          "FRI" -> 4, "SAT" -> 5, "SUN" -> 6)
        alias.toUpperCase match {
          case "D"                  => DayFreq(n)
          case "B"                  => BusinessDayFreq(n)
          case "W"                  => WeekFreq(n)
          case a if a.startsWith("W-") && dows.contains(a.drop(2)) =>
            WeekFreq(n, Some(dows(a.drop(2))))
          // pandas start-of-period aliases -> month starts; END-of-period
          // aliases ("M"/"ME", "Q"/"QE", "Y"/"YE"/"A") -> month ENDS: a
          // month-end grid through plain add_months would clamp off-grid
          // (Jan 31 -> Feb 29 -> Mar 29) and flag valid panels as gapped
          case "MS"                 => MonthFreq(n)
          case "QS"                 => MonthFreq(3 * n)
          case "YS" | "AS"          => MonthFreq(12 * n)
          case "M" | "ME"           => MonthEndFreq(n)
          case "Q" | "QE"           => MonthEndFreq(3 * n)
          case "Y" | "YE" | "A"     => MonthEndFreq(12 * n)
          case "H"                  => SecondFreq(3600L * n)
          case "T" | "MIN"          => SecondFreq(60L * n)
          case "S"                  => SecondFreq(n.toLong)
          case "L"                  => MilliFreq(n.toLong) // pandas "L" = ms
          case other => throw new IllegalArgumentException(s"unsupported freq alias: $other")
        }
      case other => throw new IllegalArgumentException(s"unsupported freq: $other")
    }
  }
}
