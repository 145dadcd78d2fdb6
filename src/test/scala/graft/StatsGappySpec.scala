package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.{Freq, PanelFrame}
import graft.operators.Stats

/** Gappy-panel masking contracts for the diagnostics family. Each operator
  * documents ONE masking rule for null targets; these specs fail if anyone
  * reintroduces mixed row-count/null-skip semantics (the class of bug fixed
  * in cusum in round 6 and in decompose's window count in round 7):
  *
  *   - cusum / acf: nulls are dropped BEFORE positions/lags are assigned —
  *     the statistic over a gappy series equals the statistic over the
  *     compacted series (observations are what count, not rows).
  *   - decompose / strengths: nulls PROPAGATE positionally — any centered
  *     window containing a null yields a null trend/resid (statsmodels
  *     NaN behavior), never a silently rescaled mean.
  *   - an all-null series still surfaces one row with null stats, not
  *     a silent drop.
  */
class StatsGappySpec extends SparkSpec {
  import spark.implicits._

  private def panel(rows: Seq[(String, Long, Option[Double])]) =
    PanelFrame(rows.toDF("unique_id", "ds", "y"), freq = Freq.IntFreq(1))

  // a series with a clear level shift; values chosen integer-exact
  private val shifted: Seq[Double] =
    Seq(1.0, 2, 1, 2, 1, 2, 9, 10, 9, 10, 9, 10)

  test("cusum: gappy series equals the compacted series; all-null surfaces") {
    val gappy = panel(
      shifted.zipWithIndex.flatMap { case (v, i) =>
        // interleave null rows between every observation
        Seq(("s", (2 * i).toLong, Some(v)), ("s", (2 * i + 1).toLong, None))
      } ++ (0L until 4L).map(t => ("allnull", t, None)))
    val compact = panel(shifted.zipWithIndex.map { case (v, i) => ("s", i.toLong, Some(v)) })

    val g = Stats.cusumChangepoints(gappy).collect()
      .map(r => r.getString(0) -> r).toMap
    val c = Stats.cusumChangepoints(compact).collect().head

    val gs = g("s")
    assert(gs.getLong(1) == c.getLong(1), "n must count observations")
    assert(gs.getLong(2) == c.getLong(2), "cp_pos must be an observation position")
    assert(gs.getDouble(3) == c.getDouble(3), "statistic must ignore null rows")
    assert(gs.getBoolean(4) == c.getBoolean(4))

    val an = g("allnull")
    assert(an.getLong(1) == 0 && an.isNullAt(2) && an.isNullAt(3) &&
      !an.getBoolean(4), s"all-null series must yield null stats: $an")
  }

  test("acf: gappy series equals the compacted series (lag-k pairs are observations)") {
    val vals = Seq(3.0, 5, 4, 6, 5, 7, 6, 8, 7, 9)
    val gappy = panel(vals.zipWithIndex.flatMap { case (v, i) =>
      Seq(("s", (3 * i).toLong, Some(v)), ("s", (3 * i + 1).toLong, None))
    })
    val compact = panel(vals.zipWithIndex.map { case (v, i) => ("s", i.toLong, Some(v)) })
    val g = Stats.acf(gappy, Seq(1, 2)).collect().head
    val c = Stats.acf(compact, Seq(1, 2)).collect().head
    assert(g.getLong(1) == c.getLong(1))
    assert(g.getDouble(2) == c.getDouble(2), "acf1 must mask identically")
    assert(g.getDouble(3) == c.getDouble(3), "acf2 must mask identically")
  }

  test("decompose: a null inside the centered window nulls the trend (no rescaled mean)") {
    // 9 rows, period 3, null at position 4 (0-based): windows centered at
    // positions 3, 4, 5 all contain the null -> trend null there; edges
    // (0, 8) null; the rest are exact 3-row means
    val ys = Seq(Some(3.0), Some(6.0), Some(9.0), Some(6.0), None,
      Some(12.0), Some(9.0), Some(12.0), Some(15.0))
    val p = panel(ys.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) })
    val rows = Stats.decompose(p, period = 3).orderBy("ds").collect()
    def trend(r: Row): Option[Double] =
      if (r.isNullAt(3)) None else Some(r.getDouble(3))
    assert(trend(rows(0)).isEmpty && trend(rows(8)).isEmpty, "edges null")
    assert(trend(rows(1)).contains(6.0) && trend(rows(2)).contains(7.0))
    assert(trend(rows(3)).isEmpty && trend(rows(4)).isEmpty && trend(rows(5)).isEmpty,
      s"windows containing the null must have null trend, got ${rows.toSeq}")
    assert(trend(rows(6)).contains(11.0) && trend(rows(7)).contains(12.0))
    // resid exists exactly where trend does (and y is observed)
    rows.foreach { r =>
      val hasTrend = !r.isNullAt(3)
      assert(r.isNullAt(5) == !hasTrend,
        s"resid must mask with trend: $r")
    }
  }

  test("strengths: computed over masked residuals only; all-null series surfaces") {
    val ys = (0 until 18).map(i => Some((3.0 + (i % 3) * 3 + i)))
    val withGap = ys.updated(8, None)
    val p = panel(withGap.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) } ++
      (0L until 6L).map(t => ("allnull", t, Option.empty[Double])))
    val out = Stats.strengths(p, period = 3).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = out("s")
    // residual rows: full-window positions excluding those touching the gap
    assert(s.getLong(1) > 0 && !s.isNullAt(2) && !s.isNullAt(3),
      s"gappy series must still yield strengths from masked rows: $s")
    val an = out("allnull")
    assert(an.getLong(1) == 0 && an.isNullAt(2) && an.isNullAt(3),
      s"all-null series must yield null strengths: $an")
  }
}
