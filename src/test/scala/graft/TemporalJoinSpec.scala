package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lDF(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("k", "t", "lv")
  private def rDF(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("k", "rt", "rv")

  /** Reference model. Backward: greatest rt <= t (or < t when !exact);
    * forward: smallest rt >= t (or > t); nearest: smaller |gap|, backward
    * wins ties. Among equal matched rt, greatest rv; tolerance nulls
    * matches with |gap| > tol.
    */
  private def naiveAsof(
      left: Seq[(Long, Long, Double)], right: Seq[(Long, Long, Double)],
      tol: Option[Long], exact: Boolean,
      direction: String = "backward"): Seq[(Long, Long, Double, Option[Long], Option[Double])] =
    left.map { case (k, t, lv) =>
      val candB = right.filter { case (rk, rt, _) => rk == k && (if (exact) rt <= t else rt < t) }
      val candF = right.filter { case (rk, rt, _) => rk == k && (if (exact) rt >= t else rt > t) }
      def pickB = if (candB.isEmpty) None
        else Some(candB.map { case (_, rt, rv) => (rt, rv) }.max)
      def pickF = if (candF.isEmpty) None else {
        val rt = candF.map(_._2).min
        Some((rt, candF.filter(_._2 == rt).map(_._3).max))
      }
      val m = direction match {
        case "backward" => pickB
        case "forward"  => pickF
        case "nearest"  => (pickB, pickF) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) => if (t - b._1 <= f._1 - t) Some(b) else Some(f)
        }
      }
      val best = m.filter(mm => tol.forall(math.abs(t - mm._1) <= _))
      (k, t, lv, best.map(_._1), best.map(_._2))
    }

  private def runAsof(left: Seq[(Long, Long, Double)], right: Seq[(Long, Long, Double)],
                      tol: Option[Long], exact: Boolean, direction: String = "backward") =
    TemporalJoin.asofJoin(lDF(left), rDF(right), Seq("k"), "t", "rt",
        payload = Seq("rt" -> "mt", "rv" -> "mv"),
        tolerance = tol, allowExactMatches = exact, direction = direction)
      .select($"k", $"t", $"lv", $"mt", $"mv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq.sorted

  test("asof join: backward match, exact-match toggle, tolerance, ties") {
    val right = Seq((1L, 10L, 1.0), (1L, 10L, 3.0), (1L, 20L, 2.0), (2L, 5L, 9.0))
    val left  = Seq((1L, 10L, 0.1), (1L, 15L, 0.2), (1L, 25L, 0.3),
                    (2L, 4L, 0.4), (3L, 50L, 0.5))

    // exact matches on: t=10 sees the tied pair at rt=10 (max rv wins)
    assert(runAsof(left, right, None, exact = true) ==
      naiveAsof(left, right, None, exact = true).sorted)
    // strict: t=10 has nothing before it
    val strict = runAsof(left, right, None, exact = false)
    assert(strict == naiveAsof(left, right, None, exact = false).sorted)
    assert(strict.find(r => r._1 == 1L && r._2 == 10L).get._4.isEmpty)
    // tolerance: inclusive at the bound, null beyond it
    val tolIn  = runAsof(left, right, Some(5L), exact = true)
    assert(tolIn.find(r => r._1 == 1L && r._2 == 25L).get._4.contains(20L))
    val tolOut = runAsof(left, right, Some(4L), exact = true)
    assert(tolOut.find(r => r._1 == 1L && r._2 == 25L).get._4.isEmpty)
    // key 3 has no right rows at all: left-outer nulls
    assert(runAsof(left, right, None, exact = true)
      .find(_._1 == 3L).get._4.isEmpty)
  }

  test("asof join == naive model on randomized inputs, all three directions") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 12) {
      val nl = 30 + rnd.nextInt(40)
      val nr = 20 + rnd.nextInt(40)
      def gen(n: Int) = Seq.fill(n)(
        (rnd.nextInt(4).toLong, rnd.nextInt(25).toLong, (rnd.nextInt(9) + 1) / 2.0))
      val left = gen(nl); val right = gen(nr)
      val tol = if (round % 3 == 0) Some(rnd.nextInt(8).toLong) else None
      val exact = round % 2 == 0
      val direction = Seq("backward", "forward", "nearest")(round % 3)
      assert(runAsof(left, right, tol, exact, direction) ==
        naiveAsof(left, right, tol, exact, direction).sorted,
        s"round=$round tol=$tol exact=$exact direction=$direction")
    }
  }

  test("asof join: forward and nearest direction semantics") {
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0))
    val left  = Seq((1L, 4L, 0.1), (1L, 14L, 0.2), (1L, 15L, 0.3),
                    (1L, 16L, 0.4), (1L, 20L, 0.5), (1L, 25L, 0.6))
    val fwd = runAsof(left, right, None, exact = true, "forward")
    assert(fwd.find(_._2 == 4L).get._4.contains(10L))
    assert(fwd.find(_._2 == 14L).get._4.contains(20L))
    assert(fwd.find(_._2 == 20L).get._4.contains(20L))   // inclusive
    assert(fwd.find(_._2 == 25L).get._4.isEmpty)         // nothing ahead
    val fwdStrict = runAsof(left, right, None, exact = false, "forward")
    assert(fwdStrict.find(_._2 == 20L).get._4.isEmpty)   // 20 -> only 20, strict
    val near = runAsof(left, right, None, exact = true, "nearest")
    assert(near.find(_._2 == 14L).get._4.contains(10L))  // gap 4 < 6
    assert(near.find(_._2 == 15L).get._4.contains(10L))  // tie -> backward
    assert(near.find(_._2 == 16L).get._4.contains(20L))  // gap 4 < 6
    assert(near.find(_._2 == 25L).get._4.contains(20L))
    val nearStrict = runAsof(left, right, None, exact = false, "nearest")
    assert(nearStrict.find(_._2 == 20L).get._4.contains(10L)) // 20 excluded, 10 nearest
    val nearTol = runAsof(left, right, Some(4L), exact = true, "nearest")
    assert(nearTol.find(_._2 == 4L).get._4.isEmpty)      // gap 6 > tol 4

    // the two nearest arms are two sort orders over the SAME exchanges
    // (tie-dedup agg + window partitioning) — no third shuffle, no join
    def exchanges(direction: String): Int =
      TemporalJoin.asofJoin(lDF(left), rDF(right), Seq("k"), "t", "rt",
          payload = Seq("rt" -> "mt", "rv" -> "mv"), direction = direction)
        .queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    assert(exchanges("nearest") == exchanges("backward"))
  }

  test("range join: binned == naive cross filter, spans over many bins") {
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(120)(
      (rnd.nextInt(3).toLong, rnd.nextInt(200).toLong - 50, rnd.nextInt(100).toDouble))
    val windows = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(180).toLong - 60
      (rnd.nextInt(3).toLong, i.toLong, s, s + rnd.nextInt(40))
    }
    val out = TemporalJoin.rangeJoinBinned(
        points.toDF("k", "t", "pv"), windows.toDF("k", "wid", "ws", "we"),
        Seq("k"), "t", "ws", "we", binWidth = 8L)
      .select($"k", $"wid", $"t", $"pv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val expected = (for {
      (pk, t, pv) <- points
      (wk, wid, ws, we) <- windows
      if pk == wk && t >= ws && t <= we
    } yield (pk, wid, t, pv)).sorted
    assert(out == expected)

    // negative times bin correctly (floor division, not truncate-to-zero)
    val neg = TemporalJoin.rangeJoinBinned(
        Seq((0L, -9L, 1.0)).toDF("k", "t", "pv"),
        Seq((0L, 0L, -10L, -8L)).toDF("k", "wid", "ws", "we"),
        Seq("k"), "t", "ws", "we", binWidth = 8L).count()
    assert(neg == 1L)
  }

  test("range join: loud guards and a shuffle-join plan") {
    def fails(points: Seq[(Long, Long, Double)], windows: Seq[(Long, Long, Long, Long)],
              frag: String): Unit = {
      val e = intercept[Exception] {
        TemporalJoin.rangeJoinBinned(
          points.toDF("k", "t", "pv"), windows.toDF("k", "wid", "ws", "we"),
          Seq("k"), "t", "ws", "we", binWidth = 4L, maxBinsPerWindow = 8).count()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains(frag))),
        s"no '$frag' in ${chain(e).map(_.getMessage)}")
    }
    val pts = Seq((0L, 1L, 1.0))
    fails(pts, Seq((0L, 0L, 10L, 5L)), "inverted window")
    fails(pts, Seq((0L, 0L, 0L, 100L)), "spans more than 8 bins")

    val plan = TemporalJoin.rangeJoinBinned(
        Seq((0L, 1L, 1.0)).toDF("k", "t", "pv"),
        Seq((0L, 0L, 0L, 4L)).toDF("k", "wid", "ws", "we"),
        Seq("k"), "t", "ws", "we", binWidth = 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a nested-loop plan:\n$plan")

    // payload-name collision and overlapping non-key columns are rejected
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(lDF(Seq((0L, 1L, 1.0))), rDF(Seq((0L, 1L, 1.0))),
        Seq("k"), "t", "rt", payload = Seq("rv" -> "lv"))
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.rangeJoinBinned(
        Seq((0L, 1L, 1.0)).toDF("k", "t", "pv"),
        Seq((0L, 0L, 0L, 4L, 2.0)).toDF("k", "wid", "ws", "we", "pv"),
        Seq("k"), "t", "ws", "we", binWidth = 4L)
    }
  }

  test("null timestamps: right rows never match, left rows emit unmatched") {
    // right with a null time would otherwise sort FIRST and become the
    // spurious match of every unmatched backward left
    val l = Seq((0L, java.lang.Long.valueOf(5L), 1.0),
      (0L, null.asInstanceOf[java.lang.Long], 2.0)).toDF("k", "t", "lv")
    val r = Seq((0L, null.asInstanceOf[java.lang.Long], 9.0),
      (0L, java.lang.Long.valueOf(100L), 8.0)).toDF("k", "rt", "rv")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val out = TemporalJoin.asofJoin(l, r, Seq("k"), "t", "rt",
        payload = Seq("rv" -> "mrv"), direction = dir)
        .collect().map(x => Option(x.get(1)).map(_.toString) -> Option(x.get(3)))
        .toMap
      // the null-time left is always emitted, never matched
      assert(out(None).isEmpty, s"dir=$dir: null-time left matched ${out(None)}")
      // the t=5 left never matches the null-time right
      dir match {
        case "backward" => assert(out(Some("5")).isEmpty)
        case _          => assert(out(Some("5")).contains(8.0))
      }
    }
  }

  test("duplicate payload output names are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(lDF(Seq((0L, 1L, 1.0))), rDF(Seq((0L, 1L, 1.0))),
        Seq("k"), "t", "rt", payload = Seq("rt" -> "v", "rv" -> "v"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("range join bins exactly beyond 2^53 (nanosecond-epoch magnitudes)") {
    val base = 1_700_000_000_000_000_000L // ns epoch, > 2^53
    val points = Seq((0L, base + 7L, 1.0)).toDF("k", "t", "pv")
    val windows = Seq((0L, 1L, base + 5L, base + 9L))
      .toDF("k", "wid", "ws", "we")
    val out = TemporalJoin.rangeJoinBinned(points, windows, Seq("k"),
      "t", "ws", "we", binWidth = 1000L).collect()
    // double division of base/1000 rounds; integral div must keep the
    // point and its enclosing window in the same bin
    assert(out.length == 1, s"lost the match at ns-epoch magnitude: ${out.toSeq}")
  }
}
