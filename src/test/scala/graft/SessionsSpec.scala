package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessions

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference model: per key, sort times, break where gap > threshold. */
  private def naiveSessions(rows: Seq[(Long, Long)], gap: Long): Map[(Long, Long), Long] =
    rows.groupBy(_._1).flatMap { case (k, ks) =>
      val ts = ks.map(_._2).sorted
      var sid = 0L; var prev = Long.MinValue
      ts.map { t =>
        if (prev == Long.MinValue || t - prev > gap) sid += 1
        prev = t
        (k, t) -> sid
      }
    }

  test("sessionize: gaps, inclusive bound, ties, multiple keys") {
    val rows = Seq((1L, 0L), (1L, 10L), (1L, 10L), (1L, 21L), (1L, 31L),
                   (2L, 5L), (2L, 100L))
    val out = Sessions.sessionize(rows.toDF("k", "t"), Seq("k"), "t", gap = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    val exp = naiveSessions(rows, 10L)
    out.foreach { case (kt, sid) => assert(sid == exp(kt), s"$kt") }
    // gap == threshold stays in-session (0 -> 10), strict break at 11 (10 -> 21)
    assert(exp((1L, 10L)) == exp((1L, 0L)))
    assert(exp((1L, 21L)) == exp((1L, 10L)) + 1)
  }

  test("sessionize == naive model on randomized inputs") {
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 6) {
      val rows = Seq.fill(80 + rnd.nextInt(80))(
        (rnd.nextInt(4).toLong, rnd.nextInt(60).toLong))
      val gap = 1L + rnd.nextInt(10)
      val exp = naiveSessions(rows, gap)
      val out = Sessions.sessionize(rows.toDF("k", "t"), Seq("k"), "t", gap)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      out.foreach { case (kt, sid) =>
        assert(sid == exp(kt), s"round=$round gap=$gap at $kt")
      }
    }
  }

  /** Reference sweep for interval merging. */
  private def naiveMerge(rows: Seq[(Long, Long, Long)], minGap: Long): Seq[(Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, ks) =>
      val sorted = ks.map { case (_, s, e) => (s, e) }.sorted
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case (s, e) =>
        if (acc.nonEmpty && s <= acc.last._2 + minGap) {
          val (ps, pe, n) = acc.last
          acc(acc.length - 1) = (ps, math.max(pe, e), n + 1)
        } else acc += ((s, e, 1L))
      }
      acc.map { case (s, e, n) => (k, s, e, n) }
    }

  test("mergeIntervals == naive sweep, nested and adjacent intervals") {
    val rows = Seq(
      (1L, 0L, 10L), (1L, 5L, 7L),    // nested
      (1L, 10L, 12L),                 // touching (gap 0 merges)
      (1L, 20L, 25L),                 // separate
      (2L, 0L, 1L), (2L, 3L, 4L))     // merges only with minGap >= 2
    def run(minGap: Long) =
      Sessions.mergeIntervals(rows.toDF("k", "s", "e"), Seq("k"), "s", "e", minGap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    assert(run(0L) == naiveMerge(rows, 0L).sorted)
    assert(run(2L) == naiveMerge(rows, 2L).sorted)
    assert(run(0L).count(_._1 == 1L) == 2)  // [0,12] x3 merged, [20,25]
    assert(run(2L).count(_._1 == 2L) == 1)

    val rnd = new scala.util.Random(23)
    for (round <- 0 until 6) {
      val rnd2 = Seq.fill(60 + rnd.nextInt(60)) {
        val s = rnd.nextInt(100).toLong
        (rnd.nextInt(3).toLong, s, s + rnd.nextInt(12).toLong)
      }
      val g = rnd.nextInt(4).toLong
      assert(Sessions.mergeIntervals(rnd2.toDF("k", "s", "e"), Seq("k"), "s", "e", g)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted == naiveMerge(rnd2, g).sorted, s"round=$round gap=$g")
    }
  }

  test("sessionize drops null timestamps instead of inflating session ids") {
    val df = Seq(("a", java.lang.Long.valueOf(1L)),
      ("a", null.asInstanceOf[java.lang.Long]),
      ("a", java.lang.Long.valueOf(2L)),
      ("a", java.lang.Long.valueOf(100L))).toDF("k", "t")
    val out = Sessions.sessionize(df, Seq("k"), "t", gap = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    // the null-time row is gone; the real rows get 2 sessions, not 3
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (100L, 2L)), out.mkString(","))
  }
}
