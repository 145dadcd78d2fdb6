package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GlobalScan
import graft.functions.GlobalScan.{EwmTask, ExpandingTask}

/** The global unbounded evaluation paths: blockedScan (distributed blocked
  * two-pass for expanding stats) against scan (the ordered sequential fold
  * it replaced on those shapes), plus scan's EWM collapsed-component
  * invariant.
  */
class GlobalScanSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("__ord", LongType, nullable = false),
    StructField("__s", DoubleType, nullable = true),
    StructField("__c", LongType, nullable = true),
    StructField("__ss", DoubleType, nullable = true),
    StructField("__mn", DoubleType, nullable = true),
    StructField("__mx", DoubleType, nullable = true)))

  /** comps relation from per-ordinal (possibly null) value lists. */
  private def compsOf(vals: Seq[Seq[Option[Double]]]): DataFrame = {
    val rows = vals.zipWithIndex.map { case (vs, o) =>
      val nn = vs.flatten
      Row(o.toLong,
        if (nn.isEmpty) null else java.lang.Double.valueOf(nn.sum),
        java.lang.Long.valueOf(nn.length.toLong),
        if (nn.isEmpty) null else java.lang.Double.valueOf(nn.map(x => x * x).sum),
        if (nn.isEmpty) null else java.lang.Double.valueOf(nn.min),
        if (nn.isEmpty) null else java.lang.Double.valueOf(nn.max))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 7), schema)
  }

  private val allTasks = Seq(
    ExpandingTask("mean", 1, "em"), ExpandingTask("std", 1, "es"),
    ExpandingTask("min", 1, "emn"), ExpandingTask("max", 2, "emx"))

  private def collectMap(df: DataFrame): Map[Long, Seq[Option[Double]]] =
    df.collect().map { r =>
      r.getLong(0) -> (1 until r.length).map(i =>
        if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    }.toMap

  test("blockedScan == sequential scan exactly on integer-valued data") {
    // integer sums are exact in FP, so the two-level fold and the strict
    // sequential fold must agree to the BIT (the oracle panels are
    // integer-valued — this is the hash-exactness precondition)
    val rnd = new scala.util.Random(11)
    val vals = Seq.tabulate(700) { o =>
      Seq.fill(rnd.nextInt(3))(
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(50).toDouble))
    }
    val comps = compsOf(vals)
    // blockSize far below the ordinal count so carries genuinely engage
    val blocked = collectMap(GlobalScan.blockedScan(comps, "__ord", allTasks, blockSize = 64))
    val seq = collectMap(GlobalScan.scan(comps, "__ord", allTasks))
    assert(blocked.keySet == seq.keySet && blocked.nonEmpty)
    blocked.foreach { case (o, b) =>
      assert(b == seq(o), s"ordinal $o: blocked=$b sequential=${seq(o)}")
    }
  }

  test("blockedScan tracks the sequential scan on arbitrary doubles") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.tabulate(500)(_ =>
      Seq.fill(1 + rnd.nextInt(2))(Some(rnd.nextGaussian() * 13.7)))
    val comps = compsOf(vals)
    val blocked = collectMap(GlobalScan.blockedScan(comps, "__ord", allTasks, blockSize = 32))
    val seq = collectMap(GlobalScan.scan(comps, "__ord", allTasks))
    blocked.foreach { case (o, b) =>
      b.zip(seq(o)).zipWithIndex.foreach {
        case ((Some(x), Some(y)), i) =>
          assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
            s"ordinal $o col $i: blocked=$x sequential=$y")
        case ((bx, by), i) =>
          assert(bx == by, s"ordinal $o col $i nullability: $bx vs $by")
      }
    }
  }

  test("blockedScan plans no unpartitioned window and distributes the fold") {
    val vals = Seq.tabulate(300)(o => Seq(Some(o.toDouble % 17)))
    val out = GlobalScan.blockedScan(compsOf(vals), "__ord",
      Seq(ExpandingTask("mean", 1, "em")), blockSize = 32)
    out.write.format("noop").mode("overwrite").save()
    val g = new graft.tools.PlanGuard(0L)
    val unpart = g.nodes(out.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w.nodeName
    }
    assert(unpart.isEmpty, "blockedScan must not plan an unpartitioned window")
  }

  test("blockedScan rejects non-dense ordinals loudly") {
    // a hole would make the prefix combine silently skip history (and the
    // o - lag shift return nulls); the contract is dense-by-construction,
    // so violations must raise, not mis-compute
    val vals = Seq.tabulate(100)(o => Seq(Some(o.toDouble)))
    val holey = compsOf(vals).filter(col("__ord") =!= 37L)
    val e = intercept[Exception] {
      GlobalScan.blockedScan(holey, "__ord",
        Seq(ExpandingTask("mean", 1, "em")), blockSize = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-dense")))
  }

  /** Collapsed per-ordinal comps (the EWM contract: __mn == __mx == cv). */
  private def collapsedOf(cv: Seq[Option[Double]]): DataFrame = {
    val rows = cv.zipWithIndex.map { case (v, o) =>
      val d = v.map(java.lang.Double.valueOf).orNull
      val c = java.lang.Long.valueOf(if (v.isDefined) 1L else 0L)
      Row(o.toLong, d, c, v.map(x => java.lang.Double.valueOf(x * x)).orNull, d, d)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 7), schema)
  }

  private val ewmTasks = Seq(
    EwmTask(0.3, 1, "e3"), EwmTask(0.5, 1, "e5"), EwmTask(0.3, 40, "e3off"))

  test("blockedEwm tracks the sequential scan across genuine block carries") {
    // nulls sprinkled in (identity affine maps), one lag larger than the
    // block size, two alphas; blockSize far below the ordinal count
    val rnd = new scala.util.Random(23)
    val cv = Seq.tabulate(500)(o =>
      if (o % 11 == 3) None else Some(rnd.nextGaussian() * 13.7 - 2.0))
    val comps = collapsedOf(cv)
    val blocked = collectMap(GlobalScan.blockedEwm(comps, "__ord", ewmTasks, blockSize = 32))
    val seq = collectMap(GlobalScan.scan(comps, "__ord", ewmTasks))
    assert(blocked.keySet == seq.keySet && blocked.nonEmpty)
    blocked.foreach { case (o, b) =>
      b.zip(seq(o)).zipWithIndex.foreach {
        case ((Some(x), Some(y)), i) =>
          assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
            s"ordinal $o col $i: blocked=$x sequential=$y")
        case ((bx, by), i) =>
          assert(bx == by, s"ordinal $o col $i nullability: $bx vs $by")
      }
    }
  }

  test("blockedEwm == sequential scan to the bit within a single block") {
    // calendars at or under blockSize never touch the cross-block combine:
    // the within-block run is EwmUpdate itself, an exact replay
    val rnd = new scala.util.Random(29)
    val cv = Seq.tabulate(200)(o =>
      if (o % 7 == 2) None else Some(rnd.nextGaussian() * 3.3))
    val comps = collapsedOf(cv)
    val blocked = collectMap(GlobalScan.blockedEwm(comps, "__ord", ewmTasks, blockSize = 1024))
    val seq = collectMap(GlobalScan.scan(comps, "__ord", ewmTasks))
    blocked.foreach { case (o, b) =>
      assert(b == seq(o), s"ordinal $o: blocked=$b sequential=${seq(o)}")
    }
  }

  test("blockedEwm carries state through entirely-missing blocks") {
    // a block of nulls is the identity affine map: the carry must pass
    // through untouched and every ordinal in it reads the prior state
    val cv = Seq.tabulate(96)(o =>
      if (o >= 16 && o < 48) None else Some(o.toDouble % 13))
    val comps = collapsedOf(cv)
    val blocked = collectMap(GlobalScan.blockedEwm(comps, "__ord",
      Seq(EwmTask(0.5, 1, "ew")), blockSize = 16))
    val seq = collectMap(GlobalScan.scan(comps, "__ord",
      Seq(EwmTask(0.5, 1, "ew"))))
    blocked.foreach { case (o, b) =>
      assert(b == seq(o), s"ordinal $o: blocked=$b sequential=${seq(o)}")
    }
    // the gap really reads the pre-gap state
    assert(blocked(20L) == blocked(17L) && blocked(48L) == blocked(17L))
  }

  test("scan and blockedEwm both treat NaN collapsed values as missing") {
    // EwmUpdate's contract: null AND NaN inputs leave the state untouched.
    // A NaN consumed as a value would poison the state forever.
    val cv = Seq(Some(2.0), Some(Double.NaN), Some(4.0), None, Some(6.0))
    val comps = collapsedOf(cv)
    val task = Seq(EwmTask(0.5, 0, "ew"))
    val seq = collectMap(GlobalScan.scan(comps, "__ord", task))
    val blocked = collectMap(GlobalScan.blockedEwm(comps, "__ord", task, blockSize = 2))
    assert(seq == blocked)
    assert(seq(1L) == Seq(Some(2.0)))               // NaN skipped, state held
    assert(seq(2L) == Seq(Some(0.5 * 4.0 + 0.5 * 2.0)))
    assert(seq(4L) == Seq(Some(0.5 * 6.0 + 0.5 * 3.0)))
  }

  test("blockedEwm plans no unpartitioned window and distributes the fold") {
    val cv = Seq.tabulate(300)(o => Some(o.toDouble % 17))
    val out = GlobalScan.blockedEwm(collapsedOf(cv), "__ord",
      Seq(EwmTask(0.5, 1, "ew")), blockSize = 32)
    out.write.format("noop").mode("overwrite").save()
    val g = new graft.tools.PlanGuard(0L)
    val unpart = g.nodes(out.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w.nodeName
    }
    assert(unpart.isEmpty, "blockedEwm must not plan an unpartitioned window")
  }

  test("blockedEwm rejects non-dense ordinals loudly") {
    val cv = Seq.tabulate(100)(o => Some(o.toDouble))
    val holey = collapsedOf(cv).filter(col("__ord") =!= 37L)
    val e = intercept[Exception] {
      GlobalScan.blockedEwm(holey, "__ord",
        Seq(EwmTask(0.5, 1, "ew")), blockSize = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-dense")))
  }

  test("blockedEwm rejects non-collapsed components loudly") {
    val comps = compsOf(Seq(Seq(Some(1.0), Some(3.0)), Seq(Some(2.0))))
    val e = intercept[Exception] {
      GlobalScan.blockedEwm(comps, "__ord", Seq(EwmTask(0.5, 1, "ew"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-collapsed")))
  }

  test("scan rejects EWM over non-collapsed components") {
    // the EWM branch reads __mn as "the collapsed value" — only valid when
    // __mn == __mx (the collapse-branch layout). A multi-row component
    // reaching it must fail loudly, not produce a silently wrong EWM.
    val comps = compsOf(Seq(Seq(Some(1.0), Some(3.0)), Seq(Some(2.0))))
    val e = intercept[org.apache.spark.SparkException] {
      GlobalScan.scan(comps, "__ord", Seq(EwmTask(0.5, 1, "ew"))).collect()
    }
    assert(e.getMessage.contains("non-collapsed") ||
      Option(e.getCause).exists(_.getMessage.contains("non-collapsed")))
  }
}
