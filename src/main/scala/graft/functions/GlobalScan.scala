package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Evaluation paths for unbounded GLOBAL-pooled transforms over the
  * per-ordinal component relation. Since r10 the decomposable expanding
  * stats run [[blockedScan]] — a DISTRIBUTED blocked two-pass — and since
  * r12 EWM runs [[blockedEwm]], the same blocked shape via the affine-map
  * composition of its recursion. [[scan]]'s ordered single-task fold over
  * the calendar-bounded relation is the bit-exact reference twin the specs
  * compare the blocked paths against, AND (r13) the production path for
  * calendars at or under `spark.graft.globalScanSequentialMax` ordinals,
  * where one fold replaces the blocked shapes' whole stage stack (see
  * [[graft.operators.Featurizer]]'s globalUnboundedParts).
  *
  * Replaces the unpartitioned `WindowExec` these transforms previously
  * planned: the relation (one row per distinct timestamp of the global
  * calendar — see the MilliFreq fit guard in
  * [[graft.operators.Featurizer]]) is sorted into a single partition and
  * folded ONCE in ordinal order by a `mapPartitions` kernel. Same
  * single-task cost on the same calendar-bounded relation, but the plan
  * contains no `WindowExec: No Partition Defined`, so that warning class in
  * logs/PlanGuard always signals a real defect (the same contract as
  * [[Ordinals.withGlobalOrdinalScalable]]'s distributed calendar rank).
  *
  * FP contract: the fold accumulates in ascending ordinal order — the
  * identical order Spark's running-frame `WindowExec` adds rows — and each
  * feature replays its window-expression arithmetic operation-for-operation
  * (`coalesce(sum,0)+x` style null-skipping sums, `stdFromSums`'
  * `sqrt(max((ss - s*s/n)/(n-1), 0))`, EWM's `α·x + (1−α)·state`), so
  * results are bit-identical to the window form it replaces (the oracle
  * compare is exact float equality).
  *
  * Reference semantics: expanding kernels lag_transforms.py:1139-1358, EWM
  * recursion + hole-safe shift lag_transforms.py:1502-1699.
  */
private[graft] object GlobalScan {

  /** One scannable feature: `out` = the statistic of the global history up
    * to (and including) ordinal `o - lag`, evaluated at every ordinal `o`.
    */
  sealed trait ScanTask { def lag: Int; def out: String }
  /** kind ∈ mean | std | min | max (the decomposable expanding stats). */
  final case class ExpandingTask(kind: String, lag: Int, out: String) extends ScanTask
  final case class EwmTask(alpha: Double, lag: Int, out: String) extends ScanTask

  /** Scan task for one (lag, transform) if the transform's global unbounded
    * evaluation is expressible as a sequential fold; None otherwise (the
    * featurizer then fails fast with the partition_by guidance). Offsets
    * unwrap to their inner transform with the shifted lag.
    */
  def taskOf(lag: Int, t: LagTransform, out: String): Option[ScanTask] = t match {
    case Offset(inner, n)                   => taskOf(lag + n, inner, out)
    case e: ExponentiallyWeightedMean       => Some(EwmTask(e.alpha, lag, out))
    case _: ExpandingMean                   => Some(ExpandingTask("mean", lag, out))
    case _: ExpandingStd                    => Some(ExpandingTask("std", lag, out))
    case _: ExpandingMin                    => Some(ExpandingTask("min", lag, out))
    case _: ExpandingMax                    => Some(ExpandingTask("max", lag, out))
    case _                                  => None
  }

  /** Running state after consuming one ordinal: null-skipping component sums
    * (matching Spark's Sum/Min/Max buffer semantics: null until the first
    * non-null input, `coalesce(acc,0)+x` after) plus one EWM state per
    * distinct alpha.
    */
  private final class Snapshot(val s: Double, val sSeen: Boolean,
                               val c: Long, val cSeen: Boolean,
                               val ss: Double, val ssSeen: Boolean,
                               val mn: Double, val mnSeen: Boolean,
                               val mx: Double, val mxSeen: Boolean,
                               val ewm: Array[Double], val ewmSeen: Array[Boolean])

  /** Run the scan. `comps` must carry exactly one row per dense global
    * ordinal with nullable component columns `__s` (sum), `__c` (non-null
    * count), `__ss` (sum of squares), `__mn` (min), `__mx` (max); rows for
    * EVERY ordinal 0..T-1 must be present (the global calendar defines the
    * ordinals, so this holds by construction). Returns (ordCol, task
    * features...), one row per ordinal.
    */
  def scan(comps: DataFrame, ordCol: String, tasks: Seq[ScanTask]): DataFrame = {
    require(tasks.nonEmpty, "GlobalScan.scan with no tasks")
    val alphas: Array[Double] =
      tasks.collect { case EwmTask(a, _, _) => a }.distinct.toArray
    val alphaIdx = alphas.zipWithIndex.toMap
    val maxLag = tasks.map(_.lag).max
    require(tasks.forall(_.lag >= 0), s"negative scan lag in $tasks")

    val outSchema = StructType(StructField(ordCol, LongType, nullable = false) +:
      tasks.map(t => StructField(t.out, DoubleType, nullable = true)))
    // compile each task to (lagOfTask, snapshot => value) up front so the
    // per-row loop is a flat array walk
    val compiled: Array[(Int, Snapshot => Any)] = tasks.map {
      case ExpandingTask("mean", lag, _) => (lag, (sn: Snapshot) =>
        if (sn.cSeen && sn.c > 0) java.lang.Double.valueOf(sn.s / sn.c) else null)
      case ExpandingTask("std", lag, _) => (lag, (sn: Snapshot) =>
        if (sn.cSeen && sn.c > 1) {
          // exact replay of LagTransforms.stdFromSums:
          // sqrt(greatest((ss - s*s/n)/(n-1), 0.0))
          val num = (sn.ss - sn.s * sn.s / sn.c) / (sn.c - 1L)
          java.lang.Double.valueOf(math.sqrt(math.max(num, 0.0)))
        } else null)
      case ExpandingTask("min", lag, _) => (lag, (sn: Snapshot) =>
        if (sn.mnSeen) java.lang.Double.valueOf(sn.mn) else null)
      case ExpandingTask("max", lag, _) => (lag, (sn: Snapshot) =>
        if (sn.mxSeen) java.lang.Double.valueOf(sn.mx) else null)
      case ExpandingTask(k, _, _) => throw new IllegalArgumentException(s"bad kind $k")
      case EwmTask(a, lag, _) =>
        val ai = alphaIdx(a)
        (lag, (sn: Snapshot) =>
          if (sn.ewmSeen(ai)) java.lang.Double.valueOf(sn.ewm(ai)) else null)
    }.toArray
    val nAlpha = alphas.length

    comps
      .select(col(ordCol).cast("long").as(ordCol),
        col("__s").cast("double").as("__s"), col("__c").cast("long").as("__c"),
        col("__ss").cast("double").as("__ss"),
        col("__mn").cast("double").as("__mn"), col("__mx").cast("double").as("__mx"))
      .repartition(1).sortWithinPartitions(col(ordCol))
      .mapPartitions { it =>
        // ring buffer of post-ordinal snapshots, indexed by ordinal
        val ring = new Array[Snapshot](maxLag + 1)
        var s = 0.0; var sSeen = false
        var c = 0L; var cSeen = false
        var ss = 0.0; var ssSeen = false
        var mn = 0.0; var mnSeen = false
        var mx = 0.0; var mxSeen = false
        val ewm = new Array[Double](nAlpha)
        val ewmSeen = new Array[Boolean](nAlpha)
        var expected = 0L
        // backstop for calendars the fit-time frequency guard cannot see
        // (e.g. a tick-indexed IntFreq panel whose calendar scales with the
        // row count): the sequential fold is calendar-bounded BY CONTRACT —
        // refuse loudly instead of grinding one task for hours
        val maxRows = 50_000_000L
        it.map { r =>
          val o = r.getLong(0)
          // the dense-calendar invariant the ring buffer relies on
          require(o == expected,
            s"GlobalScan: non-dense ordinal $o (expected $expected)")
          require(o < maxRows,
            s"GlobalScan: the pooled calendar exceeds $maxRows distinct " +
              "timestamps — it scales with the row count, not a bounded " +
              "calendar. Use partition_by pooling, a coarser frequency, or " +
              "pre-aggregate the panel (the EWM recursion is sequential by " +
              "nature and must stay calendar-bounded).")
          expected += 1
          if (!r.isNullAt(1)) { s = s + r.getDouble(1); sSeen = true }
          if (!r.isNullAt(2)) { c = c + r.getLong(2); cSeen = true }
          if (!r.isNullAt(3)) { ss = ss + r.getDouble(3); ssSeen = true }
          if (!r.isNullAt(4)) {
            val x = r.getDouble(4)
            mn = if (mnSeen) math.min(mn, x) else x; mnSeen = true
          }
          if (!r.isNullAt(5)) {
            val x = r.getDouble(5)
            mx = if (mxSeen) math.max(mx, x) else x; mxSeen = true
          }
          // EWM consumes the per-ordinal collapsed value = __mn (== __mx ==
          // the collapsed cv when derived from the collapse branch); the
          // recursion replays EwmUpdate: α·x + (1−α)·state, null x skipped.
          // That reading is ONLY valid on collapsed components — over true
          // multi-row components __mn is a real minimum and the EWM would be
          // silently wrong. Today unreachable (forcedCollapse routes every
          // EWM through the collapse branch), but nothing upstream GUARDS
          // the invariant, so verify it per row: collapsed components have
          // __mn and __mx bit-equal (or both null).
          if (nAlpha > 0) {
            val mnNull = r.isNullAt(4); val mxNull = r.isNullAt(5)
            require(mnNull == mxNull && (mnNull ||
              java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
                java.lang.Double.doubleToLongBits(r.getDouble(5))),
              s"GlobalScan: EWM task over a non-collapsed component at " +
                s"ordinal $o (__mn != __mx) — EWM recursions require the " +
                "collapsed per-ordinal relation")
          }
          // NaN is missing like null (EwmUpdate's documented semantics,
          // and blockedEwm's): consuming it would poison the state forever
          if (nAlpha > 0 && !r.isNullAt(4) && !r.getDouble(4).isNaN) {
            val x = r.getDouble(4)
            var ai = 0
            while (ai < nAlpha) {
              ewm(ai) =
                if (ewmSeen(ai)) alphas(ai) * x + (1.0 - alphas(ai)) * ewm(ai)
                else x
              ewmSeen(ai) = true
              ai += 1
            }
          }
          ring((o % (maxLag + 1)).toInt) = new Snapshot(s, sSeen, c, cSeen,
            ss, ssSeen, mn, mnSeen, mx, mxSeen, ewm.clone(), ewmSeen.clone())
          val vals = new Array[Any](compiled.length + 1)
          vals(0) = o
          var ti = 0
          while (ti < compiled.length) {
            val (lag, f) = compiled(ti)
            val src = o - lag
            vals(ti + 1) = if (src < 0) null else f(ring((src % (maxLag + 1)).toInt))
            ti += 1
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }(Encoders.row(outSchema))
  }

  /** DISTRIBUTED blocked evaluation of the decomposable expanding stats
    * (mean/std/min/max) — the r10 replacement for running them through
    * [[scan]]'s single-task fold. Three stages, none of which funnels the
    * calendar through one task:
    *
    *   1. within-block RUNNING components via a WindowExec PARTITIONED by
    *      block (`blockSize` ordinals per block) — distributed, running
    *      frames accumulate sequentially in ordinal order;
    *   2. an exclusive-prefix CARRY fold over the per-block totals — the
    *      only sequential step, over the block-summary relation
    *      (calendar/blockSize rows, e.g. 1024× smaller than the calendar);
    *   3. a broadcast join-back combining carry ⊕ within-block running
    *      state, then each task reads its statistic at ordinal `o - lag`
    *      through a self-join on the ordinal axis.
    *
    * FP contract: the combine associates as carry + withinBlockRun (a
    * two-level left fold) where [[scan]] folds strictly sequentially. IEEE
    * addition is not associative, so on arbitrary doubles the two paths can
    * differ in the last ulp of the SUMS; min/max/count are order-free, each
    * statistic's final arithmetic replays the window expressions
    * operation-for-operation, and on integer-valued panels (every oracle
    * panel — exact FP sums) the paths are bit-equal. EWM recursions are not
    * decomposable and stay on [[scan]].
    */
  def blockedScan(comps: DataFrame, ordCol: String, tasks: Seq[ScanTask],
                  blockSize: Long = 1024L): DataFrame = {
    require(tasks.nonEmpty, "GlobalScan.blockedScan with no tasks")
    require(blockSize >= 2, s"blockSize must be >= 2, got $blockSize")
    val expTasks = tasks.collect { case e: ExpandingTask => e }
    require(expTasks.length == tasks.length,
      "blockedScan handles decomposable expanding stats only; EWM runs scan")
    require(expTasks.forall(_.lag >= 0), s"negative scan lag in $tasks")

    val base = comps.select(col(ordCol).cast("long").as(ordCol),
        col("__s").cast("double").as("__s"), col("__c").cast("long").as("__c"),
        col("__ss").cast("double").as("__ss"),
        col("__mn").cast("double").as("__mn"), col("__mx").cast("double").as("__mx"))
      .withColumn("__blk", expr(s"`$ordCol` div ${blockSize}L"))
    val wRun = Window.partitionBy(col("__blk")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.partitionBy(col("__blk"))
    // dense-calendar contract, enforced like scan's per-row require: every
    // ordinal 0..T-1 present exactly once, or the prefix combine (and the
    // o - lag shift) would silently skip history. Any hole or duplicate
    // desynchronizes ordinal vs within-block row_number.
    val rn = row_number().over(Window.partitionBy(col("__blk")).orderBy(col(ordCol)))
    val dense = col(ordCol) === col("__blk") * lit(blockSize) + col("__rn") - 1
    // NOTE the withRun subtree is referenced twice below (totals branch and
    // the snap join). That is safe without exchange reuse — the __blk
    // repartition is HASH partitioning, a pure function of content, so two
    // evaluations always agree (unlike range sampling) — and cheap: the
    // relation is calendar-bounded by contract, and ReuseExchange dedupes
    // the shuffles in one executed plan.
    val withRun = base.select(col(ordCol), col("__blk"),
      sum(col("__s")).over(wRun).as("__rs"),
      sum(col("__c")).over(wRun).as("__rc"),
      sum(col("__ss")).over(wRun).as("__rss"),
      min(col("__mn")).over(wRun).as("__rmn"),
      max(col("__mx")).over(wRun).as("__rmx"),
      max(col(ordCol)).over(wBlk).as("__lastOrd"),
      count(lit(1)).over(wBlk).as("__bn"),
      rn.as("__rn"))
      .withColumn(ordCol, when(dense, col(ordCol))
        .otherwise(raise_error(concat(
          lit("GlobalScan.blockedScan: non-dense ordinal "),
          col(ordCol).cast("string"), lit(" in block "),
          col("__blk").cast("string"))).cast("long")))
      .drop("__rn")
    // per-block totals = the running state at the block's last ordinal
    // (NOT a groupBy re-aggregation, whose partial-merge order would not
    // replay the window's sequential accumulation)
    val totals = withRun.filter(col(ordCol) === col("__lastOrd"))
      .select(col("__blk"), col("__rs"), col("__rc"), col("__rss"),
        col("__rmn"), col("__rmx"), col("__bn"))
    val carrySchema = StructType(Seq(
      StructField("__blk", LongType, nullable = false),
      StructField("__ps", DoubleType, nullable = true),
      StructField("__pc", LongType, nullable = true),
      StructField("__pss", DoubleType, nullable = true),
      StructField("__pmn", DoubleType, nullable = true),
      StructField("__pmx", DoubleType, nullable = true)))
    // exclusive-prefix carry per block: state BEFORE consuming the block,
    // folded sequentially in block order over the tiny totals relation.
    // Completes the density enforcement the per-row alignment guard above
    // cannot see: block ids must be contiguous from 0 (a whole missing
    // block keeps every remaining row aligned) and every block except the
    // LAST must hold exactly blockSize rows (a hole at a block's tail
    // also keeps alignment). Tail "holes" in the final block are ordinals
    // past the calendar's end — nothing to miss.
    val bsz = blockSize
    val carry = totals.repartition(1).sortWithinPartitions(col("__blk"))
      .mapPartitions { it =>
        var s = 0.0; var sSeen = false
        var c = 0L; var cSeen = false
        var ss = 0.0; var ssSeen = false
        var mn = 0.0; var mnSeen = false
        var mx = 0.0; var mxSeen = false
        var expectBlk = 0L
        var prevN = -1L
        it.map { r =>
          val blk = r.getLong(0)
          require(blk == expectBlk,
            s"GlobalScan.blockedScan: missing block $expectBlk (got $blk) — non-dense calendar")
          require(prevN == -1L || prevN == bsz,
            s"GlobalScan.blockedScan: block ${expectBlk - 1} holds $prevN of $bsz " +
              "ordinals with later blocks present — non-dense calendar")
          expectBlk += 1
          prevN = r.getLong(6)
          val out = Row(r.getLong(0),
            if (sSeen) java.lang.Double.valueOf(s) else null,
            if (cSeen) java.lang.Long.valueOf(c) else null,
            if (ssSeen) java.lang.Double.valueOf(ss) else null,
            if (mnSeen) java.lang.Double.valueOf(mn) else null,
            if (mxSeen) java.lang.Double.valueOf(mx) else null)
          if (!r.isNullAt(1)) { s += r.getDouble(1); sSeen = true }
          if (!r.isNullAt(2)) { c += r.getLong(2); cSeen = true }
          if (!r.isNullAt(3)) { ss += r.getDouble(3); ssSeen = true }
          if (!r.isNullAt(4)) {
            val x = r.getDouble(4)
            mn = if (mnSeen) math.min(mn, x) else x; mnSeen = true
          }
          if (!r.isNullAt(5)) {
            val x = r.getDouble(5)
            mx = if (mxSeen) math.max(mx, x) else x; mxSeen = true
          }
          out
        }
      }(Encoders.row(carrySchema))
    def addNullSkip(p: Column, r: Column): Column =
      when(p.isNull && r.isNull, lit(null).cast("double"))
        .otherwise(coalesce(p, lit(0.0)) + coalesce(r, lit(0.0)))
    val snap = withRun.join(broadcast(carry), Seq("__blk"))
      .select(col(ordCol),
        addNullSkip(col("__ps"), col("__rs")).as("__ts"),
        (coalesce(col("__pc"), lit(0L)) + coalesce(col("__rc"), lit(0L))).as("__tc"),
        addNullSkip(col("__pss"), col("__rss")).as("__tss"),
        least(col("__pmn"), col("__rmn")).as("__tmn"),      // least/greatest
        greatest(col("__pmx"), col("__rmx")).as("__tmx"))   // skip nulls
    // statistic of the FULL prefix at each ordinal — the same arithmetic
    // as scan's compiled tasks (stdFromSums replay included)
    def statCol(kind: String): Column = kind match {
      case "mean" => when(col("__tc") > 0, col("__ts") / col("__tc").cast("double"))
      case "std" => when(col("__tc") > 1,
        sqrt(greatest(
          (col("__tss") - col("__ts") * col("__ts") / col("__tc").cast("double"))
            / (col("__tc") - 1L).cast("double"),
          lit(0.0))))
      case "min" => col("__tmn")
      case "max" => col("__tmx")
      case k => throw new IllegalArgumentException(s"bad kind $k")
    }
    val kinds = expTasks.map(_.kind).distinct
    val statFrame = snap.select(
      col(ordCol) +: kinds.map(k => statCol(k).as(s"__st_$k")): _*)
    // value at ordinal o = statistic of the prefix up to o - lag: shift the
    // stat frame by each distinct lag and left-join onto the ordinal axis
    // (o - lag < 0 stays null via the left join)
    val axis = comps.select(col(ordCol).cast("long").as(ordCol))
    var out = axis
    expTasks.groupBy(_.lag).toSeq.sortBy(_._1).foreach { case (lag, ts) =>
      val shifted = statFrame.select(
        (col(ordCol) + lit(lag)).as(ordCol) +:
          ts.map(t => col(s"__st_${t.kind}").as(t.out)): _*)
      out = out.join(shifted, Seq(ordCol), "left")
    }
    out.select(col(ordCol) +: tasks.map(t => col(t.out)): _*)
  }

  /** DISTRIBUTED blocked evaluation of the EWM recursion — the r12
    * replacement for running global-pooled EWM through [[scan]]'s
    * single-task fold. The recursion y = (1−α)·y + α·x is sequential, but
    * each consumed value is an AFFINE map y → a·y + b (a = 1−α, b = α·x),
    * and affine maps compose associatively: (a,b)∘(c,d) = (ac, ad+b). So a
    * block of the calendar collapses to ONE affine map
    * (A, B) = ((1−α)^n, zero-init EWM run over the block), and the same
    * three-stage shape as [[blockedScan]] applies:
    *
    *   1. within-block running state via a WindowExec PARTITIONED by block:
    *      per distinct alpha, the fresh-init EWM run `e` (for blocks with
    *      no prior state), the zero-init run `B` (the affine offset), and
    *      the non-missing count `n` (the affine slope exponent) — all
    *      sequential exact replays of [[graft.plans.EwmUpdate]];
    *   2. an exclusive-prefix CARRY fold over per-block (e, B, n) totals —
    *      the only sequential step, over the block-summary relation
    *      (calendar/blockSize rows);
    *   3. a broadcast join-back: y_o = (1−α)^{n_o} · carry + B_o when the
    *      carry has state, else e_o; then each task reads ordinal o − lag
    *      through the same shifted left-join as [[blockedScan]].
    *
    * FP contract: WITHIN a block the recursion replays EwmUpdate
    * operation-for-operation (bit-identical); ACROSS blocks the combine
    * computes pow(1−α, n)·carry + B where the sequential fold interleaves
    * the carry's decay with each step, so multi-block results can differ
    * from [[scan]] in the last ulps (relative ~1e-15) — far inside the
    * oracle compare's 1e-6 rounding. Calendars at or under `blockSize`
    * ordinals stay single-block and bit-identical.
    *
    * Same null/NaN semantics as EwmUpdate: missing inputs leave the state
    * untouched (identity map); the first non-missing value seeds a fresh
    * state at full weight. Reference recursion:
    * /root/reference/mlforecast/lag_transforms.py:1502-1699.
    */
  def blockedEwm(comps: DataFrame, ordCol: String, tasks: Seq[ScanTask],
                 blockSize: Long = 1024L): DataFrame = {
    require(tasks.nonEmpty, "GlobalScan.blockedEwm with no tasks")
    require(blockSize >= 2, s"blockSize must be >= 2, got $blockSize")
    val ewmTasks = tasks.collect { case e: EwmTask => e }
    require(ewmTasks.length == tasks.length,
      "blockedEwm handles EWM tasks only; expanding stats run blockedScan")
    require(ewmTasks.forall(_.lag >= 0), s"negative scan lag in $tasks")
    val alphas: Seq[Double] = ewmTasks.map(_.alpha).distinct

    // EWM consumes the per-ordinal COLLAPSED value (scan's contract: __mn
    // and __mx bit-equal or both null/NaN on collapsed components) — same
    // loud per-row guard as scan, in expression form
    val collapsedOk = (col("__mn").isNull && col("__mx").isNull) ||
      (isnan(col("__mn")) && isnan(col("__mx"))) || (col("__mn") === col("__mx"))
    val base = comps.select(col(ordCol).cast("long").as(ordCol),
        when(collapsedOk, col("__mn").cast("double"))
          .otherwise(raise_error(concat(
            lit("GlobalScan.blockedEwm: EWM task over a non-collapsed "),
            lit("component at ordinal "), col(ordCol).cast("string"),
            lit(" (__mn != __mx) — EWM recursions require the collapsed "),
            lit("per-ordinal relation"))).cast("double")).as("__x"))
      .withColumn("__blk", expr(s"`$ordCol` div ${blockSize}L"))
    val missing = col("__x").isNull || isnan(col("__x"))
    val wRun = Window.partitionBy(col("__blk")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.partitionBy(col("__blk"))
    // dense-calendar contract, enforced exactly like blockedScan: per-row
    // ordinal vs within-block row_number alignment here, block contiguity
    // and block fill in the carry fold below
    val rn = row_number().over(Window.partitionBy(col("__blk")).orderBy(col(ordCol)))
    val dense = col(ordCol) === col("__blk") * lit(blockSize) + col("__rn") - 1
    val perAlpha = alphas.zipWithIndex.flatMap { case (a, ai) =>
      Seq(
        graft.plans.EwmExpr.ewm(col("__x"), a, Seq(col("__blk")), col(ordCol))
          .as(s"__e$ai"),
        graft.plans.EwmExpr.ewm(col("__x"), a, Seq(col("__blk")), col(ordCol),
          zeroInit = true).as(s"__b$ai"))
    }
    val withRun = base.select(Seq(col(ordCol), col("__blk")) ++ perAlpha ++ Seq(
        sum(when(missing, lit(0L)).otherwise(lit(1L))).over(wRun).as("__n"),
        max(col(ordCol)).over(wBlk).as("__lastOrd"),
        count(lit(1)).over(wBlk).as("__bn"),
        rn.as("__rn")): _*)
      .withColumn(ordCol, when(dense, col(ordCol))
        .otherwise(raise_error(concat(
          lit("GlobalScan.blockedEwm: non-dense ordinal "),
          col(ordCol).cast("string"), lit(" in block "),
          col("__blk").cast("string"))).cast("long")))
      .drop("__rn")
    // per-block totals = running state at the block's last ordinal
    val totals = withRun.filter(col(ordCol) === col("__lastOrd"))
      .select(Seq(col("__blk"), col("__n"), col("__bn")) ++
        alphas.indices.flatMap(ai => Seq(col(s"__e$ai"), col(s"__b$ai"))): _*)
    val carrySchema = StructType(
      StructField("__blk", LongType, nullable = false) +:
        alphas.indices.map(ai => StructField(s"__y$ai", DoubleType, nullable = true)))
    // exclusive-prefix carry per block: the EWM state BEFORE consuming the
    // block (null = no value seen yet), folded sequentially in block order
    // over the tiny totals relation. Mirrors blockedScan's density checks.
    val bsz = blockSize
    val alphaArr = alphas.toArray
    val carry = totals.repartition(1).sortWithinPartitions(col("__blk"))
      .mapPartitions { it =>
        val nAlpha = alphaArr.length
        val y = new Array[Double](nAlpha)
        val seen = new Array[Boolean](nAlpha)
        var expectBlk = 0L
        var prevN = -1L
        it.map { r =>
          val blk = r.getLong(0)
          require(blk == expectBlk,
            s"GlobalScan.blockedEwm: missing block $expectBlk (got $blk) — non-dense calendar")
          require(prevN == -1L || prevN == bsz,
            s"GlobalScan.blockedEwm: block ${expectBlk - 1} holds $prevN of $bsz " +
              "ordinals with later blocks present — non-dense calendar")
          expectBlk += 1
          prevN = r.getLong(2)
          val out = Row.fromSeq(blk +: alphaArr.indices.map(ai =>
            if (seen(ai)) java.lang.Double.valueOf(y(ai)) else null))
          val nBlk = r.getLong(1)
          if (nBlk > 0) {
            var ai = 0
            while (ai < nAlpha) {
              val e = r.getDouble(3 + 2 * ai)
              val b = r.getDouble(4 + 2 * ai)
              y(ai) =
                if (seen(ai)) math.pow(1.0 - alphaArr(ai), nBlk.toDouble) * y(ai) + b
                else e
              seen(ai) = true
              ai += 1
            }
          }
          out
        }
      }(Encoders.row(carrySchema))
    // combined state at each ordinal: the block's affine map applied to the
    // carry where one exists, the fresh-init run otherwise
    val statFrame = withRun.join(broadcast(carry), Seq("__blk"))
      .select(col(ordCol) +: alphas.zipWithIndex.map { case (a, ai) =>
        when(col(s"__y$ai").isNotNull,
          pow(lit(1.0 - a), col("__n").cast("double")) * col(s"__y$ai") +
            col(s"__b$ai"))
          .otherwise(col(s"__e$ai")).as(s"__st_$ai")
      }: _*)
    // value at ordinal o = state at o - lag (same shifted left-join as
    // blockedScan; o - lag < 0 stays null)
    val alphaIdx = alphas.zipWithIndex.toMap
    val axis = comps.select(col(ordCol).cast("long").as(ordCol))
    var out = axis
    ewmTasks.groupBy(_.lag).toSeq.sortBy(_._1).foreach { case (lag, ts) =>
      val shifted = statFrame.select(
        (col(ordCol) + lit(lag)).as(ordCol) +:
          ts.map(t => col(s"__st_${alphaIdx(t.alpha)}").as(t.out)): _*)
      out = out.join(shifted, Seq(ordCol), "left")
    }
    // backticks: EWM feature names carry dots (alpha0.5)
    out.select(col(ordCol) +: tasks.map(t => col(s"`${t.out}`")): _*)
  }
}
