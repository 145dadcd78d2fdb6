package graft.tools

/** The bench's load-vs-regression classification, factored out of
  * Bench.main so the round-signal logic is unit-testable without a Spark
  * session. Semantics:
  *
  *   - a query is FLAGGED when its wall leaves the committed band
  *     (> max(1.5×ref, ref + 0.75 s));
  *   - a plan/code regression moves CPU and survives a serial re-run; box
  *     load moves wall (and, through JIT starvation, can inflate CPU too —
  *     r9's ggbm showed 12.7×), but a serial end-of-session re-time
  *     recovers;
  *   - a session whose calibration spin shows contention (wall/cpu ratio)
  *     cannot credibly CONVICT a regression — under load every flag stays
  *     suspect and the next quiet run adjudicates;
  *   - (r10) contention is not the only load signature: a box that is
  *     uniformly slow early in the session (frequency scaling, a co-tenant
  *     saturating every core) keeps wall/cpu ≈ 1 while BOTH inflate. The
  *     fixed-work spin's ABSOLUTE duration against the committed quiet-box
  *     spin catches that: a start-spin ≥ 1.5× the committed quiet time puts
  *     the session start in a "load window", and flags measured there can
  *     only be convicted from their serial end-of-session re-time (taken
  *     after the window has passed). The per-query CPU band is additionally
  *     scaled by the spin duration interpolated to the query's position in
  *     the session, so an early-session query on a half-speed box gets a
  *     2× CPU allowance while a late-session one gets none.
  *   - (r12) a load-window session — slow start OR mid-suite spin, or a
  *     load-wave-shaped flag count — re-times EVERY flag under a wall-clock
  *     budget ([[widenRetimes]]/[[retimePicks]]), and the COMMITTED band is
  *     protected: load_suspect queries keep their clean retime or the
  *     previous band entry ([[protectedBand]]), so a loaded session can
  *     never inflate the reference its successors flag against.
  */
object LoadClassify {

  /** The flagging band around a committed reference wall: ONE definition
    * shared by [[flagged]] and the band-protection invariant in
    * [[protectedBand]] (a clean retime is exactly a non-flagging value) —
    * a drift between two copies of these constants would silently break
    * that invariant.
    */
  def wallBand(ref: Double): Double = math.max(1.5 * ref, ref + 0.75)

  /** Query names whose wall left the committed band. */
  def flagged(wall: Map[String, Double],
              refW: Map[String, Double]): Seq[String] =
    wall.collect {
      case (n, w) if refW.contains(n) && w > wallBand(refW(n)) => n
    }.toSeq.sorted

  /** Was the session START inside a load window? True when the fixed-work
    * calibration spin ran ≥ 1.5× slower than the committed quiet-box spin.
    * No committed reference (first round with the field) → false: the
    * contention-ratio and CPU-band checks stay in force, so this only
    * widens, never replaces, the existing defenses.
    */
  def startLoaded(spinQuietRef: Option[Double], spinStartWall: Double): Boolean =
    spinQuietRef.exists(q => q > 0 && spinStartWall >= 1.5 * q)

  /** Environment speed factor (≥ 1) at a query's position in the session:
    * the spin wall linearly interpolated between the start and end spins,
    * normalized by the committed quiet-box spin. A box 2.5× slow at start
    * and quiet at end (r10's driver session) gives early queries ~2.5× and
    * late queries ~1×, instead of one session-wide scale that under-acquits
    * the start and over-acquits the end.
    */
  def spinFactor(offset: Double, sessionLen: Double,
                 spinStartWall: Double, spinEndWall: Double,
                 spinQuietRef: Option[Double]): Double = {
    val quiet = spinQuietRef.filter(_ > 0)
      .getOrElse(math.min(spinStartWall, spinEndWall))
    val frac =
      if (sessionLen <= 0) 1.0
      else math.min(1.0, math.max(0.0, offset / sessionLen))
    val w = spinStartWall + (spinEndWall - spinStartWall) * frac
    math.max(1.0, w / math.max(quiet, 1e-9))
  }

  /** Should the serial re-time set widen from the worst `k` to EVERY flag?
    * Yes whenever there is evidence of a load window anywhere in the
    * session — an absolutely-slow start or mid-suite spin — or the flag
    * count itself is load-wave-shaped (r11: 32 flags from mid-run waves
    * while both spins read clean), or any single flag sits SEVERELY over
    * its band (r13 verdict #1: cv_interval_metrics_snaive measured 4× its
    * band in a session whose spins all read 1.00 — contention the suite
    * generates ITSELF leaves no spin signature, so a severe outlier is
    * treated as its own load evidence and every flag earns a clean serial
    * re-time). A widened pick list is bounded by the caller's serial-retime
    * TIME budget, not a count cap.
    */
  def widenRetimes(startLoaded: Boolean, midLoaded: Boolean,
                   flagCount: Int, flagThreshold: Int = 8,
                   severeFlag: Boolean = false): Boolean =
    startLoaded || midLoaded || flagCount >= flagThreshold || severeFlag

  /** Is any flag SEVERELY over its band (> 2× the flagging bound)? The
    * in-suite-contention signature: quiet spins, few flags, one extreme
    * outlier. Shared by Bench so the severity rule has one definition.
    */
  def severeFlag(flags: Seq[String], wall: Map[String, Double],
                 refW: Map[String, Double]): Boolean =
    flags.exists(n => refW.get(n).exists(r => wall.getOrElse(n, 0.0) > 2.0 * wallBand(r)))

  /** The serial re-time set: worst flags by absolute wall excess. On a
    * quiet session with few flags the worst `k` suffice (the rest
    * adjudicate via the CPU band); when `widen` (see [[widenRetimes]])
    * EVERY flag needs a clean measurement to be convictable, so the list
    * is uncapped — the caller bounds execution by wall-clock budget and
    * ships any budget-skipped names in the artifact.
    */
  def retimePicks(flags: Seq[String], wall: Map[String, Double],
                  refW: Map[String, Double], k: Int = 5,
                  widen: Boolean = false): Seq[String] = {
    val ordered = flags.sortBy(n => refW(n) - wall(n))
    if (widen) ordered else ordered.take(k)
  }

  /** The per-query band to COMMIT in the artifact: the session's measured
    * values, except that a `load_suspect` query keeps a CLEAN value — its
    * serial re-time where one exists (the (wall, cpu) pair from whichever
    * measurement has the lower wall), else the previously committed band
    * entry — so a loaded session can never inflate the reference band its
    * successors flag against (the r11 failure: a 526 s loaded run replaced
    * the quiet band and would have hidden genuine regressions under ~10
    * 2-5x-inflated entries). Non-suspect queries (including convicted
    * regressions) commit their honest fresh measurement.
    */
  def protectedBand(measuredW: Map[String, Double],
                    measuredC: Map[String, Double],
                    refW: Map[String, Double], refC: Map[String, Double],
                    loadSuspect: Seq[String],
                    retimed: Map[String, (Double, Double)])
      : (Map[String, Double], Map[String, Double]) = {
    val suspects = loadSuspect.toSet
    // a retime that would ITSELF flag against the previous band (the
    // whole session was loaded, retimes included) is not a clean
    // measurement — keep the previous band entry rather than commit a
    // still-inflated wall and shrink future flagging
    def retimeClean(n: String, rw: Double): Boolean =
      refW.get(n).forall(r => rw <= wallBand(r))
    val pairs = measuredW.map { case (n, mw) =>
      val mc = measuredC.get(n)
      val (w, c) =
        if (!suspects(n)) (mw, mc)
        else retimed.get(n) match {
          case Some((rw, rc)) if rw <= mw && retimeClean(n, rw) =>
            (rw, Some(rc))
          case _ =>
            // previous-band fallback is ATOMIC: committing the previous
            // wall with THIS session's inflated cpu (or vice versa) would
            // leak the loaded measurement into band_cpu and loosen future
            // cpuFlat acquittals — take the previous (wall, cpu) pair
            // together, or keep the measured pair together when the
            // previous band is incomplete
            (refW.get(n), refC.get(n)) match {
              case (Some(rw), Some(rc)) => (rw, Some(rc))
              case _                    => (mw, mc)
            }
        }
      n -> (w, c)
    }
    (pairs.map { case (n, (w, _)) => n -> w },
      pairs.collect { case (n, (_, Some(c))) => n -> c })
  }

  /** Split the flags into (loadSuspect, cpuSuspect, regressed). A flag is
    * LOAD when the best observed wall re-enters the band, the observed CPU
    * stayed flat vs the committed CPU (original measurement judged with its
    * in-session spin factor, re-time judged without), the serial re-time
    * recovered most of the inflation, the whole session measured contended
    * (`spinLoaded`), or the session was absolutely slow at the start OR
    * mid-suite spin (`loadWindowed`) and this flag never got a clean
    * re-time; only a flag failing all of those is a REGRESSION.
    *
    * (r13) CPU is the load-invariant signal by this file's own doctrine,
    * so the blanket `spinLoaded`/`unadjudicated` acquittals must not
    * dissolve a flag whose own-process CPU is WAY past even the
    * spin-scaled allowance (the r12 failure: a budget-skipped flag at 21×
    * its CPU band shipped as `load_suspect`). Such a flag ships as
    * CPU_SUSPECT — a conviction-grade verdict in the artifact; callers
    * still band-protect it like a suspect (its wall measurement is load-
    * tainted, so committing it would poison the reference band).
    */
  def classify(flags: Seq[String], wall: Map[String, Double],
               cpu: Map[String, Double], refW: Map[String, Double],
               refC: Map[String, Double],
               retimed: Map[String, (Double, Double)],
               spinLoaded: Boolean,
               /** Flags the widened retime list DROPPED for wall-clock
                 * budget. A flag was only widened onto that list because
                 * the session showed load evidence (slow spin or a
                 * load-wave-shaped flag count), so a budget-skipped flag
                 * has no credible measurement either — it stays suspect
                 * like an un-retimed load-window flag, instead of being
                 * convicted from (and committing to the band) its possibly
                 * wave-inflated wall. */
               budgetSkipped: Set[String] = Set.empty,
               /** Environment CPU-speed inflation (>= 1), e.g. the
                 * in-session DuckDB yardstick's CPU vs the committed
                 * artifact's: CPU-seconds are load-invariant under
                 * scheduling contention but NOT under frequency scaling or
                 * a shared slow box — identical single-threaded work
                 * burning 2x the CPU acquits every query's CPU inflation
                 * up to that factor. */
               cpuScale: Double = 1.0,
               /** True when any in-suite calibration spin (start or the
                 * mid-suite spin taken before the retimes) ran absolutely
                 * slow vs the committed quiet-box spin: flags measured in
                 * such a session carry no credible measurement until their
                 * serial re-time. */
               loadWindowed: Boolean = false,
               /** Per-query spin-interpolated speed factor (>= 1) for the
                 * ORIGINAL measurement's position in the session; the
                 * re-time runs at session end and is judged at factor 1. */
               spinFactorOf: String => Double = _ => 1.0):
      (Seq[String], Seq[String], Seq[String]) = {
    val cls: Seq[(String, Int)] = flags.map { n =>
      val (w2, _) = retimed.getOrElse(n, (wall(n), cpu(n)))
      val bestW = math.min(wall(n), w2)
      val inWallBand = bestW <= math.max(1.25 * refW(n), refW(n) + 0.75)
      // the yardstick cpuScale and the spin factor measure the SAME
      // physical slowdown (per-cycle speed) in overlapping windows — take
      // the larger, never the product, or a box uniformly 2x slow would
      // get a 4x band and acquit regressions its clean re-time convicts
      def cpuBand(rc: Double, f: Double): Double = {
        val scale = math.max(cpuScale, f)
        math.max(1.3 * rc * scale, rc * scale + 0.5)
      }
      // a MISSING reference CPU must not auto-acquit (exists, not forall):
      // without it the wall-based verdict stays in force, the same
      // no-silent-disable stance as the thread-CPU guard in calibrationSpin
      val fOrig = math.max(1.0, spinFactorOf(n))
      val cpuFlat = refC.get(n).exists { rc =>
        cpu.get(n).exists(_ <= cpuBand(rc, fOrig)) ||
          retimed.get(n).exists(_._2 <= cpuBand(rc, 1.0))
      }
      val recovered = retimed.contains(n) && w2 <= 0.67 * wall(n)
      // no clean measurement exists for a load-window flag (or a
      // budget-skipped widened flag) without a re-time — it stays
      // suspect; the next quiet session adjudicates
      val unadjudicated =
        (loadWindowed || budgetSkipped(n)) && !retimed.contains(n)
      // UN-retimed flag whose own-process CPU sits 5x past even the
      // spin-scaled allowance: blanket load evidence cannot acquit this
      // (the band already includes the measured slowdown; JIT starvation
      // under waves reaches a few x, not 5x past a widened band — r12's
      // dissolved conviction was 6.3x). A RETIMED flag adjudicates through
      // the existing rules instead: its serial measurement is strictly
      // better evidence than this heuristic.
      val cpuBlown = !retimed.contains(n) && refC.get(n).exists { rc =>
        cpu.get(n).exists(_ > 5.0 * cpuBand(rc, fOrig))
      }
      val acquitted = inWallBand || cpuFlat || recovered ||
        ((spinLoaded || unadjudicated) && !cpuBlown)
      n -> (if (acquitted) 0 else if (cpuBlown) 1 else 2)
    }
    (cls.collect { case (n, 0) => n },
      cls.collect { case (n, 1) => n },
      cls.collect { case (n, 2) => n })
  }
}
