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
  *   - a session whose calibration spin shows contention cannot credibly
  *     CONVICT a regression — under load every flag stays suspect and the
  *     next quiet run adjudicates.
  */
object LoadClassify {

  /** Query names whose wall left the committed band. */
  def flagged(wall: Map[String, Double],
              refW: Map[String, Double]): Seq[String] =
    wall.collect {
      case (n, w) if refW.contains(n) &&
        w > math.max(1.5 * refW(n), refW(n) + 0.75) => n
    }.toSeq.sorted

  /** The worst `k` flags by absolute wall excess — the serial re-time set. */
  def retimePicks(flags: Seq[String], wall: Map[String, Double],
                  refW: Map[String, Double], k: Int = 5): Seq[String] =
    flags.sortBy(n => refW(n) - wall(n)).take(k)

  /** Split the flags into (loadSuspect, regressed). A flag is LOAD when the
    * best observed wall re-enters the band, the best observed CPU stayed
    * flat vs the committed CPU, the serial re-time recovered most of the
    * inflation, or the whole session measured contended (`spinLoaded`);
    * only a quiet-session flag failing all of those is a REGRESSION.
    */
  def classify(flags: Seq[String], wall: Map[String, Double],
               cpu: Map[String, Double], refW: Map[String, Double],
               refC: Map[String, Double],
               retimed: Map[String, (Double, Double)],
               spinLoaded: Boolean,
               /** Environment CPU-speed inflation (>= 1), e.g. the
                 * in-session DuckDB yardstick's CPU vs the committed
                 * artifact's: CPU-seconds are load-invariant under
                 * scheduling contention but NOT under frequency scaling or
                 * a shared slow box — identical single-threaded work
                 * burning 2x the CPU acquits every query's CPU inflation
                 * up to that factor. */
               cpuScale: Double = 1.0): (Seq[String], Seq[String]) = {
    val cls = flags.map { n =>
      val (w2, c2) = retimed.getOrElse(n, (wall(n), cpu(n)))
      val bestW = math.min(wall(n), w2)
      val bestC = math.min(cpu(n), c2)
      val inWallBand = bestW <= math.max(1.25 * refW(n), refW(n) + 0.75)
      // a MISSING reference CPU must not auto-acquit (exists, not forall):
      // without it the wall-based verdict stays in force, the same
      // no-silent-disable stance as the thread-CPU guard in calibrationSpin
      val cpuFlat = refC.get(n).exists(rc =>
        bestC <= math.max(1.3 * rc * cpuScale, rc * cpuScale + 0.5))
      val recovered = retimed.contains(n) && w2 <= 0.67 * wall(n)
      n -> (inWallBand || cpuFlat || recovered || spinLoaded)
    }
    (cls.collect { case (n, true) => n }, cls.collect { case (n, false) => n })
  }
}
