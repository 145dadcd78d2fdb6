package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.LoadClassify

/** The bench's load-vs-regression round signal, pinned as plain unit
  * logic: the judge-facing artifact classification must keep its
  * semantics through future Bench refactors.
  */
class LoadClassifySpec extends AnyFunSuite {

  private val refW = Map("a" -> 2.0, "b" -> 10.0, "c" -> 0.1, "d" -> 4.0)
  private val refC = Map("a" -> 20.0, "b" -> 100.0, "c" -> 1.0, "d" -> 40.0)

  test("flagging uses the 1.5x-or-+0.75s committed band") {
    val wall = Map(
      "a" -> 2.9,  // < 1.5x and < +0.75 -> in band
      "b" -> 16.0, // > 1.5x -> flagged
      "c" -> 0.2,  // 2x ref but tiny absolute -> in band (+0.75 floor)
      "d" -> 6.5,  // 1.6x and +2.5s -> flagged
      "new" -> 99.0) // not in the committed band -> never flagged
    assert(LoadClassify.flagged(wall, refW) == Seq("b", "d"))
  }

  test("retime picks the worst absolute wall excess first") {
    val wall = Map("a" -> 9.0, "b" -> 16.0, "d" -> 12.0) // excess: 7, 6, 8
    val flags = Seq("a", "b", "d")
    assert(LoadClassify.retimePicks(flags, wall, refW, k = 2) == Seq("d", "a"))
  }

  test("wall inflation with flat CPU classifies as load") {
    // the r8/r9 poster child: wall 3.6x, CPU barely moved
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 36.0), Map("b" -> 110.0), refW, refC,
      retimed = Map.empty, spinLoaded = false)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("a recovering serial re-time classifies as load even when CPU inflated") {
    // ggbm-style: JIT starvation inflated CPU 5x AND wall 3x; the
    // end-of-session re-run recovered -> environment, not code
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (11.0, 120.0)), spinLoaded = false)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("persistent wall+CPU inflation on a quiet box convicts a regression") {
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (29.0, 490.0)), spinLoaded = false)
    assert(load.isEmpty && reg == Seq("b"))
  }

  test("a contended session never convicts — flags stay suspect") {
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (29.0, 490.0)), spinLoaded = true)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("missing committed CPU column must NOT auto-acquit as load") {
    // with no CPU reference the cpu test cannot run; the wall-based
    // verdict stays in force (fail closed: surface for a human look)
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, Map.empty,
      retimed = Map.empty, spinLoaded = false)
    assert(reg == Seq("b") && load.isEmpty)
  }

  test("a start-spin >= 1.5x the committed quiet spin marks the window") {
    // r10 driver session: quiet spin 0.84 s, start spin 2.07 s
    assert(LoadClassify.startLoaded(Some(0.84), 2.07))
    assert(!LoadClassify.startLoaded(Some(0.84), 1.1))
    // no committed reference (first round with the field) -> fail open to
    // the existing defenses, never a free acquittal
    assert(!LoadClassify.startLoaded(None, 9.9))
  }

  test("spinFactor interpolates the box speed across the session") {
    // box 2.5x slow at start, quiet at end (quiet ref 0.8): an early query
    // gets ~2.5x allowance, a mid-session one ~1.75x, a late one ~1x
    val f0 = LoadClassify.spinFactor(0.0, 400.0, 2.0, 0.8, Some(0.8))
    val fMid = LoadClassify.spinFactor(200.0, 400.0, 2.0, 0.8, Some(0.8))
    val fEnd = LoadClassify.spinFactor(400.0, 400.0, 2.0, 0.8, Some(0.8))
    assert(math.abs(f0 - 2.5) < 1e-9)
    assert(math.abs(fMid - 1.75) < 1e-9)
    assert(math.abs(fEnd - 1.0) < 1e-9)
    // a box FASTER than the committed quiet spin clamps to 1 (a fast spin
    // must not shrink the band and manufacture convictions)
    assert(LoadClassify.spinFactor(0.0, 400.0, 0.5, 0.5, Some(0.8)) == 1.0)
  }

  test("a load-window session never convicts an un-retimed flag") {
    // the r10 false-conviction shape: early-alphabet queries ran in the
    // slow window, wall AND cpu both ~2x the committed band, spin ratio
    // quiet (wall/cpu ~ 1 on a uniformly slow box), no retime reached them
    val (load, _, reg) = LoadClassify.classify(Seq("a", "b"),
      Map("a" -> 4.0, "b" -> 20.0), Map("a" -> 44.0, "b" -> 220.0),
      refW, refC, retimed = Map.empty, spinLoaded = false,
      cpuScale = 1.0, loadWindowed = true)
    assert(load == Seq("a", "b") && reg.isEmpty)
  }

  test("a load-window flag whose clean re-time stays out of band convicts") {
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (29.0, 490.0)), spinLoaded = false,
      cpuScale = 1.0, loadWindowed = true)
    assert(load.isEmpty && reg == Seq("b"))
  }

  test("the per-query spin factor widens the CPU band for early queries") {
    // cpu 2x the committed band, but the query ran while the interpolated
    // spin said the box was 2.2x slow -> acquitted; the same numbers at
    // factor 1 (late in the session) convict
    def run(f: Double) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 200.0), refW, refC,
      retimed = Map.empty, spinLoaded = false, cpuScale = 1.0,
      loadWindowed = false, spinFactorOf = _ => f)
    val (load, _, reg) = run(2.2)
    assert(load == Seq("b") && reg.isEmpty)
    val (load1, _, reg1) = run(1.0)
    assert(load1.isEmpty && reg1 == Seq("b"))
  }

  test("a re-time judged clean at factor 1 acquits even if the original was hot") {
    // original cpu 5x (slow window), retimed wall still above the band but
    // retimed cpu back inside the committed band -> load, not regression
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (28.0, 105.0)), spinLoaded = false,
      cpuScale = 1.0, loadWindowed = true)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("retimePicks widens to EVERY flag, uncapped, when widen is set") {
    // r11: 32 flags from mid-run load waves, but the old cap of 16 left
    // 27 suspects without a clean measurement for a full round
    val wall = (1 to 32).map(i => s"q$i" -> 10.0).toMap
    val ref = (1 to 32).map(i => s"q$i" -> 1.0).toMap
    val flags = wall.keys.toSeq.sorted
    assert(LoadClassify.retimePicks(flags, wall, ref).size == 5)
    assert(LoadClassify.retimePicks(flags, wall, ref, widen = true).size == 32)
  }

  test("retimes widen on a slow start, a slow mid-suite spin, or many flags") {
    assert(LoadClassify.widenRetimes(startLoaded = true, midLoaded = false, 2))
    assert(LoadClassify.widenRetimes(startLoaded = false, midLoaded = true, 2))
    // r11's exact shape: both spins clean, 32 mid-wave flags
    assert(LoadClassify.widenRetimes(startLoaded = false, midLoaded = false, 32))
    assert(!LoadClassify.widenRetimes(startLoaded = false, midLoaded = false, 3))
  }

  test("a severe over-band flag widens retimes even on a quiet session (r13 #1)") {
    // the r13 driver shape: spins all 1.00, few flags, one row at 4x its
    // band (cv_interval_metrics_snaive 14.47 vs band 3.63) — in-suite
    // contention leaves no spin signature, so severity itself widens
    val wall = Map("a" -> 14.47, "b" -> 4.0)
    val refW = Map("a" -> 3.63, "b" -> 3.2)
    assert(LoadClassify.severeFlag(Seq("a"), wall, refW)) // 14.47 > 2*5.445
    assert(!LoadClassify.severeFlag(Seq("b"), wall, refW)) // 4.0 < 2*4.8
    assert(LoadClassify.widenRetimes(startLoaded = false, midLoaded = false, 2,
      severeFlag = LoadClassify.severeFlag(Seq("a", "b"), wall, refW)))
    assert(!LoadClassify.widenRetimes(startLoaded = false, midLoaded = false, 2,
      severeFlag = LoadClassify.severeFlag(Seq("b"), wall, refW)))
  }

  test("a loaded session's committed band preserves quiet values for un-retimed suspects") {
    // the r11 defect: a loaded run overwrote the committed band with ~10
    // 2-5x-inflated walls, so genuine regressions under them would never
    // flag again. load_suspect without a retime -> previous band entry;
    // with a retime -> the clean (wall, cpu) pair; non-suspects (incl.
    // convicted regressions) -> the honest fresh measurement.
    val measuredW = Map("a" -> 9.0, "b" -> 33.0, "c" -> 0.09, "new" -> 1.0)
    val measuredC = Map("a" -> 90.0, "b" -> 300.0, "c" -> 0.9, "new" -> 10.0)
    val (bw, bc) = LoadClassify.protectedBand(measuredW, measuredC,
      refW, refC, loadSuspect = Seq("a", "b"),
      retimed = Map("b" -> (11.0, 105.0)))
    assert(bw("a") == 2.0 && bc("a") == 20.0) // un-retimed suspect: previous band
    assert(bw("b") == 11.0 && bc("b") == 105.0) // retimed suspect: clean pair
    assert(bw("c") == 0.09 && bc("c") == 0.9) // quiet query: fresh measurement
    assert(bw("new") == 1.0 && bc("new") == 10.0) // no previous band: fresh
  }

  test("protectedBand commits a suspect only from a clean min-wall retime pair") {
    // a retime SLOWER than the original is not the session's best
    // evidence — the suspect keeps the previous committed band entry,
    // and a clean retime commits its own (wall, cpu) PAIR unmixed
    val (bw, bc) = LoadClassify.protectedBand(
      Map("a" -> 3.0), Map("a" -> 30.0), refW, refC,
      loadSuspect = Seq("a"), retimed = Map("a" -> (5.0, 21.0)))
    assert(bw("a") == 2.0 && bc("a") == 20.0)
  }

  test("protectedBand refuses a retime that would itself flag against the band") {
    // sustained-load session: measured 10 s, retime 8 s — still 4x the
    // committed 2 s band. Committing 8 would shrink future flagging to
    // >12 s and hide genuine regressions; keep the previous band entry.
    val (bw, bc) = LoadClassify.protectedBand(
      Map("a" -> 10.0), Map("a" -> 90.0), refW, refC,
      loadSuspect = Seq("a"), retimed = Map("a" -> (8.0, 75.0)))
    assert(bw("a") == 2.0 && bc("a") == 20.0)
    // a retime INSIDE the flag band commits normally (ratchets real wins)
    val (bw2, bc2) = LoadClassify.protectedBand(
      Map("a" -> 10.0), Map("a" -> 90.0), refW, refC,
      loadSuspect = Seq("a"), retimed = Map("a" -> (1.4, 13.0)))
    assert(bw2("a") == 1.4 && bc2("a") == 13.0)
  }

  test("a budget-skipped widened flag stays suspect even with quiet spins") {
    // the r11 shape with a wave that MISSES every spin: 8+ flags widen
    // the retime list, the budget drops this one, spins read clean —
    // without a clean measurement it must defer, not convict from (and
    // commit to the band) its wave-inflated wall
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map.empty, spinLoaded = false,
      budgetSkipped = Set("b"))
    assert(load == Seq("b") && reg.isEmpty)
    // the same flag WITH a clean-failing retime still convicts
    val (load2, _, reg2) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (29.0, 490.0)), spinLoaded = false,
      budgetSkipped = Set.empty)
    assert(load2.isEmpty && reg2 == Seq("b"))
  }

  test("cpuScale and spinFactor take the max, never the product") {
    // a box uniformly 2x slow gives cpuScale ~= 2 AND spinFactor ~= 2 —
    // the same physical slowdown measured twice. A real regression whose
    // CPU is 3.6x the committed band must NOT slip under a 4x product
    // band; the clean re-time (judged at factor 1 but still x cpuScale)
    // convicts it
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 40.0), Map("b" -> 360.0),
      Map("b" -> 10.0), Map("b" -> 100.0),
      retimed = Map("b" -> (39.0, 355.0)), spinLoaded = false,
      cpuScale = 2.0, loadWindowed = false, spinFactorOf = _ => 2.0)
    assert(load.isEmpty && reg == Seq("b"))
    // the same numbers under a product band (5.2x) would have acquitted:
    // prove the max band still acquits genuine environment inflation
    val (load2, _, reg2) = LoadClassify.classify(Seq("b"),
      Map("b" -> 40.0), Map("b" -> 250.0),
      Map("b" -> 10.0), Map("b" -> 100.0),
      retimed = Map.empty, spinLoaded = false,
      cpuScale = 2.0, loadWindowed = false, spinFactorOf = _ => 2.0)
    assert(load2 == Seq("b") && reg2.isEmpty)
  }

  test("a budget-skipped flag with blown CPU ships as cpu_suspect, not load") {
    // the r12 failure: cv_intervals_diff_scaler at 21x the committed CPU
    // band was budget-skipped and dissolved into `unadjudicated` — the
    // driver artifact convicted only an unrelated query. CPU is the
    // load-invariant signal: 20x CPU on an un-retimed flag must ship as a
    // conviction-grade verdict.
    val (load, cpuS, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 2000.0), refW, refC, // cpu 20x ref
      retimed = Map.empty, spinLoaded = false,
      budgetSkipped = Set("b"))
    assert(load.isEmpty && cpuS == Seq("b") && reg.isEmpty)
    // spinLoaded must not dissolve it either
    val (load2, cpuS2, reg2) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 2000.0), refW, refC,
      retimed = Map.empty, spinLoaded = true)
    assert(load2.isEmpty && cpuS2 == Seq("b") && reg2.isEmpty)
  }

  test("replay of the r12 driver session convicts cv_intervals_diff_scaler") {
    // the driver's exact numbers: wall 170.5 s vs band 9.9, CPU 2,813 s vs
    // band 134.7, session start-spin 2.15 vs quiet 0.84 (loadWindowed,
    // spin factor ~2.56 at the query's position), budget-skipped
    val n = "cv_intervals_diff_scaler"
    val (load, cpuS, reg) = LoadClassify.classify(Seq(n),
      Map(n -> 170.5), Map(n -> 2813.0),
      Map(n -> 9.9), Map(n -> 134.7),
      retimed = Map.empty, spinLoaded = false,
      budgetSkipped = Set(n), cpuScale = 1.0, loadWindowed = true,
      spinFactorOf = _ => 2.56)
    assert(load.isEmpty && cpuS == Seq(n) && reg.isEmpty)
    // and the band stays protected: the 170.5 s wall must not commit
    val (bw, bc) = LoadClassify.protectedBand(
      Map(n -> 170.5), Map(n -> 2813.0),
      Map(n -> 9.9), Map(n -> 134.7),
      loadSuspect = Seq(n), retimed = Map.empty)
    assert(bw(n) == 9.9 && bc(n) == 134.7)
  }

  test("a retimed flag never routes to cpu_suspect — its retime adjudicates") {
    // the judge's own r12 adjudication shape: a quiet serial retime landed
    // on the band (11.3 s / 47 CPU), so the flag is load, not a conviction
    val (load, cpuS, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 170.0), Map("b" -> 2800.0), refW, refC,
      retimed = Map("b" -> (11.3, 47.0)), spinLoaded = false)
    assert(load == Seq("b") && cpuS.isEmpty && reg.isEmpty)
  }

  test("wave-level CPU inflation (under 5x band) still defers via unadjudicated") {
    // JIT starvation under waves reaches a few x (r9: observed on ggbm) —
    // a budget-skipped flag at ~3.8x the band stays load_suspect
    val (load, cpuS, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map.empty, spinLoaded = false, budgetSkipped = Set("b"))
    assert(load == Seq("b") && cpuS.isEmpty && reg.isEmpty)
  }

  test("environment cpu-speed inflation acquits via the yardstick scale") {
    // cpu doubled (10 vs ref 4.9) everywhere because the BOX is 2x slower
    // per cycle (the in-session DuckDB yardstick shows the same 2x): with
    // cpuScale = 2 the flag classifies load, with 1 it would convict
    val (load, _, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 3.0), Map("b" -> 10.0),
      Map("b" -> 1.8), Map("b" -> 4.9),
      retimed = Map.empty, spinLoaded = false, cpuScale = 2.0)
    assert(load == Seq("b") && reg.isEmpty)
    val (_, _, reg1) = LoadClassify.classify(Seq("b"),
      Map("b" -> 3.0), Map("b" -> 10.0),
      Map("b" -> 1.8), Map("b" -> 4.9),
      retimed = Map.empty, spinLoaded = false)
    assert(reg1 == Seq("b"))
  }
}
