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
    val (load, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 36.0), Map("b" -> 110.0), refW, refC,
      retimed = Map.empty, spinLoaded = false)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("a recovering serial re-time classifies as load even when CPU inflated") {
    // ggbm-style: JIT starvation inflated CPU 5x AND wall 3x; the
    // end-of-session re-run recovered -> environment, not code
    val (load, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (11.0, 120.0)), spinLoaded = false)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("persistent wall+CPU inflation on a quiet box convicts a regression") {
    val (load, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (29.0, 490.0)), spinLoaded = false)
    assert(load.isEmpty && reg == Seq("b"))
  }

  test("a contended session never convicts — flags stay suspect") {
    val (load, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, refC,
      retimed = Map("b" -> (29.0, 490.0)), spinLoaded = true)
    assert(load == Seq("b") && reg.isEmpty)
  }

  test("missing committed CPU column must NOT auto-acquit as load") {
    // with no CPU reference the cpu test cannot run; the wall-based
    // verdict stays in force (fail closed: surface for a human look)
    val (load, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 30.0), Map("b" -> 500.0), refW, Map.empty,
      retimed = Map.empty, spinLoaded = false)
    assert(reg == Seq("b") && load.isEmpty)
  }

  test("environment cpu-speed inflation acquits via the yardstick scale") {
    // cpu doubled (10 vs ref 4.9) everywhere because the BOX is 2x slower
    // per cycle (the in-session DuckDB yardstick shows the same 2x): with
    // cpuScale = 2 the flag classifies load, with 1 it would convict
    val (load, reg) = LoadClassify.classify(Seq("b"),
      Map("b" -> 3.0), Map("b" -> 10.0),
      Map("b" -> 1.8), Map("b" -> 4.9),
      retimed = Map.empty, spinLoaded = false, cpuScale = 2.0)
    assert(load == Seq("b") && reg.isEmpty)
    val (_, reg1) = LoadClassify.classify(Seq("b"),
      Map("b" -> 3.0), Map("b" -> 10.0),
      Map("b" -> 1.8), Map("b" -> 4.9),
      retimed = Map.empty, spinLoaded = false)
    assert(reg1 == Seq("b"))
  }
}
