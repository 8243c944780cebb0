package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round bench regression gate: threshold semantics, the
  * absolute-drift noise floor, numeric (not lexicographic) round file
  * selection, sf guarding, malformed-input degradation, and the
  * contended flag boundary. Pure unit tests — no SparkSession.
  */
class BenchGateSpec extends AnyFunSuite {

  test("regressions flags >1.5x unit drift above the absolute floor") {
    val prev = Map("a" -> 10.0, "b" -> 10.0, "c" -> 10.0)
    val cur = Map("a" -> 16.0, "b" -> 14.0, "c" -> 9.0)
    val r = BenchGate.regressions(cur, prev)
    assert(r.map(_._1) == Seq("a"), "only the 1.6x query trips the 1.5x gate")
    assert(math.abs(r.head._2 - 1.6) < 1e-9)
  }

  test("sub-floor absolute drift never flags, whatever the ratio") {
    // 0.3 -> 0.6 units is 2x but only 0.3 units of drift (~80 ms): noise
    val r = BenchGate.regressions(Map("tiny" -> 0.6), Map("tiny" -> 0.3))
    assert(r.isEmpty)
    // same ratio with a whole-probe drift DOES flag
    val r2 = BenchGate.regressions(Map("big" -> 6.0), Map("big" -> 3.0))
    assert(r2.map(_._1) == Seq("big"))
  }

  test("new, retired, and improved queries are never flagged") {
    val r = BenchGate.regressions(
      cur = Map("new" -> 100.0, "faster" -> 2.0),
      prev = Map("retired" -> 100.0, "faster" -> 50.0))
    assert(r.isEmpty)
  }

  test("regressions sort worst-first, ties broken by name") {
    val prev = Map("a" -> 10.0, "b" -> 10.0, "z" -> 10.0)
    val cur = Map("a" -> 20.0, "b" -> 30.0, "z" -> 20.0)
    val r = BenchGate.regressions(cur, prev)
    assert(r.map(_._1) == Seq("b", "a", "z"))
  }

  test("uniform session drift never flags; a query moving against the field does") {
    // 30 queries all 1.6x slower — the round-18 measured regime: the
    // round-START code re-benched against the prior round's units
    // drifted individual queries 1.5-1.8x with zero code change. The
    // field-wide move must not flag...
    val prev = (1 to 30).map(i => s"q$i" -> 10.0).toMap
    val drifted = prev.view.mapValues(_ * 1.6).toMap
    assert(BenchGate.sessionDrift(drifted, prev) === 1.6)
    assert(BenchGate.regressions(drifted, prev).isEmpty)
    // ...but one query at 4x against the same field grades as 4/1.6 = 2.5x
    val oneBad = drifted + ("q7" -> 40.0)
    val r = BenchGate.regressions(oneBad, prev)
    assert(r.map(_._1) == Seq("q7"))
    assert(math.abs(r.head._2 - 2.5) < 1e-6)
  }

  test("sessionDrift falls back to 1.0 below the common-query minimum (filtered runs)") {
    val prev = (1 to 5).map(i => s"q$i" -> 10.0).toMap
    val cur = prev.view.mapValues(_ * 1.6).toMap
    assert(BenchGate.sessionDrift(cur, prev) === 1.0)
    // and the raw ratios then grade directly — all five flag
    assert(BenchGate.regressions(cur, prev).size === 5)
  }

  test("loadEnvelope: per-query max over the last RefWindow rounds, sf-filtered; override bypasses") {
    val dir = Files.createTempDirectory("benchenv")
    def write(r: Int, sf: String, us: (String, Double)*): Unit =
      Files.writeString(dir.resolve(s"BENCH_UNITS_r$r.json"),
        s"""{"sf":"$sf","units":{${us.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""")
    try {
      write(12, "/sfA", "q1" -> 50.0)            // outside the 3-round window
      write(14, "/sfB", "q1" -> 100.0)           // wrong sf, never joins
      write(15, "/sfA", "q1" -> 5.0)
      write(16, "/sfA", "q1" -> 9.0, "q2" -> 2.0)
      write(17, "/sfA", "q1" -> 6.0)
      val env = BenchGate.loadEnvelope(dir, None, "/sfA").get
      assert(env.round === 17)
      assert(env.units === Map("q1" -> 9.0, "q2" -> 2.0),
        "q1 takes the window max 9.0, not r17's 6.0 nor r12's out-of-window 50.0")
      // a query slower than every recent round still flags through it
      assert(BenchGate.regressions(Map("q1" -> 20.0), env.units).map(_._1) === Seq("q1"))
      // ...but one that was that slow in ANY recent round does not
      assert(BenchGate.regressions(Map("q1" -> 9.5), env.units).isEmpty)
      // override keeps single-file semantics
      val o = BenchGate.loadEnvelope(dir, Some("BENCH_UNITS_r15.json"), "/sfA").get
      assert(o.units === Map("q1" -> 5.0))
    } finally {
      Files.list(dir).forEach(p => Files.delete(p)); Files.delete(dir)
    }
  }

  test("latestUnitsFile picks the numerically highest round (r9 < r17)") {
    val dir = Files.createTempDirectory("benchgate")
    try {
      Files.writeString(dir.resolve("BENCH_UNITS_r9.json"), "{}")
      Files.writeString(dir.resolve("BENCH_UNITS_r17.json"), "{}")
      Files.writeString(dir.resolve("BENCH_r99.json"), "{}") // not a units file
      val hit = BenchGate.latestUnitsFile(dir)
      assert(hit.map(_._1).contains(17))
      assert(hit.map(_._2.getFileName.toString).contains("BENCH_UNITS_r17.json"))
    } finally {
      Files.list(dir).forEach(p => Files.delete(p)); Files.delete(dir)
    }
  }

  test("parseUnits reads sf + units and degrades to None on malformed input") {
    val ok = BenchGate.parseUnits(17,
      """{"sf":"/data/sf0.1","probe_med":0.27,"units":{"q1":1.5,"q2":3}}""")
    assert(ok.contains(BenchGate.PrevUnits(17, "/data/sf0.1",
      Map("q1" -> 1.5, "q2" -> 3.0))))
    assert(BenchGate.parseUnits(1, "not json").isEmpty)
    assert(BenchGate.parseUnits(1, """{"units":{"q":1}}""").isEmpty, "no sf")
    assert(BenchGate.parseUnits(1, """{"sf":"x","units":{}}""").isEmpty, "empty units")
  }

  test("loadLatest: override path wins; sf mismatch is the caller's guard") {
    val dir = Files.createTempDirectory("benchgate")
    try {
      Files.writeString(dir.resolve("BENCH_UNITS_r3.json"),
        """{"sf":"/data/sf0.1","units":{"q":1}}""")
      Files.writeString(dir.resolve("scratch.json"),
        """{"sf":"/data/sf0.01","units":{"q":9}}""")
      val scanned = BenchGate.loadLatest(dir)
      assert(scanned.exists(p => p.round == 3 && p.units == Map("q" -> 1.0)))
      val overridden = BenchGate.loadLatest(dir, Some("scratch.json"))
      assert(overridden.exists(p => p.sf == "/data/sf0.01" && p.round == -1))
      assert(BenchGate.loadLatest(dir, Some("absent.json")).isEmpty)
    } finally {
      Files.list(dir).forEach(p => Files.delete(p)); Files.delete(dir)
    }
  }

  test("committed BENCH_UNITS_r17.json parses and covers the carried set") {
    val p = java.nio.file.Paths.get("BENCH_UNITS_r17.json")
    assume(Files.isReadable(p), "run from the repo root")
    val parsed = BenchGate.parseUnits(17, Files.readString(p))
    assert(parsed.nonEmpty, "committed units file must stay parseable")
    assert(parsed.get.units.size == 257)
    assert(parsed.get.sf.endsWith("sf0.1"))
  }

  test("contended flags probe max/med > 2.0, not the r17-benign 1.44") {
    assert(!BenchGate.contended(probeMax = 0.39, probeMed = 0.27))
    assert(BenchGate.contended(probeMax = 0.60, probeMed = 0.27))
    assert(!BenchGate.contended(probeMax = 1.0, probeMed = 0.0), "degenerate med")
  }

  test("a deliberate slowdown in a scratch reference trips the gate") {
    // simulate the verdict's acceptance test: take real r17 units, halve
    // one query's reference, and assert exactly that query self-reports
    val real = BenchGate.loadLatest(java.nio.file.Paths.get("."))
    assume(real.nonEmpty, "run from the repo root")
    val units = real.get.units
    val victim = units.maxBy(_._2)._1 // the largest-unit query: floor-safe
    val doctored = units.updated(victim, units(victim) / 2.0)
    val r = BenchGate.regressions(units, doctored)
    assert(r.map(_._1) == Seq(victim))
    assert(BenchGate.regressions(units, units).isEmpty, "self-compare is clean")
  }
}
