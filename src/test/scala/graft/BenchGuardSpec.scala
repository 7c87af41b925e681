package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 hardening (VERDICT r09 items 5+6): pins for the bench
  * harness's two honesty mechanisms.
  *
  *  1. PRE-FLIGHT GATE — the driver's r09 bench spent 26 minutes inside
  *     a window already below envelope at the start (cpu 444 Mops, par
  *     10.5k); the end-of-run guard quarantined the numbers but not the
  *     time. `Bench.withinEnvelope` is the single decision function both
  *     the pre-flight refusal and the end-of-run promotion share; this
  *     spec pins its verdicts on the historically-observed windows and
  *     lints that `main` actually wires the refusal (abort JSON +
  *     non-zero exit) so a refactor can't silently drop the gate.
  *
  *  2. HONEST FORCING — round 9 measured a 170× under-count when
  *     `.count()` timing let Catalyst prune the timed work (q274's left
  *     join deleted wholesale). `graft.Force` executes via
  *     `queryExecution.toRdd` so the plan runs AS WRITTEN; the lint here
  *     pins that Bench/Profile time through Force and that nobody
  *     reintroduces `.count()` on a timed query result.
  */
class BenchGuardSpec extends AnyFunSuite {

  // ---- 1. envelope decision function ------------------------------------

  test("withinEnvelope: r09 driver window (io ok, cpu 444, par 10.5k) refuses") {
    // the exact axes the r09 driver bench started in — the motivating case
    assert(!Bench.withinEnvelope(430.0, 444.0, 10500.0, 32))
  }

  test("withinEnvelope: r08 collapsed window (cpu_end 261 Mops) refuses") {
    assert(!Bench.withinEnvelope(476.0, 261.0, 16000.0, 32))
  }

  test("withinEnvelope: io writeback throttle (88 MB/s) refuses") {
    assert(!Bench.withinEnvelope(88.0, 478.0, 16719.0, 32))
  }

  test("withinEnvelope: r08 par-loss window (cpu healthy, par high/low) refuses") {
    // single-thread cpu read HEALTHY (514-520 Mops) while parallel
    // throughput was gone — the axis round 8 proved discriminating
    assert(!Bench.withinEnvelope(450.0, 514.0, 10900.0, 32))
    assert(!Bench.withinEnvelope(450.0, 514.0, 21500.0, 32))
  }

  test("withinEnvelope: healthy reference window passes") {
    assert(Bench.withinEnvelope(457.0, 478.0, 16719.0, 32))
    // band edges are inclusive
    assert(Bench.withinEnvelope(300.0, 470.0, 11000.0, 32))
    assert(Bench.withinEnvelope(300.0, 470.0, 21000.0, 32))
  }

  test("withinEnvelope: par band gates only at the 32-thread baseline shape") {
    // on any other host shape the par axis is record-only (no committed
    // baseline band for that shape) — io+cpu still gate
    assert(Bench.withinEnvelope(450.0, 500.0, 5000.0, 16))
    assert(!Bench.withinEnvelope(450.0, 400.0, 5000.0, 16))
  }

  // ---- source lints ------------------------------------------------------

  private def source(rel: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), rel)
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("lint: Bench.main wires the pre-flight refusal path") {
    val b = source("src/main/scala/graft/Bench.scala")
    assert(b.contains("\"preflight_abort\":true"),
      "pre-flight abort must emit a parseable JSON marker")
    assert(b.contains("bench_preflight_abort.json"),
      "pre-flight abort must leave a durable sidecar")
    assert(b.contains("sys.exit(2)"),
      "pre-flight abort must exit non-zero so the driver sees a refusal")
    assert(b.contains("withinEnvelope(ioMbps, cpuMops, cpuParMops"),
      "the refusal must use the shared envelope decision function")
  }

  // ---- 2. honest-forcing lint -------------------------------------------

  test("lint: Force executes via toRdd, never a parent count aggregate") {
    val f = source("src/main/scala/graft/Force.scala")
    assert(f.contains("queryExecution.toRdd"),
      "Force must execute the plan AS WRITTEN (toRdd), not under an " +
        "Aggregate whose column pruning deletes timed work")
  }

  test("lint: Bench times queries through Force, not .count()") {
    val b = source("src/main/scala/graft/Bench.scala")
    assert(b.contains("Force(fn(spark, sfDir))"),
      "Bench's timed region must force via graft.Force")
    assert(!b.contains("fn(spark, sfDir).count"),
      ".count() timing lets Catalyst prune timed work (measured 170× " +
        "under-count on q274's twin in round 9)")
  }

  test("lint: Profile's bench-mirror mode times through Force") {
    val p = source("src/main/scala/graft/Profile.scala")
    assert(p.contains("Force(q.run(spark, sfDir))"),
      "Profile queries mode must force via graft.Force")
    assert(!p.contains("q.run(spark, sfDir).count"),
      "no .count() timing on registered queries")
  }
}
