package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-type lint (tools/check_oracle.py) must stay driver-strict:
  * its --selftest seeds the exact bug shapes that escaped previous rounds
  * (a window-SUM HUGEINT like q87's, a bare-literal DECIMAL like r2's)
  * and asserts the lint goes red on them and green once CAST-disciplined.
  *
  * The lint itself needs the driver-side python3+duckdb toolchain; when
  * that's absent (a bare JVM CI box) the test cancels rather than fails —
  * the gate it guards only runs where that toolchain exists anyway.
  */
class OracleLintSpec extends AnyFunSuite {

  test("check_oracle.py --selftest: seeded HUGEINT/DECIMAL go red, CAST green") {
    val probe =
      try new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor()
      catch { case _: java.io.IOException => -1 }
    assume(probe == 0, "python3+duckdb unavailable; lint runs driver-side only")

    val p = new ProcessBuilder("python3", "tools/check_oracle.py", "--selftest")
      .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .redirectErrorStream(true)
      .start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val exit = p.waitFor()
    assert(exit == 0, s"selftest failed (exit $exit):\n$out")
    assert(out.contains("selftest PASS"), out)
  }
}
