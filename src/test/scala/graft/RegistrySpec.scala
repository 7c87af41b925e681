package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract over the registry itself: names key the
  * correctness artifacts (CORRECTNESS_r*.json, the Verify dump dirs,
  * SPARK_GRAFT_ONLY prefixes), so they must be unique, well-formed and
  * documented; every oracle must be non-empty SQL.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("query names follow the qNN_snake_case convention") {
    val bad = Registry.all.map(_.name)
      .filterNot(_.matches("q[0-9]+[a-z]?_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }

  test("every registered query carries a non-empty oracle") {
    // rows-only registration exists as an escape hatch, but the gate's
    // value is the hash compare — nothing currently ships without one
    val missing = Registry.all.filter(q =>
      q.oracle.isEmpty || q.oracle.exists(_.trim.isEmpty)).map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: ${missing.mkString(", ")}")
  }

  test("the registry is large enough that a family went missing if it shrinks") {
    assert(Registry.all.size >= 146, s"registry shrank to ${Registry.all.size}")
  }
}
