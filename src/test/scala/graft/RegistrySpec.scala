package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the registry and its oracle stay in exact
  * 1:1 correspondence (a key typo on either side silently downgrades the
  * driver's check to rows-only), and the flagship entry runs.
  */
class RegistrySpec extends AnyFunSuite {

  test("every registry query has an oracle twin and vice versa") {
    val q = Queries.registry.keySet
    val o = OracleSql.sql.keySet
    assert((q -- o).isEmpty, s"registry entries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle entries without query: ${(o -- q).toSeq.sorted}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}
