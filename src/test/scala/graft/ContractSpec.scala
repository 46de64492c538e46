package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's own invariants — cheap structural checks that
  * catch a dangling registry entry at `sbt test` time instead of at the
  * driver's oracle gate. */
class ContractSpec extends AnyFunSuite {
  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across the core/ext maps and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(
      _.matches("q\\d+_[a-z0-9_]+")))
    // q-numbers are unique too: two names sharing a number would make
    // ledger references ambiguous
    val nums = names.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == nums.size,
      nums.groupBy(identity).filter(_._2.size > 1).keys.toSeq)
  }

  test("oracle SQL never pins a scale factor: sink-interchange paths " +
      "carry the __SF__ token, not a literal sfN directory") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.matches("(?s).*target/[a-z0-9_]+_sf0?\\.\\d+.*"),
        s"$name pins a literal SF dir — use SfToken")
    }
  }
}
