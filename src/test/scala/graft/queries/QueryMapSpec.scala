package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Key hygiene for the declared-query / oracle maps (the driver contract). */
class QueryMapSpec extends AnyFunSuite {

  test("StrictMap rejects duplicate keys") {
    val e = intercept[IllegalArgumentException](StrictMap("a" -> 1, "a" -> 2))
    assert(e.getMessage.contains("a"))
    assert(StrictMap("a" -> 1, "b" -> 2) == Map("a" -> 1, "b" -> 2))
  }

  test("every oracle key has a declared query") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
  }

  test("every declared query has an oracle (full hash-gate coverage)") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${q -- o}")
  }

  test("relational and extension maps are key-disjoint") {
    val shared = Relational.queries.keySet intersect Extensions.queries.keySet
    assert(shared.isEmpty, s"shared keys: $shared")
  }

  test("corpus shape matches the documented inventory (q01-q28, x01-x175, e01-e03)") {
    val q = graft.SparkEntry.queries.keySet
    def series(prefix: String, n: Int): Set[String] =
      (1 to n).map(i => f"$prefix$i%02d_").toSet
    // numeric id up to the first underscore, so x100+ parses like x01
    def prefixes(of: Set[String]): Set[String] =
      of.map(s => s.takeWhile(_ != '_') + "_")
    assert(prefixes(q.filter(_.startsWith("q"))) == series("q", 28))
    assert(prefixes(q.filter(_.startsWith("x"))) == series("x", 176))
    assert(prefixes(q.filter(_.startsWith("e"))) == series("e", 3))
    assert(q.size == 207) // the SparkEntry scaladoc's number — keep in sync
  }
}
