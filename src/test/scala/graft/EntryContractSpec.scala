package graft

/** Guards on the driver contract surface itself.
  *
  * The driver's correctness gate only checks queries that appear in BOTH
  * `SparkEntry.queries` and `SparkEntry.oracleSql` — a query registered
  * without an oracle silently downgrades to a rows-only check, and an
  * oracle without a query is dead SQL. Round 5 shipped 8 silently-broken
  * queries precisely because nothing local flagged the driver-side gap;
  * this spec makes the registration contract loud.
  */
class EntryContractSpec extends SparkSpec {

  test("every registered query carries an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries with no oracle (driver downgrades to rows-only): ${q -- o}")
    assert((o -- q).isEmpty, s"dead oracle SQL without a query: ${o -- q}")
  }

  test("query names are unique, stable-format, and the suite keeps growing") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("q\\d+_[a-z0-9_]+"), s"non-canonical query name: $n")
    }
    assert(SparkEntry.queries.size >= 154,
      s"query count regressed: ${SparkEntry.queries.size}")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
