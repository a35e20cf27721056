package graft

class SparkEntrySpec extends SparkSpec {

  test("entry returns >0 rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has columns aligned with its oracle presence") {
    // each oracleSql key must exist in queries
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
  }

  test("all queries run non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
