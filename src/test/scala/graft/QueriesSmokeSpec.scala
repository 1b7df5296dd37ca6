package graft

/** Smoke tier: every registered query runs at sf0.001 and returns rows.
  * (Value-level correctness is the DuckDB oracle gate — tools/verify_local.py.)
  */
class QueriesSmokeSpec extends SparkSpec {

  test("registry names are unique and oracles exist for SQL-expressible ops") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001 with rows > 0") {
      val df = q.fn(spark, sf("sf0.001"))
      assert(df.count() > 0)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
