package graft

/** Sanity for the driver contract: every query runs at sf0.001, returns
  * rows (except known-empty ones), has oracle coverage, and the entry
  * smoke passes. (Full value correctness is gated by the DuckDB oracle
  * at sf0.01 — `tools/check.py`; this suite is the fast in-JVM tier.)
  */
class QueriesSpec extends SparkSpec {

  /** legitimately empty at tiny scale: every customer has orders
    * (join_anti, set_except); the sf0.001 order graph is too sparse to
    * sustain any 4-truss — every edge peels (k_truss; the cascade
    * semantics are pinned on a hand graph in `GraphSpec`, the values
    * by the sf0.01 oracle where the peel is 15k → 165 over 7 rounds). */
  private val mayBeEmpty = Set("join_anti", "set_except", "k_truss")

  test("entry (flagship search) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
  }

  test("query names are unique across modules") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size)
  }

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} runs at sf0.001${if (q.oracle.isEmpty) " (rows-only)" else ""}") {
      val n = q.fn(spark, sfDir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
