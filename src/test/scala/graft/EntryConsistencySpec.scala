package graft

/** The driver contract itself: every gate query must carry an oracle
  * (a missing `oracleSql` key silently downgrades the gate to a
  * weaker rows-only check — a typo must fail CI instead), every
  * oracle must point at a real query, and the flagship entry must
  * produce rows.
  */
class EntryConsistencySpec extends SparkSpec {

  test("queries and oracleSql keys are 1:1 — no silent rows-only downgrades") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"gates without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("flagship entry returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
