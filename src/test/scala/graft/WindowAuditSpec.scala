package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Repo-wide guard against the silent scale-killer: a window with no
  * PARTITION BY moves its whole input through one task. Every gate
  * query's physical plan is swept; the only unpartitioned windows
  * allowed are the ones whose input is provably aggregate-sized, each
  * with its justification here. A new offender — or an exemption that
  * stops being needed — fails the build either way.
  */
class WindowAuditSpec extends SparkSpec {

  /** query → why an all-to-one window is safe there. */
  private val exempt: Map[String, String] = Map(
    "analytics_yoy_growth" ->
      ("lag over per-year order counts: the window input is one row " +
        "per calendar year (dozens of rows at any corpus size) — the " +
        "aggregation below it already reduced the data"),
    "text_vocabulary" ->
      ("global rank over per-token aggregates: the window input is " +
        "one row per distinct token (vocabulary-sized, orders smaller " +
        "than the corpus) — both shuffles below it are partial-agg'd"),
    "text_quantile_cut" ->
      ("running count over the value HISTOGRAM (one row per distinct " +
        "token count, bounded by max doc length) — the groupBy below " +
        "already collapsed the corpus; the window input is " +
        "domain-sized, not data-sized")
  )

  test("no gate query has an unpartitioned window outside the exempt set") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
        val n = SparkEntry.queries(q)(spark, SF)
          .queryExecution.executedPlan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }.length
        if (n > 0) Some(q -> n) else None
      }
      val unexplained = offenders.filterNot { case (q, _) => exempt.contains(q) }
      val stale = exempt.keySet -- offenders.map(_._1).toSet
      assert(unexplained.isEmpty,
        s"unpartitioned WindowExec in non-exempt queries: $unexplained")
      assert(stale.isEmpty,
        s"exemptions no longer needed (remove them): $stale")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
