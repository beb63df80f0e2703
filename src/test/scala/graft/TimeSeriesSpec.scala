package graft

import graft.operators.Events

/** Gap-fill densification and the integer z-score anomaly detector
  * built on it.
  */
class TimeSeriesSpec extends SparkSpec {

  test("gap-fill: contiguous hour spine, counts preserved, absent hours zero") {
    import spark.implicits._
    val filled = Events.gapfillHourly(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(filled.nonEmpty)
    val hours = filled.map(_._1)
    // dense: every hour between min and max present exactly once
    assert(hours.length == (hours.last - hours.head + 1).toInt,
      s"spine not dense: ${hours.length} rows over span ${hours.last - hours.head + 1}")
    assert(hours.distinct.length == hours.length, "duplicate hours in spine")
    // total events preserved (fill adds only zeros)
    val total = Tables.events(spark, SF).count()
    assert(filled.map(_._2).sum == total,
      s"gap-fill changed the total: ${filled.map(_._2).sum} vs $total")
    assert(filled.forall(_._2 >= 0))
  }

  test("anomaly flags match a scala re-derivation of the integer z-test") {
    import spark.implicits._
    val series = Events.gapfillHourly(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = series.indices.flatMap { i =>
      if (i < 24) None
      else {
        val win = series.slice(i - 24, i).map(_._2)
        val (x, s1, s2) = (series(i)._2, win.sum, win.map(v => v * v).sum)
        val dev = 24 * x - s1
        if (dev * dev > 4 * (24 * s2 - s1 * s1)) Some(series(i)._1) else None
      }
    }.toSet
    val got = Events.anomalyHours(spark, SF)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"flag mismatch: spark-only=${got -- expected} scala-only=${expected -- got}")
    // two-sided: the squared form catches dips as well as spikes — a
    // dead hour against a steady 100/h baseline (variance 0) flags
    val s1 = 24 * 100L
    assert((24 * 0 - s1) * (24 * 0 - s1) > 4 * (24 * (24 * 100L * 100L) - s1 * s1),
      "integer z-test must flag a dead hour against a steady baseline")
  }
}
