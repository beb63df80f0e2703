package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Long) = new Timestamp(1704067200000L + m * 60000L)

  test("as-of picks the latest right row ≤ t, null when none precedes") {
    import spark.implicits._
    val probes = Seq(
      (1L, ts(5), 7L),   // after r10 → r?? no: rights at 0 and 10 → picks 0
      (2L, ts(10), 7L),  // exactly at a right row → that row (>= semantics)
      (3L, ts(25), 7L),  // after both → picks 10
      (4L, ts(1), 8L)    // other key, no right rows → null
    ).toDF("event_id", "ts", "user_id")
    val rights = Seq(
      (7L, ts(0), 100L),
      (7L, ts(10), 200L)
    ).toDF("user_id", "ts", "ref_id")
    val got = AsOfJoin.asOf(probes, rights, Seq("user_id"), "ts", "ts",
        Seq("ref_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(1L -> 100L, 2L -> 200L, 3L -> 200L, 4L -> -1L))
  }

  test("single shuffle: exactly one exchange in the plan") {
    import spark.implicits._
    val probes = Seq((1L, ts(5), 7L)).toDF("event_id", "ts", "user_id")
    val rights = Seq((7L, ts(0), 100L)).toDF("user_id", "ts", "ref_id")
    val plan = AsOfJoin.asOf(probes, rights, Seq("user_id"), "ts", "ts",
        Seq("ref_id"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange").length - 1
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("nearest-in-time: before/after/tie/one-sided fixtures resolve to the closest click") {
    import spark.implicits._
    def tns(min: Long): Long = min * 60L * 1000000000L
    val ev = Seq(
      // u1: error@30 with clicks @10 and @45 → forward wins (15' < 20')
      (1L, tns(10), 1L, "click", 0.0, "{}"),
      (2L, tns(45), 1L, "click", 0.0, "{}"),
      (3L, tns(30), 1L, "error", 0.0, "{}"),
      // u2: error@30 with clicks @20 and @40 — exact tie → backward
      (4L, tns(20), 2L, "click", 0.0, "{}"),
      (5L, tns(40), 2L, "click", 0.0, "{}"),
      (6L, tns(30), 2L, "error", 0.0, "{}"),
      // u3: only a click BEFORE; u4: only AFTER; u5: none (dropped)
      (7L, tns(0), 3L, "click", 0.0, "{}"),
      (8L, tns(60), 3L, "error", 0.0, "{}"),
      (9L, tns(90), 4L, "click", 0.0, "{}"),
      (10L, tns(60), 4L, "error", 0.0, "{}"),
      (11L, tns(5), 5L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("nearest").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = AsOfJoin.nearestClickOffset(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val M = 60L * 1000000L
    assert(got == Map(3L -> 15 * M, 6L -> -10 * M, 8L -> -60 * M,
      10L -> 30 * M), s"got $got")
  }

  test("temporal SCD join ≡ interval containment on the real corpus; containment audit is zero") {
    import spark.implicits._
    val ev = Tables.events(spark, SF)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mids = ev.groupBy(_._2).view.mapValues { g =>
      (g.map(_._3).min + g.map(_._3).max) / 2 }.toMap
    val expected = ev.groupBy { case (_, u, t) =>
        if (t >= mids(u)) "v2" else "v1" }
      .view.mapValues(g => (g.size.toLong, g.map(_._1).sum)).toMap
    val got = AsOfJoin.temporalScdJoin(spark, SF)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(got.view.mapValues(_._1).toMap == expected,
      s"got=$got expected=$expected")
    got.values.foreach { case (_, invalid) =>
      assert(invalid == 0L, "matched an expired dimension version") }
  }
}
