package graft

import graft.operators.Events
import org.apache.spark.sql.functions.{call_function, hour}

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

  test("cusum: gate rows match a scala re-derivation; a planted level shift is recovered at its boundary") {
    val series = Events.gapfillHourly(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val tN = series.length.toLong
    val g = series.map(_._2).sum
    var p = 0L
    val ds = series.zipWithIndex.map { case ((h, n), i) =>
      p += n; (h, n, tN * p - (i + 1) * g)
    }
    val expected = ds.sortBy { case (h, _, d) => (-math.abs(d), h) }.take(10)
    val got = Events.cusumHours(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq,
      s"cusum top-10 mismatch:\n got=${got.toSeq}\n exp=${expected.toSeq}")
    // the statistic itself: a clean level shift (100/h then 200/h)
    // maximizes |d| exactly at the boundary hour
    val synth = (0 until 100).map(i => if (i < 50) 100L else 200L)
    val sg = synth.sum
    var sp = 0L
    val sd = synth.zipWithIndex.map { case (n, i) =>
      sp += n; (i, math.abs(100L * sp - (i + 1) * sg))
    }
    assert(sd.maxBy(_._2)._1 == 49,
      s"changepoint not at the boundary: ${sd.maxBy(_._2)}")
  }

  test("wma: decomposed window numerator equals the brute-force position-weighted sum") {
    val series = Events.gapfillHourly(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = series.indices.flatMap { i =>
      if (i < 23) None
      else {
        val win = series.slice(i - 23, i + 1).map(_._2)
        // weights 1 (oldest) .. 24 (newest)
        val num = win.zipWithIndex.map { case (x, j) => (j + 1) * x }.sum
        Some((series(i)._1, series(i)._2, num))
      }
    }
    val got = Events.wmaHours(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == expected,
      s"wma numerator mismatch: got=${got.take(3).toSeq}… exp=${expected.take(3)}…")
    // the exported fp column is the single division
    Events.wmaHours(spark, SF).collect().foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 300.0) < 1e-4 + 1e-9)
    }
  }

  test("bandedSpine ≡ the unpartitioned spine window across band boundaries; plan is band-partitioned") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // dense spine crossing several 10-wide bands, values irregular so
    // a dropped/duplicated ghost row would corrupt some trailing sum
    val spine = (0L to 97L).map(h => (h, (h * h) % 13))
      .toDF("h", "n").repartition(7)
    def stats(df: org.apache.spark.sql.DataFrame,
        w0: org.apache.spark.sql.expressions.WindowSpec) = {
      val w = w0.rowsBetween(-5, 0)
      df.withColumn("nw", count(lit(1)).over(w))
        .withColumn("sx", sum($"n").over(w))
        .withColumn("mx", max($"n").over(w))
    }
    val banded = Events.bandedSpine(spine, "h", lookback = 5,
        bandWidth = 10L)(stats)
      .select($"h", $"nw", $"sx", $"mx")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val flat = stats(spine, Window.orderBy($"h"))
      .select($"h", $"nw", $"sx", $"mx")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(banded == flat, s"first diff: ${
      flat.keys.toSeq.sorted.find(k => banded.get(k) != flat.get(k))
        .map(k => s"$k banded=${banded.get(k)} flat=${flat.get(k)}")}")
    // a frame NOT ending at the current row works too (anomalyHours'
    // -24..-1 shape) — ghosts cover any frame inside [-lookback, 0]
    def lagStats(df: org.apache.spark.sql.DataFrame,
        w0: org.apache.spark.sql.expressions.WindowSpec) =
      df.withColumn("sx", sum($"n").over(w0.rowsBetween(-5, -1)))
    val bLag = Events.bandedSpine(spine, "h", lookback = 5,
        bandWidth = 10L)(lagStats)
      .select($"h", $"sx").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val fLag = lagStats(spine, Window.orderBy($"h"))
      .select($"h", $"sx").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(bLag == fLag)
    // negative hours band correctly too (floor, not truncate-to-zero)
    val negSpine = (-25L to 14L).map(h => (h, h % 7 + 7)).toDF("h", "n")
    val bN = Events.bandedSpine(negSpine, "h", lookback = 5,
        bandWidth = 10L)(stats)
      .select($"h", $"sx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fN = stats(negSpine, Window.orderBy($"h"))
      .select($"h", $"sx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bN == fN)
    // every row survives exactly once (ghost filter is airtight)
    assert(banded.size == 98 && bN.size == 40)
    // and the WHOLE POINT: the window runs hash-partitioned on the
    // band, not through one SinglePartition exchange
    val plan = Events.bandedSpine(spine, "h", lookback = 5,
      bandWidth = 10L)(stats).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__band"),
      s"banded window is not band-partitioned:\n$plan")
    // guard: a band narrower than the lookback must refuse
    intercept[IllegalArgumentException] {
      Events.bandedSpine(spine, "h", lookback = 24, bandWidth = 10L)(stats)
    }
  }

  test("weekly profile: ≤168 in-range cells, counts sum to the corpus total") {
    import spark.implicits._
    val cells = Events.weeklyProfile(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cells.nonEmpty && cells.length <= 168, s"${cells.length} cells")
    cells.foreach { case (dow, hod, _) =>
      assert(dow >= 0 && dow <= 6 && hod >= 0 && hod <= 23,
        s"cell out of range: ($dow,$hod)") }
    val total = Tables.events(spark, SF).count()
    assert(cells.map(_._3).sum == total,
      s"cell counts ${cells.map(_._3).sum} != corpus $total")
  }

  test("transition matrix rows are distributions: probs sum to 1 within rounding, counts cover all pairs") {
    import spark.implicits._
    val rows = Events.transitionMatrix(spark, SF)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, grp) =>
      val p = grp.map(_._4).sum
      assert(math.abs(p - 1.0) <= 0.0004 * grp.length,
        s"row $from sums to $p") }
    // every user with n events contributes exactly n−1 transitions
    val users = Tables.events(spark, SF).groupBy($"user_id").count()
      .collect().map(_.getLong(1)).filter(_ >= 2)
    assert(rows.map(_._3).sum == users.map(_ - 1).sum,
      "transition count != sum of per-user (n-1)")
  }

  test("path trigrams never cross a session boundary") {
    import spark.implicits._
    // raw events.parquet stores ts as NANOSECOND longs (Tables.events
    // converts via timestamp_micros(ts div 1000))
    def t(min: Int): Long = (3600L * 24 + min * 60L) * 1000000000L
    // one user: A,B,C,D a minute apart (trigrams A>B>C and B>C>D),
    // then a 40-minute gap, then E,F,G — G arriving in a NEW session
    // only 2 events deep would be wrong to pair with D or E
    val ev = Seq(
      (1L, t(0), 7L, "A", 0.0, "{}"), (2L, t(1), 7L, "B", 0.0, "{}"),
      (3L, t(2), 7L, "C", 0.0, "{}"), (4L, t(3), 7L, "D", 0.0, "{}"),
      (5L, t(44), 7L, "E", 0.0, "{}"), (6L, t(45), 7L, "F", 0.0, "{}"),
      (7L, t(46), 7L, "G", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("paths").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.pathTrigrams(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A>B>C" -> 1L, "B>C>D" -> 1L, "E>F>G" -> 1L),
      s"got $got — a trigram crossed the 30-minute session boundary")
  }

  test("sliding rollup: every event in exactly 3 hops; crafted window membership exact") {
    import spark.implicits._
    import graft.operators.Events
    // corpus: total sliding mass is exactly 3× the event count
    val total = graft.Tables.events(spark, SF).count()
    val rows = Events.slidingRollup(spark, SF).collect()
    assert(rows.map(_.getLong(1)).sum == 3 * total)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val starts = rows.map(_.getTimestamp(0).getTime)
    assert(starts.sameElements(starts.sorted) &&
      starts.toSet.size == starts.length)

    // crafted: 02:30 lands in windows 00/01/02, 03:10 in 01/02/03
    def tns(hr: Int, min: Int): Long = (hr * 3600L + min * 60L) * 1000000000L
    val ev = Seq(
      (1L, tns(2, 30), 1L, "A", 0.0, "{}"),
      (2L, tns(3, 10), 2L, "B", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("slide").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.slidingRollup(spark, tmp)
      .collect()
      .map(r => (r.getTimestamp(0).getTime / 3600000L,
        r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 2L, 2L), (2L, 2L, 2L),
      (3L, 1L, 1L)), s"got $got")
  }

  test("attribution: last touch wins, 72h boundary inclusive, ties pick greatest type, no touch = direct") {
    import spark.implicits._
    import graft.operators.Analytics
    def tns(min: Long): Long = min * 60L * 1000000000L
    val ev = Seq(
      // u7: click then view before purchase → view (last touch)
      (1L, tns(0), 7L, "click", 1.0, "{}"),
      (2L, tns(10), 7L, "view", 1.0, "{}"),
      (3L, tns(20), 7L, "purchase", 10.0, "{}"),
      // u8: touch 4321 min (> 72h) before purchase → direct
      (4L, tns(0), 8L, "click", 1.0, "{}"),
      (5L, tns(4321), 8L, "purchase", 20.0, "{}"),
      // u9: no touches at all → direct
      (6L, tns(0), 9L, "purchase", 5.0, "{}"),
      // u10: click and view at the SAME instant → tie-break picks view
      (7L, tns(5), 10L, "click", 1.0, "{}"),
      (8L, tns(5), 10L, "view", 1.0, "{}"),
      (9L, tns(6), 10L, "purchase", 7.0, "{}"),
      // u11: touch exactly 72h (4320 min) before → still attributed
      (10L, tns(0), 11L, "click", 1.0, "{}"),
      (11L, tns(4320), 11L, "purchase", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("attr").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Analytics.attributionLastTouch(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("click", 1L, 3.0), ("direct", 2L, 25.0),
      ("view", 2L, 17.0)), s"got ${got.toSeq}")
  }

  test("linear attribution splits value in integer cents across all in-window touches; remainder truncates") {
    import spark.implicits._
    import graft.operators.Analytics
    def tns(min: Long): Long = min * 60L * 1000000000L
    val ev = Seq(
      // u7: click + view in window, 10.01 → 500c each, 1c truncated
      (1L, tns(0), 7L, "click", 1.0, "{}"),
      (2L, tns(10), 7L, "view", 1.0, "{}"),
      (3L, tns(20), 7L, "purchase", 10.01, "{}"),
      // u8: touch outside 72h → direct keeps 2000c
      (4L, tns(0), 8L, "click", 1.0, "{}"),
      (5L, tns(4321), 8L, "purchase", 20.0, "{}"),
      // u9: no touches → direct 500c
      (6L, tns(0), 9L, "purchase", 5.0, "{}"),
      // u12: two clicks + one view, 9.00 → click 600c, view 300c
      (7L, tns(0), 12L, "click", 1.0, "{}"),
      (8L, tns(5), 12L, "click", 1.0, "{}"),
      (9L, tns(10), 12L, "view", 1.0, "{}"),
      (10L, tns(15), 12L, "purchase", 9.0, "{}"),
      // u13: 3 clicks over 1.00 → the channel takes (100·3) div 3 = 100
      (11L, tns(0), 13L, "click", 1.0, "{}"),
      (12L, tns(1), 13L, "click", 1.0, "{}"),
      (13L, tns(2), 13L, "click", 1.0, "{}"),
      (14L, tns(3), 13L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("attr_lin").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Analytics.attributionLinear(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // click: touches 1+2+3 = 6 (u7, u12, u13), credit 500+600+100;
    // view: 500 (u7: 1001c div 2 — the odd cent truncates) + 300 (u12)
    assert(got == Seq(("click", 6L, 1200L), ("direct", 0L, 2500L),
      ("view", 2L, 800L)), s"got $got")
  }

  test("position attribution: 40/20/40 by rank, 1-touch takes all, 2-touch splits even, middles share 20% by integer div") {
    import spark.implicits._
    import graft.operators.Analytics
    def tns(min: Long): Long = min * 60L * 1000000000L
    val ev = Seq(
      // u7: click, view → n=2 → 500000 ppm each over 10.00
      (1L, tns(0), 7L, "click", 1.0, "{}"),
      (2L, tns(10), 7L, "view", 1.0, "{}"),
      (3L, tns(20), 7L, "purchase", 10.0, "{}"),
      // u9: no touches → direct keeps w=1e6 over 5.00
      (6L, tns(0), 9L, "purchase", 5.0, "{}"),
      // u12: click, view, view, click → endpoints 400000 each (click),
      // two middles (view) split 200000 → 100000 each, over 10.00
      (7L, tns(0), 12L, "click", 1.0, "{}"),
      (8L, tns(5), 12L, "view", 1.0, "{}"),
      (9L, tns(10), 12L, "view", 1.0, "{}"),
      (10L, tns(15), 12L, "click", 1.0, "{}"),
      (11L, tns(20), 12L, "purchase", 10.0, "{}"),
      // u14: a single view → 100% over 2.00
      (12L, tns(0), 14L, "view", 1.0, "{}"),
      (13L, tns(5), 14L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("attr_pos").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Analytics.attributionPosition(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // click: u7 500000·1000 + u12 2·400000·1000 = 1,300,000,000 (3 touches)
    // direct: 5.00 → 500·1000000 = 500,000,000
    // view: u7 500000·1000 + u12 2·100000·1000 + u14 1000000·200
    //     = 500M + 200M + 200M = 900,000,000 (4 touches)
    assert(got == Seq(("click", 3L, 1300000000L), ("direct", 1L, 500000000L),
      ("view", 4L, 900000000L)), s"got $got")
  }

  test("time-decay attribution: weights halve per 12h step, 72h boundary weight 1, shares truncate per channel") {
    import spark.implicits._
    import graft.operators.Analytics
    def tns(min: Long): Long = min * 60L * 1000000000L
    val ev = Seq(
      // u7: click 25h before (k=2, w=16), view 1h before (k=0, w=64)
      // over 8.00 → Σw=80: click 800·16 div 80 = 160, view 640
      (1L, tns(0), 7L, "click", 1.0, "{}"),
      (2L, tns(24 * 60), 7L, "view", 1.0, "{}"),
      (3L, tns(25 * 60), 7L, "purchase", 8.0, "{}"),
      // u8: touch past 72h → direct keeps 2000c
      (4L, tns(0), 8L, "click", 1.0, "{}"),
      (5L, tns(4321), 8L, "purchase", 20.0, "{}"),
      // u9: no touches → direct 500c
      (6L, tns(0), 9L, "purchase", 5.0, "{}"),
      // u11: sole click at exactly 72h → k=6, w=1, full 300c
      (10L, tns(0), 11L, "click", 1.0, "{}"),
      (11L, tns(4320), 11L, "purchase", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("attr_decay").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Analytics.attributionTimeDecay(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", 2L, 460L), ("direct", 0L, 2500L),
      ("view", 1L, 640L)), s"got $got")
  }

  test("longest streak: gaps-and-islands on a crafted calendar; ties pick the earliest run") {
    import spark.implicits._
    def dayNs(d: Long): Long = d * 86400L * 1000000000L
    val ev = Seq(
      // u1: days 10,11,12 then 14,15 → streak 3 starting day 10
      (1L, dayNs(10), 1L, "click", 0.0, "{}"),
      (2L, dayNs(11) + 5000000000L, 1L, "click", 0.0, "{}"),
      (3L, dayNs(12), 1L, "view", 0.0, "{}"),
      (4L, dayNs(14), 1L, "click", 0.0, "{}"),
      (5L, dayNs(15), 1L, "click", 0.0, "{}"),
      // u2: two 2-day runs (20,21) and (30,31) → tie picks start 20
      (6L, dayNs(20), 2L, "click", 0.0, "{}"),
      (7L, dayNs(21), 2L, "click", 0.0, "{}"),
      (8L, dayNs(30), 2L, "click", 0.0, "{}"),
      (9L, dayNs(31), 2L, "click", 0.0, "{}"),
      // u3: a single day, multiple events → streak 1
      (10L, dayNs(40), 3L, "click", 0.0, "{}"),
      (11L, dayNs(40) + 1000000000L, 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("streaks").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.operators.Events.activeStreaks(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 10L), (2L, 2L, 20L), (3L, 1L, 40L)),
      s"got $got")
  }

  test("interval merge: overlapping and touching presence windows coalesce; disjoint ones don't") {
    import spark.implicits._
    def mNs(min: Long): Long = min * 60L * 1000000000L
    val ev = Seq(
      // u1: events at 0' and 10' overlap (30' spans) → one interval
      // [0, 40'); event at 100' is disjoint → second interval
      (1L, mNs(0), 1L, "click", 0.0, "{}"),
      (2L, mNs(10), 1L, "click", 0.0, "{}"),
      (3L, mNs(100), 1L, "view", 0.0, "{}"),
      // u2: event at 0' and exactly 30' — touching ends merge
      (4L, mNs(0), 2L, "click", 0.0, "{}"),
      (5L, mNs(30), 2L, "click", 0.0, "{}"),
      // duplicate timestamp must not double-count
      (6L, mNs(30), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("imerge").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.operators.Events.intervalMerge(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // u1: [0,40) + [100,130) = 2 intervals, 70 min; u2: [0,60) = 60 min
    assert(got == Seq((1L, 2L, 70L * 60), (2L, 1L, 60L * 60)), s"got $got")
  }

  test("sliding DAU equals a scala trailing-24h distinct re-derivation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val pairs = Tables.events(spark, SF)
      .select(expr("unix_timestamp(ts) div 3600").as("h"), $"user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (pairs.map(_._1).min, pairs.map(_._1).max)
    val byHour = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = ((lo + 23) to hi).map { wh =>
      wh -> ((wh - 23) to wh).flatMap(h => byHour.getOrElse(h, Set.empty))
        .toSet.size.toLong
    }.toMap
    val got = Events.slidingDau(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"mismatch on ${got.keySet.union(expected.keySet).filter(k => got.get(k) != expected.get(k)).take(5)}")
    // a 24h window can never see fewer users than its own hour's DAU
    val hourly = byHour.view.mapValues(_.size.toLong).toMap
    got.foreach { case (wh, n) =>
      assert(n >= hourly.getOrElse(wh, 0L), s"window $wh below own hour") }
  }

  test("seasonal residuals: each (dow, hod) cell sums to zero and matches brute force") {
    import graft.operators.Events
import org.apache.spark.sql.functions.{call_function, hour}
    val rows = Events.seasonalResidual(spark, SF)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // Σ over a cell of (n·obs − tot) telescopes to obs·tot − obs·tot = 0
    rows.groupBy { case (_, _, dow, hod, _) => (dow, hod) }
      .foreach { case (cell, rs) =>
        assert(rs.map(_._5).sum == 0L, s"cell $cell residuals sum ≠ 0") }
    // brute force from the gap-filled series
    val filled = Events.gapfillHourly(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cells = filled.groupBy { case (h, _) => ((h / 24 + 4) % 7, h % 24) }
      .view.mapValues(rs => (rs.map(_._2).sum, rs.length.toLong)).toMap
    val expected = filled.map { case (h, n) =>
      val (tot, obs) = cells(((h / 24 + 4) % 7, h % 24))
      (h, n, (h / 24 + 4) % 7, h % 24, n * obs - tot)
    }.toSet
    assert(rows.toSet == expected)
  }

  test("ACF: planted 24h cycle peaks at lag 24, dips at lag 12; ≡ scala moment re-derivation") {
    import spark.implicits._
    // 10 days of a clean daily rhythm plus a deterministic ramp
    val ys = (0 until 240).map(h =>
      100L + (if (h % 24 < 12) 40L else -40L) + h % 7)
    val series = ys.zipWithIndex.map { case (n, h) => (h.toLong, n) }
      .toDF("h", "n")
    val got = graft.operators.Events.acfOfSeries(series, maxLag = 24)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val tt = ys.size.toLong; val g = ys.sum; val q = ys.map(y => y * y).sum
    val want = (1 to 24).map { k =>
      val head = ys.dropRight(k); val tail = ys.drop(k)
      val ak = head.zip(tail).map { case (a, b) => a * b }.sum
      val num = tt.toDouble * tt.toDouble * ak.toDouble -
        tt.toDouble * g.toDouble * (head.sum.toDouble + tail.sum.toDouble) +
        (tt - k).toDouble * g.toDouble * g.toDouble
      val den = tt.toDouble * tt.toDouble * q.toDouble -
        tt.toDouble * g.toDouble * g.toDouble
      k.toLong -> ((tt - k, math.floor(num / den * 1e6 + 0.5) / 1e6))
    }.toMap
    // pairs counts and acf values match the flat re-derivation
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (p, a)) =>
      assert(got(k)._1 == p, s"pairs at lag $k")
      assert(math.abs(got(k)._2 - a) < 2e-6, s"acf at lag $k: ${got(k)._2} vs $a")
    }
    // the planted structure: daily cycle → strong positive at 24,
    // strong negative at 12, and 24 beats every other lag
    assert(got(24L)._2 > 0.8 && got(12L)._2 < -0.8)
    assert((1L to 23L).forall(k => got(24L)._2 > got(k)._2))
  }

  test("forecast backtest ≡ scala fold; seasonal-168 wins on a planted weekly cycle") {
    import spark.implicits._
    // 4 weeks of a clean weekly pattern: hour-of-week determines the
    // level exactly, so the 168-lag model is PERFECT (mae 0) while
    // naive and daily models err on the within-week structure
    val ys = (0 until 672).map(h => 50L + (h % 168) % 13 * 7)
    val series = ys.zipWithIndex.map { case (n, h) => (h.toLong, n) }
      .toDF("h", "n")
    val got = graft.operators.Events.forecastEvalOfSeries(series)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    def fold(k: Int): (Long, Long, Long) = {
      val pairs = ys.drop(k).zip(ys.dropRight(k))
      (pairs.size.toLong,
        pairs.map { case (y, p) => math.abs(y - p) }.sum,
        pairs.map { case (y, p) => y - p }.sum)
    }
    Seq("naive_1" -> 1, "seasonal_24" -> 24, "seasonal_168" -> 168)
      .foreach { case (model, k) =>
        val (n, ae, bias) = fold(k)
        val (gn, gae, gbias, gmae) = got(model)
        assert((gn, gae, gbias) == ((n, ae, bias)), s"$model moments")
        assert(math.abs(gmae -
          math.floor(ae.toDouble / n * 1e4 + 0.5) / 1e4) < 2e-4, s"$model mae")
      }
    assert(got("seasonal_168")._4 == 0.0, "weekly model must be perfect")
    assert(got("naive_1")._4 > 0.0 && got("seasonal_24")._4 > 0.0)
  }

  test("runs test: alternating series maxes runs (z>0), block series collapses to 2 runs (z<0)") {
    import spark.implicits._
    def run(ys: Seq[Long]): (Long, Long, Long, Double) = {
      val df = ys.zipWithIndex.map { case (n, h) => (h.toLong, n) }
        .toDF("h", "n")
      val r = graft.operators.Events.runsTestOfSeries(df).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // 40 alternating points around mean 50: every step flips sign
    val alt = (0 until 40).map(i => if (i % 2 == 0) 60L else 40L)
    val (ap, an, ar, az) = run(alt)
    assert((ap, an, ar) == ((20L, 20L, 40L)) && az > 3.0, s"alt z=$az")
    // two blocks: 20 high then 20 low — exactly 2 runs
    val blocks = Seq.fill(20)(60L) ++ Seq.fill(20)(40L)
    val (bp, bn, br2, bz) = run(blocks)
    assert((bp, bn, br2) == ((20L, 20L, 2L)) && bz < -3.0, s"block z=$bz")
    // scala fold re-derivation on an arbitrary deterministic series
    val ys = (0 until 60).map(i => (i * 37 % 11).toLong)
    val tt = ys.size.toLong; val g = ys.sum
    val signs = ys.map(y => tt * y - g).filter(_ != 0L).map(d => if (d > 0) 1 else -1)
    val np = signs.count(_ == 1).toLong; val nn = signs.count(_ == -1).toLong
    val rr = 1L + signs.sliding(2).count(p => p(0) != p(1))
    val (gp, gn, gr, _) = run(ys)
    assert((gp, gn, gr) == ((np, nn, rr)), s"($gp,$gn,$gr) vs ($np,$nn,$rr)")
  }

  test("EWMA: fan-out device ≡ scala truncated-exponential fold; step responds half-way each hour") {
    import spark.implicits._
    val W = 16
    val ys = (0 until 80).map(i => (i * 53 % 17).toLong * 3L)
    val series = ys.zipWithIndex.map { case (n, h) => (h.toLong, n) }
      .toDF("h", "n")
    val got = graft.operators.Events.ewmaOfSeries(series, W).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (W - 1 until 80).map { t =>
      t.toLong -> (0 until W).map(j => ys(t - j) * (1L << (W - 1 - j))).sum
    }.toMap
    assert(got == want, "EWMA numerators diverge from the direct fold")
    // a unit step at hour 40 of a zero series: after the step the
    // truncated EWMA is 100·(2^16 - 2^(15-k))/(2^16-1) — halving gap
    val step = (0 until 60).map(i => if (i >= 40) 100L else 0L)
    val sdf = step.zipWithIndex.map { case (n, h) => (h.toLong, n) }
      .toDF("h", "n")
    val s = graft.operators.Events.ewmaOfSeries(sdf, W).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(39L) == 0.0)
    assert(math.abs(s(40L) - 50.0) < 0.1, s"first response ${s(40L)}")
    assert(s(45L) > 98.0 && s(45L) < 100.0)
  }

  test("CCF: planted 3-hour lead shows the peak exactly at lag +3; ≡ scala moments") {
    import spark.implicits._
    // x leads y by 3 hours: y_t = x_{t-3} + small deterministic noise
    val xs = (0 until 200).map(i => (i * 31 % 13).toLong)
    val ys = (0 until 200).map(i => (if (i >= 3) xs(i - 3) * 2 else 0L)
      + i % 3)
    val df = (0 until 200).map(i => (i.toLong, xs(i), ys(i)))
      .toDF("h", "x", "y")
    val got = graft.operators.Events.crossCorrOfSeries(df, 6).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // scala re-derivation of the exact moments at each lag
    (-6 to 6).foreach { k =>
      val pairs = (0 until 200).flatMap { t =>
        val u = t + k
        if (u >= 0 && u < 200) Some((xs(t), ys(u))) else None
      }
      val n = pairs.length.toLong
      val sxy = pairs.map { case (a, b) => a * b }.sum
      val (gn, gsxy, gr) = got(k.toLong)
      assert(gn == n && gsxy == sxy, s"moments at lag $k")
      val sx = pairs.map(_._1).sum.toDouble; val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val r = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(gr - r) < 2e-6, s"r at lag $k: $gr vs $r")
    }
    // the planted lead: +3 dominates every other lag
    assert((-6 to 6).filter(_ != 3).forall(k => got(3L)._3 > got(k.toLong)._3),
      s"lag-3 peak not dominant: $got")
    assert(got(3L)._3 > 0.9)
  }

  test("mann-kendall: monotone series gives S = C(m,2), all-tied gives z = 0") {
    import spark.implicits._
    val m = 10
    val up = (1 to m).map(i => ("up", i.toLong, i.toLong * 3))
    val flat = (1 to m).map(i => ("flat", i.toLong, 7L))
    val got = Events.mannKendallOf((up ++ flat).toDF("event_type", "d", "n"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("up")
    assert(s.getAs[Long]("s_stat") == m.toLong * (m - 1) / 2)
    val var18 = m.toLong * (m - 1) * (2 * m + 5)
    assert(s.getAs[Long]("var18") == var18)
    val z = (m * (m - 1) / 2.0 - 1.0) / math.sqrt(var18 / 18.0)
    assert(math.abs(s.getAs[Double]("z") -
      math.round(z * 10000) / 10000.0) < 1e-9)
    val f = got("flat")
    assert(f.getAs[Long]("s_stat") == 0L)
    assert(f.getAs[Long]("var18") == 0L)
    assert(f.getAs[Double]("z") == 0.0)
  }

  test("mann-kendall matches a scala pair-fold on the real daily series") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val daily = Tables.events(spark, SF)
      .select($"event_type", expr("unix_timestamp(ts) div 86400").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val ns = rows.sortBy(_._2).map(_._3).toSeq
      val sStat = (for { i <- ns.indices; j <- i + 1 until ns.length }
        yield java.lang.Long.signum(ns(j) - ns(i)).toLong).sum
      val ties = ns.groupBy(identity).values
        .map(g => { val t2 = g.size.toLong; t2 * (t2 - 1) * (2 * t2 + 5) }).sum
      val md = ns.length.toLong
      t -> ((sStat, md * (md - 1) * (2 * md + 5) - ties))
    }
    val got = Events.mannKendallDaily(spark, SF).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("s_stat"), r.getAs[Long]("var18")))).toMap
    assert(got == expected, s"$got vs $expected")
  }

  /** Scala reference fold for Theil–Sen: quantized pairwise slopes
    * via Java truncating division (the operator's documented `div`
    * semantics), median as lo+hi bracketing order stats.
    */
  private def senRef(rows: Seq[(Long, Long)]): (Long, Long) = {
    val sorted = rows.sortBy(_._1)
    val slopes = (for {
      i <- sorted.indices; j <- i + 1 until sorted.length
    } yield (sorted(j)._2 - sorted(i)._2) * 1000000L /
        (sorted(j)._1 - sorted(i)._1)).sorted
    val m = slopes.length
    (m.toLong, slopes((m + 1) / 2 - 1) + slopes(m / 2))
  }

  test("theil-sen: exact median slope incl. negative truncation; outlier-robust vs OLS") {
    import spark.implicits._
    // down: slope −1/3 per day → each pairwise slope −1000000/3Δ
    // exercises trunc-toward-zero on NEGATIVE operands in both the
    // operator and the scala fold (floor division would give −333334)
    val down = (0 to 6).map(i => ("down", i.toLong, 10L - i / 3))
    // robust: clean slope 2/day with one wild outlier day — the
    // median slope must stay 2.0 where OLS would be dragged
    val robust = (0 to 8).map(i =>
      ("robust", i.toLong, if (i == 4) 1000L else 5L + 2 * i))
    val df = (down ++ robust).toDF("event_type", "d", "n")
    val got = Events.theilSenOf(df).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((name, rows) <- Seq(
        "down" -> down.map(t => (t._2, t._3)),
        "robust" -> robust.map(t => (t._2, t._3)))) {
      val (m, x2) = senRef(rows)
      assert(got(name).getAs[Long]("n_pairs") == m, s"$name pairs")
      assert(got(name).getAs[Long]("sen_x2_micro") == x2,
        s"$name: ${got(name).getAs[Long]("sen_x2_micro")} vs $x2")
    }
    assert(got("robust").getAs[Double]("slope_per_day") == 2.0,
      "outlier day dragged the Sen slope")
    assert(got("down").getAs[Double]("slope_per_day") < 0.0)
  }

  test("theil-sen matches the scala fold on the real daily series") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val daily = Tables.events(spark, SF)
      .select($"event_type", expr("unix_timestamp(ts) div 86400").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      t -> senRef(rows.map(r => (r._2, r._3)).toSeq)
    }
    val got = Events.theilSenDaily(spark, SF).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("sen_x2_micro")))).toMap
    assert(got == expected.toMap, s"$got vs $expected")
  }

  test("kleinberg bursts: Viterbi == exhaustive state enumeration; planted burst recovered exactly") {
    import graft.operators.Events
    // exhaustive reference: minimum-cost state sequence over ALL 2^n
    // assignments — an algorithm the Viterbi shares no code with
    def brute(series: Seq[(Long, Long)], s: Double,
        gamma: Double): Seq[Int] = {
      val n = series.length
      val base = math.max(series.map(_._2).sum.toDouble / n, 1e-9)
      val burst = s * base
      val enter = gamma * math.log(n.toDouble)
      def cost(states: Seq[Int]): Double = {
        var c = 0.0; var prev = 0
        states.zip(series).foreach { case (st, (_, cnt)) =>
          if (st == 1 && prev == 0) c += enter
          val r = if (st == 1) burst else base
          c += -(cnt * math.log(r) - r)
          prev = st
        }
        c
      }
      (0 until (1 << n)).map(m => (0 until n).map(i => (m >> i) & 1))
        .minBy(cost)
    }
    def toIntervals(series: Seq[(Long, Long)], st: Seq[Int]) = {
      val out = Seq.newBuilder[(Long, Long, Long, Long)]
      var i = 0
      while (i < st.length) {
        if (st(i) == 1) {
          var j = i
          while (j < st.length && st(j) == 1) j += 1
          out += ((series(i)._1, series(j - 1)._1, (j - i).toLong,
            series.slice(i, j).map(_._2).sum))
          i = j
        } else i += 1
      }
      out.result()
    }
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 12) {
      val n = 8 + rnd.nextInt(5)
      val series = (0 until n).map(i =>
        (i.toLong, (2 + rnd.nextInt(10)).toLong))
      val got = Events.burstIntervals(series, 2.0, 1.0)
      val want = toIntervals(series, brute(series, 2.0, 1.0))
      assert(got == want, s"trial $trial: $got vs $want (series $series)")
    }
    // planted: flat 5/h with hours 10..13 at 25/h — the burst is
    // exactly that window
    val planted = (0L to 23L).map(h =>
      (h, if (h >= 10 && h <= 13) 25L else 5L))
    val got = Events.burstIntervals(planted, 2.0, 1.0)
    assert(got == Seq((10L, 13L, 4L, 100L)), s"planted: $got")
    // real corpus: intervals ordered, disjoint, within the spine
    val real = Events.bursts(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    real.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, "overlapping bursts")
      case _ =>
    }
    real.foreach { case (s0, e0, nh, _) =>
      assert(e0 - s0 + 1 >= nh || nh >= 1) }
  }

  /** Reference DTW: the full (n+1)×(m+1) textbook matrix, no rolling
    * rows — an independent spelling of the kernel's recurrence.
    */
  private def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
    if (a.isEmpty && b.isEmpty) return 0L
    if (a.isEmpty) return b.map(math.abs).sum
    if (b.isEmpty) return a.map(math.abs).sum
    val inf = Long.MaxValue / 4
    val dp = Array.fill(a.length + 1, b.length + 1)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(a.length)(b.length)
  }

  test("dtw kernel: identities, symmetry, phase forgiveness, and random ≡ full-matrix reference") {
    import spark.implicits._
    def k(a: Seq[Long], b: Seq[Long]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(call_function("dtw", $"a", $"b")).head.getLong(0)
    assert(k(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0L)
    // the defining property: a phase shift warps away for free where
    // Euclidean distance would pay |2-0|+|0-2| at the misalignment
    assert(k(Seq(0L, 1L, 2L, 0L), Seq(0L, 0L, 1L, 2L, 0L)) == 0L)
    assert(k(Seq(1L, 3L, 4L), Seq(1L, 4L)) == 1L) // 3 matches 4 at cost 1
    assert(k(Seq.empty, Seq(2L, -3L)) == 5L)      // documented empty rule
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val a = Seq.fill(rnd.nextInt(10) + 1)(rnd.nextInt(20).toLong)
      val b = Seq.fill(rnd.nextInt(10) + 1)(rnd.nextInt(20).toLong)
      assert(k(a, b) == refDtw(a, b), s"a=$a b=$b")
      assert(k(a, b) == k(b, a), "symmetry")
    }
  }

  test("dtw profiles gate: distances re-derive from driver-side hourly profiles") {
    import spark.implicits._
    val got = Events.dtwProfiles(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    val counts = Tables.events(spark, SF)
      .select($"event_type", hour($"ts").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(x => x).view.mapValues(_.length.toLong).toMap
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val prof = types.map(t =>
      t -> (0L to 23L).map(h => counts.getOrElse((t, h), 0L))).toMap
    val exp = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield (types(i), types(j)) -> refDtw(prof(types(i)), prof(types(j))))
      .toMap
    assert(got.toMap == exp, s"${got.toMap} vs $exp")
    // ordering contract: ascending distance, then types
    val ds = got.map(_._2)
    assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
  }

  test("classical decomposition: period-24 impulse series recovers the exact seasonal profile, edges trimmed") {
    import spark.implicits._
    import graft.operators.Events
    def hns(h: Long): Long = h * 3600L * 1000000000L
    // 72 hours: hod 0 gets 3 events, every other hour 1 event
    val rows = (0L until 72L).flatMap { t =>
      val k = if (t % 24 == 0) 3 else 1
      (0 until k).map(i => (t * 10 + i, hns(t), 1L, "view", 0.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("decomp").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.decomposeClassical(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.size == 24)
    // full-window centers are t in [12, 59]: every hod seen exactly
    // twice; the 2x24 MA of a pure period-24 series is the flat mean
    // 26/24, so trend_x48 = 52 everywhere: det = 48c - 52
    got.foreach { case (hod, nObs, detSum, seasonal) =>
      assert(nObs == 2L, s"hod $hod: n_obs $nObs")
      if (hod == 0L) {
        assert(detSum == 184L && seasonal == 1.9167,
          s"hod 0: ($detSum, $seasonal)")
      } else {
        assert(detSum == -8L && seasonal == -0.0833,
          s"hod $hod: ($detSum, $seasonal)")
      }
    }
  }

  test("holt: a linear ramp is a fixed point of the recursion — forecast extends it exactly; constant series stays flat") {
    import spark.implicits._
    import graft.operators.Events
    def hns(h: Long): Long = h * 3600L * 1000000000L
    def write(counts: Seq[Int], dir: String): String = {
      val rows = counts.zipWithIndex.flatMap { case (k, t) =>
        (0 until k).map(i => (t.toLong * 100 + i, hns(t.toLong), 1L,
          "view", 0.0, "{}"))
      }
      val tmp = java.nio.file.Files.createTempDirectory(dir).toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    // ramp 5,6,...,14: l_t = 1e6·x_t, b = 1e6 exactly at every step
    val ramp = Events.holtForecast(spark, write((5 to 14).toSeq, "holt1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ramp == (1L to 24L).map(h => (h, (14L + h) * 1000000L)),
      s"ramp fan wrong: ${ramp.take(3)}")
    // constant 7: level pinned, trend zero, flat fan
    val flat = Events.holtForecast(spark, write(Seq.fill(6)(7), "holt2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flat.forall(_._2 == 7000000L), s"flat fan wrong: ${flat.take(3)}")
  }

  test("pinball: perfect seasonal-naive forecast scores 0; a +1/day drift scores exactly tau/10") {
    import spark.implicits._
    import graft.operators.Events
    def hns(h: Long): Long = h * 3600L * 1000000000L
    def write(counts: Seq[Int], dir: String): String = {
      val rows = counts.zipWithIndex.flatMap { case (k, t) =>
        (0 until k).map(i => (t.toLong * 100 + i, hns(t.toLong), 1L,
          "view", 0.0, "{}"))
      }
      val tmp = java.nio.file.Files.createTempDirectory(dir).toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    val flat = Events.pinballBacktest(spark,
        write(Seq.fill(72)(2), "pin1")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(flat.map(_._1).toSeq == Seq(1L, 5L, 9L))
    assert(flat.forall(r => r._2 == 48L && r._3 == 0L && r._4 == 0.0))
    // y(t) = 1 + t div 24: every scored hour over-shoots yhat by 1
    val drift = Events.pinballBacktest(spark,
        write((0 until 72).map(t => 1 + t / 24), "pin2")).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(drift == Map(1L -> 0.1, 5L -> 0.5, 9L -> 0.9), s"got $drift")
  }

  test("holt-winters: a pure period-24 series is a fixed point — the fan reproduces the daily pattern exactly") {
    import spark.implicits._
    import graft.operators.Events
    def hns(h: Long): Long = h * 3600L * 1000000000L
    // m = 3 with deviations +2/-1/-1 at hods 0/1/2 (sum zero, so the
    // day-1 init lands exactly on l0 = 3e6 and s0 = the deviations;
    // every later step is then the identity)
    def d(hod: Long): Long = hod match {
      case 0 => 2; case 1 => -1; case 2 => -1; case _ => 0
    }
    val rows = (0L until 72L).flatMap { t =>
      val k = (3 + d(t % 24)).toInt
      (0 until k).map(i => (t * 100 + i, hns(t), 1L, "view", 0.0, "{}"))
    }
    val tmp = java.nio.file.Files.createTempDirectory("hw").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.holtWintersForecast(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lastH = 71L
    val want = (1L to 24L).map(h =>
      (h, (3L + d((lastH + h) % 24)) * 1000000L))
    assert(got == want, s"got ${got.take(5)} want ${want.take(5)}")
  }

  test("seasonal strength: a pure hour-of-week pattern reads 1e6, a constant series reads 0") {
    import graft.operators.Events
    import spark.implicits._
    def rows(k: Long => Int) = (0L until 336L).flatMap { h =>
      (0 until k(h)).map(i =>
        (h * 1000 + i, new java.sql.Timestamp(h * 3600000L), 1L, "view"))
    }
    // counts determined ONLY by the 168-cell hour-of-week position,
    // two full weeks: within-cell variance is exactly 0
    def cell(h: Long) = (h / 24) % 7 * 24 + h % 24
    val tmp = java.nio.file.Files.createTempDirectory("fs").toString
    rows(h => 1 + (cell(h) % 3).toInt)
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val pure = Events.seasonalStrength(spark, tmp).collect().head
    assert(pure.getAs[Long]("ss_within_micro") == 0L)
    assert(pure.getAs[Long]("strength_ppm") == 1000000L)
    // constant: the weekly pattern explains nothing (SS_total = 0)
    val tmp2 = java.nio.file.Files.createTempDirectory("fs2").toString
    rows(_ => 2).toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp2/events.parquet")
    val flat = Events.seasonalStrength(spark, tmp2).collect().head
    assert(flat.getAs[Long]("ss_total_micro") == 0L)
    assert(flat.getAs[Long]("strength_ppm") == 0L)
  }

  test("periodogram: a 24h impulse train reads full amplitude at p=24 and strictly less at 168; a constant series reads 0 at both") {
    import graft.operators.Events
    import spark.implicits._
    // impulse train over 14 days: y=24 every 24th hour, else absent
    val train = (0L until 336L by 24L).map(h => (h, 24L)).toDF("h", "y")
    val got = Events.periodogramOf(train).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(got(24L) == ((336L, 1000000L)), got.toString)
    assert(got(168L)._2 < 1000000L)
    // constant over exact common multiples of both periods: every
    // phase appears equally often, the quantized basis cancels pairwise
    val flat = (0L until 336L).map(h => (h, 5L)).toDF("h", "y")
    val f = Events.periodogramOf(flat).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(f(24L) == 0L && f(168L) == 0L, f.toString)
  }

  test("binseg: a planted level shift is recovered at its exact boundary with cost 0; a constant series has gain 0") {
    import graft.operators.Events
    import spark.implicits._
    // 6 days at 2, then 6 days at 10: the split after day 5 makes
    // both segments constant -> cost 0, gain = total SSE =
    // (624 - 72²/12)·1e6 = 192e6
    val shift = ((0L to 5L).map(d => (d, 2L)) ++
      (6L to 11L).map(d => (d, 10L))).toDF("d", "y")
    val r = Events.binsegDailyOf(shift).collect().head
    assert(r.getAs[Long]("split_last_left_day") == 5L)
    assert(r.getAs[Long]("n_left") == 6L && r.getAs[Long]("n_right") == 6L)
    assert(r.getAs[Long]("s_left") == 12L && r.getAs[Long]("s_right") == 60L)
    assert(r.getAs[Long]("cost_micro") == 0L)
    assert(r.getAs[Long]("sse0_micro") == 192000000L)
    assert(r.getAs[Long]("gain_micro") == 192000000L)
    // constant series: every split costs 0, argmin tie-breaks to the
    // earliest day, gain exactly 0
    val flat = (0L to 5L).map(d => (d, 5L)).toDF("d", "y")
    val f = Events.binsegDailyOf(flat).collect().head
    assert(f.getAs[Long]("split_last_left_day") == 0L)
    assert(f.getAs[Long]("gain_micro") == 0L)
    // degenerate single-distinct-day series: no i < n split exists,
    // so BOTH engines emit zero rows (the oracle's LIMIT-1 CTE joins
    // empty; the Spark global agg must not emit an all-NULL row)
    val single = Seq((3L, 7L)).toDF("d", "y")
    assert(Events.binsegDailyOf(single).collect().isEmpty)
    assert(Events.binsegDailyOf(single.limit(0)).collect().isEmpty)
  }

  test("entropy rate: deterministic chain reads 0, uniform fan-out reads ln k, pooled row is the weighted fold") {
    import graft.operators.Events
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val tmp = java.nio.file.Files.createTempDirectory("er").toString
    // user 1: a->b->a->b (froms: a->b, b->a, a->b — deterministic);
    // users 2,3: c->a and c->b (c fans out uniformly over 2 targets)
    val rows = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(1)),
      (3L, 1L, "a", ts(2)), (4L, 1L, "b", ts(3)),
      (5L, 2L, "c", ts(0)), (6L, 2L, "a", ts(1)),
      (7L, 3L, "c", ts(0)), (8L, 3L, "b", ts(1)))
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.entropyRate(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ln2 = 693147L
    assert(got("a") == ((2L, 0L))) // a always -> b
    assert(got("b") == ((1L, 0L))) // b always -> a
    assert(got("c") == ((2L, ln2))) // uniform over {a, b}
    // pooled: (2·0 + 1·0 + 2·ln2) div 5
    assert(got("ALL") == ((5L, 2L * ln2 / 5L)))
  }

  test("inter-arrival fit: constant gaps give the step ECDF — zero mass below the mean-side octiles, full mass above, ks at the j=5 octile") {
    import graft.operators.Events
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // one user, one type, 9 arrivals 100s apart: 8 identical gaps.
    // Exp thresholds at mean 100s: octiles j=1..5 sit BELOW 100s
    // (−ln(3/8) ≈ 0.98), j=6,7 above (ln 4 ≈ 1.39, ln 8 ≈ 2.08) —
    // the ECDF is a step at the constant, so f_emp is 0 then 10⁶
    val ev = (0L until 9L).map(i => (7L, ts(i * 100L), "a"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.interArrivalFitOf(ev).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet == (1L to 7L).toSet)
    (1L to 5L).foreach { j =>
      assert(got(j) == ((8L, 0L, 0L, j * 125000L, 625000L)),
        s"j=$j: ${got(j)}")
    }
    assert(got(6L) == ((8L, 8L, 1000000L, 250000L, 625000L)))
    assert(got(7L) == ((8L, 8L, 1000000L, 125000L, 625000L)))
    // two users with disjoint gap scales stay independent per type:
    // the lag window never crosses users
    val two = ((0L until 3L).map(i => (1L, ts(i * 10L), "b")) ++
      (0L until 3L).map(i => (2L, ts(1000000L + i * 1000L), "b")))
      .toDF("user_id", "ts", "event_type")
    val census = Events.interArrivalFitOf(two).collect()
    assert(census.forall(_.getLong(2) == 4L)) // 2 gaps per user, not 5
  }
}
