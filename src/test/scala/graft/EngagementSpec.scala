package graft

import graft.operators.Analytics

/** Ordered multi-step funnel and DAU/MAU stickiness. */
class EngagementSpec extends SparkSpec {

  test("funnel steps enforce STRICTLY-AFTER ordering on a crafted fixture") {
    import spark.implicits._
    val ev = Seq(
      // u1: clean view → click → purchase
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: purchased BEFORE clicking — reaches click, not purchase
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 20L),
      // u3: a click before the first view is ignored; the later one counts
      (3L, "click", 5L), (3L, "view", 10L), (3L, "click", 15L),
      (3L, "purchase", 20L),
      // u4: view only
      (4L, "view", 10L),
      // u5: click at the SAME instant as the view — strictly-after fails
      (5L, "view", 10L), (5L, "click", 10L),
      // u6: clicks but never views — not in the funnel at all
      (6L, "click", 5L))
      .toDF("user_id", "event_type", "tus")
    val got = Analytics.funnelStepsOf(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("1_view", 5L, 1000000L),
      ("2_click", 3L, 600000L),
      ("3_purchase", 2L, 666666L)), s"got ${got.toSeq}")
  }

  test("corpus funnel is monotone and ppm-consistent") {
    val rows = Analytics.funnelSteps(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length == 3)
    val ns = rows.map(_._2)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel not monotone: $rows")
    assert(rows(0)._3 == 1000000L)
    assert(rows(1)._3 == (if (ns(0) == 0) 0L else ns(1) * 1000000L / ns(0)))
    assert(rows(2)._3 == (if (ns(1) == 0) 0L else ns(2) * 1000000L / ns(1)))
  }

  test("DAU/MAU: dau ≤ mau, shared month denominator, exact ppm") {
    import spark.implicits._
    val rows = Analytics.dauStickiness(spark, SF)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, mau, ppm) =>
      assert(dau >= 1 && dau <= mau, s"$d: dau $dau vs mau $mau")
      assert(ppm == dau * 1000000L / mau, s"$d: ppm mismatch")
    }
    // every day of one calendar month reports the same MAU
    rows.groupBy { case (d, _, _, _) => (d.getYear, d.getMonthValue) }
      .foreach { case (m, rs) =>
        assert(rs.map(_._3).distinct.length == 1, s"month $m MAU varies") }
    // one row per distinct active day
    val nDays = Tables.events(spark, SF)
      .select(org.apache.spark.sql.functions.to_date($"ts")).distinct().count()
    assert(rows.length.toLong == nDays)
  }

  test("time-to-convert ≡ a scala first-to-first re-derivation; percentiles exact") {
    import spark.implicits._
    val ev = Tables.events(spark, SF)
      .select($"user_id", $"ts", $"event_type")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
    val signup = ev.filter(_._3 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val lat = signup.toSeq.flatMap { case (u, s) =>
      val ps = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2 >= s)
      // ms-domain re-derivation: µs diffs are whole ms in this corpus
      if (ps.isEmpty) None else Some((ps.map(_._2).min - s) / 1000)
    }.sorted
    assert(lat.nonEmpty, "corpus must convert somebody")
    def disc(p: Double): Long = lat(math.ceil(p * lat.size).toInt - 1)
    val r = graft.operators.Analytics.timeToConvert(spark, SF).head()
    assert(r.getLong(0) == lat.size.toLong)
    assert(r.getLong(1) == disc(0.5) && r.getLong(2) == disc(0.9))
    assert(r.getLong(3) == lat.max)
    assert(r.getLong(4) == signup.size.toLong)
  }

  test("cohort LTV ≡ scala re-derivation; cumulative telescopes; pre-signup purchases excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SF)
      .select($"user_id", expr("unix_timestamp(ts) div 604800").as("w"),
        $"event_type", expr("CAST(round(value * 1000000) AS BIGINT)").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val signup = ev.filter(_._3 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._2).min).toMap
    val purch = ev.filter(_._3 == "purchase")
      .flatMap { case (u, w, _, m) =>
        signup.get(u).filter(_ <= w).map(cw => ((cw, w - cw), m)) }
    val rev = purch.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sizes = signup.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = graft.operators.Analytics.cohortLtv(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.map(_._1).toSet == rev.keySet)
    // per-cohort: rev matches, cumulative telescopes, ltv floor-divides
    got.groupBy(_._1._1).foreach { case (cw, rows) =>
      var cum = 0L
      rows.sortBy(_._1._2).foreach { case ((_, widx), (r, c, u, l)) =>
        assert(r == rev((cw, widx)), s"rev at ($cw, $widx)")
        cum += r
        assert(c == cum, s"cumulative at ($cw, $widx)")
        assert(u == sizes(cw) && l == cum / u, s"ltv at ($cw, $widx)")
      }
    }
  }

  test("as-of features ≡ a scala fold at T; post-T activity moves nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SF)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_timestamp(ts)").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    // the cutoff: smallest es whose cumulative count reaches 80%
    val times = ev.map(_._4).sorted
    val t0 = times(math.ceil(times.length * 0.8).toInt - 1)
    val past = ev.filter(_._4 <= t0)
    val want = past.groupBy(_._1).map { case (u, es) =>
      val last = es.maxBy(e => (e._4, e._2))
      u -> ((es.size.toLong,
        es.count(_._4 > t0 - 7L * 86400).toLong,
        es.count(_._4 > t0 - 86400).toLong,
        t0 - es.map(_._4).max,
        es.map(_._3).distinct.size.toLong,
        last._3))
    }
    val got = graft.operators.Features.userFeaturesAsOf(spark, SF)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(got.keySet == want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)}")
    want.foreach { case (u, f) => assert(got(u) == f, s"user $u: ${got(u)} vs $f") }
    // leakage control: post-T events exist and are invisible
    assert(ev.exists(_._4 > t0), "fixture must have post-T activity")
  }

  test("SRM check: hash assignment on the corpus is balanced; statistic ≡ scala; flag fires iff chi2 > 3.8415") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = graft.operators.Analytics.abSrmCheck(spark, SF).head
    val (n, a, b) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(a + b == n)
    val chi2 = (a - b).toDouble * (a - b) / n
    assert(math.abs(r.getDouble(3) -
      math.floor(chi2 * 1e4 + 0.5) / 1e4) < 2e-4)
    assert(r.getBoolean(4) == ((a - b) * (a - b) * 10000L > 38415L * n))
    // a healthy md5 split must NOT flag on the real corpus
    assert(!r.getBoolean(4), s"hash split flagged SRM: a=$a b=$b")
    // and the flag itself is live: a deliberately lopsided count does trip it
    assert((900L - 100L) * (900L - 100L) * 10000L > 38415L * 1000L)
  }

  test("Welch t readout ≡ scala from the same integer moments") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = Tables.events(spark, SF)
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("CAST(round(value * 1000000) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def bucket(u: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${u}ab".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      BigInt(md5.take(7), 16).toLong % 1000
    }
    val (a, b) = xs.partition(x => bucket(x._1) % 2 == 0)
    def mom(g: Seq[Long]): (Long, Long, Long) =
      (g.size.toLong, g.sum, g.map(x => x * x).sum)
    val (n1, s1, q1) = mom(a.map(_._2).toSeq)
    val (n2, s2, q2) = mom(b.map(_._2).toSeq)
    def vd(n: Long, s: Long, q: Long) =
      (n.toDouble * q - s.toDouble * s) / (n.toDouble * (n.toDouble - 1.0))
    val t = (s1.toDouble / n1 - s2.toDouble / n2) /
      math.sqrt(vd(n1, s1, q1) / n1 + vd(n2, s2, q2) / n2)
    val r = graft.operators.Analytics.abTtest(spark, SF).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((n1, s1, n2, s2)))
    assert(math.abs(r.getDouble(4) -
      math.floor(t * 1e4 + 0.5) / 1e4) < 2e-4, s"t=${r.getDouble(4)} vs $t")
    // a null effect on a hash split: |t| should be unremarkable
    assert(math.abs(r.getDouble(4)) < 5.0, s"suspicious t on a null split")
  }
}
