package graft

import graft.operators.Pii
import org.apache.spark.sql.functions.col

/** PII redaction on crafted strings: the gate proves cross-engine
  * regex equality on the synthetic tail; this spec pins the pattern
  * SEMANTICS — what each class must and must not match.
  */
class PiiSpec extends SparkSpec {

  private def run(texts: (Long, String)*): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id") +: Pii.redactCols(col("text")): _*)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))))
      .toMap
  }

  test("e-mail, IP, and phone are each detected and redacted") {
    val out = run(
      1L -> "write to jane.doe+spam@sub.example.org today",
      2L -> "server at 192.168.0.1 answered",
      3L -> "call +1 (555) 010-4242 now")
    assert(out(1L) == ((1L, 0L, 0L, "write to <EMAIL> today")))
    assert(out(2L) == ((0L, 1L, 0L, "server at <IP> answered")))
    assert(out(3L) == ((0L, 0L, 1L, "call <PHONE> now")))
  }

  test("all three classes in one document, counted independently") {
    val (ne, ni, np, red) =
      run(1L -> "a@b.com vs 10.0.0.1 vs 555-123456")(1L)
    assert((ne, ni, np) == ((1L, 1L, 1L)))
    assert(red == "<EMAIL> vs <IP> vs <PHONE>")
  }

  test("non-PII near-misses stay untouched") {
    val out = run(
      1L -> "versions 1.2.3.4a and 1.2 are fine",   // no \b after octet / too few
      2L -> "user at host dot com",                  // no @
      3L -> "short 12345 digits")                    // under phone's 7-char floor
    assert(out(1L) == ((0L, 0L, 0L, "versions 1.2.3.4a and 1.2 are fine")))
    assert(out(2L) == ((0L, 0L, 0L, "user at host dot com")))
    assert(out(3L) == ((0L, 0L, 0L, "short 12345 digits")))
  }

  test("dotted IP is not half-eaten by the phone pattern") {
    // phone class has no '.', so redaction order can't produce
    // <PHONE> fragments out of an IP's octets
    val (_, ni, np, red) = run(1L -> "from 10.255.0.255 thanks")(1L)
    assert((ni, np) == ((1L, 0L)))
    assert(red == "from <IP> thanks")
  }

  test("the gate's synthetic tail detects exactly one of each class") {
    val gate = Pii.piiRedact(spark, SF)
    assert(gate.count() > 0)
    val bad = gate.filter(
      col("n_email") =!= 1L || col("n_ip") =!= 1L || col("n_phone") =!= 1L)
    assert(bad.count() == 0)
    val leftover = gate.filter(
      col("redacted").rlike("@|[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"))
    assert(leftover.count() == 0)
  }

  test("l-diversity: flagged groups re-derive from a driver fold and are exactly the low-diversity set") {
    import spark.implicits._
    import graft.operators.Pii
    val got = Pii.lDiversity(spark, SF).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val rows = Tables.customer(spark, SF)
      .select($"c_nationkey",
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.round($"c_acctbal" * 100)
            .cast("long").cast("double") / 200000.0).cast("long"),
        $"c_mktsegment").collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getAs[Number](1).longValue),
        r.getString(2)))
    val exp = rows.groupBy(_._1).collect {
      case (qi, members) if members.map(_._2).distinct.length < 3 =>
        val byseg = members.groupBy(_._2).view.mapValues(_.length).toMap
        val dominant = byseg.toSeq.maxBy { case (seg, n) => (n, seg) }._1
        qi -> ((byseg.size.toLong, members.length.toLong, dominant))
    }
    assert(got == exp, s"${got.toSeq.sortBy(_._1)} vs ${exp.toSeq.sortBy(_._1)}")
    // every flagged group is below l; none of the unflagged are
    assert(got.values.forall(_._1 < 3L))
  }

  test("t-closeness: a planted pure cell reads its hand-computed total variation; balanced cells stay below the default bar") {
    import spark.implicits._
    import graft.operators.Pii
    // two nations, two balance bands. nation 0 spreads 4 segments
    // evenly in both bands; nation 1 packs band 0 with pure 'AUTO'
    // (the disclosure) and keeps band 1 even. The pure cell also
    // drags the GLOBAL distribution AUTO-ward, so the even cells sit
    // at a small-but-nonzero TV — both levels are asserted.
    val segs = Seq("AUTO", "BUILDING", "FURNITURE", "MACHINERY")
    val uniform = for {
      b <- Seq(0, 1); i <- 0 until 4
      r <- 0 until 3
    } yield (0L, segs(i), b * 2000.0 + 100.0)
    val skewed = Seq.fill(8)((1L, "AUTO", 100.0)) ++
      (0 until 8).map(i => (1L, segs(i % 4), 2100.0))
    val all = uniform ++ skewed
    val df = all.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    // hand fold of the gate's quantized arithmetic
    val nTot = all.size.toLong
    val globalPpm = segs.map(sg => sg ->
      math.round(all.count(_._2 == sg).toDouble * 1e6 / nTot)).toMap
    def tv(nk: Long, band: Long): Long = {
      val cell = all.filter(r => r._1 == nk &&
        (r._3 / 2000.0).toLong == band)
      segs.map { sg =>
        math.abs(math.round(cell.count(_._2 == sg).toDouble * 1e6
          / cell.size) - globalPpm(sg))
      }.sum / 2
    }
    // pure AUTO cell: global is 16/40 AUTO, 8/40 others →
    // TV = ½(0.6 + 3·0.2) = 0.6
    assert(tv(1L, 0L) == 600000L && tv(0L, 0L) == 150000L)
    // default bar (0.3): ONLY the pure cell trips
    val strict = Pii.tClosenessOf(df, tPpm = 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(strict == Map((1L, 0L) -> ((8L, 600000L))), strict.toString)
    // a 0.1 bar also surfaces the even cells at their exact TV (the
    // global shift the pure cell itself caused)
    val loose = Pii.tClosenessOf(df, tPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(loose((0L, 0L)) == 150000L && loose((0L, 1L)) == 150000L &&
      loose((1L, 1L)) == 150000L && loose((1L, 0L)) == 600000L)
  }

  test("generalization ladder: nested levels are monotone, exactly one chosen = minimal achieving level") {
    import graft.operators.Pii
    val rows = Pii.generalizationLadder(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L))
    // each level is a coarsening of the previous: groups merge, so
    // group count can't grow, the min group can't shrink, and no row
    // becomes newly at-risk
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2, s"n_groups grew ${a} -> ${b}")
      assert(b._3 >= a._3, s"min_group shrank ${a} -> ${b}")
      assert(b._5 <= a._5, s"rows_at_risk grew ${a} -> ${b}")
    }
    assert(rows.count(_._6 == 1L) == 1, "exactly one chosen level")
    val chosen = rows.find(_._6 == 1L).get._1
    val achieving = rows.filter(_._4 == 0L).map(_._1)
    if (achieving.nonEmpty) assert(chosen == achieving.min)
    else assert(chosen == 3L)
  }
}
