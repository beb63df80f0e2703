package graft

import graft.operators.{Analytics, Pii}
import org.apache.spark.sql.functions._

/** Market-basket pair mining and the k-anonymity governance audit:
  * semantic equivalence of the map-side pair generation to the
  * self-join the oracle states, and the privacy contract (every
  * reported group is genuinely below k; nothing below k escapes).
  */
class MiningSpec extends SparkSpec {

  test("basket pair generation ≡ the self-join form, including duplicate parts") {
    import spark.implicits._
    // order 10 has part 7 twice → the (5,7) pair must count BOTH
    // line pairs; order 20 is a singleton (no pairs); order 30 has
    // all-distinct parts
    val li = Seq((10L, 5L), (10L, 7L), (10L, 7L), (20L, 9L),
      (30L, 1L), (30L, 2L), (30L, 3L)).toDF("l_orderkey", "l_partkey")
    val tmp = java.nio.file.Files.createTempDirectory("basket").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Analytics.basketPairs(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = li.select($"l_orderkey".as("k"), $"l_partkey".as("p1"))
    val b = li.select($"l_orderkey".as("k"), $"l_partkey".as("p2"))
    val joined = a.join(b, Seq("k")).filter($"p1" < $"p2")
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == joined, s"got=$got joined=$joined")
    assert(got.contains((5L, 7L, 2L)), s"duplicate-part support wrong: $got")
  }

  test("basket pairs: no exchange carries basket arrays — only scalars shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val shuffles =
      try Analytics.basketPairs(spark, SF).queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.output
      }
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // shuffle 1: partkey scalars keyed by orderkey (map-side partial
    // collect_list is fine — the FULL basket only exists post-merge,
    // map-side partials are per-task slices); the pair/count and
    // top-k exchanges must be pure scalars. Nothing corpus-sized
    // carries an array except the bounded per-order partial lists.
    assert(shuffles.length >= 2, s"expected ≥2 shuffles, got $shuffles")
    assert(shuffles.tail.forall(out => !out.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])),
      s"post-basket exchange carries arrays: ${shuffles.map(_.map(_.name))}")
  }

  test("expectations audit counts each planted violation class exactly once") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      // clean row
      (1L, 10L, "O", 100.0, ts("1995-06-01"), "1-URGENT"),
      // duplicate orderkey pair (1 uniqueness violation)
      (2L, 10L, "F", 200.0, ts("1996-06-01"), "2-HIGH"),
      (2L, 10L, "F", 210.0, ts("1996-07-01"), "2-HIGH"),
      // non-positive price + out-of-domain status
      (3L, 10L, "X", -5.0, ts("1997-06-01"), "3-MEDIUM"),
      // out-of-range date + orphan custkey
      (4L, 99L, "P", 50.0, ts("1999-06-01"), "4-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val cust = Seq((10L, "c10", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val tmp = java.nio.file.Files.createTempDirectory("expect").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    cust.write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = graft.operators.Analytics.expectations(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "custkey_not_null" -> 0L,
      "custkey_references_customer" -> 1L,
      "orderdate_in_range" -> 1L,
      "orderkey_unique" -> 1L,
      "status_in_domain" -> 1L,
      "totalprice_positive" -> 1L), s"got $got")
  }

  test("k-anonymity audit: reported groups are exactly those below k, and floors negative bands") {
    import spark.implicits._
    val reported = Pii.kAnonymity(spark, SF, k = 5).collect()
    assert(reported.nonEmpty)
    assert(reported.forall(_.getAs[Long]("group_size") < 5))
    // re-derive the full census: violating + compliant = all groups,
    // and no group below k is missing from the report
    val all = Tables.customer(spark, SF)
      .select($"c_nationkey", $"c_mktsegment",
        floor(round($"c_acctbal" * 100).cast("long").cast("double")
          / 200000.0).cast("long").as("bal_band"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band").count()
    val below = all.filter($"count" < 5).count()
    assert(reported.length.toLong == below,
      s"report ${reported.length} groups, census says $below")
    // negative balances exist in TPC-H-ish data and must floor DOWN
    // (band −1), not truncate toward zero into band 0 with the poor
    val negBands = all.filter($"bal_band" < 0).count()
    assert(negBands > 0, "fixture lost its negative-balance bands")
  }

  test("frequent triples equal a brute basket census; nested generation matches pair semantics one order up") {
    import spark.implicits._
    val baskets = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val brute = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
      .withDefaultValue(0L)
    baskets.values.foreach { parts =>
      for {
        i <- parts.indices; j <- (i + 1) until parts.length
        k <- (j + 1) until parts.length
        if parts(i) < parts(j) && parts(j) < parts(k)
      } brute((parts(i), parts(j), parts(k))) += 1L
    }
    val expected = brute.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(20)
      .map { case ((a, b, c), s) => (a, b, c, s) }
    val got = graft.operators.Analytics.basketTriples(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
  }

  test("growth accounting: crafted lifecycle classifies new/retained/resurrected/churned; identity holds") {
    import spark.implicits._
    def wNs(w: Long): Long = w * 604800L * 1000000000L
    // u1: weeks 0,1,3 → new@0, retained@1, churned@2, resurrected@3,
    //     churned@4 (4 not an active week → dropped from output)
    // u2: week 1 only → new@1, churned@2
    // u3: weeks 0,1 → new@0, retained@1, churned@2
    val ev = Seq(
      (1L, wNs(0), 1L), (2L, wNs(1), 1L), (3L, wNs(3), 1L),
      (4L, wNs(1), 2L),
      (5L, wNs(0), 3L), (6L, wNs(1) + 1000000000L, 3L))
      .map { case (id, ts, u) => (id, ts, u, "click", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("growth").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.operators.Analytics.growthAccounting(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // weeks output = active weeks {0, 1, 3}; week 2 has no activity
    // so its churn (u1, u2, u3 all) is not a reported row
    assert(got == Seq((0L, 2L, 0L, 0L, 0L), (1L, 1L, 2L, 0L, 0L),
      (3L, 0L, 0L, 1L, 0L)), s"got $got")
    // identity on the real corpus: active = new + retained + resurrected
    val corpus = graft.operators.Analytics.growthAccounting(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1) + r.getLong(2) + r.getLong(3)))
      .toMap
    val active = Tables.events(spark, SF)
      .select($"user_id", org.apache.spark.sql.functions.expr(
        "unix_micros(ts) div 604800000000").as("w"))
      .distinct().groupBy($"w").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(corpus == active,
      s"identity broken: ${corpus.toSet.diff(active.toSet).take(3)}")
  }

  test("association rules: supports, confidence, and lift re-derive from a basket fold") {
    import spark.implicits._
    val rules = graft.operators.Analytics.assocRules(spark, SF).collect()
    assert(rules.nonEmpty)
    val baskets = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemSupp = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = byOrder.size.toLong
    val pairSupp = byOrder.values
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rules.foreach { r =>
      val (a, c) = (r.getAs[Long]("ante"), r.getAs[Long]("cons"))
      val sAb = pairSupp(if (a < c) (a, c) else (c, a))
      assert(r.getAs[Long]("supp_ab") == sAb, s"supp mismatch $r")
      assert(r.getAs[Long]("supp_a") == itemSupp(a))
      assert(r.getAs[Long]("supp_b") == itemSupp(c))
      assert(r.getAs[Long]("conf_ppm") == sAb * 1000000L / itemSupp(a))
      assert(r.getAs[Long]("lift_ppm") ==
        sAb * n * 1000000L / (itemSupp(a) * itemSupp(c)))
      assert(sAb >= 3L, "min-support leak")
    }
    // lift ordering is respected and symmetric rules both appear when
    // both clear the cut (they share supp_ab so both were emitted)
    val lifts = rules.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }

  test("a-priori pruned triples equal the unpruned census at the same support") {
    import spark.implicits._
    val got = graft.operators.Analytics
      .triplesApriori(spark, SF, minSupport = 2L, topK = 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // unpruned: driver-side census over distinct baskets
    val baskets = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val exp = baskets.values
      .flatMap(_.combinations(3).map(t => (t(0), t(1), t(2))))
      .groupBy(identity(_)).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    assert(got == exp, s"pruned=$got unpruned=$exp")
    // the prune must actually bite: reduced baskets are narrower than
    // raw ones on this corpus (3445 surviving pairs of 115k)
    assert(exp.nonEmpty)
  }
}
