package graft

import graft.operators.DecisionSupport
import org.apache.spark.sql.functions._

/** Cross-reconciliation properties for the classic decision-support
  * shapes — each gate's aggregate structure is re-derived from an
  * independent composition so a silently-wrong join or filter can't
  * hide behind a green compile.
  */
class DecisionSupportSpec extends SparkSpec {

  /** Timestamps surface as LocalDateTime (NTZ) or java.sql.Timestamp
    * depending on the physical parquet dtype — normalize. */
  private def ldt(v: Any): java.time.LocalDateTime = v match {
    case l: java.time.LocalDateTime => l
    case t: java.sql.Timestamp => t.toLocalDateTime
    case x => sys.error(s"unexpected timestamp class: ${x.getClass}")
  }

  test("q13: histogram mass reconciles to customers and orders") {
    import spark.implicits._
    val hist = DecisionSupport.q13CustDist(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val customers = Tables.customer(spark, SF).count()
    val orders = Tables.orders(spark, SF)
      .filter($"o_orderpriority" =!= "1-URGENT").count()
    assert(hist.map(_._2).sum == customers,
      "every customer lands in exactly one count bucket")
    assert(hist.map { case (k, n) => k * n }.sum == orders,
      "bucket mass re-adds to the filtered order count")
  }

  test("q14: promo share is a sub-sum of total") {
    val r = DecisionSupport.q14PromoRevenue(spark, SF).collect()(0)
    assert(r.getLong(1) > 0L, "window must capture revenue")
    assert(r.getLong(0) >= 0L && r.getLong(0) <= r.getLong(1))
  }

  test("q15: every returned supplier carries the exact max revenue") {
    import spark.implicits._
    val rows = DecisionSupport.q15TopSupplier(spark, SF).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(2)).distinct
    assert(revs.length == 1, s"all winners tie at the max: ${revs.toSeq}")
    // independent max: plain agg over the same quarter
    val direct = Tables.lineitem(spark, SF)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(10000L) - expr("CAST(round(l_discount * 10000) AS BIGINT)")))
        .as("r"))
      .agg(max($"r")).collect()(0).getLong(0)
    assert(revs.head == direct)
  }

  test("q17: small-quantity lines are a strict subset with consistent sums") {
    val r = DecisionSupport.q17SmallQty(spark, SF).collect()(0)
    val (total, avgYearly, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0L, "the brand/type cut must select some below-avg lines")
    assert(avgYearly == total / 7L)
  }

  test("q18: survivors clear the threshold and cap at 100") {
    import spark.implicits._
    val rows = DecisionSupport.q18LargeVolume(spark, SF, minQty = 150L)
      .collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getLong(5) > 150L))
    // price ordering is descending
    val prices = rows.map(_.getLong(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q19: disjunctive revenue equals the sum of its exclusive branches") {
    import spark.implicits._
    val r = DecisionSupport.q19Disjunctive(spark, SF).collect()(0)
    val revenue = if (r.isNullAt(0)) 0L else r.getLong(0)
    val n = r.getLong(1)
    // brands are disjoint, so the OR is a disjoint union: re-derive
    // per-branch counts independently and compare
    val li = Tables.lineitem(spark, SF)
      .select($"l_partkey", expr("CAST(l_quantity AS BIGINT)").as("q_i"))
      .join(Tables.part(spark, SF).select($"p_partkey", $"p_brand", $"p_size"),
        $"l_partkey" === $"p_partkey")
    val branches = Seq(
      ("Brand#2", 1, 15, 1L, 15L), ("Brand#12", 10, 30, 10L, 25L),
      ("Brand#22", 20, 50, 20L, 40L))
    val perBranch = branches.map { case (b, s0, s1, q0, q1) =>
      li.filter($"p_brand" === b && $"p_size".between(s0, s1) &&
        $"q_i".between(q0, q1)).count()
    }.sum
    assert(n == perBranch, s"OR count $n != disjoint branch sum $perBranch")
    assert(revenue >= 0L)
  }

  test("q22: segment counts re-add to an independent exists-style count") {
    import spark.implicits._
    val rows = DecisionSupport.q22IdleBalance(spark, SF).collect()
    val gateTotal = rows.map(_.getLong(1)).sum
    val cust = Tables.customer(spark, SF)
      .select($"c_custkey",
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
    val pos = cust.filter($"bal_c" > 0L)
      .agg(sum($"bal_c"), count(lit(1))).collect()(0)
    val (sumPos, nPos) = (pos.getLong(0), pos.getLong(1))
    val active = Tables.orders(spark, SF)
      .filter($"o_orderdate" >= "1999-01-01")
      .select($"o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val direct = cust.collect().count { r =>
      r.getLong(1) * nPos > sumPos && !active.contains(r.getLong(0))
    }
    assert(gateTotal == direct, s"gate $gateTotal != direct $direct")
  }

  test("q8: per-year nation volume never exceeds the region total") {
    val rows = DecisionSupport.q8MarketShare(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= r.getLong(2),
        s"year ${r.getLong(0)}: nation ${r.getLong(1)} > total ${r.getLong(2)}")
    }
  }

  test("q6: band revenue re-adds from a driver-side fold over raw lines") {
    import spark.implicits._
    val r = DecisionSupport.q6RevenueBand(spark, SF).collect()(0)
    val raw = Tables.lineitem(spark, SF)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)"),
        expr("CAST(l_quantity AS BIGINT)"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .filter { case (_, db, q) => db >= 500L && db <= 700L && q < 24L }
    assert(r.getLong(1) == raw.length)
    assert(r.getLong(0) == raw.map { case (pc, db, _) => pc * db }.sum)
  }

  test("q4: semi-join counts each order once however many lines are late") {
    import spark.implicits._
    val gate = DecisionSupport.q4LatePriority(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ords = Tables.orders(spark, SF)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority").collect()
      .map(r => (r.getLong(0), ldt(r.get(1)), r.getString(2)))
    val lines = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_shipdate").collect()
      .map(r => (r.getLong(0), ldt(r.get(1))))
      .groupBy(_._1)
    val direct = ords.filter { case (ok, od, _) =>
      lines.getOrElse(ok, Array.empty[(Long, java.time.LocalDateTime)])
        .exists(_._2.isAfter(od.plusDays(90)))
    }.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    assert(gate == direct, s"gate $gate != driver re-count $direct")
  }

  test("q12: high+low counts re-add to the late-line census per status") {
    import spark.implicits._
    val gate = DecisionSupport.q12ShipmodePriority(spark, SF).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pri = Tables.orders(spark, SF)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority").collect()
      .map(r => r.getLong(0) -> ((ldt(r.get(1)), r.getString(2)))).toMap
    val direct = Tables.lineitem(spark, SF)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
      .select($"l_orderkey", $"l_shipdate", $"l_linestatus").collect()
      .flatMap { r =>
        val (od, p) = pri(r.getLong(0))
        if (ldt(r.get(1)).isAfter(od.plusDays(60)))
          Some(r.getString(2) -> (p == "1-URGENT" || p == "2-HIGH"))
        else None
      }
      .groupBy(_._1).view.mapValues { xs =>
        (xs.count(_._2).toLong, xs.count(!_._2).toLong)
      }.toMap
    assert(gate == direct, s"gate $gate != driver re-count $direct")
  }

  test("q10: the returned top-k is the prefix of the full revenue ordering") {
    import spark.implicits._
    val top = DecisionSupport.q10ReturnedItems(spark, SF, k = 20).collect()
    assert(top.length == 20)
    val full = DecisionSupport.q10ReturnedItems(spark, SF, k = Int.MaxValue)
      .collect()
    assert(full.length >= 20)
    assert(top.map(_.getLong(0)).toSeq == full.take(20).map(_.getLong(0)).toSeq)
    val revs = top.map(_.getLong(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q2: every returned (part, supplier) achieves that part's exact min") {
    import spark.implicits._
    val rows = DecisionSupport.q2MinCostSupplier(spark, SF).collect()
    assert(rows.nonEmpty)
    // independent per-part min over the same cut
    val mins = Tables.lineitem(spark, SF)
      .join(Tables.part(spark, SF)
        .filter($"p_type" === "LARGE" && $"p_size".between(10, 30)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey")
      .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(6) == mins(r.getLong(3)),
        s"part ${r.getLong(3)}: cost ${r.getLong(6)} != min ${mins(r.getLong(3))}")
    }
    assert(rows.map(_.getLong(3)).distinct.length == mins.size,
      "every part in the cut with supply appears at least once")
  }

  test("q21: aggregation rewrite == brute-force exists/not-exists fold") {
    import spark.implicits._
    val gate = DecisionSupport.q21SoleLateSupplier(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ords = Tables.orders(spark, SF).filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate").collect()
      .map(r => r.getLong(0) -> ldt(r.get(1))).toMap
    val os = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), ldt(r.get(2))))
      .filter(t => ords.contains(t._1))
      .groupBy(t => (t._1, t._2)).map { case ((ok, sk), ts) =>
        (ok, sk, ts.exists(_._3.isAfter(ords(ok).plusDays(90))))
      }.toSeq
    val byOrder = os.groupBy(_._1)
    val names = Tables.supplier(spark, SF).select($"s_suppkey", $"s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = os.filter { case (ok, sk, late) =>
      val others = byOrder(ok).filter(_._2 != sk)
      late && others.nonEmpty && !others.exists(_._3)
    }.groupBy(t => names(t._2)).view.mapValues(_.size.toLong).toMap
    assert(gate == direct, s"gate $gate != brute fold $direct")
  }

  test("q9/q11/q16/q20 shapes: driver-side re-derivations and cut invariants on the real corpus") {
    import spark.implicits._
    import graft.operators.DecisionSupport
    // q9: exact profit recompute
    val li = Tables.lineitem(spark, SF)
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice",
        $"l_discount", $"l_quantity", year($"l_shipdate").as("yr"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 100), math.round(r.getDouble(3) * 100),
        math.round(r.getDouble(4)), r.getInt(5)))
    val retail = Tables.part(spark, SF)
      .filter($"p_name".contains("widget"))
      .select("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    val supNat = Tables.supplier(spark, SF).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("s_nationkey")).toMap
    val natName = Tables.nation(spark, SF).collect()
      .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val expected = li.filter(x => retail.contains(x._1))
      .groupBy(x => (natName(supNat(x._2)), x._6.toLong))
      .view.mapValues(_.map(x =>
        x._3 * (100L - x._4) - 60L * x._5 * retail(x._1)).sum).toMap
    val q9 = DecisionSupport.q9ProfitShape(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(q9 == expected, s"q9 mismatch: ${q9.size} vs ${expected.size}")
    // q11: threshold strict, emitted set = filtered set
    val q11 = DecisionSupport.q11ImportantParts(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (q11.nonEmpty) {
      val tot = li.filter(x => natName(supNat(x._2)) == "NATION_7")
        .map(_._3).sum
      q11.foreach { case (_, v) => assert(v * 2000L > tot) }
    }
    // q16: the negated cut and the flagged exclusion hold
    val flagged = Tables.supplier(spark, SF)
      .filter($"s_acctbal" < 0).collect().map(_.getLong(0)).toSet
    val q16 = DecisionSupport.q16SupplierCensus(spark, SF).collect()
    q16.foreach { r =>
      assert(r.getString(0) != "Brand#1" && !r.getString(1).startsWith("PROMO"))
      assert(r.getLong(3) >= 1L)
    }
    // q20: every emitted supplier dominates at least one widget part in 1997
    val qty = li.filter(x => retail.contains(x._1) && x._6 == 1997)
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._5).sum).toMap
    val tots = qty.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val dominant = qty.collect {
      case ((p, s), own) if 2 * own > tots(p) => s }.toSet
    val supName = Tables.supplier(spark, SF).collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("s_suppkey")).toMap
    DecisionSupport.q20ExcessSuppliers(spark, SF).collect().foreach { r =>
      val sk = supName(r.getString(0))
      assert(dominant.contains(sk), s"supplier $sk not dominant")
      assert(natName(supNat(sk)) == "NATION_3")
    }
  }
}
