package graft

import graft.operators.DecisionSupport
import org.apache.spark.sql.functions._

/** Cross-reconciliation properties for the classic decision-support
  * shapes — each gate's aggregate structure is re-derived from an
  * independent composition so a silently-wrong join or filter can't
  * hide behind a green compile.
  */
class DecisionSupportSpec extends SparkSpec {

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
}
