package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join row-for-row") {
    import spark.implicits._
    val li = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
    // small side keyed identically to the fact's join column
    val small = Tables.supplier(spark, SF)
      .select($"s_suppkey".as("l_suppkey"), $"s_name")
    val plain = li.join(small, Seq("l_suppkey"))
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(li, small, "l_suppkey", factor = 8)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("heavy hitters ranks the hottest key first (sketch path, exact at capacity)") {
    import spark.implicits._
    val df = Seq.fill(50)("hot").map(Tuple1(_)).toDF("k")
      .union(Seq("a", "b", "c").map(Tuple1(_)).toDF("k"))
    val top = Skew.heavyHitters(df, $"k", topN = 1).collect()(0)
    assert(top.getString(0) == "hot" && top.getLong(1) == 50L
      && top.getLong(2) == 0L)
  }

  test("sketch heavy hitters matches the exact groupBy on real data") {
    import spark.implicits._
    val li = Tables.lineitem(spark, SF)
    // 10 supplier keys at sf0.001 — capacity default far exceeds it,
    // so the sketch is exact and must agree with the full shuffle
    val sketch = Skew.heavyHitters(li, $"l_suppkey", topN = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Skew.heavyHittersExact(li, $"l_suppkey", topN = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sketch.map(_._2) == exact.map(_._2)) // same count profile
    assert(sketch.toMap == exact.toMap)         // same key → count
  }

  test("sketch heavy hitters plan: single sketch aggregate, no key-space shuffle") {
    import spark.implicits._
    val plan = Skew.heavyHitters(Tables.lineitem(spark, SF), $"l_suppkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ss_topk"))
    // the point of the sketch path: no exchange hash-partitions on the
    // key (that is the exact path's full key-space shuffle). Asserting
    // the ABSENCE of that pattern is robust to AQE's plan-string form
    // and exchange-count drift, unlike an exact substring count.
    assert(!plan.contains("hashpartitioning(l_suppkey"),
      s"sketch path must not shuffle the key space:\n$plan")
  }
}
