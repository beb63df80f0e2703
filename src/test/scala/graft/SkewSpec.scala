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

  test("heavy hitters ranks the hottest key first") {
    import spark.implicits._
    val df = Seq.fill(50)("hot").map(Tuple1(_)).toDF("k")
      .union(Seq("a", "b", "c").map(Tuple1(_)).toDF("k"))
    val top = Skew.heavyHitters(df, $"k", topN = 1).collect()(0)
    assert(top.getString(0) == "hot" && top.getLong(1) == 50L)
  }
}
