package graft

import org.apache.spark.sql.functions._

class OlapSpec extends SparkSpec {

  test("HLL approx distinct within 5% of exact (the 100 TB path)") {
    import spark.implicits._
    val ev = Tables.events(spark, SF)
    val exact = ev.select(count_distinct($"user_id")).collect()(0).getLong(0)
    val approx = ev.select(approx_count_distinct($"user_id", rsd = 0.02))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx quantiles bracket the exact median") {
    import spark.implicits._
    val ev = Tables.events(spark, SF)
    val exact = ev.select(percentile($"value", lit(0.5)))
      .collect()(0).getDouble(0)
    val Array(approx) = ev.stat.approxQuantile("value", Array(0.5), 0.01)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("rollup computes all grouping levels in one Expand pass") {
    val plan = graft.operators.Olap.rollupOrders(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup not planned as Expand:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"rollup should need at most one shuffle:\n$plan")
  }
}
