package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def ts(m: Long) = new Timestamp(1704067200000L + m * 60000L)

  test("band join matches the naive inequality join exactly") {
    import spark.implicits._
    // rights at minutes 0..59 for one key; left at minute 10, band 30'
    val left = Seq((1L, ts(10), 7L)).toDF("lid", "lts", "k")
    val right = (0L until 60L).map(m => (7L, ts(m), m))
      .toDF("k", "rts", "rid")
    val banded = RangeJoin.bandJoin(left, right, Seq("k"), "lts", "rts",
        band = 30L * 60 * 1000000)
      .select($"rid").collect().map(_.getLong(0)).toSet
    val naive = left.join(right, Seq("k"))
      .filter($"rts" >= $"lts" &&
        $"rts" < org.apache.spark.sql.functions.expr("lts + INTERVAL 30 MINUTES"))
      .select($"rid").collect().map(_.getLong(0)).toSet
    assert(banded == naive)
    assert(banded == (10L until 40L).toSet)
  }

  test("no broadcast nested loop in the banded plan") {
    import spark.implicits._
    val left = Seq((1L, ts(10), 7L)).toDF("lid", "lts", "k")
    val right = Seq((7L, ts(5), 1L)).toDF("k", "rts", "rid")
    val plan = RangeJoin.bandJoin(left, right, Seq("k"), "lts", "rts",
        band = 60000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to nested loop:\n$plan")
  }
}
