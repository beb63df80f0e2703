package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** topk_by must equal the ROW_NUMBER window spelling on every input —
  * the bounded buffer is a plan change, never a semantics change —
  * including tie-heavy keys, string payloads (binary UTF-8 order),
  * k larger than the group, and any partitioning (merge exactness).
  */
class TopKAggSpec extends SparkSpec {

  private def windowRef(rows: Seq[(String, Long, Long)],
      k: Int): Set[(String, Long, Long)] = {
    import spark.implicits._
    rows.toDF("g", "key", "p")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"key".desc, $"p")))
      .filter($"rk" <= k)
      .select($"g", $"key", $"p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def aggForm(rows: Seq[(String, Long, Long)], k: Int,
      parts: Int): Set[(String, Long, Long)] = {
    import spark.implicits._
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("g", "key", "p")
      .groupBy($"g").agg(expr(s"topk_by(key, p, $k)").as("top"))
      .select($"g", explode($"top").as("t"))
      .select($"g", $"t.key", $"t.payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("topk_by == row_number window on tie-heavy random data across partitionings") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(10).toLong, i.toLong)
    }
    for (k <- Seq(1, 3, 7); parts <- Seq(2, 9)) {
      assert(aggForm(rows, k, parts) == windowRef(rows, k),
        s"mismatch at k=$k parts=$parts")
    }
  }

  test("k larger than the group returns the whole group, sorted") {
    import spark.implicits._
    val got = spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(("a", 5L, 1L), ("a", 9L, 2L), ("a", 5L, 0L)), 3))
      .toDF("g", "key", "p")
      .groupBy($"g").agg(expr("topk_by(key, p, 100)").as("top"))
      .select($"top").head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((9L, 2L), (5L, 0L), (5L, 1L)), s"got $got")
  }

  test("string payloads order in binary UTF-8; null keys and payloads ignored") {
    import spark.implicits._
    val df = Seq(
      ("a", java.lang.Long.valueOf(7L), "bb"),
      ("a", java.lang.Long.valueOf(7L), "aa"),
      ("a", java.lang.Long.valueOf(7L), null),
      ("a", null.asInstanceOf[java.lang.Long], "zz"),
      ("a", java.lang.Long.valueOf(3L), "cc"))
      .toDF("g", "key", "p")
    val got = df.groupBy($"g").agg(expr("topk_by(key, p, 2)").as("top"))
      .select($"top").head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got == Seq((7L, "aa"), (7L, "bb")), s"got $got")
  }
}
