package graft

import graft.operators.Analytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** bandedNtile must be bit-identical to the SQL-standard NTILE over
  * the same total order — the banded two-phase rank is a plan
  * change, never a semantics change — including when band borders
  * split a bucket and when n % k forces uneven bucket sizes.
  */
class RfmSpec extends SparkSpec {

  private def ntileRef(rows: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = rows.toDF("key", "metric")
    df.withColumn("s",
        ntile(k).over(Window.orderBy($"metric", $"key")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  private def banded(rows: Seq[(Long, Long)], k: Int,
      bandWidth: Long): Map[Long, Long] = {
    import spark.implicits._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5)).toDF("key", "metric")
    Analytics.bandedNtile(df, "metric", expr(s"metric div $bandWidth"),
        tie = "key", k = k, out = "s")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("bandedNtile == ntile: uneven buckets (n=13, k=5) across band borders") {
    // metrics straddle band borders (width 10) mid-bucket; duplicate
    // metric values tie-broken by key
    val rows = Seq(1L -> 3L, 2L -> 3L, 3L -> 7L, 4L -> 12L, 5L -> 12L,
      6L -> 19L, 7L -> 21L, 8L -> 21L, 9L -> 21L, 10L -> 30L,
      11L -> 44L, 12L -> 44L, 13L -> 58L)
    assert(banded(rows, 5, 10L) == ntileRef(rows, 5))
  }

  test("bandedNtile == ntile: n < k, n == k, all-one-band, one-per-band") {
    val small = Seq(1L -> 5L, 2L -> 1L, 3L -> 9L)
    assert(banded(small, 5, 100L) == ntileRef(small, 5)) // n<k, one band
    val exact = (1L to 5L).map(i => i -> i * 7L)
    assert(banded(exact, 5, 1L) == ntileRef(exact, 5)) // one per band
    val rnd = new scala.util.Random(3)
    val big = (1L to 40L).map(i => i -> rnd.nextInt(100).toLong)
    assert(banded(big, 5, 25L) == ntileRef(big, 5))
    assert(banded(big, 7, 10L) == ntileRef(big, 7))
  }

  test("rfm census covers every customer exactly once; scores in 1..5") {
    import spark.implicits._
    val census = Analytics.rfmSegments(spark, SF).collect()
    val nCust = graft.Tables.orders(spark, SF)
      .select($"o_custkey").distinct().count()
    assert(census.map(_.getLong(3)).sum == nCust)
    census.foreach { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).foreach { s =>
        assert(s >= 1L && s <= 5L, s"score out of range: $r")
      }
    }
  }
}
