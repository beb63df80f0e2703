package graft

import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.StringType

/** ss_topk (SpaceSaving, HeavyHitters.scala) + bloom_agg /
  * bloom_might_contain (GraftExtensions.scala): the sketch claims —
  * exactness at sufficient capacity, the SpaceSaving error bounds
  * under eviction, the length-prefixed serialization, and the bloom
  * no-false-negative / bounded-false-positive contract.
  */
class HeavyHittersSpec extends SparkSpec {

  private def topk(rows: Seq[Row]): Seq[(Any, Long, Long)] =
    rows.map(r => (r.get(0), r.getLong(1), r.getLong(2)))

  test("ss_topk is exact (err=0, counts match groupBy) when capacity >= distinct keys") {
    import spark.implicits._
    // key_i appears i times, i in 1..40; shuffled + multi-partition so
    // the merge path runs
    val rows = scala.util.Random.shuffle((1 to 40).flatMap(i => Seq.fill(i)(f"key$i%02d")))
    rows.toDF("k").repartition(5).createOrReplaceTempView("ss_exact_in")
    val got = topk(spark.sql("SELECT ss_topk(k, 10, 64) AS t FROM ss_exact_in")
      .collect()(0).getSeq[Row](0))
    val expected = (40 to 31 by -1).map(i => (f"key$i%02d": Any, i.toLong, 0L))
    assert(got == expected)
  }

  test("ss_topk under eviction keeps the SpaceSaving bounds and all guaranteed-heavy keys") {
    import spark.implicits._
    // 5 heavy long keys (~200 each) + 95 light keys (3 each):
    // N ≈ 1285, capacity 16 → N/capacity ≈ 80, so the heavies MUST
    // surface; light keys may appear with est>true but never with
    // est-err > true.
    val trueCounts: Map[Long, Long] =
      ((1L to 5L).map(i => i -> (200L + i)) ++ (6L to 100L).map(_ -> 3L)).toMap
    val rows = scala.util.Random.shuffle(
      trueCounts.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) })
    rows.toDF("k").repartition(7).createOrReplaceTempView("ss_bound_in")
    val got = topk(spark.sql("SELECT ss_topk(k, 16, 16) AS t FROM ss_bound_in")
      .collect()(0).getSeq[Row](0))
    assert(got.nonEmpty && got.size <= 16)
    got.foreach { case (key, est, err) =>
      val truth = trueCounts(key.asInstanceOf[Long])
      assert(est >= truth, s"key $key: est $est under-counts true $truth")
      assert(est - err <= truth, s"key $key: est-err ${est - err} exceeds true $truth")
    }
    val returnedKeys = got.map(_._1.asInstanceOf[Long]).toSet
    (1L to 5L).foreach(h => assert(returnedKeys.contains(h), s"heavy key $h evicted"))
    // sorted est desc — heavies outrank every light key
    assert(got.take(5).map(_._1.asInstanceOf[Long]).toSet == (1L to 5L).toSet)
  }

  test("serialize round-trips a string key larger than 64 KB (writeUTF would throw)") {
    val agg = SpaceSavingTopK(
      BoundReference(0, StringType, nullable = true), Literal(5), Literal(8))
    val buf = agg.createAggregationBuffer()
    val big = "x" * 70000 // modified-UTF-8 length 70000 > 65535
    buf.offer(big, 3L, 1L, 8)
    buf.offer("small", 1L, 0L, 8)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.m.toMap == buf.m.toMap)
  }

  test("ss_topk end-to-end with >64 KB string keys across a shuffle") {
    import spark.implicits._
    val big = "y" * 70000
    (Seq.fill(10)(big) ++ Seq("a", "b")).toDF("k")
      .repartition(3).createOrReplaceTempView("ss_big_in")
    val got = topk(spark.sql("SELECT ss_topk(k, 1, 4) AS t FROM ss_big_in")
      .collect()(0).getSeq[Row](0))
    assert(got == Seq((big, 10L, 0L)))
  }

  test("ss_topk rejects non-numeric and non-positive k/capacity at analysis time") {
    import spark.implicits._
    Seq("a").toDF("k").createOrReplaceTempView("ss_bad_in")
    val nonNumeric = intercept[Exception](
      spark.sql("SELECT ss_topk(k, 5, 'x') FROM ss_bad_in").collect())
    assert(nonNumeric.getMessage.contains("numeric constants"))
    val nonPositive = intercept[Exception](
      spark.sql("SELECT ss_topk(k, 0, 5) FROM ss_bad_in").collect())
    assert(nonPositive.getMessage.contains("positive"))
  }

  test("bloom_agg/bloom_might_contain: zero false negatives, FPR near the 3% design point") {
    spark.range(0, 2000).toDF("k").createOrReplaceTempView("bloom_in")
    // every inserted key must probe true
    val falseNeg = spark.sql(
      """SELECT count(*) FROM bloom_in
         WHERE NOT bloom_might_contain(
           (SELECT bloom_agg(xxhash64(k), 2000) FROM bloom_in), xxhash64(k))""")
      .collect()(0).getLong(0)
    assert(falseNeg == 0L)
    // 10k disjoint probes: Spark's BloomFilterAggregate targets 3% FPP
    // at estItems — allow 2x headroom before calling it broken
    spark.range(1000000, 1010000).toDF("k").createOrReplaceTempView("bloom_probe")
    val falsePos = spark.sql(
      """SELECT count(*) FROM bloom_probe
         WHERE bloom_might_contain(
           (SELECT bloom_agg(xxhash64(k), 2000) FROM bloom_in), xxhash64(k))""")
      .collect()(0).getLong(0)
    assert(falsePos < 600, s"FPR ${falsePos / 10000.0} way above the 3% design point")
  }

  test("bloom_agg three-arg form (explicit numBits) builds a working filter") {
    // own view — no ordering dependency on the two-arg test above
    spark.range(0, 2000).toDF("k").createOrReplaceTempView("bloom3_in")
    val falseNeg = spark.sql(
      """SELECT count(*) FROM bloom3_in
         WHERE NOT bloom_might_contain(
           (SELECT bloom_agg(xxhash64(k), 2000, 100000) FROM bloom3_in), xxhash64(k))""")
      .collect()(0).getLong(0)
    assert(falseNeg == 0L)
  }
}
