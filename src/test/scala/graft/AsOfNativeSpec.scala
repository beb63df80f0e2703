package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The native as-of join (custom LogicalPlan/Strategy/SparkPlan) must
  * be row-identical to the compositional asOf on every shape that has
  * bitten a merge-join implementation before: ties, misses, null
  * keys/times, keys present on one side only, empty partitions.
  */
class AsOfNativeSpec extends SparkSpec {

  private def compo(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOf(l, r, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect().map(x =>
        (x.getLong(0), if (x.isNullAt(3)) None else Some(x.getLong(3))))

  private def native(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOfNative(l, r, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect().map(x =>
        (x.getLong(0), if (x.isNullAt(3)) None else Some(x.getLong(3))))

  test("native ≡ compositional on crafted edge shapes") {
    import spark.implicits._
    // left: (id, k, t); right: (k, rt, v)
    val left = Seq(
      (1L, 10L, 100L),  // match at equal time
      (2L, 10L, 150L),  // latest of several
      (3L, 10L, 99L),   // before any right row -> null
      (4L, 20L, 500L),  // key with no right rows -> null
      (5L, 30L, 300L),  // tie: two right rows same (k, rt)
      (6L, 40L, 1L)     // right side has keys the left never probes
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L, 11L), (10L, 120L, 12L), (10L, 140L, 13L),
      (30L, 300L, 31L), (30L, 300L, 32L), // same time, payload tiebreak
      (35L, 1L, 99L),                     // unprobed key
      (40L, 5L, 41L)                      // after left's t=1 -> null
    ).toDF("k", "rt", "v")
    val exp = Seq(1L -> Some(11L), 2L -> Some(13L), 3L -> None,
      4L -> None, 5L -> Some(32L), 6L -> None)
    assert(native(left, right).toSeq == exp)
    assert(compo(left, right).toSeq == exp)
  }

  test("native ≡ compositional under nulls in keys and times") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(100L)), (2L, None, Some(100L)),
      (3L, Some(10L), None)
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), Some(50L), 1L), (None, Some(40L), 2L),
      (Some(10L), None, 3L)
    ).toDF("k", "rt", "v")
    val n = native(left, right).toSeq
    assert(n == compo(left, right).toSeq)
    assert(n == Seq(1L -> Some(1L), 2L -> None, 3L -> None),
      s"null semantics broken: $n")
  }

  test("native ≡ compositional on randomized streams across many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val left = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t").repartition(7)
    val right = (1 to 300).map(i =>
      (rnd.nextInt(16).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rt", "v").repartition(5)
    assert(native(left, right).toSeq == compo(left, right).toSeq)
  }

  test("plan: the custom exec is planned with two exchanges and streams in sorted order") {
    import spark.implicits._
    val left = Seq((1L, 1L, 1L)).toDF("id", "k", "t")
    val right = Seq((1L, 1L, 1L)).toDF("k", "rt", "v")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = AsOfJoin.asOfNative(left.repartition(4, $"id"),
      right.repartition(4, $"v"), Seq("k"), "t", "rt", Seq("v"))
    val plan =
      try df.queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val execs = plan.collect {
      case e: graft.plans.AsOfJoinExec => e }
    assert(execs.length == 1, s"AsOfJoinExec not planned:\n$plan")
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.shuffleOrigin ==
            org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e }
    assert(exchanges.length == 2,
      s"expected exactly 2 requirement exchanges:\n$plan")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "native path must carry no window")
  }

  test("gate twin: native gate rows == compositional gate rows on real events") {
    val a = AsOfJoin.eventsAsOfSignupNative(spark, SF)
      .orderBy("event_id").collect().map(_.toSeq)
    val b = AsOfJoin.eventsAsOfSignup(spark, SF)
      .orderBy("event_id").collect().map(_.toSeq)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y })
  }
}
