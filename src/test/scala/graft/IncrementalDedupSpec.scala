package graft

import graft.operators.{MinHashLSH, Sampling}
import org.apache.spark.sql.functions._

/** Incremental (batch-vs-index) near-dedup must agree with the full
  * corpus run: restricting the full pairs to cross-split ones and
  * re-orienting them is exactly what the incremental path computes.
  */
class IncrementalDedupSpec extends SparkSpec {

  test("batch-vs-index equals the cross-split slice of the full run") {
    import spark.implicits._
    val inBatch: Long => Boolean = {
      val docs = Tables.documents(spark, SF)
        .select($"doc_id", Sampling.bucket($"doc_id", "inc").as("b"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1) < 100)).toMap
      docs.apply
    }
    val full = MinHashLSH.nearDuplicates(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // keep pairs with exactly one side in the batch, oriented batch-first
    val expected = full.flatMap { case (a, b, j) =>
      (inBatch(a), inBatch(b)) match {
        case (true, false) => Some((a, b, j))
        case (false, true) => Some((b, a, j))
        case _ => None
      }
    }.toSet
    val got = MinHashLSH.incrementalGate(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "split produced no cross pairs — pick another salt")
  }

  test("the index never shuffles: batch band keys broadcast") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = MinHashLSH.incrementalGate(spark, SF)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shuffled = plan.collect { case e: ShuffleExchangeExec => e.output }
      // allowed exchanges: the candidate distinct and (at most) the
      // est aggregation — none may carry the 64-long signature arrays
      val offenders = shuffled.filter(_.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
      assert(offenders.isEmpty,
        s"signature arrays in shuffle exchanges: ${offenders.map(_.map(_.name))}")
      assert(plan.toString.contains("BroadcastHashJoin"),
        "batch side not broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
