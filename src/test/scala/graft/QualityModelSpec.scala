package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {

  test("score is the token-weight sum; keep is exactly score >= 0") {
    import spark.implicits._
    val rows = QualityModel.scoreDocuments(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(3) == 1L) == (r.getLong(2) >= 0L), s"keep mismatch: $r")
      // |score| can never exceed 3 per token
      assert(math.abs(r.getLong(2)) <= 3L * r.getLong(1), s"score out of range: $r")
    }
    // the stand-in genuinely separates: both classes occur
    val keeps = rows.map(_.getLong(3)).toSet
    assert(keeps == Set(0L, 1L), s"degenerate classifier on the spec corpus: $keeps")
  }

  test("a trained weight TABLE drops in: element_at lookup ≡ the arithmetic stand-in") {
    import spark.implicits._
    // materialize the stand-in function as an explicit weight vector —
    // the exact shape a real trained model arrives in — and score via
    // the lookup path a production model would use
    val weights = Array.tabulate(QualityModel.D)(b => (b % 7 - 3).toLong)
    val wlit = typedLit(weights.toSeq)
    val docs = Tables.documents(spark, SF)
    val viaLookup = docs
      .select($"doc_id", explode(graft.operators.Dedup.tokensCol($"text")).as("tok"))
      .select($"doc_id", element_at(wlit,
        (QualityModel.bucketCol($"tok") + 1).cast("int")).as("w"))
      .groupBy($"doc_id").agg(sum($"w").as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val standIn = QualityModel.scoreDocuments(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaLookup == standIn)
  }

  test("scoring adds exactly one exchange: the per-doc partial-aggregated sum") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = QualityModel.scoreDocuments(spark, SF)
        .queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e.output }
      assert(shuffles.length == 1, s"expected 1 shuffle, got ${shuffles.length}")
      assert(!shuffles.head.exists(a => a.name == "text" || a.name == "tok"),
        s"tokens/text in the score exchange: ${shuffles.head.map(_.name)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
