package graft

import graft.pipeline.CurationPipeline

/** The composed curation job: stage accounting must be monotone, the
  * output must satisfy every stage's own invariant, and the whole
  * run must be deterministic.
  */
class CurationPipelineSpec extends SparkSpec {

  private lazy val (out, report) = CurationPipeline.run(spark, SF)
  private lazy val outRows = out.collect()

  test("stage counts are monotone non-increasing and nothing degenerates") {
    assert(report.input == 500)
    assert(report.stages.sliding(2).forall { case Seq(a, b) => b <= a })
    assert(report.sampled > 0, "pipeline curated away the whole corpus")
    assert(report.sampled < report.input, "pipeline dropped nothing")
  }

  test("output satisfies the rule stage: every survivor passes the gopher battery") {
    import spark.implicits._
    val flags = graft.operators.Curation.gopherFilterOf(spark,
      Tables.documents(spark, SF)).filter($"keep" === 0L)
      .collect().map(_.getLong(0)).toSet
    assert(outRows.forall(r => !flags.contains(r.getAs[Long]("doc_id"))))
  }

  test("output has no exact duplicate texts") {
    val texts = outRows.map(_.getAs[String]("text"))
    assert(texts.length == texts.distinct.length)
  }

  test("output satisfies the model stage: every survivor scores non-negative") {
    import spark.implicits._
    val dropped = graft.operators.QualityModel.scoreDocuments(spark, SF)
      .filter($"keep" === 0L).collect().map(_.getLong(0)).toSet
    assert(outRows.forall(r => !dropped.contains(r.getAs[Long]("doc_id"))))
  }

  test("output satisfies the budget stage: every source's total tokens within budget") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the sample stage only subsets the budget-admitted prefix, so
    // per-source totals of the OUTPUT must still respect the cap
    val ids = outRows.map(_.getAs[Long]("doc_id")).toSet
    val totals = Tables.documents(spark, SF)
      .filter($"doc_id".isin(ids.toSeq: _*))
      .select($"source",
        size(graft.operators.Dedup.tokensCol($"text")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(totals.nonEmpty)
    totals.foreach { case (src, tok) =>
      assert(tok <= 600, s"$src exceeds the 600-token budget: $tok")
    }
  }

  test("output ids all fall in the sample buckets, and the run is deterministic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = outRows.map(_.getAs[Long]("doc_id")).toSet
    val buckets = Tables.documents(spark, SF)
      .filter($"doc_id".isin(ids.toSeq: _*))
      .select(graft.operators.Sampling.bucket($"doc_id", "curation"))
      .collect().map(_.getLong(0))
    assert(buckets.forall(_ < 800))
    val (out2, report2) = CurationPipeline.run(spark, SF)
    assert(report2 == report)
    assert(out2.collect().map(_.getAs[Long]("doc_id")).toSet == ids)
  }
}
