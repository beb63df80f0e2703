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
