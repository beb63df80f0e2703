package graft

import graft.operators.Decontaminate

/** Decontaminate (benchmark n-gram overlap): the bloom-prefiltered
  * scale variant must equal the broadcast-set gate query exactly
  * (the exact gram join behind the bloom rescues every false
  * positive), and the probe must stay a scan-side filter.
  */
class DecontaminateSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("bloom-prefiltered decontamination equals the broadcast-set result") {
    val exact = rows(Decontaminate.contaminated(spark, SF))
    val bloom = rows(Decontaminate.contaminatedViaBloom(spark, SF))
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("bloom probe is a pre-join scan filter, not a shuffle") {
    val plan = Decontaminate.contaminatedViaBloom(spark, SF)
      .queryExecution.executedPlan.toString
    // pretty-printed as might_contain; it must sit in a Filter on the
    // scan side, i.e. appear in the plan at all (the join alone would
    // not mention it)
    assert(plan.contains("might_contain"))
  }
}
