package graft

import graft.sources.{Bucketing, Readers}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed join plans with zero exchanges and matches the plain join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, SF)
      .select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, SF)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "l_orderkey", buckets = 8)
    // at sf0.001 the planner prefers broadcast (which also avoids a
    // shuffle but ignores bucketing); disable it to exercise the
    // sort-merge path a fact⋈fact join takes at real scale
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.join(ord, "l_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("PERMISSIVE csv reader quarantines malformed rows instead of failing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("rows.csv")
    java.nio.file.Files.writeString(f,
      "id,qty,added\n1,10,\"January 2, 2024\"\n2,notanumber,\"January 3, 2024\"\n3,30,\"January 4, 2024\"\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("added", StringType),
      StructField("_corrupt_record", StringType)))
    val df = Readers.csv(spark, f.toString, schema,
      dateCols = Seq("added"), dateFormat = "MMMM d, yyyy").cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("qty").isNotNull).count() == 2)
    assert(df.filter(col("added") === lit("2024-01-02").cast("date")).count() == 1)
    df.unpersist()
  }
}
