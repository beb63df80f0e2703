package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("native expression matches the reference implementation") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "ütf-8 bytes ✓",
      "the quick brown fox jumps over the lazy dog")
    val got = texts.toDF("t")
      .select($"t", RollingHash.rolling_hash($"t").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(got(t) == RollingHash.reference(t), s"mismatch for '$t'")
    }
  }

  test("registered as a SQL function via GraftExtensions") {
    val h = spark.sql("SELECT rolling_hash('spark') AS h")
      .collect()(0).getLong(0)
    assert(h == RollingHash.reference("spark"))
  }

  test("null input yields null") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(RollingHash.rolling_hash($"t")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    import spark.implicits._
    // a parquet scan, not a local relation — Catalyst constant-folds
    // local data before codegen ever runs
    val df = Tables.documents(spark, SF)
      .select(RollingHash.rolling_hash($"text"))
    // codegen'd operators print with a `*(stageId)` star prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rollinghash("),
      s"projection not inside a codegen stage:\n$plan")
  }
}
