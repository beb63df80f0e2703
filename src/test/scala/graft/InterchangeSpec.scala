package graft

import graft.sources.Readers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader-feature depth behind the source_jsonl / source_orc gates:
  * the PERMISSIVE quarantine actually captures malformed JSON lines,
  * and the ORC scan prunes and pushes down like parquet.
  */
class InterchangeSpec extends SparkSpec {

  test("jsonl PERMISSIVE mode quarantines malformed lines, parses the rest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
    val f = dir.resolve("part-000.json")
    java.nio.file.Files.write(f,
      """{"doc_id": 1, "text": "good row"}
        |{"doc_id": 2, "text": "also good"}
        |{"doc_id": 3, "text": "truncated...
        |not json at all
        |{"doc_id": 4, "text": "fine again"}
        |""".stripMargin.getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val got = Readers.jsonl(spark, dir.toString, schema).collect()
    val good = got.filter(_.isNullAt(2))
    val bad = got.filter(!_.isNullAt(2))
    assert(good.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(bad.length == 2, s"expected 2 quarantined lines, got ${bad.length}")
    assert(bad.forall(r => r.isNullAt(0) || r.getString(2).nonEmpty))
  }

  test("orc scan prunes columns and pushes the id filter down") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    docs.write.mode("overwrite").orc(s"$tmp/documents")
    val q = Readers.orc(spark, s"$tmp/documents")
      .filter($"doc_id".between(10, 20)).select($"doc_id", $"lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThanOrEqual(doc_id,10)"),
      s"doc_id filter not pushed to the ORC scan:\n$plan")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("text"), s"ORC scan reads unused text column: $read")
    // round-trip values match the parquet source
    val want = docs.filter($"doc_id".between(10, 20))
      .select($"doc_id", $"lang").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSet == want)
  }

  test("csv round trip preserves text with embedded commas, quotes, and newlines") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "comma, inside", "en", "web", 13L),
      (3L, "a \"quoted\" span", "en", "web", 15L),
      (4L, "line one\nline two", "en", "web", 17L),
      (5L, "trailing backslash \\ and, \"both\"", "en", "web", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("csvrt").toString
    nasty.write.option("header", "true").option("escape", "\"")
      .csv(s"$tmp/docs")
    val back = graft.sources.Readers.csv(spark, s"$tmp/docs", nasty.schema,
        multiLine = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = nasty.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want, s"csv round trip mangled text: $back")
  }
}
