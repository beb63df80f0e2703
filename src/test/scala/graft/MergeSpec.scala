package graft

import java.sql.Timestamp

import graft.pipeline.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-02-01 00:00:00")

  test("upsert replaces matched keys and appends new ones") {
    import spark.implicits._
    val current = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val got = Merge.upsert(current, updates, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("scd2 closes changed versions, inserts new, ignores unchanged; replay is a no-op") {
    import spark.implicits._
    val current = Seq(
      (1L, "a", t1, null.asInstanceOf[Timestamp]),
      (2L, "b", t1, null.asInstanceOf[Timestamp])
    ).toDF("id", "v", "valid_from", "valid_to")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("id", "v")

    val merged = Merge.scd2(current, updates, "id", t2).cache()
    val rows = merged.collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(3)).map(_.toString).getOrElse("open"))).toSet
    assert(rows == Set(
      (1L, "a", "open"),                      // untouched
      (2L, "b", t2.toString),                 // closed old version
      (2L, "B", "open"),                      // new version
      (3L, "c", "open")))                     // new key
    // replaying the same batch changes nothing (hash-equal attrs)
    val replay = Merge.scd2(merged, updates, "id", t2)
    assert(replay.count() == merged.count())
    assert(replay.filter(col("valid_to").isNull).count() == 3)
    merged.unpersist()
  }
}
