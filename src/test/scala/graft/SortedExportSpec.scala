package graft

import graft.pipeline.SortedExport
import org.apache.spark.sql.functions._

/** Range-partitioned total-order export: real global order across
  * the file sequence, losslessness, rough balance, and the gate's
  * self-verification actually firing on a broken layout.
  */
class SortedExportSpec extends SparkSpec {

  test("export holds one global (n_chars DESC, doc_id) order across the file sequence and is lossless") {
    import spark.implicits._
    val out = graft.util.Scratch.dir("graft_sortspec") + "/docs"
    SortedExport.exportSorted(
      Tables.documents(spark, SF).select($"doc_id", $"n_chars"),
      out, files = 8, $"n_chars".desc, $"doc_id")
    // per file (in name order = range order): collect rows in stored
    // order — sf0.001 is collect-scale, and stored order is the test
    val dir = new java.io.File(out)
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.toString).sorted
    assert(files.length >= 4, s"expected several range files, got ${files.length}")
    val perFile = files.map { f =>
      spark.read.parquet(f).select($"n_chars", $"doc_id")
        .collect().map(r => (-r.getLong(0), r.getLong(1))) // ASC key
    }
    perFile.foreach { rows =>
      assert(rows.sameElements(rows.sorted), "rows inside a file out of order")
    }
    // concatenated in file-name order = globally sorted
    val all = perFile.flatten
    assert(all.sameElements(all.sorted),
      "file sequence does not hold the global order")
    // lossless: exact multiset of (doc_id, n_chars)
    val want = Tables.documents(spark, SF).select($"doc_id", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(all.map { case (k1, k2) => (k2, -k1) }.sorted.sameElements(want))
    // sampled cuts are approximate — demand rough balance, not equality
    val sizes = perFile.map(_.length)
    assert(sizes.max <= math.max(8, sizes.min * 4),
      s"pathological file skew: ${sizes.toSeq}")
  }

  test("gate verdicts are true on the real export and the oracle row matches the corpus aggregates") {
    import spark.implicits._
    val row = SortedExport.sortedExportGate(spark, SF).head()
    val docs = Tables.documents(spark, SF)
    assert(row.getAs[Boolean]("files_sorted"))
    assert(row.getAs[Boolean]("files_disjoint"))
    assert(row.getAs[Long]("n_docs") == docs.count())
    assert(row.getAs[Long]("head_chars") ==
      docs.agg(max($"n_chars")).head.getLong(0))
  }

  test("the within-file monotonicity fold flags a deliberately shuffled layout") {
    import spark.implicits._
    // write WITHOUT sortWithinPartitions: ranges still disjoint, but
    // in-file order is storage order, which a hash-shuffled frame
    // breaks — the verdict column must go false, not error
    val out = graft.util.Scratch.dir("graft_sortspec_bad") + "/docs"
    Tables.documents(spark, SF).select($"doc_id", $"n_chars")
      .orderBy(hash($"doc_id")) // scrambled relative to the sort key
      .coalesce(2)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
      .select(input_file_name().as("f"),
        (-$"n_chars").as("k1"), $"doc_id".as("k2"))
    val violations = back.as[(String, Long, Long)].mapPartitions { it =>
      var prevF: String = null
      var p1 = Long.MinValue; var p2 = Long.MinValue
      var bad = 0L
      it.foreach { case (f, k1, k2) =>
        if (f == prevF && (k1 < p1 || (k1 == p1 && k2 < p2))) bad += 1
        prevF = f; p1 = k1; p2 = k2
      }
      Iterator.single(bad)
    }.reduce(_ + _)
    assert(violations > 0L, "scrambled layout must produce violations")
  }
}
