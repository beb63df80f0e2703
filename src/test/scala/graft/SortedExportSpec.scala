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

  test("the within-file monotonicity check flags a scrambled layout") {
    import spark.implicits._
    // write WITHOUT sortWithinPartitions: in-file order is storage
    // order, which a hash-shuffled frame breaks
    val out = graft.util.Scratch.dir("graft_sortspec_bad") + "/docs"
    Tables.documents(spark, SF).select($"doc_id", $"n_chars")
      .orderBy(hash($"doc_id")) // scrambled relative to the sort key
      .coalesce(2)
      .write.mode("overwrite").parquet(out)
    assert(SortedExport.orderViolations(spark, out,
      -col("n_chars"), col("doc_id")) > 0L,
      "scrambled layout must produce violations")
  }

  test("fragment reconciliation is sound across read-split boundaries (file >> maxPartitionBytes)") {
    import spark.implicits._
    // one big sorted file, then one with a single order break — read
    // both with splits forced tiny so each file becomes MANY read
    // fragments; a partition-local fold that never compares across
    // splits would pass the broken file
    val good = (0L until 20000L).map(i => (i, i))
    val bad = good.take(10000) ++ (5000L until 15000L).map(i => (i, i))
    val goodOut = graft.util.Scratch.dir("graft_splitspec_g") + "/t"
    val badOut = graft.util.Scratch.dir("graft_splitspec_b") + "/t"
    // tiny row groups: parquet splits land on row-group boundaries,
    // so a single-row-group file would defeat the split forcing
    good.toDF("k", "doc_id").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "16384").parquet(goodOut)
    bad.toDF("k", "doc_id").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "16384").parquet(badOut)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try {
      val nParts = spark.read.parquet(goodOut).rdd.getNumPartitions
      assert(nParts > 1, s"split forcing failed: $nParts partition(s)")
      assert(SortedExport.orderViolations(spark, goodOut,
        col("k"), col("doc_id")) == 0L,
        "a sorted file read as many fragments must verify clean")
      assert(SortedExport.orderViolations(spark, badOut,
        col("k"), col("doc_id")) > 0L,
        "the single order break must be caught wherever the splits land")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
