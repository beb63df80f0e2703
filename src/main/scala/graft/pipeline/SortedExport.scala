package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Total-order export — the TeraSort device: `repartitionByRange`
  * samples the sort key to cut `files` contiguous key ranges, each
  * partition sorts ONLY its own slice, and the written files
  * together hold the corpus in one global order with no all-to-one
  * sort anywhere (the classic use: curriculum-ordered training
  * shards, where readers stream files in name order and see
  * quality-descending documents). This is the 1-D complement of the
  * Z-order write ([[Zorder]] / ManifestTable.writeClustered): z-order
  * trades perfect order on one column for zone-map quality on
  * several; range export gives the single-key total order a
  * sequential consumer needs.
  *
  * Scale: the range sampler reads a bounded reservoir per partition
  * (Spark's RangePartitioner), the sort is per-partition, and no
  * stage ever holds more than one partition's rows — the shape
  * survives any corpus size by raising `files`.
  */
object SortedExport {

  /** Write `df` to `out` as `files` range-partitioned parquet files,
    * globally ordered by `keys` across the file sequence.
    */
  def exportSorted(df: DataFrame, out: String, files: Int,
      keys: Column*): Unit =
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(out)

  /** Gate: export documents curriculum-ordered by (n_chars DESC,
    * doc_id), read the files back, and VERIFY the order property
    * distributedly — per-file key ranges pairwise disjoint (file
    * stats frame, `files` rows) and rows inside every file
    * monotone. The within-file check is a mapPartitions fold on
    * purpose: STORED ROW ORDER is the property under test, and no
    * declarative plan can observe it (any sort/exchange would
    * destroy the evidence); runs of equal file name are compared
    * independently, so Spark packing several small files into one
    * read partition cannot fake a pass or a fail. The gate row
    * carries the two verdicts as columns — a broken export
    * hash-mismatches the oracle instead of erroring — plus
    * order-invariant content aggregates proving the export is
    * lossless. File-boundary keys are deliberately NOT output: the
    * sampler's cuts may move between runs; the ORDER is the
    * contract, the cuts are not.
    */
  def sortedExportGate(spark: SparkSession, dir: String,
      files: Int = 8): DataFrame = {
    import spark.implicits._
    val out = graft.util.Scratch.dir("graft_sorted_export") + "/documents"
    exportSorted(
      Tables.documents(spark, dir).select($"doc_id", $"n_chars"),
      out, files, $"n_chars".desc, $"doc_id")
    val back = spark.read.parquet(out)
      .select(input_file_name().as("f"),
        (-$"n_chars").as("k1"), $"doc_id".as("k2"))
    // within-file monotonicity: fold each read partition, comparing
    // (k1, k2) only against the previous row OF THE SAME FILE
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
    // cross-file disjointness over the file-stats frame (`files` rows)
    val stats = back.groupBy($"f")
      .agg(min(struct($"k1", $"k2")).as("lo"), max(struct($"k1", $"k2")).as("hi"))
    val overlaps = stats
      .withColumn("prev_hi", lag($"hi", 1).over(Window.orderBy($"lo")))
      .filter($"prev_hi".isNotNull && !($"prev_hi" < $"lo"))
      .count()
    // order-invariant content proof: the readback is the corpus
    back.agg(
        count(lit(1)).as("n_docs"),
        sum($"k2").as("id_sum"),
        max(-$"k1").as("head_chars"),
        min(-$"k1").as("tail_chars"))
      .withColumn("files_sorted", lit(violations == 0L))
      .withColumn("files_disjoint", lit(overlaps == 0L))
  }

  val sortedExportGateSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(doc_id) AS BIGINT) AS id_sum,
              max(n_chars) AS head_chars,
              min(n_chars) AS tail_chars,
              true AS files_sorted,
              true AS files_disjoint
       FROM documents"""
}
