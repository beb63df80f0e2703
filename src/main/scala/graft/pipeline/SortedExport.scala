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

  /** Within-file order violations in a written layout whose rows
    * carry the ASC key (k1, k2) — 0 iff every file's stored row
    * sequence is monotone. Sound under ANY read split layout: the
    * fold runs per read partition, but it reduces contiguous
    * (file, `_metadata.row_index`) runs to FRAGMENT summaries —
    * first/last index, first/last key, intra-fragment violation
    * count — and fragments reconcile per file afterwards. A file
    * larger than maxPartitionBytes arrives as several fragments;
    * comparing only within a partition would skip the rows
    * straddling the split boundary and let a broken export pass, so
    * a spine gap/overlap or an order break ACROSS fragment
    * boundaries counts as a violation too. The mapPartitions fold is
    * the point, not a fallback: STORED ROW ORDER is the property
    * under test, and no declarative plan can observe it (any
    * sort/exchange would destroy the evidence). Fragment count is
    * split-count-sized — a metadata-scale collect.
    */
  def orderViolations(spark: SparkSession, path: String,
      k1: Column, k2: Column): Long = {
    import spark.implicits._
    val back = spark.read.parquet(path)
      .select(input_file_name().as("f"),
        col("_metadata.row_index").as("ri"), k1.as("k1"), k2.as("k2"))
    val frags = back.as[(String, Long, Long, Long)].mapPartitions { it =>
      val acc = Seq.newBuilder[(String, Long, Long, Long, Long, Long, Long, Long)]
      var f: String = null
      var fr = 0L; var fk1 = 0L; var fk2 = 0L
      var lr = 0L; var lk1 = 0L; var lk2 = 0L
      var bad = 0L; var open = false
      def flush(): Unit = if (open) acc += ((f, fr, lr, fk1, fk2, lk1, lk2, bad))
      it.foreach { case (file, ri, c1, c2) =>
        if (!open || file != f || ri != lr + 1) {
          flush(); f = file; fr = ri; fk1 = c1; fk2 = c2; bad = 0L; open = true
        } else if (c1 < lk1 || (c1 == lk1 && c2 < lk2)) bad += 1
        lr = ri; lk1 = c1; lk2 = c2
      }
      flush(); acc.result().iterator
    }.collect()
    frags.map(_._8).sum +
      frags.groupBy(_._1).values.map { fs =>
        val s = fs.sortBy(_._2).toSeq
        s.sliding(2).count {
          case Seq(a, b) =>
            b._2 != a._3 + 1 || // gap/overlap in the index spine
              a._6 > b._4 || (a._6 == b._4 && a._7 > b._5) // order break
          case _ => false
        }.toLong
      }.sum
  }

  /** Gate: export documents curriculum-ordered by (n_chars DESC,
    * doc_id), read the files back, and VERIFY the order property —
    * per-file key ranges pairwise disjoint (file-stats frame,
    * `files` rows) and rows inside every file monotone
    * ([[orderViolations]]). The gate row carries the two verdicts as
    * columns — a broken export hash-mismatches the oracle instead of
    * erroring — plus order-invariant content aggregates proving the
    * export is lossless. File-boundary keys are deliberately NOT
    * output: the sampler's cuts may move between runs; the ORDER is
    * the contract, the cuts are not.
    */
  def sortedExportGate(spark: SparkSession, dir: String,
      files: Int = 8): DataFrame = {
    import spark.implicits._
    val out = graft.util.Scratch.dir("graft_sorted_export") + "/documents"
    exportSorted(
      Tables.documents(spark, dir).select($"doc_id", $"n_chars"),
      out, files, $"n_chars".desc, $"doc_id")
    val violations = orderViolations(spark, out, -col("n_chars"), col("doc_id"))
    val back = spark.read.parquet(out)
      .select(input_file_name().as("f"),
        (-$"n_chars").as("k1"), $"doc_id".as("k2"))
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
