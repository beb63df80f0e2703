package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Extract step (≙ task.py:69 `pd.read_csv`): schema'd file readers.
  * An explicit schema means no inference pass — one scan, not two —
  * and malformed rows land in `_corrupt_record` instead of killing
  * the job (PERMISSIVE), which is the posture you want when a 100 TB
  * ingest hits a bad file.
  */
object Readers {

  /** CSV with a caller-supplied schema; `dateCols` parsed with the
    * given format at read time (≙ the reference's
    * pd.to_datetime(date_added) in task.py:79).
    */
  /** `multiLine` parses quoted fields containing newlines (the
    * Netflix CSV has one such record). It disables intra-file split
    * parallelism — fine for CSV ingest (parallelism comes from file
    * count); the lake itself is parquet.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      dateCols: Seq[String] = Nil, dateFormat: String = "MMMM d, yyyy",
      header: Boolean = true, multiLine: Boolean = false): DataFrame = {
    val raw = spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .option("mode", "PERMISSIVE")
      // RFC 4180: quotes inside quoted fields are DOUBLED ("" not \").
      // Spark's default escape is backslash — wrong for CSV written by
      // pandas, DuckDB, Excel, or Spark itself with escape='"'.
      .option("escape", "\"")
      .csv(path)
    // try_to_date: empty/malformed date strings → null instead of an
    // ANSI runtime error (Spark 4 default) — consistent with the
    // PERMISSIVE quarantine posture above
    dateCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, try_to_date(trim(col(c)), dateFormat)))
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines with a caller-supplied schema — the crawl-dump ingest
    * format. Schema'd for the same reason as [[csv]] (inference is a
    * second full scan at 100 TB), PERMISSIVE so malformed lines land
    * in `_corrupt_record` (declare it in the schema to capture them)
    * instead of killing a 10⁵-file ingest. Line-delimited JSON splits
    * by newline, so intra-file parallelism survives — but a JSON scan
    * parses whole lines regardless of projection; the posture is
    * convert-to-parquet at the lake boundary, this reader only owns
    * the ingest hop.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** ORC — the other columnar lake format warehouses hand over.
    * Column pruning and predicate pushdown work like parquet's (the
    * gate's explain shows the pruned ReadSchema), so reading a
    * foreign ORC lake does not force an immediate rewrite.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
