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
  def csv(spark: SparkSession, path: String, schema: StructType,
      dateCols: Seq[String] = Nil, dateFormat: String = "MMMM d, yyyy",
      header: Boolean = true): DataFrame = {
    val raw = spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
    dateCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, to_date(trim(col(c)), dateFormat)))
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
