package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated testdata layout
  * (`<dir>/<name>.parquet`). All gate queries read through here so
  * scans stay column-pruned and filter-pushed by Catalyst.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.ts has shipped in two physical layouts across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 rejects outright —
    * read as raw int64 nanos via the SPARK-40819 legacy conf and
    * truncate to µs; integer `div`, not `/`, because ns epochs
    * overflow a double's 53-bit mantissa) and plain TIMESTAMP(µs)
    * (read as-is). Branch on the dtype the scan actually yields so a
    * testdata regen can't break every events-reading plan again. NTZ
    * timestamps are cast to session-tz TIMESTAMP — an identical
    * instant because every Graft session pins session.timeZone=UTC —
    * so downstream `unix_micros`/`window`/`Row.getTimestamp` code
    * sees one type regardless of the physical layout.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case _: TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected int64-nanos or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
