package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed layout for co-located joins: both sides written with
  * `bucketBy(n, key)` + `sortBy(key)` hash-place rows so a later
  * equi-join on the key needs NO exchange — the single biggest
  * shuffle eliminator for fact-to-fact joins that repeat across a
  * pipeline (at 100 TB a lineitem⋈orders shuffle is tens of TB of
  * network; bucketed, it's zero).
  *
  * Bucket count rule of thumb: total_size / bucket_count ≈ one
  * healthy task (128-512 MB), and keep it a multiple of cluster
  * parallelism. Both tables MUST agree on count and key.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching
    * layouts Catalyst plans a SortMergeJoin with zero Exchange.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
