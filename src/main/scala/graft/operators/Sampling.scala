package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible form of the
  * training-data mixing primitive. `sample(fraction)` draws from an
  * RNG whose result depends on partitioning and retry history; these
  * operators decide membership from a hash of the ROW KEY, so a
  * sample is (a) reproducible across runs/clusters/engines, (b) a
  * plain filter over the scan — zero shuffle, whole-stage codegen,
  * (c) consistent across tables (the same key always lands in the
  * same per-mille bucket, so fact and dim samples stay joinable),
  * and (d) nested: rate 50‰ ⊆ rate 100‰ by construction.
  *
  * Hash = first 7 hex chars of md5(key || salt) — 28 bits, portable
  * to any engine with md5 (the DuckDB oracle recomputes it exactly;
  * same family as MinHashLSH's hash). Change `salt` to draw an
  * independent sample.
  */
object Sampling {

  /** Per-mille bucket (0..999) for a key — stable across engines. */
  def bucket(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 7), 16, 10)
      .cast("long") % 1000

  def bucketSql(keyExpr: String, salt: String = ""): String =
    s"('0x' || substr(md5($keyExpr::VARCHAR || '$salt'), 1, 7))::BIGINT % 1000"

  /** Keep rows whose key falls in the first `ratePerMille` buckets. */
  def hashSample(df: DataFrame, key: Column, ratePerMille: Int,
      salt: String = ""): DataFrame = {
    require(ratePerMille >= 0 && ratePerMille <= 1000)
    df.filter(bucket(key, salt) < ratePerMille)
  }

  /** Stratified variant: per-stratum rates (training-mix weights),
    * e.g. keep 20% of English, 5% of everything else. Still one
    * zero-shuffle filter.
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int,
      salt: String = ""): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(strata === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket(key, salt) < rate)
  }

  /** Gate: 10% of documents by doc_id hash. */
  def sampleDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hashSample(Tables.documents(spark, dir), $"doc_id", 100)
      .select($"doc_id", $"lang")
  }

  val sampleDocsSql: String =
    s"""SELECT doc_id, lang FROM documents
        WHERE ${bucketSql("doc_id")} < 100"""

  /** Gate: language-stratified mix — 200‰ of en, 50‰ of de, 100‰
    * default.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    stratifiedSample(Tables.documents(spark, dir), $"doc_id", $"lang",
        Map("en" -> 200, "de" -> 50), defaultPerMille = 100)
      .groupBy($"lang").agg(count(lit(1)).as("n_kept"))
  }

  val sampleStratifiedSql: String =
    s"""SELECT lang, count(*) AS n_kept FROM documents
        WHERE ${bucketSql("doc_id")} <
          CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 50 ELSE 100 END
        GROUP BY lang"""
}
