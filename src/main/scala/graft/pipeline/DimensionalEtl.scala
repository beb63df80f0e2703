package graft.pipeline

import graft.Tables
import graft.functions.TextFns
import graft.operators.{Normalize, SurrogateKey}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's dimensional-model build (task.py:74-139)
  * re-expressed Spark-first over the testdata: `documents.text` and
  * `part.p_name` stand in for the Netflix multi-value columns
  * (cast/director). Produces:
  *
  *  - token dimension (≙ personnel): union of both sources, distinct,
  *    surrogate ids, gender enrichment
  *  - doc_token bridge (≙ movie_crew): (entity_id, token_id,
  *    source_type), built by joining the exploded facts back to the
  *    dimension on the natural key — the dimension is broadcast, so
  *    the bridge build never shuffles the fact side.
  */
object DimensionalEtl {

  /** Exploded (doc_id, token) pairs from documents.text. */
  def docTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Normalize.splitTrimExplode(
      Tables.documents(spark, dir).select($"doc_id", $"text"),
      $"text", " ", "token"
    ).select($"doc_id", $"token")
  }

  /** Exploded (p_partkey, token) pairs from part.p_name. */
  def partTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Normalize.splitTrimExplode(
      Tables.part(spark, dir).select($"p_partkey", $"p_name"),
      $"p_name", " ", "token"
    ).select($"p_partkey", $"token")
  }

  /** Token dimension: union both sources (≙ actors ∪ directors),
    * distinct, ordered surrogate id, gender heuristic. Ids come from
    * SurrogateKey.orderedScalable — same rank-by-token ids as a
    * global row_number (tokens are distinct here), but assigned via
    * range partitions + per-partition offsets, so a web-corpus-sized
    * vocabulary never funnels through one window partition.
    */
  def tokenDim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = docTokens(spark, dir).select($"token")
      .union(partTokens(spark, dir).select($"token"))
      .distinct()
    SurrogateKey.orderedScalable(all, "token", "token_id")
      .withColumn("gender", TextFns.genderGuess($"token"))
      .select($"token", $"token_id", $"gender")
  }

  /** Bridge (≙ movie_crew): entity→token_id with a source tag, dim
    * broadcast into both exploded fact sides.
    */
  def bridge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = broadcast(tokenDim(spark, dir).select($"token", $"token_id"))
    val docs = docTokens(spark, dir)
      .join(dim, "token")
      .select($"doc_id".cast("long").as("entity_id"), $"token_id",
        lit("doc").as("source_type"))
    val parts = partTokens(spark, dir)
      .join(dim, "token")
      .select($"p_partkey".cast("long").as("entity_id"), $"token_id",
        lit("part").as("source_type"))
    docs.union(parts)
  }

  /** Full star-schema build + load through any TableSink (≙ task.py
    * load(); ParquetSink is the lake default, JdbcSink the
    * reference's literal warehouse target). Returns the written
    * locations.
    */
  def buildAndLoad(spark: SparkSession, dir: String,
      sink: graft.sources.TableSink): Seq[String] = Seq(
    // vocabulary-sized dim → single file; bridge and fact keep their
    // upstream partitioning (both scale with the corpus)
    sink.write("token_dim", tokenDim(spark, dir).coalesce(1)),
    sink.write("doc_token_bridge", bridge(spark, dir)),
    sink.write("documents_fact", Tables.documents(spark, dir)))

  def buildAndLoad(spark: SparkSession, dir: String, outDir: String): Seq[String] =
    buildAndLoad(spark, dir, new graft.sources.ParquetSink(outDir))

  /** Calendar dimension spanning the fact table's date domain — the
    * warehouse dim_date every star schema carries (the reference's
    * schema stops at raw date columns; a real mart joins them to
    * this). One tiny min/max aggregate parameterizes a zero-shuffle
    * `sequence` generator — the dimension is generated, never
    * scanned. Day-of-week is ISO (1 = Monday) in both engines:
    * Spark's `weekday` is 0-based Monday, DuckDB's `isodow` 1-based.
    */
  def dimDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.orders(spark, dir)
      .agg(min($"o_orderdate").as("lo"), max($"o_orderdate").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      .select($"d",
        year($"d").cast("long").as("yr"),
        quarter($"d").cast("long").as("qtr"),
        month($"d").cast("long").as("mon"),
        dayofmonth($"d").cast("long").as("dom"),
        (weekday($"d") + 1).cast("long").as("dow"))
      .withColumn("is_weekend", $"dow" >= 6)
  }

  val dimDateSql: String =
    """WITH span AS (
         SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders),
       days AS (
         SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                            INTERVAL 1 DAY)) AS DATE) AS d
         FROM span)
       SELECT d, CAST(year(d) AS BIGINT) AS yr,
              CAST(quarter(d) AS BIGINT) AS qtr,
              CAST(month(d) AS BIGINT) AS mon,
              CAST(day(d) AS BIGINT) AS dom,
              CAST(isodow(d) AS BIGINT) AS dow,
              isodow(d) >= 6 AS is_weekend
       FROM days"""
}
