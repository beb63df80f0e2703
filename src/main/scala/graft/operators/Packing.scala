package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk batch construction used
  * for LLM pretraining: documents are concatenated in a fixed order
  * and the stream is cut into fixed-size token windows; each doc is
  * tagged with the training sequence its first token falls in and
  * its offset inside it.
  *
  * Distributed shape: a deterministic md5 SHARD (same hash family as
  * [[Sampling]], so DuckDB reproduces it) bounds every window
  * partition — each shard packs independently in (shard, doc_id)
  * order. One shuffle on shard; shard count scales with the cluster,
  * and packing stays reproducible at any parallelism because the
  * order inside a shard is total. The whitespace token count is the
  * stand-in tokenizer (same expression as TextAnalysis.tokenCounts);
  * swapping in a real tokenizer's count column changes nothing else.
  */
object Packing {

  /** Pack any (unit key, token count) frame: units are sharded by the
    * md5 bucket of their composite key, ordered totally within the
    * shard, and tagged with the training sequence their first token
    * falls in. Works for whole documents (the gate below) and for
    * chunker output (doc_id, chunk_idx) alike — the chunk→pack
    * composition is the RAG/pretraining prep path.
    */
  def packUnits(units: DataFrame, keyCols: Seq[String], tokenCol: String,
      budget: Int, shards: Int): DataFrame = {
    import units.sparkSession.implicits._
    require(keyCols.nonEmpty && budget >= 1 && shards >= 1)
    val key = concat_ws(":", keyCols.map(col): _*)
    val w = Window.partitionBy($"shard").orderBy(keyCols.map(col): _*)
    units
      .withColumn("shard", Sampling.bucket(key) % shards)
      .withColumn("tokens_before",
        coalesce(sum(col(tokenCol)).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", floor($"tokens_before" / budget))
      .withColumn("seq_offset", $"tokens_before" % budget)
      .drop("tokens_before")
  }

  /** @param budget tokens per training sequence
    * @param shards independent packing streams (≥ cluster cores at
    *   scale; 8 keeps the testdata gate readable)
    */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 256,
      shards: Int = 8): DataFrame = {
    import spark.implicits._
    packUnits(
      Tables.documents(spark, dir)
        .select($"doc_id",
          size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      Seq("doc_id"), "n_tokens", budget, shards)
      .select($"doc_id", $"shard", $"n_tokens", $"seq_id", $"seq_offset")
  }

  val packSequencesSql: String =
    s"""SELECT doc_id, shard, n_tokens,
          CAST(floor(tokens_before / 256) AS BIGINT) AS seq_id,
          CAST(tokens_before % 256 AS BIGINT) AS seq_offset
        FROM (
          SELECT doc_id, shard, n_tokens,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS tokens_before
          FROM (
            SELECT doc_id,
                   ${Sampling.bucketSql("doc_id")} % 8 AS shard,
                   CAST(len(list_filter(list_transform(
                     string_split(trim(text), ' '), x -> trim(x)),
                     x -> length(x) > 0)) AS BIGINT) AS n_tokens
            FROM documents))"""
}
