package graft.pipeline

import graft.Tables
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The training-data pipeline's LAST mile: export the curated corpus
  * as N size-balanced JSONL shards — the format every LLM data loader
  * ingests — plus a per-shard manifest. What makes it an operator and
  * not a `write.json` one-liner:
  *
  *  - BALANCE: shards are balanced by TOKENS, not docs (a doc-count
  *    split leaves shard sizes hostage to length skew). Assignment is
  *    shard = start-offset div stride over the exact global token
  *    cumsum, stride = ⌈total/N⌉ — every shard lands within one
  *    document of the ideal size, and no document splits;
  *  - SCALE: the cumsum is the banded two-phase device
  *    ([[Sampling.capTokensPerSource]], here global): per-band totals
  *    → exclusive offsets over the ≤1000-row band frame → within-band
  *    running sums. Nothing corpus-sized funnels through one sorter,
  *    text never shuffles for the ASSIGNMENT (only scalars do);
  *  - DETERMINISM: band order is the md5 device, so the same corpus
  *    always produces byte-identical shard membership — resumable,
  *    diffable exports;
  *  - VERIFICATION: the gate re-READS the written JSONL and censuses
  *    it (docs, tokens, id range, and a text checksum per shard), so
  *    the JSON round trip itself — escaping, schema, partition
  *    discovery — is inside the verified surface.
  */
object TrainingExport {

  /** (input columns…, n_tokens, shard_id) — assignment only, no IO.
    * `df` must carry `doc_id`; token counts use the whitespace
    * tokenizer shared with the budget samplers.
    */
  def shardAssignments(df: DataFrame, nShards: Int,
      salt: String = "shard"): DataFrame = {
    require(nShards >= 1)
    import df.sparkSession.implicits._
    val banded = df
      .withColumn("n_tokens", size(Dedup.tokensCol($"text")).cast("long"))
      .withColumn("__band", Sampling.bucket($"doc_id", salt))
    val bandTotals = banded.groupBy($"__band")
      .agg(sum($"n_tokens").as("__bt"))
    // exclusive prefix over the ≤1000-row band frame (unpartitioned —
    // aggregate-sized input; WindowAuditSpec carries the exemption)
    val wBands = Window.orderBy($"__band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("__off", coalesce(sum($"__bt").over(wBands), lit(0L)))
      .select($"__band".as("__o_band"), $"__off")
    val stride = bandTotals.agg(
      expr(s"greatest((sum(__bt) + ${nShards}L - 1) div ${nShards}L, 1L)")
        .as("__s"))
    val wIn = Window.partitionBy($"__band").orderBy($"doc_id")
    banded
      .join(broadcast(offsets), $"__band" === $"__o_band")
      .crossJoin(broadcast(stride))
      .withColumn("__cum", $"__off" + sum($"n_tokens").over(wIn))
      .withColumn("shard_id", expr("(__cum - n_tokens) div __s"))
      .drop("__band", "__o_band", "__off", "__s", "__cum")
  }

  /** Write the corpus as `nShards` JSONL shard directories and read
    * the export BACK into a per-shard census — the gate runs the full
    * write → partition-discovered read → verify loop. The checksum
    * column folds a 28-bit md5 prefix of every round-tripped text, so
    * an escaping or truncation bug in the JSON path hash-fails.
    */
  def exportJsonl(spark: SparkSession, dir: String,
      nShards: Int = 8): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source")
    val out = graft.util.Scratch.dir("graft_export_jsonl") + "/corpus"
    shardAssignments(docs, nShards)
      .write.mode("overwrite").partitionBy("shard_id").json(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_tokens", LongType)))
    spark.read.schema(schema).json(out)
      .withColumn("shard_id",
        regexp_extract(input_file_name(), "shard_id=(\\d+)", 1).cast("long"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"),
        sum(conv(substring(md5($"text"), 1, 7), 16, 10).cast("long"))
          .as("text_sum"))
      .orderBy($"shard_id")
  }

  /** Oracle: assignment arithmetic + census re-derived straight from
    * the source table — agreement proves the exported files carry
    * exactly the right documents, bytes intact.
    */
  def exportJsonlSql(nShards: Int = 8): String = {
    val bucket = Sampling.bucketSql("doc_id", "shard")
    s"""WITH toks AS (
          SELECT doc_id, text,
                 CAST(len(list_filter(list_transform(
                        string_split(trim(text), ' '), x -> trim(x)),
                        x -> length(x) > 0)) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, text, n_tokens,
                 CAST(sum(n_tokens) OVER (ORDER BY $bucket, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
          FROM toks),
        s AS (SELECT greatest((CAST(sum(n_tokens) AS BIGINT) + $nShards - 1)
                              // $nShards, 1) AS stride
              FROM toks)
        SELECT (cum - n_tokens) // stride AS shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc,
               CAST(sum(('0x' || substr(md5(text), 1, 7))::BIGINT) AS BIGINT)
                 AS text_sum
        FROM c, s
        GROUP BY 1 ORDER BY 1"""
  }
}
