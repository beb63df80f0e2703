package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window step a
  * training (or RAG indexing) pipeline runs before sequence packing:
  * each document becomes ⌈n/stride⌉ windows of up to `window` tokens
  * starting every `stride` tokens, so consecutive chunks overlap by
  * `window − stride` tokens and every token lands in at least one
  * chunk. The final window may be shorter (it is clamped at the
  * document end, never padded).
  *
  * Shape at 100 TB: chunking is a per-row generator over the scan —
  * tokens never shuffle and the expansion factor is ~window/stride.
  * Downstream, [[Packing.packSequences]] owns cross-document
  * assembly; this operator only owns the within-document geometry.
  */
object Chunking {

  /** (doc_id, chunk_idx, n_tokens, chunk_text) per window. */
  def chunkDocuments(docs: DataFrame, window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    import docs.sparkSession.implicits._
    val toks = Dedup.tokensCol($"text")
    docs
      .select($"doc_id", toks.as("t"))
      .filter(size($"t") >= 1)
      .select($"doc_id",
        posexplode(transform(
          // Column./ is fp division — floor+cast keeps sequence integral
          sequence(lit(0), floor((size($"t") - 1) / stride).cast("int")),
          i => slice($"t", i * stride + 1, lit(window)))))
      .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
        size($"col").cast("long").as("n_tokens"),
        array_join($"col", " ").as("chunk_text"))
  }

  def chunkGate(spark: SparkSession, dir: String, window: Int = 64,
      stride: Int = 48): DataFrame =
    chunkDocuments(Tables.documents(spark, dir), window, stride)

  /** DuckDB mirror: the same start grid (0, stride, …, ≤ len−1) and
    * the same end-clamped slices.
    */
  def chunkGateSql(window: Int = 64, stride: Int = 48): String =
    s"""WITH toks AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(trim(text), ' '),
                             x -> trim(x)), x -> length(x) > 0) AS t
          FROM documents),
        starts AS (
          SELECT doc_id, t, unnest(range(0, len(t), $stride)) AS s
          FROM toks WHERE len(t) >= 1)
        SELECT doc_id, CAST(s // $stride AS BIGINT) AS chunk_idx,
               CAST(len(t[s + 1 : least(s + $window, len(t))]) AS BIGINT)
                 AS n_tokens,
               array_to_string(t[s + 1 : least(s + $window, len(t))], ' ')
                 AS chunk_text
        FROM starts"""
}
