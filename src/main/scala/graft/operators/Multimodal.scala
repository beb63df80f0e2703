package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload with typed metadata. At 100 TB the
  * payload column dominates the scan; every operator below projects
  * metadata-only where it can so parquet column pruning skips the
  * bytes entirely.
  */
case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte], n_bytes: Long)

/** Decoded (stubbed) per-item features. `feature` stands in for the
  * real decoder's embedding output.
  */
case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
    n_frames: Long, mean_byte: Double, feature: Array[Float])

/** #39 multimodal plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, decoded in fixed-size batches inside
  * `mapPartitions` (the JVM analogue of `mapInPandas` — one decoder
  * instantiation per partition, amortized over batches, never one
  * per row). The decode itself is a clearly-marked deterministic
  * STUB (no codec libs in this container); the schema, batching,
  * and partition flow are real and spec-tested.
  */
object Multimodal {

  /** Rows per decode batch — sized so `batch_size × max_payload`
    * fits comfortably in executor memory next to the decoder's own
    * buffers (the same knob as `spark.sql.execution.arrow
    * .maxRecordsPerBatch` for Pandas UDFs).
    */
  val BATCH = 64

  /** Media table derived from `documents`: UTF-8 payload bytes as
    * the opaque binary column, format round-robined by id. This is
    * the shape a real ingest would land: (id, fmt, payload, size).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          ($"doc_id" % 3).cast("int") + 1).as("fmt"),
        $"text".cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length($"payload").cast("long"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake standing in for a real codec
    * (e.g. JPEG decode → pooled CNN features). Consumes the payload
    * bytes exactly once, like a real decoder would.
    */
  private def stubDecode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val nFrames = m.n_bytes / 256 + 1
      var sum = 0L
      val feat = new Array[Float](8)
      var i = 0
      while (i < m.payload.length) {
        val b = m.payload(i) & 0xff
        sum += b
        feat(i % 8) += b / 255.0f
        i += 1
      }
      val mean = if (m.payload.length == 0) 0.0
        else sum.toDouble / m.payload.length
      // half-away-from-zero to match SQL round() (mean is ≥ 0)
      MediaFeatures(m.doc_id, m.fmt, m.n_bytes, nFrames,
        math.floor(mean * 10000 + 0.5) / 10000, feat)
    }

  /** Batched decode: grouped iterator inside mapPartitions keeps at
    * most BATCH payloads materialized per task and gives the decoder
    * its amortized-batch call shape.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BATCH).flatMap(stubDecode))
  }

  /** STUB resize — deterministic nearest-neighbor downsample of the
    * payload viewed as a ⌈√n⌉-square byte grid, standing in for an
    * image resize kernel. The Spark-side contract is the real part:
    * batched mapPartitions, output payload is `side²` bytes, metadata
    * updated to the new geometry.
    */
  def resize(media: Dataset[MediaRow], side: Int = 8): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BATCH).flatMap(_.map { m =>
      val n = m.payload.length
      val srcSide = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
      val out = new Array[Byte](side * side)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val sy = y * srcSide / side
          val sx = x * srcSide / side
          val idx = sy * srcSide + sx
          out(y * side + x) = if (idx < n) m.payload(idx) else 0
          x += 1
        }
        y += 1
      }
      MediaRow(m.doc_id, m.fmt, out, out.length.toLong)
    }))
  }

  /** Gate query: metadata + frame count through the real batched
    * decode path. Columns restricted to what ANSI SQL can reproduce;
    * the feature vector itself is asserted in MultimodalSpec.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaTable(spark, dir))
      .select($"doc_id", $"fmt", $"n_bytes", $"n_frames", $"mean_byte")
  }

  /** Frame sampling: every `everyN`-th fixed-size frame of each
    * payload as its own row — the decode-side of video/audio
    * ingestion (a real decoder would emit keyframes; the 256-byte
    * frame grid is the deterministic stand-in). Pure generator +
    * binary substring: `sequence` enumerates sampled frame indices,
    * `explode` fans out, `substring` slices bytes — all codegen, no
    * UDF, and the frame fan-out happens executor-side (never
    * collects payloads to the driver).
    */
  val FRAME_BYTES = 256

  def frameSample(spark: SparkSession, dir: String, everyN: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF()
      // empty payloads have no frames — and Spark's `div` truncates
      // toward zero where the oracle's // floors, so (0-1) div 256
      // would fabricate a phantom frame_idx 0
      .filter($"n_bytes" > 0)
      .select($"doc_id", $"payload", $"n_bytes",
        explode(sequence(lit(0L), expr(s"(n_bytes - 1) div $FRAME_BYTES"),
          lit(everyN.toLong))).as("frame_idx"))
      .select($"doc_id", $"frame_idx",
        expr(s"substring(payload, cast(frame_idx * $FRAME_BYTES + 1 as int), " +
          s"$FRAME_BYTES)").as("frame"))
      .select($"doc_id", $"frame_idx",
        octet_length($"frame").cast("long").as("frame_len"),
        md5($"frame").as("frame_md5"))
  }

  /** ASCII payloads ⇒ byte-slicing the blob ≡ substring on the text
    * (DuckDB has no BLOB substring); md5 hashes the same bytes.
    */
  def frameSampleSql(everyN: Int = 4): String =
    s"""SELECT doc_id, frame_idx,
          CAST(length(substring(text, CAST(frame_idx * $FRAME_BYTES + 1 AS BIGINT),
               $FRAME_BYTES)) AS BIGINT) AS frame_len,
          md5(substring(text, CAST(frame_idx * $FRAME_BYTES + 1 AS BIGINT),
               $FRAME_BYTES)) AS frame_md5
        FROM (SELECT doc_id, text, unnest(range(0,
                (length(text) - 1) // $FRAME_BYTES + 1, $everyN)) AS frame_idx
              FROM documents WHERE length(text) > 0)"""

  /** The testdata text is pure ASCII (driver-verified), so per-char
    * `ord` equals the UTF-8 byte value.
    */
  val featuresSql: String =
    """SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
           ELSE 'wav' END AS fmt,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) AS BIGINT) // 256 + 1 AS n_frames,
         round(list_sum(list_transform(range(1, length(text) + 1),
           i -> ord(text[i]))) * 1.0 / length(text), 4) AS mean_byte
       FROM documents"""
}
