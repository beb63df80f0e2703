package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{array, count, expr, lit, min,
  posexplode, substring}

/** Decoded image metadata/features; `ok = false` rows are the
  * quarantine lane (payload failed the codec), metrics null.
  */
case class ImageDecoded(doc_id: Long, ok: Boolean, width: Option[Long],
    height: Option[Long], channels: Option[Long], px_sum: Option[Long])

/** Decoded audio metadata/features, same quarantine contract. */
case class AudioFp(doc_id: Long, ok: Boolean, n_frames: Option[Long],
  fp_bits: Option[Long])

case class AudioDecoded(doc_id: Long, ok: Boolean, sample_rate: Option[Long],
    n_frames: Option[Long], sum_abs: Option[Long])

/** #39c/#39d REAL multimodal decode — the part row 39 stubbed until
  * round 11. The codecs are JDK-public (`javax.imageio` PNG,
  * `javax.sound.sampled` WAV), so no container libs are needed, and
  * the decode is genuinely exercised end-to-end:
  *
  *  - ENCODE side: each document becomes one real 8-bit grayscale
  *    PNG / one real PCM-16 mono WAV whose geometry and samples are
  *    pure integer functions of doc_id — written by the actual codec
  *    (`ImageIO.write` / `AudioSystem.write`), not templated bytes;
  *  - DECODE side: batched `mapPartitions` (the same amortized-batch
  *    shape as [[Multimodal.decodeFeatures]]) runs the actual
  *    reader; a payload the codec rejects lands in the quarantine
  *    lane (`ok = false`, metrics null) instead of failing the job —
  *    the PERMISSIVE-reader contract applied to media;
  *  - ORACLE side: because the pixel/sample functions are closed-form
  *    integer arithmetic, DuckDB re-derives every decoded metric
  *    (width/height/channels/pixel sum; rate/frames/Σ|sample|)
  *    WITHOUT a codec — so a wrong decode (byte-order slip, color
  *    model confusion, off-by-one frame math) hash-fails the gate.
  *
  * Scale shape: encode + decode are a single zero-shuffle scan;
  * payloads never leave the executors and never concentrate
  * driver-side. A corrupt sub-population (doc_id % 97 / % 101) is
  * built in so the quarantine lane is exercised at every SF.
  */
object MultimodalCodec {

  /** Batch size for the grouped-iterator decode — same knob as
    * [[Multimodal.BATCH]].
    */
  val BATCH = 64

  // ── PNG ──────────────────────────────────────────────────────────

  /** Geometry/pixels as pure functions of doc_id: w ∈ [8,16],
    * h ∈ [8,14], pixel(x, y) = (id·31 + x·7 + y·13) mod 256.
    */
  def pngWidth(id: Long): Int = (8 + id % 9).toInt
  def pngHeight(id: Long): Int = (8 + id % 7).toInt
  def pngPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** One real PNG via the JDK encoder. 8-bit grayscale round-trips
    * sample-exact through PNG (lossless, no color-space rescale for
    * TYPE_BYTE_GRAY), which is what lets the oracle re-derive the
    * decoded pixel sum arithmetically.
    */
  def encodePng(id: Long): Array[Byte] =
    encodeGrid(pngWidth(id), pngHeight(id), pngPixel(id, _, _))

  private def encodeGrid(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, px(x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The image corpus: one PNG per document; every 97th payload is
    * truncated to its first 16 bytes (signature + partial IHDR — the
    * codec must reject it) to drive the quarantine lane.
    */
  def imageTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val full = encodePng(id)
        val payload = if (id % 97 == 0) full.take(16) else full
        MediaRow(id, "png", payload, payload.length.toLong)
      })
  }

  /** Batched REAL decode: `ImageIO.read` per payload inside grouped
    * `mapPartitions`; a null/throwing decode quarantines the row.
    * Pixel sum reads the gray raster band directly — the inverse of
    * [[encodePng]]'s setSample, so any codec-level distortion would
    * surface as a wrong sum, not be absorbed by symmetric bugs.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.grouped(BATCH).flatMap(_.map { m =>
        try {
          val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.payload))
          if (img == null) ImageDecoded(m.doc_id, ok = false, None, None, None, None)
          else {
            val r = img.getRaster
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += r.getSample(x, y, 0); x += 1 }
              y += 1
            }
            ImageDecoded(m.doc_id, ok = true, Some(img.getWidth.toLong),
              Some(img.getHeight.toLong), Some(r.getNumBands.toLong), Some(sum))
          }
        } catch { case _: java.io.IOException | _: RuntimeException =>
          ImageDecoded(m.doc_id, ok = false, None, None, None, None)
        }
      })
    }
  }

  /** Gate: encode → REAL PNG decode → metrics, quarantine included. */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeImages(imageTable(spark, dir)).toDF()
  }

  /** Oracle: the decoded metrics re-derived arithmetically — no codec
    * on the DuckDB side, so agreement means the JVM codec really
    * round-tripped the samples.
    */
  val imageDecodeSql: String =
    """WITH g AS (
         SELECT doc_id,
                8 + doc_id % 9 AS w,
                8 + doc_id % 7 AS h
         FROM documents),
       px AS (
         SELECT g.doc_id,
                CAST(sum((g.doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS BIGINT)
                  AS px_sum
         FROM g, range(16) x(x), range(14) y(y)
         WHERE x.x < g.w AND y.y < g.h
         GROUP BY g.doc_id)
       SELECT g.doc_id,
              g.doc_id % 97 <> 0 AS ok,
              CASE WHEN g.doc_id % 97 = 0 THEN NULL
                   ELSE CAST(g.w AS BIGINT) END AS width,
              CASE WHEN g.doc_id % 97 = 0 THEN NULL
                   ELSE CAST(g.h AS BIGINT) END AS height,
              CASE WHEN g.doc_id % 97 = 0 THEN NULL
                   ELSE CAST(1 AS BIGINT) END AS channels,
              CASE WHEN g.doc_id % 97 = 0 THEN NULL
                   ELSE px.px_sum END AS px_sum
       FROM g JOIN px ON px.doc_id = g.doc_id"""

  /** Average-hash (aHash) perceptual image fingerprint over the REAL
    * decode path — the image-dedup primitive (near-identical images
    * at different sizes collapse to the same or hamming-close hash):
    * the decoded raster is point-sampled to an 8×8 grid
    * (sx = x·w div 8, sy = y·h div 8 — integer nearest-neighbor, the
    * [[Multimodal.resize]] mapping), and bit (y, x) is set when
    * 64·sample > Σ samples (cross-multiplied — no fp mean). Emitted
    * as a 64-char bit string, row-major, so any engine can compare /
    * hamming it without signed-overflow games; corrupt payloads ride
    * the same quarantine lane as [[decodeImages]]. The oracle
    * re-derives every bit from the closed-form pixel function —
    * agreement means the real codec + sampling produced exactly the
    * intended grid.
    */
  def imagePHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(BATCH).flatMap(_.map { m =>
        try {
          val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.payload))
          if (img == null) (m.doc_id, false, None: Option[String])
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val r = img.getRaster
            val s = new Array[Int](64)
            var sum = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val v = r.getSample(x * w / 8, y * h / 8, 0)
                s(y * 8 + x) = v
                sum += v
                x += 1
              }
              y += 1
            }
            val bits = s.map(v => if (64L * v > sum) '1' else '0').mkString
            (m.doc_id, true, Some(bits))
          }
        } catch { case _: java.io.IOException | _: RuntimeException =>
          (m.doc_id, false, None: Option[String])
        }
      })
    }.toDF("doc_id", "ok", "phash")
  }

  /** Gate: encode → real decode → aHash, quarantine included. */
  def imagePHashGate(spark: SparkSession, dir: String): DataFrame =
    imagePHash(imageTable(spark, dir))

  /** Oracle: all 64 bits re-derived arithmetically from the pixel
    * function — row-major string_agg over the 8×8 grid.
    */
  val imagePHashSql: String =
    """WITH g AS (
         SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
         FROM documents),
       cells AS (
         SELECT g.doc_id, y.y, x.x,
                (g.doc_id * 31 + ((x.x * g.w) // 8) * 7
                 + ((y.y * g.h) // 8) * 13) % 256 AS v
         FROM g, range(8) x(x), range(8) y(y)),
       sums AS (
         SELECT doc_id, CAST(sum(v) AS BIGINT) AS s FROM cells GROUP BY doc_id),
       bits AS (
         SELECT c.doc_id,
                string_agg(CASE WHEN 64 * c.v > m.s THEN '1' ELSE '0' END, ''
                           ORDER BY c.y, c.x) AS phash
         FROM cells c JOIN sums m ON m.doc_id = c.doc_id
         GROUP BY c.doc_id)
       SELECT g.doc_id,
              g.doc_id % 97 <> 0 AS ok,
              CASE WHEN g.doc_id % 97 = 0 THEN NULL ELSE b.phash END AS phash
       FROM g JOIN bits b ON b.doc_id = g.doc_id"""

  /** Image corpus with DUPLICATE CONTENT built in: every run of 7 doc
    * ids shares one pixel grid (seed = id div 7 · 7) — the shape a
    * crawl actually produces (same image mirrored under many URLs).
    */
  def imageTableGrouped(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val payload = encodePng(id / 7 * 7)
        MediaRow(id, "png", payload, payload.length.toLong)
      })
  }

  /** Gate: image dedup END-TO-END over the real codec — encode the
    * duplicate-laden corpus, REAL-decode every payload, perceptual-
    * hash the rasters, and group by hash: (hash, copy count, keeper =
    * min id). The full image-dedup loop — ingest → decode → content
    * fingerprint → exact hash-groupBy — with each stage the real
    * implementation, and the oracle re-deriving the hashes
    * arithmetically so a codec or sampling slip breaks the grouping.
    * Cross-seed aHash collisions simply merge groups — identically in
    * both engines — which is perceptual dedup's contract (hash
    * equality, not provenance, defines a duplicate).
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imagePHash(imageTableGrouped(spark, dir))
      .filter($"ok")
      .groupBy($"phash")
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper"))
      .orderBy($"keeper")
  }

  val phashDedupSql: String =
    """WITH g AS (
         SELECT doc_id, (doc_id // 7) * 7 AS sid FROM documents),
       geo AS (
         SELECT doc_id, sid, 8 + sid % 9 AS w, 8 + sid % 7 AS h FROM g),
       cells AS (
         SELECT doc_id, y.y, x.x,
                (sid * 31 + ((x.x * w) // 8) * 7 + ((y.y * h) // 8) * 13) % 256
                  AS v
         FROM geo, range(8) x(x), range(8) y(y)),
       sums AS (
         SELECT doc_id, CAST(sum(v) AS BIGINT) AS s FROM cells GROUP BY doc_id),
       bits AS (
         SELECT c.doc_id,
                string_agg(CASE WHEN 64 * c.v > m.s THEN '1' ELSE '0' END, ''
                           ORDER BY c.y, c.x) AS phash
         FROM cells c JOIN sums m ON m.doc_id = c.doc_id
         GROUP BY c.doc_id)
       SELECT phash, CAST(count(*) AS BIGINT) AS n_copies,
              CAST(min(doc_id) AS BIGINT) AS keeper
       FROM bits GROUP BY phash
       ORDER BY keeper"""

  /** NOISY duplicate corpus: same 7-id pixel groups as
    * [[imageTableGrouped]], but each id perturbs ONE aHash-sampled
    * pixel by (id mod 7) — the near-duplicate shape (re-encoded,
    * slightly retouched copies) whose hashes land a few bits apart
    * instead of identical.
    */
  def noisyPixel(id: Long, x: Int, y: Int): Int = {
    val seed = id / 7 * 7
    val (w, h) = (pngWidth(seed), pngHeight(seed))
    val bump = if (x == 3 * w / 8 && y == 3 * h / 8) (id % 7).toInt else 0
    (pngPixel(seed, x, y) + bump) % 256
  }

  def imageTableNoisy(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val seed = id / 7 * 7
        val payload = encodeGrid(pngWidth(seed), pngHeight(seed),
          noisyPixel(id, _, _))
        MediaRow(id, "png", payload, payload.length.toLong)
      })
  }

  /** NEAR-duplicate image pairs: hamming(aHash) ≤ `maxHamming` over
    * the noisy corpus, found WITHOUT an all-pairs join — the 64-bit
    * hash splits into 4 16-bit chunks, and any pair within hamming 3
    * must agree on ≥1 whole chunk (pigeonhole — the [[SimHash]]
    * device applied to image hashes), so candidates come from 4
    * chunk-keyed equi-joins and only candidates pay the exact
    * 64-position hamming verify. Lossless at the declared radius;
    * MultimodalSpec checks candidates ⊇ the brute-force pair set.
    */
  def phashNearPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    require(maxHamming < 4, "4-chunk pigeonhole is lossless only to hamming 3")
    // the image decode + 8×8 aHash is the kernel; a single-split
    // input fuses it into one task (1.2 s single-task on the r16
    // probe) — spread the corpus before the decode
    val hashes = imagePHash(imageTableNoisy(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism))
      .filter($"ok").select($"doc_id", $"phash")
      .localCheckpoint(true)
    val chunks = hashes.select($"doc_id", posexplode(array((0 until 4).map(c =>
      substring($"phash", c * 16 + 1, 16)): _*)))
      .withColumnRenamed("pos", "ci").withColumnRenamed("col", "chunk")
    val cand = chunks.as("x").join(chunks.as("y"),
        $"x.ci" === $"y.ci" && $"x.chunk" === $"y.chunk" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .distinct()
    cand
      .join(hashes.select($"doc_id".as("a"), $"phash".as("pa")), "a")
      .join(hashes.select($"doc_id".as("b"), $"phash".as("pb")), "b")
      .withColumn("hamming", expr(
        "CAST(size(filter(sequence(1, 64), i -> " +
          "substr(pa, i, 1) != substr(pb, i, 1))) AS BIGINT)"))
      .filter($"hamming" <= maxHamming)
      .select($"a", $"b", $"hamming")
      .orderBy($"a", $"b")
  }

  /** Oracle: hashes re-derived arithmetically (noisy pixel formula),
    * then a brute-force pair scan — blocking is lossless at radius 3,
    * so the candidate path must return exactly the brute set.
    */
  val phashNearPairsSql: String =
    """WITH g AS (
         SELECT doc_id, (doc_id // 7) * 7 AS sid FROM documents),
       geo AS (
         SELECT doc_id, sid, 8 + sid % 9 AS w, 8 + sid % 7 AS h FROM g),
       cells AS (
         SELECT doc_id, y.y, x.x,
                ((sid * 31 + ((x.x * w) // 8) * 7 + ((y.y * h) // 8) * 13) % 256
                 + CASE WHEN (x.x * w) // 8 = (3 * w) // 8
                         AND (y.y * h) // 8 = (3 * h) // 8
                        THEN doc_id % 7 ELSE 0 END) % 256 AS v
         FROM geo, range(8) x(x), range(8) y(y)),
       sums AS (
         SELECT doc_id, CAST(sum(v) AS BIGINT) AS s FROM cells GROUP BY doc_id),
       bits AS (
         SELECT c.doc_id,
                string_agg(CASE WHEN 64 * c.v > m.s THEN '1' ELSE '0' END, ''
                           ORDER BY c.y, c.x) AS phash
         FROM cells c JOIN sums m ON m.doc_id = c.doc_id
         GROUP BY c.doc_id),
       pairs AS (
         SELECT a.doc_id AS a, b.doc_id AS b,
                CAST(len([i for i in range(1, 65)
                          if substr(a.phash, CAST(i AS INT), 1)
                             <> substr(b.phash, CAST(i AS INT), 1)])
                     AS BIGINT) AS hamming
         FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
       SELECT a, b, hamming FROM pairs
       WHERE hamming <= 3 ORDER BY a, b"""

  // ── WAV ──────────────────────────────────────────────────────────

  /** Sample plan as pure functions of doc_id: n ∈ [64, 192] PCM-16
    * samples, rate ∈ {8000..12000}, s(i) = ((id·13 + i·7) mod 2¹⁶)
    * − 2¹⁵.
    */
  def wavFrames(id: Long): Int = (64 + id % 129).toInt
  def wavRate(id: Long): Int = (8000 + (id % 5) * 1000).toInt
  def wavSample(id: Long, i: Int): Int =
    ((id * 13 + i.toLong * 7) % 65536).toInt - 32768

  /** One real WAV (RIFF/PCM-16-LE mono) via the JDK encoder. */
  def encodeWav(id: Long): Array[Byte] =
    encodeWavSamples(Array.tabulate(wavFrames(id))(wavSample(id, _)),
      wavRate(id))

  /** WAV encode of explicit samples — crafted-fixture entry for
    * specs (gain/locality probes need controlled PCM).
    */
  def encodeWavSamples(samples: Array[Int], rate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val n = samples.length
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = samples(i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The audio corpus: one WAV per document; every 101st payload is
    * truncated to 8 bytes (half a RIFF header) for the quarantine
    * lane.
    */
  def audioTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val full = encodeWav(id)
        val payload = if (id % 101 == 0) full.take(8) else full
        MediaRow(id, "wav", payload, payload.length.toLong)
      })
  }

  /** Batched REAL decode: `AudioSystem.getAudioInputStream` parses
    * the RIFF container (rejecting the truncated payloads), the PCM
    * stream is drained and each sample reconstructed little-endian —
    * Σ|sample| is the arithmetic the oracle replays.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BATCH).flatMap(_.map { m =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.payload))
        try {
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < bytes.length) {
            val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
            sum += math.abs(s.toLong)
            i += 2
          }
          AudioDecoded(m.doc_id, ok = true,
            Some(fmt.getSampleRate.toLong), Some(bytes.length / 2L), Some(sum))
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: RuntimeException =>
          AudioDecoded(m.doc_id, ok = false, None, None, None)
      }
    }))
  }

  /** Gate: encode → REAL WAV decode → metrics, quarantine included. */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeAudio(audioTable(spark, dir)).toDF()
  }

  /** Energy-delta audio fingerprint off the REAL decode path — the
    * Shazam-lineage device (Wang 2003) reduced to its deterministic
    * integer core: 16-sample frame energies Σs² (BIGINT), one sign
    * bit per frame transition (does energy rise?), bits packed into
    * one long. Robust to uniform gain (energy ORDER survives
    * scaling), which is what makes it a fingerprint rather than a
    * checksum; frame count is bounded by payload size so the bit
    * budget is static. The oracle replays the PCM closed form
    * arithmetically — no codec on the DuckDB side, same contract as
    * the decode gates; truncated payloads quarantine ok=false.
    */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BATCH).flatMap(_.map { m =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.payload))
        try {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val samples = Array.tabulate(n)(i =>
            ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong)
          val nf = n / 16
          val e = Array.tabulate(nf) { f =>
            var s = 0L; var i = 16 * f
            while (i < 16 * f + 16) { s += samples(i) * samples(i); i += 1 }
            s
          }
          var fp = 0L
          var f = 1
          while (f < nf) { if (e(f) > e(f - 1)) fp |= 1L << (f - 1); f += 1 }
          AudioFp(m.doc_id, ok = true, Some(nf.toLong), Some(fp))
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: RuntimeException =>
          AudioFp(m.doc_id, ok = false, None, None)
      }
    }))
  }

  def audioFp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioFingerprint(audioTable(spark, dir)).toDF()
  }

  val audioFpSql: String =
    """WITH g AS (
         SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
       fr AS (
         SELECT g.doc_id, i.i // 16 AS f,
                CAST(sum(CAST(((g.doc_id * 13 + i.i * 7) % 65536) - 32768
                           AS BIGINT)
                         * (((g.doc_id * 13 + i.i * 7) % 65536) - 32768))
                     AS BIGINT) AS e
         FROM g, range(192) i(i)
         WHERE i.i < (g.n // 16) * 16
         GROUP BY 1, 2),
       lagd AS (
         SELECT doc_id, f, e,
                lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe
         FROM fr),
       fp AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
                CAST(coalesce(sum(CASE WHEN pe IS NOT NULL AND e > pe
                       THEN (1::BIGINT << (f - 1)) ELSE 0 END), 0)
                     AS BIGINT) AS fp_bits
         FROM lagd GROUP BY doc_id)
       SELECT g.doc_id, g.doc_id % 101 <> 0 AS ok,
              CASE WHEN g.doc_id % 101 = 0 THEN NULL
                   ELSE fp.n_frames END AS n_frames,
              CASE WHEN g.doc_id % 101 = 0 THEN NULL
                   ELSE fp.fp_bits END AS fp_bits
       FROM g JOIN fp ON fp.doc_id = g.doc_id"""

  val audioDecodeSql: String =
    """WITH g AS (
         SELECT doc_id,
                64 + doc_id % 129 AS n,
                8000 + (doc_id % 5) * 1000 AS rate
         FROM documents),
       amp AS (
         SELECT g.doc_id,
                CAST(sum(abs(((g.doc_id * 13 + i.i * 7) % 65536) - 32768))
                     AS BIGINT) AS sum_abs
         FROM g, range(193) i(i)
         WHERE i.i < g.n
         GROUP BY g.doc_id)
       SELECT g.doc_id,
              g.doc_id % 101 <> 0 AS ok,
              CASE WHEN g.doc_id % 101 = 0 THEN NULL
                   ELSE CAST(g.rate AS BIGINT) END AS sample_rate,
              CASE WHEN g.doc_id % 101 = 0 THEN NULL
                   ELSE CAST(g.n AS BIGINT) END AS n_frames,
              CASE WHEN g.doc_id % 101 = 0 THEN NULL
                   ELSE amp.sum_abs END AS sum_abs
       FROM g JOIN amp ON amp.doc_id = g.doc_id"""
}
