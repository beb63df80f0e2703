package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #29 MinHash + banded LSH near-duplicate detection:
  * shingle → 64-permutation min-signature → B bands of R rows →
  * bucket-join on (band, band-hash) → candidate pairs →
  * signature-estimated Jaccard.
  *
  * Everything up to the bucket join is per-row column expressions
  * (no shuffle, no UDF); the only shuffles are the band-bucket join
  * (key = 8 bytes) and the final pair distinct. Pair enumeration is
  * per-bucket, so cost is Σ bucket² — the LSH property keeps buckets
  * tiny for non-duplicates. This is the scale path the quadratic
  * Dedup.ngramJaccardPairs verifier can't walk.
  *
  * Hash family: one md5 per distinct shingle split into two 28-bit
  * halves (h1, h2), then h_i = (h1 + i·(2·h2+1)) mod 2³¹−1 — the
  * Kirsch-Mitzenmacher two-hash construction (public bloom-filter /
  * minhash folklore). Properties that matter here:
  *   - 64 hashes cost ONE digest + 64 integer ops per shingle
  *     (cheaper than 64 independent xxhash64 calls re-reading the
  *     string), all inside whole-stage codegen;
  *   - no multiplication ever exceeds 2³⁵, so default-ANSI Spark 4
  *     cannot overflow;
  *   - every step is reproducible in ANSI SQL, so the DuckDB oracle
  *     checks the ENTIRE pipeline exactly (not rows-only).
  */
object MinHashLSH {

  val H = 64   // signature length
  val BANDS = 16
  val R = 4    // rows per band; H = BANDS * R
  val M = 2147483647L // 2^31-1, Mersenne prime

  /** 28-bit integers from hex prefixes of one md5 — portable to any
    * engine with md5 + hex parsing.
    */
  private def md5Half(c: Column, from: Int): Column =
    conv(substring(md5(c), from, 7), 16, 10).cast("long")

  /** h_i = (h1 + i·(2·h2+1)) mod M; the 2·h2+1 keeps the stride odd
    * (a zero stride would collapse all 64 hashes to h1).
    */
  private def kmHash(h1: Column, h2: Column, i: Int): Column =
    (h1 + lit(i.toLong) * (h2 * 2L + 1L)) % M

  /** Per-doc signature as H flat columns (m0..m63), via the native
    * per-row kernel (graft.functions.MinHashSigs): the raw
    * space-split token array feeds one kernel call per document that
    * builds distinct 3-shingles and folds all H mins in a tight
    * loop — signature construction is a pure scan with ZERO
    * exchanges (the aggregate form below shuffles the full shingle
    * set on doc_id). Docs with < 3 tokens have no shingle and are
    * dropped (kernel returns null), matching the aggregate path.
    */
  def signatureFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id",
        call_function("minhash_sigs", split(trim($"text"), " ")).as("sig"))
      .filter($"sig".isNotNull)
      .select($"doc_id" +: (0 until H).map(i => $"sig"(i).as(s"m$i")): _*)
  }

  /** The previous explode + H `min(...)`-aggregate formulation (one
    * doc_id shuffle, map-side partial agg) — kept as the column-API
    * reference the kernel is cross-validated against in MinHashSpec.
    */
  def signatureFrameAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val halves = Dedup.shinglePostings(spark, dir)
      .select($"doc_id",
        md5Half($"shingle", 1).as("h1"), md5Half($"shingle", 9).as("h2"))
    val aggs = (0 until H).map(i => min(kmHash($"h1", $"h2", i)).as(s"m$i"))
    halves.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, sig: array<bigint> length H). */
  def signatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    signatureFrame(spark, dir)
      .select($"doc_id", array((0 until H).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Band keys (doc_id, band_idx, band_hash) straight off the flat
    * signature frame: band b's key is a 60-bit md5 prefix of its R
    * comma-joined component values — an 8-byte join key instead of a
    * ~44-byte string, same derivation on the oracle side.
    */
  def bands(frame: DataFrame): DataFrame = {
    import frame.sparkSession.implicits._
    frame.select($"doc_id", posexplode(array((0 until BANDS).map { b =>
        val key = concat_ws(",", (b * R until (b + 1) * R).map(i => col(s"m$i")): _*)
        conv(substring(md5(key), 1, 15), 16, 10).cast("long")
      }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs sharing ≥1 band bucket, with the
    * signature-estimated Jaccard (fraction of agreeing positions).
    * est_jaccard = k/64 is a dyadic rational — exactly representable
    * in a double, so no rounding is needed for oracle parity.
    */
  def candidatePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frame = signatureFrame(spark, dir).cache()
    val sigs = frame.select($"doc_id",
      array((0 until H).map(i => col(s"m$i")): _*).as("sig"))
    val bk = bands(frame)
    val pairs = bk.as("x").join(bk.as("y"),
        $"x.band_idx" === $"y.band_idx" && $"x.band_hash" === $"y.band_hash" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select($"doc_id".as("doc_a"), $"sig".as("sig_a")), "doc_a")
      .join(sigs.select($"doc_id".as("doc_b"), $"sig".as("sig_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        (aggregate(zip_with($"sig_a", $"sig_b",
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(H))
          .as("est_jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Candidates filtered to likely duplicates. Exact DuckDB gate
    * ([[nearDuplicatesSql]]); the recall property vs exact Jaccard is
    * additionally asserted in MinHashSpec.
    */
  def nearDuplicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    candidatePairs(spark, dir).filter($"est_jaccard" >= 0.5)
  }

  /** (doc_id, sig) for any (doc_id, text) frame — the building block
    * for a PERSISTED dedup index: run once over the corpus, store the
    * result, and dedup each incoming batch against it with
    * [[incrementalNearDuplicates]] instead of re-scanning the corpus.
    */
  def signaturesOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id",
        call_function("minhash_sigs", split(trim($"text"), " ")).as("sig"))
      .filter($"sig".isNotNull)
  }

  /** Band keys straight off the (doc_id, sig array) form — same
    * derivation as [[bands]], for index-shaped inputs.
    */
  def bandsOfSig(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    sigs.select($"doc_id", posexplode(array((0 until BANDS).map { b =>
        val key = concat_ws(",", (b * R until (b + 1) * R).map(i => $"sig"(i)): _*)
        conv(substring(md5(key), 1, 15), 16, 10).cast("long")
      }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** Incremental near-dedup: an incoming batch against a stored
    * signature index — the daily-ingest shape (dedup the day's crawl
    * against the whole corpus WITHOUT touching corpus text). The
    * batch side is day-sized, so its band keys broadcast and the
    * index never shuffles; candidate enumeration stays per-bucket.
    * Emits (batch_id, corpus_id, est_jaccard ≥ threshold).
    */
  def incrementalNearDuplicates(batch: DataFrame, index: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    import batch.sparkSession.implicits._
    val bs = signaturesOf(batch)
    val bb = bandsOfSig(bs)
      .select($"doc_id".as("batch_id"), $"band_idx", $"band_hash")
    val ib = bandsOfSig(index)
      .select($"doc_id".as("corpus_id"), $"band_idx", $"band_hash")
    val pairs = ib.join(broadcast(bb), Seq("band_idx", "band_hash"))
      .select($"batch_id", $"corpus_id").distinct()
    // the verify side (pairs ⋈ batch sigs) is batch-bounded, so it is
    // broadcast EXPLICITLY — "the index never shuffles" then holds by
    // construction, not by AQE's runtime broadcast conversion
    // (PlanAuditSpec pins no exchange on the index relation)
    broadcast(pairs
        .join(broadcast(bs.select($"doc_id".as("batch_id"), $"sig".as("sig_a"))),
          "batch_id"))
      .join(index.select($"doc_id".as("corpus_id"), $"sig".as("sig_b")),
        "corpus_id")
      .select($"batch_id", $"corpus_id",
        (aggregate(zip_with($"sig_a", $"sig_b",
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(H))
          .as("est_jaccard"))
      .filter($"est_jaccard" >= threshold)
  }

  /** Gate: a reproducible md5-bucket split (10% batch / 90% corpus —
    * the same cross-engine split device the decontaminate gate uses)
    * drives the incremental path, so the DuckDB oracle re-derives
    * index, batch, bands, and estimates exactly.
    */
  def incrementalGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
    val b = Sampling.bucket($"doc_id", "inc")
    incrementalNearDuplicates(
      docs.filter(b < 100),
      signaturesOf(docs.filter(b >= 100)))
  }

  def incrementalGateSql: String = {
    val bucketX = Sampling.bucketSql("x.doc_id", "inc")
    val bucketY = Sampling.bucketSql("y.doc_id", "inc")
    s"""WITH toks AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(trim(text), ' '), x -> trim(x)),
                             x -> length(x) > 0) AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                       for i in range(1, len(t) - 1)])) AS shingle
          FROM toks WHERE len(t) >= 3),
        halves AS (
          SELECT doc_id,
                 ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h1,
                 ('0x' || substr(md5(shingle), 9, 7))::BIGINT AS h2
          FROM sh),
        sig AS (
          SELECT doc_id, i, min((h1 + i * (2 * h2 + 1)) % $M) AS m
          FROM halves CROSS JOIN range($H) t(i)
          GROUP BY doc_id, i),
        bands AS (
          SELECT doc_id, i // $R AS band_idx,
                 ('0x' || substr(md5(string_agg(m::VARCHAR, ',' ORDER BY i)), 1, 15))::BIGINT
                   AS band_hash
          FROM sig GROUP BY doc_id, i // $R),
        cand AS (
          SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS corpus_id
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
          WHERE $bucketX < 100 AND $bucketY >= 100),
        est AS (
          SELECT c.batch_id, c.corpus_id,
                 CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS DOUBLE) / $H
                   AS est_jaccard
          FROM cand c
          JOIN sig a ON a.doc_id = c.batch_id
          JOIN sig b ON b.doc_id = c.corpus_id AND b.i = a.i
          GROUP BY c.batch_id, c.corpus_id)
        SELECT batch_id, corpus_id, est_jaccard FROM est
        WHERE est_jaccard >= 0.5"""
  }

  /** The full pipeline re-derived in DuckDB SQL: same shingles, same
    * md5-half hash family, same band keys, same candidate join, same
    * agreement count — hash-exact, not rows-only.
    */
  val nearDuplicatesSql: String =
    s"""WITH toks AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(trim(text), ' '), x -> trim(x)),
                             x -> length(x) > 0) AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                       for i in range(1, len(t) - 1)])) AS shingle
          FROM toks WHERE len(t) >= 3),
        halves AS (
          SELECT doc_id,
                 ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h1,
                 ('0x' || substr(md5(shingle), 9, 7))::BIGINT AS h2
          FROM sh),
        sig AS (
          SELECT doc_id, i, min((h1 + i * (2 * h2 + 1)) % $M) AS m
          FROM halves CROSS JOIN range($H) t(i)
          GROUP BY doc_id, i),
        bands AS (
          SELECT doc_id, i // $R AS band_idx,
                 ('0x' || substr(md5(string_agg(m::VARCHAR, ',' ORDER BY i)), 1, 15))::BIGINT
                   AS band_hash
          FROM sig GROUP BY doc_id, i // $R),
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
               AND x.doc_id < y.doc_id),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS DOUBLE) / $H
                   AS est_jaccard
          FROM cand c
          JOIN sig a ON a.doc_id = c.doc_a
          JOIN sig b ON b.doc_id = c.doc_b AND b.i = a.i
          GROUP BY c.doc_a, c.doc_b)
        SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.5"""

  /** LSH BAND-PLAN selection as code — the (bands × rows) knob every
    * MinHash deployment hand-tunes, decided from DATA instead
    * (Broder/IR collision calculus: a pair at Jaccard s becomes an
    * LSH candidate with p = 1 − (1 − s^r)^b). For each config on the
    * 64-permutation budget, the EXPECTED RECALL over the corpus' own
    * observed near-dup pairs (the exact-Jaccard gate frame) is
    * E[p(s)] — each pair's p computed by REPEATED multiplication
    * (fixed-length IEEE chains both engines evaluate identically;
    * `pow` carries no cross-engine rounding guarantee), quantized to
    * integer micro per pair before the mean. `chosen` = the FEWEST
    * bands (bucket work ∝ b) clearing `recallFloorPpm`, else the
    * highest-recall config — the blockingKeySelect decision shape on
    * the LSH axis.
    */
  def lshBandPlan(spark: SparkSession, dir: String,
      recallFloorPpm: Long = 900000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.Column
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
      .select($"jaccard").localCheckpoint(true)
    def powCol(c: Column, k: Int): Column = Seq.fill(k)(c).reduce(_ * _)
    val configs = Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16))
    val arms = configs.map { case (b, r) =>
      pairs.select(lit(b.toLong).as("bands"),
        lit(r.toLong).as("rows_per_band"),
        round((lit(1.0) - powCol(lit(1.0) - powCol($"jaccard", r), b))
          * 1.0e6).cast("long").as("p_micro"))
    }.reduce(_.unionByName(_))
    val perConfig = arms.groupBy($"bands", $"rows_per_band")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(p_micro) div count(1)").as("exp_recall_ppm"))
    val best = perConfig
      .agg(min(struct(
        when($"exp_recall_ppm" >= recallFloorPpm, 0L).otherwise(1L)
          .as("miss"),
        when($"exp_recall_ppm" >= recallFloorPpm, $"bands")
          .otherwise(lit(1000000L) - $"exp_recall_ppm").as("rank"),
        $"bands".as("b"))).as("w"))
      .select($"w.b".as("best_b"))
    perConfig.crossJoin(broadcast(best))
      .select($"bands", $"rows_per_band", $"n_pairs", $"exp_recall_ppm",
        when($"bands" === $"best_b", 1L).otherwise(0L).as("chosen"))
      .orderBy($"bands".desc)
  }

  def lshBandPlanSql(recallFloorPpm: Long = 900000L): String = {
    val configs = Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16))
    def pow(e: String, k: Int) = Seq.fill(k)(s"($e)").mkString(" * ")
    val arms = configs.map { case (b, r) =>
      val p = s"1.0 - ${pow(s"1.0 - ${pow("jaccard", r)}", b)}"
      s"""SELECT CAST($b AS BIGINT) AS bands,
                 CAST($r AS BIGINT) AS rows_per_band,
                 CAST(round(($p) * 1000000) AS BIGINT) AS p_micro
          FROM pairs"""
    }.mkString("\n        UNION ALL\n        ")
    s"""WITH ${graft.operators.Dedup.pairsCte},
        arms AS (
        $arms),
        per_config AS (
          SELECT bands, rows_per_band,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(p_micro) // count(*) AS BIGINT)
                   AS exp_recall_ppm
          FROM arms GROUP BY 1, 2),
        best AS (
          SELECT bands AS best_b FROM per_config
          ORDER BY CASE WHEN exp_recall_ppm >= $recallFloorPpm
                        THEN 0 ELSE 1 END,
                   CASE WHEN exp_recall_ppm >= $recallFloorPpm
                        THEN bands
                        ELSE 1000000 - exp_recall_ppm END,
                   bands
          LIMIT 1)
        SELECT bands, rows_per_band, n_pairs, exp_recall_ppm,
               CAST(CASE WHEN bands = (SELECT best_b FROM best)
                    THEN 1 ELSE 0 END AS BIGINT) AS chosen
        FROM per_config
        ORDER BY bands DESC"""
  }
}
