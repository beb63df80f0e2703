package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #29 MinHash + banded LSH near-duplicate detection:
  * shingle → xxhash64 → H permutation-min signature → B bands of R
  * rows → bucket-join on (band, band-hash) → candidate pairs →
  * signature-estimated Jaccard.
  *
  * Everything up to the bucket join is per-row column expressions
  * (no shuffle, no UDF); the only shuffles are the band-bucket join
  * (key = 16 bytes) and the final pair distinct. Pair enumeration is
  * per-bucket, so cost is Σ bucket² — the LSH property keeps buckets
  * tiny for non-duplicates. This is the scale path the quadratic
  * Dedup.ngramJaccardPairs verifier can't walk.
  */
object MinHashLSH {

  val H = 64   // signature length
  val BANDS = 16
  val R = 4    // rows per band; H = BANDS * R

  /** Per-doc signature as H flat columns (m0..m63): explode distinct
    * shingles, then H codegen'd `min(xxhash64(shingle, i))` hash
    * aggregates. The hash family is xxhash64 seeded by position —
    * independent 64-bit hashes with no multiply, so no ANSI overflow
    * (an LCG `a·h+b` family overflows), and the whole signature
    * build stays inside whole-stage codegen with map-side partial
    * aggregation — no interpreted higher-order functions, one
    * shuffle on doc_id.
    */
  def signatureFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exploded = Dedup.shinglePostings(spark, dir)
      .select($"doc_id", $"shingle".as("sh"))
    val aggs = (0 until H).map(i => min(xxhash64($"sh", lit(i))).as(s"m$i"))
    exploded.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, sig: array<bigint> length H). */
  def signatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    signatureFrame(spark, dir)
      .select($"doc_id", array((0 until H).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Band keys (doc_id, band_idx, band_hash) straight off the flat
    * signature frame: band b hashes its R component columns — no
    * array slicing, still codegen.
    */
  def bands(frame: DataFrame): DataFrame = {
    import frame.sparkSession.implicits._
    frame.select($"doc_id", posexplode(array((0 until BANDS).map(b =>
        xxhash64((b * R until (b + 1) * R).map(i => col(s"m$i")) :+ lit(b): _*)): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs sharing ≥1 band bucket, with the
    * signature-estimated Jaccard (fraction of agreeing positions).
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
        round(aggregate(zip_with($"sig_a", $"sig_b",
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(H), 4)
          .as("est_jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Candidates filtered to likely duplicates. Rows-only gate (the
    * hash family isn't reproducible in ANSI SQL); the recall property
    * vs exact Jaccard is asserted in MinHashSpec.
    */
  def nearDuplicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    candidatePairs(spark, dir).filter($"est_jaccard" >= 0.5)
  }
}
