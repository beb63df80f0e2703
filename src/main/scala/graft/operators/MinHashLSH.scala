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

  /** Deterministic odd multipliers / offsets for the H universal
    * hash functions (seeded LCG — no runtime randomness).
    */
  private val (hashA, hashB): (Array[Long], Array[Long]) = {
    var s = 42L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val a = Array.fill(H)(next() | 1L)
    val b = Array.fill(H)(next())
    (a, b)
  }

  private val POS = 0x7fffffffffffffffL

  /** MinHash signature (array<bigint> length H) over a distinct
    * shingle array column.
    */
  def signatureCol(shingles: Column): Column = {
    val aLit = array(hashA.map(lit): _*)
    val bLit = array(hashB.map(lit): _*)
    val hashes = transform(shingles, s => xxhash64(s))
    transform(sequence(lit(0), lit(H - 1)), i =>
      array_min(transform(hashes, h =>
        bitwiseAND(element_at(aLit, i + 1) * h + element_at(bLit, i + 1), lit(POS)))))
  }

  private def bitwiseAND(l: Column, r: Column): Column = l.bitwiseAND(r)

  /** (doc_id, sig) for every document with ≥3 tokens. */
  def signatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", Dedup.tokensCol($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", signatureCol(Dedup.shinglesCol($"toks", 3)).as("sig"))
  }

  /** Explode each signature into its B band keys:
    * (doc_id, band_idx, band_hash).
    */
  def bands(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    sigs.select($"doc_id", posexplode(
      transform(sequence(lit(0), lit(BANDS - 1)), b =>
        xxhash64(concat_ws(",", slice($"sig", b * R + lit(1), lit(R))), b))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs sharing ≥1 band bucket, with the
    * signature-estimated Jaccard (fraction of agreeing positions).
    */
  def candidatePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = signatures(spark, dir).cache()
    val bk = bands(sigs)
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
