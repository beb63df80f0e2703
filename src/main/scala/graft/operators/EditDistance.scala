package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) near-dedup over a fixed prefix window
  * of each document, blocked with PassJoin segment signatures (Li,
  * Deng, Feng: "PassJoin: a partition-based method for similarity
  * joins", VLDB 2011) so no all-pairs comparison ever happens.
  *
  * Pigeonhole lemma: partition a string into k+1 contiguous segments;
  * any string within edit distance k contains at least one segment as
  * an exact substring, shifted from the segment's own position by at
  * most k (the net insertions/deletions before the untouched
  * segment). So the join is: exact segments of every doc (index side)
  * against all substrings any partner could contribute (probe side:
  * partner-length band ±k, position window ±k), then an exact
  * `levenshtein` verify over the surviving candidate pairs only.
  *
  * Scale shape: the probe expansion is a constant factor per doc
  * ((2k+1)·(k+1)·(2k+1) short substrings), the candidate join keys on
  * (segment index, partner length, substring) — shingle-posting
  * cardinality, never corpus² — and the verify join moves ids only.
  * Precondition for losslessness: every key is at least k+1 chars
  * (shorter keys can have empty segments, which the index drops); the
  * documents corpus floor is far above it.
  */
object EditDistance {

  /** Gate: pairs within edit distance 4 over the 160-char prefix
    * window, with the exact distance. */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame =
    editDistancePairsOf(
      Tables.documents(spark, dir).select("doc_id", "text"), 4, 160)

  def editDistancePairsOf(docs0: DataFrame, k: Int,
      prefixLen: Int): DataFrame = {
    val spark = docs0.sparkSession
    import spark.implicits._
    val nseg = k + 1
    // the probe fan-out below (3 nested explodes per doc) is the
    // kernel; a single-split corpus fuses it into one task (2.1 s
    // single-task on the r16 probe) — spread before the fan-out
    val docs = Similarity.spread(docs0
        .select($"doc_id", substring($"text", 1, prefixLen).as("key")))
      .withColumn("len", length($"key"))

    // index: even k+1-partition of each key by ITS OWN length —
    // segment i of a length-l scheme spans [ (i·l) div (k+1),
    // ((i+1)·l) div (k+1) ) (0-based)
    val segs = docs.select($"doc_id".as("id_b"), $"len".as("lb"),
        posexplode(expr(
          s"""transform(sequence(0, $k),
              i -> substr(key, (i * len) div $nseg + 1,
                          ((i + 1) * len) div $nseg - (i * len) div $nseg))""")))
      .toDF("id_b", "lb", "i", "seg")
      .filter(length($"seg") > 0)

    // probe: every substring of this doc that could equal segment i
    // of a partner of length lb ∈ [la−k, la+k], at a start within ±k
    // of that scheme's boundary (clamped; ascending-range guard
    // before explode — Spark's sequence turns descending otherwise)
    val probes = docs
      .select($"doc_id".as("id_a"), $"key", $"len".as("la"))
      .withColumn("lb", explode(sequence(greatest($"la" - k, lit(1)),
        least($"la" + k, lit(prefixLen)))))
      .withColumn("i", explode(sequence(lit(0), lit(k))))
      .withColumn("p", expr(s"(i * lb) div $nseg"))
      .withColumn("slen",
        expr(s"((i + 1) * lb) div $nseg - (i * lb) div $nseg"))
      .filter($"slen" > 0 &&
        $"la" - $"slen" >= greatest($"p" - k, lit(0)))
      .withColumn("start", explode(sequence(
        greatest($"p" - k, lit(0)), least($"p" + k, $"la" - $"slen"))))
      .select($"id_a", $"lb", $"i",
        expr("substr(key, start + 1, slen)").as("seg"))

    val cand = probes.join(segs, Seq("i", "lb", "seg"))
      .filter($"id_a" =!= $"id_b")
      .select(least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b"))
      .distinct()

    val keyed = docs.select($"doc_id", $"key")
    cand
      .join(keyed.select($"doc_id".as("id_a"), $"key".as("key_a")), "id_a")
      .join(keyed.select($"doc_id".as("id_b"), $"key".as("key_b")), "id_b")
      // lev_bounded (functions/LevBounded.scala): banded O(k·n) DP,
      // exact for dist ≤ k, k+1 past the bound — and the ≤ k filter
      // discards exactly the capped rows, so the output is identical
      // to the built-in O(n²) levenshtein at ~1/18th the arithmetic
      .withColumn("dist",
        call_function("lev_bounded", $"key_a", $"key_b", lit(k))
          .cast("long"))
      .filter($"dist" <= k)
      .select($"id_a", $"id_b", $"dist")
      .orderBy($"id_a", $"id_b")
  }

  /** Oracle: naive verified join. The length band restates the
    * |len(a)−len(b)| ≤ k consequence of the threshold (a pruning
    * identity, not an extra constraint).
    */
  val editDistancePairsSql: String =
    """WITH kk AS (SELECT doc_id, substr(text, 1, 160) AS key FROM documents)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
       FROM kk a JOIN kk b ON a.doc_id < b.doc_id
         AND abs(length(a.key) - length(b.key)) <= 4
       WHERE levenshtein(a.key, b.key) <= 4
       ORDER BY id_a, id_b"""
}
