package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #30 SimHash near-duplicate detection: 64-bit token-weighted
  * fingerprint + pigeonhole-banded Hamming join.
  *
  * The fingerprint is a pure per-row column expression (two nested
  * higher-order functions — no explode, no shuffle). Pair search
  * splits the 64-bit hash into 4×16-bit chunks: Hamming distance ≤ 3
  * guarantees at least one chunk matches (pigeonhole), so the join
  * key is a chunk value and the quadratic blow-up is confined to
  * same-chunk buckets.
  */
object SimHash {

  /** shiftright/shiftleft with a Column shift amount (the Scala DSL
    * overloads only take Int; the SQL functions take expressions).
    */
  private def shr(c: Column, n: Column): Column = call_function("shiftright", c, n)
  private def shl(c: Column, n: Column): Column = call_function("shiftleft", c, n)

  /** 64-bit SimHash of a token array: bit b is set when
    * Σ_tokens (±1 by bit b of xxhash64(token)) > 0.
    *
    * Kept as the reference column form (interpreted higher-order
    * functions) for small/ad-hoc frames; [[fingerprints]] uses the
    * codegen explode+aggregate form for corpus-scale runs.
    */
  def simhashCol(tokens: Column): Column = {
    val sums = aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, sequence(lit(0), lit(63)), (a, i) =>
        a + when(shr(xxhash64(t), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(63)), (s, i) =>
        when(s > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** (doc_id, simhash) fingerprints, built codegen-first: explode
    * tokens (duplicates kept — SimHash weights by frequency), one
    * hash aggregate with 64 `sum(±1 by bit)` columns (map-side
    * partial agg, single doc_id shuffle), then fold the 64 sums into
    * the fingerprint. Matches simhashCol bit-for-bit for docs with
    * ≥1 token; token-less docs are dropped (they'd all collide at
    * fingerprint 0 and flood the pair stage with garbage).
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Dedup.tokenRows(spark, dir)
      .select($"doc_id", xxhash64($"token").as("h"))
    val aggs = (0 until 64).map { i =>
      sum(when(shiftright($"h", i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    toks.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .select($"doc_id",
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist. The 4×16-bit
    * pigeonhole banding is complete only for maxDist ≤ 3 (4 flipped
    * bits can land one per chunk and share nothing) — enforced, not
    * documented away.
    */
  def nearDuplicates(spark: SparkSession, dir: String): DataFrame =
    nearDuplicatesFrom(fingerprints(spark, dir), maxDist = 3)

  def nearDuplicatesFrom(fps: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3,
      s"4-chunk banding is only complete for maxDist <= 3, got $maxDist")
    import fps.sparkSession.implicits._
    val chunks = fps.select($"doc_id", $"simhash", posexplode(
        transform(sequence(lit(0), lit(3)), c =>
          shr($"simhash", c * 16).bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    chunks.as("x").join(chunks.as("y"),
        $"x.chunk_idx" === $"y.chunk_idx" && $"x.chunk" === $"y.chunk" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        bit_count($"x.simhash".bitwiseXOR($"y.simhash")).as("hamming"))
      .distinct()
      .filter($"hamming" <= maxDist)
      .orderBy($"doc_a", $"doc_b")
  }
}
