package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * embedding space coarsely, then remove documents whose embedding is
  * near-identical to a lower-id document IN THE SAME CLUSTER. The
  * clustering bounds the pair space to Σ |cell|² — the same inverted-
  * file trick the ANN family uses — so the quadratic step never sees
  * the corpus, only cells.
  *
  * Shares IVF's quantizer plumbing (Similarity.firstCentroids /
  * cellCol — a trained Similarity.kmeansCentroids drops in via the
  * `centroids` parameter): cell assignment is ONE native
  * nearest_cells kernel call (graft.functions.NearestCells) evaluated
  * map-side during the scan, zero exchanges before assignment, and
  * the plan stays O(1)-sized as nlist grows. The only shuffles are
  * the cell-keyed self-join and the per-victim aggregation. At 100 TB
  * you raise `nlist` so cells stay bounded (SemDeDup uses k ≈ 10⁴-10⁵
  * for exactly this reason — which is why assignment must NOT be an
  * O(nlist·dim)-literal expression tree); probe-side skew is AQE's
  * skew-join case.
  *
  * Exactness: assignment ties break (cos DESC, cell_id ASC) in both
  * engines; cosines are the shared sequential-fold kernel, so the
  * DuckDB oracle re-derives assignment, pairs, and aggregates
  * value-for-value.
  */
object SemDedup {

  /** Documents to drop: vec_b such that some same-cell vec_a < vec_b
    * has cosine ≥ tau. Emits the victim, its canonical keeper (the
    * smallest such vec_a), the cell, and the dup evidence.
    */
  def semanticDedup(spark: SparkSession, dir: String,
      nlist: Int = 16, tau: Double = 0.35,
      centroids: Option[Array[(Long, Array[Float])]] = None): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val cents = centroids.getOrElse(Similarity.firstCentroids(spark, dir, nlist))
    val cells = emb.select($"vec_id", $"embedding",
      Similarity.cellCol($"embedding", cents).as("cell_id"))
    val a = cells.select($"cell_id", $"vec_id".as("vec_a"), $"embedding".as("e_a"))
    val b = cells.select($"cell_id", $"vec_id".as("vec_b"), $"embedding".as("e_b"))
    a.join(b, Seq("cell_id")).filter($"vec_a" < $"vec_b")
      .select($"cell_id", $"vec_a", $"vec_b",
        round(Similarity.cosineCol($"e_a", $"e_b"), 4).as("cos"))
      .filter($"cos" >= tau)
      .groupBy($"vec_b".as("drop_id"), $"cell_id")
      .agg(min($"vec_a").as("keep_id"), count(lit(1)).as("n_dups"),
        max($"cos").as("max_cos"))
      .select($"drop_id", $"keep_id", $"cell_id", $"n_dups", $"max_cos")
  }

  def semanticDedupSql(nlist: Int = 16, tau: Double = 0.35): String =
    s"""WITH cents AS (
          SELECT vec_id AS cell_id, embedding AS c_emb
          FROM embeddings WHERE vec_id < $nlist),
        assigned AS (
          SELECT vec_id, cell_id FROM (
            SELECT e.vec_id, c.cell_id,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${Similarity.cosineSql("e.embedding", "c.c_emb")} DESC,
                              c.cell_id) AS ark
            FROM embeddings e CROSS JOIN cents c)
          WHERE ark = 1),
        pairs AS (
          SELECT a.cell_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
                 round(${Similarity.cosineSql("ae.embedding", "be.embedding")}, 4)
                   AS cos
          FROM assigned a
          JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
          JOIN embeddings ae ON ae.vec_id = a.vec_id
          JOIN embeddings be ON be.vec_id = b.vec_id)
        SELECT vec_b AS drop_id, CAST(min(vec_a) AS BIGINT) AS keep_id,
               cell_id, CAST(count(*) AS BIGINT) AS n_dups,
               max(cos) AS max_cos
        FROM pairs WHERE cos >= $tau
        GROUP BY vec_b, cell_id"""
}
