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
  * Shares IVF's quantizer stand-in (the first `nlist` corpus vectors
  * as centroids, folded into the plan as float literals — a trained
  * k-means drops in the same way): cell assignment is `nlist` codegen
  * cosine columns + an argmax CASE evaluated map-side during the scan,
  * zero exchanges before assignment. The only shuffles are the
  * cell-keyed self-join and the per-victim aggregation. At 100 TB you
  * raise `nlist` so cells stay bounded (SemDeDup uses k ≈ 10⁴-10⁵ for
  * exactly this reason); probe-side skew is AQE's skew-join case.
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
      nlist: Int = 16, tau: Double = 0.35): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val cents: Array[(Long, Array[Float])] = emb.filter($"vec_id" < nlist)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val withCos = emb.select($"vec_id" +: $"embedding" +: cents.map { case (cid, v) =>
      Similarity.cosineCol($"embedding", array(v.toSeq.map(lit(_)): _*)).as(s"c$cid")
    }: _*)
    val best = cents.map { case (cid, _) => col(s"c$cid") }
      .reduce((a, b) => greatest(a, b))
    val cell = cents.foldRight(lit(-1L)) { case ((cid, _), acc) =>
      when(col(s"c$cid") === best, lit(cid)).otherwise(acc)
    }
    val cells = withCos.select($"vec_id", $"embedding", cell.as("cell_id"))
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
