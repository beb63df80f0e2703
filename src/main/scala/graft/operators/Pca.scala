package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #35f PCA moment accumulation — the distributed half of principal
  * component analysis (Pearson 1901; the standard covariance-
  * eigendecomposition route): ONE pass over the embedding corpus
  * accumulates n, the component sums, and the upper-triangle second-
  * moment sums Σ qᵢqⱼ; the eigensolve over the resulting d×d
  * covariance is a METADATA-scale problem (64×64 here) that runs
  * driver-side wherever the moments land. This is how PCA deploys at
  * 100 TB: the corpus is touched once, O(d²) scalars travel, and
  * nothing corpus-sized ever sorts, shuffles, or collects — the same
  * Gram-moment shape as Evaluation.mlLinregNormal, generalized from
  * a 3×3 to the full feature square.
  *
  * Exactness device: components are quantized ONCE to integer
  * milli-units (round(x·10³) — documented resolution of the operator,
  * not an approximation of it: downstream eigensolve consumes the
  * quantized corpus's exact covariance), so every moment is an exact
  * BIGINT sum on any merge order. Per-row products are ≤ ~10⁶·|x|²,
  * leaving ~10¹² rows of headroom; past that the decimal(38,0) valve
  * applies.
  *
  * Plan shape: the per-row triangle expansion (d·(d+1)/2 structs from
  * a codegen `transform`) feeds a hash aggregate IN THE SAME STAGE —
  * the exploded stream never crosses the network; the exchange
  * carries ≤ 2 145 partial cells per task. The means/count arms reuse
  * the same device one level simpler.
  */
object Pca {

  def pcaMoments(spark: SparkSession, dir: String): DataFrame =
    pcaMomentsOf(Tables.embeddings(spark, dir).select(col("embedding")))

  /** Core over any single-column (embedding: array<float|double>)
    * frame; output rows (i, j, s):
    *   - (-1, -1, n)            row count
    *   - (i, -1, Σ qᵢ)          component sums, i in 0..d−1
    *   - (i, j, Σ qᵢqⱼ), i ≤ j  upper-triangle second moments
    */
  def pcaMomentsOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // the 2,145-cell moment fan-out is the kernel; a single-split
    // input fuses it into one task (measured 2.5 s single-task on the
    // r16 probe) — spread restores map-side parallelism
    val q = Similarity.spread(emb).select(expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
      .as("q"))
    val second = q
      .select(explode(expr(
        """flatten(transform(q, (xi, i) ->
             transform(slice(q, i + 1, size(q)), (xj, k) ->
               struct(i AS i, i + k AS j, xi * xj AS p))))""")).as("e"))
      .groupBy($"e.i".as("i"), $"e.j".as("j"))
      .agg(sum($"e.p").as("s"))
    val first = q
      .select(posexplode($"q"))
      .groupBy($"pos".cast("long").as("i"))
      .agg(lit(-1L).as("j"), sum($"col").as("s"))
    val n = q.agg(count(lit(1)).as("s"))
      .select(lit(-1L).as("i"), lit(-1L).as("j"), $"s")
    n.unionByName(first.select($"i", $"j", $"s"))
      .unionByName(second)
      .orderBy($"i", $"j")
  }

  val pcaMomentsSql: String =
    """WITH q AS (
         SELECT list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         FROM embeddings),
       second AS (
         SELECT CAST(i.range AS BIGINT) AS i, CAST(j.range AS BIGINT) AS j,
                CAST(sum(q[i.range + 1] * q[j.range + 1]) AS BIGINT) AS s
         FROM q, range(0, 64) i, range(0, 64) j
         WHERE i.range <= j.range
         GROUP BY 1, 2),
       first AS (
         SELECT CAST(i.range AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j,
                CAST(sum(q[i.range + 1]) AS BIGINT) AS s
         FROM q, range(0, 64) i
         GROUP BY 1, 2),
       n AS (
         SELECT CAST(-1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j,
                CAST(count(*) AS BIGINT) AS s
         FROM q)
       SELECT i, j, s FROM n
       UNION ALL SELECT i, j, s FROM first
       UNION ALL SELECT i, j, s FROM second
       ORDER BY i, j"""

  /** Per-label embedding-centroid drift: pairwise cosine between
    * label centroids — the cheap first-order answer to "do these two
    * sources/slices live in the same embedding region?" before
    * reaching for MMD. Exactness: component sums accumulate over the
    * SAME milli-quantized integers as [[pcaMomentsOf]] (exact BIGINT
    * per (label, dim) — one partial-agg'd shuffle of |labels|·d
    * cells), and the cosine of the SUM vectors (≡ cosine of the mean
    * vectors — the 1/n scalars cancel) is one pinned double
    * expression over those exact integers, rounded at the edge.
    * Pairwise stage is |labels|²·d on metadata.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sums = Tables.embeddings(spark, dir)
      .select($"label", posexplode(expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")))
      .groupBy($"label", $"pos").agg(sum($"col").as("s"))
    val a = sums.select($"label".as("la"), $"pos", $"s".as("sa"))
    val b = sums.select($"label".as("lb"), $"pos", $"s".as("sb"))
    a.join(b, Seq("pos")).filter($"la" < $"lb")
      .groupBy($"la", $"lb")
      .agg(sum($"sa".cast("decimal(38,0)") * $"sb").as("dot"),
        sum($"sa".cast("decimal(38,0)") * $"sa").as("na"),
        sum($"sb".cast("decimal(38,0)") * $"sb").as("nb"))
      .select($"la", $"lb",
        round($"dot".cast("double") /
          (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))), 6)
          .as("centroid_cos"))
      .orderBy($"la", $"lb")
  }

  val embeddingDriftSql: String =
    """WITH q AS (
         SELECT label,
                list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         FROM embeddings),
       sums AS (
         SELECT label, CAST(i.range AS BIGINT) AS pos,
                CAST(sum(q[i.range + 1]) AS BIGINT) AS s
         FROM q, range(0, 64) i
         GROUP BY 1, 2),
       pairs AS (
         SELECT a.label AS la, b.label AS lb,
                CAST(sum(CAST(a.s AS HUGEINT) * b.s) AS DECIMAL(38,0)) AS dot,
                CAST(sum(CAST(a.s AS HUGEINT) * a.s) AS DECIMAL(38,0)) AS na,
                CAST(sum(CAST(b.s AS HUGEINT) * b.s) AS DECIMAL(38,0)) AS nb
         FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
         GROUP BY 1, 2)
       SELECT la, lb,
              round(CAST(dot AS DOUBLE)
                    / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))),
                    6) AS centroid_cos
       FROM pairs ORDER BY la, lb"""

  /** Driver-side eigensolve over the moment rows — cyclic Jacobi on
    * the exact covariance C = S/n − μμᵀ of the QUANTIZED corpus
    * (deterministic: fixed sweep order, fixed iteration count to
    * convergence threshold). Returns eigenvalues descending. Used by
    * the spec and by callers who want the components; the gate ships
    * the moments because an eigensolve has no cross-engine exact
    * form.
    */
  def eigenvaluesFromMoments(rows: Seq[(Long, Long, Long)]): Array[Double] = {
    val n = rows.find(r => r._1 == -1L && r._2 == -1L).get._3.toDouble
    val d = (rows.map(_._1).max + 1).toInt
    val mean = new Array[Double](d)
    rows.filter(r => r._1 >= 0 && r._2 == -1L).foreach { case (i, _, s) =>
      mean(i.toInt) = s.toDouble / n
    }
    val c = Array.ofDim[Double](d, d)
    rows.filter(r => r._2 >= 0).foreach { case (i, j, s) =>
      val v = s.toDouble / n - mean(i.toInt) * mean(j.toInt)
      c(i.toInt)(j.toInt) = v
      c(j.toInt)(i.toInt) = v
    }
    // cyclic Jacobi sweeps until off-diagonal mass is negligible
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; r <- (p + 1) until d) s += c(p)(r) * c(p)(r)
      s
    }
    while (off() > 1e-18 && sweep < 60) {
      for (p <- 0 until d; r <- (p + 1) until d if math.abs(c(p)(r)) > 1e-15) {
        val theta = 0.5 * math.atan2(2.0 * c(p)(r), c(r)(r) - c(p)(p))
        val (co, si) = (math.cos(theta), math.sin(theta))
        for (k <- 0 until d) {
          val (akp, akr) = (c(k)(p), c(k)(r))
          c(k)(p) = co * akp - si * akr
          c(k)(r) = si * akp + co * akr
        }
        for (k <- 0 until d) {
          val (apk, ark) = (c(p)(k), c(r)(k))
          c(p)(k) = co * apk - si * ark
          c(r)(k) = si * apk + co * ark
        }
      }
      sweep += 1
    }
    (0 until d).map(i => c(i)(i)).sortBy(-_).toArray
  }
}
