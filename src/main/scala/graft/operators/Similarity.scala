package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity operators over `embeddings`
  * (vec_id, embedding: array<float>, label).
  *
  * Dot products run in double via zip_with + aggregate — sequential
  * summation, matching the DuckDB oracle's semantics. No UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision — native codegen kernel
    * (graft.functions.VecDot), registered via GraftExtensions.
    */
  def dotCol(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** Fused single-pass cosine (graft.functions.VecCosine). */
  def cosineCol(a: Column, b: Column): Column =
    call_function("vec_cosine", a, b)

  /** Reference HOF formulation, kept for spec cross-validation of
    * the native kernels.
    */
  def dotColHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** #33 brute-force cosine top-k: every query vector (vec_id <
    * nQueries) against the full corpus. The query side is broadcast,
    * so the corpus is scanned exactly once with no shuffle before
    * the per-query top-k.
    */
  def bruteforceTopK(spark: SparkSession, dir: String,
      nQueries: Int = 5, k: Int = 5): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val cands = emb.select($"vec_id".as("cand_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    cands.join(broadcast(queries), $"cand_id" =!= $"query_id")
      .select($"query_id", $"cand_id",
        round(cosineCol($"q_emb", $"c_emb"), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
  }

  def bruteforceTopKSql(nQueries: Int = 5, k: Int = 5): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < $nQueries),
        scored AS (
          SELECT q.query_id, c.vec_id AS cand_id,
                 round(
                   list_reduce(list_transform(list_zip(q.q_emb, c.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
                   / (sqrt(list_reduce(list_transform(q.q_emb,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
                    * sqrt(list_reduce(list_transform(c.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))),
                 4) AS cos
          FROM embeddings c CROSS JOIN q
          WHERE c.vec_id <> q.query_id)
        SELECT query_id, cand_id, cos, rk FROM (
          SELECT query_id, cand_id, cos,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, cand_id) AS BIGINT) AS rk
          FROM scored)
        WHERE rk <= $k"""

  /** #32 blocked embedding near-dup: pairs within the same `label`
    * block above a cosine threshold. Blocking bounds the pair space;
    * at scale the block key becomes an LSH bucket (see lshTopK).
    */
  def embeddingDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding")
    val a = emb.select($"vec_id".as("vec_a"), $"label", $"embedding".as("e_a"))
    val b = emb.select($"vec_id".as("vec_b"), $"label", $"embedding".as("e_b"))
    a.join(b, Seq("label")).filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", round(cosineCol($"e_a", $"e_b"), 4).as("cos"))
      .filter($"cos" >= threshold)
  }

  def embeddingDedupSql(threshold: Double = 0.35): String =
    s"""WITH scored AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 round(
                   list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(a.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
                    * sqrt(list_reduce(list_transform(b.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))),
                 4) AS cos
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, cos FROM scored WHERE cos >= $threshold"""

  /** Label-free near-dup pairs at scale: block by shared LSH
    * signature chunk instead of a ground-truth label — the pair space
    * is Σ bucket² over 4-bit hyperplane buckets, and the exact cosine
    * filter runs only inside buckets. Recall vs the exhaustive pair
    * set is spec-gated (high-cosine pairs agree on most hyperplanes,
    * so they share chunks with high probability).
    */
  def embeddingDedupLsh(spark: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", lshSignatureCol($"embedding").as("sig"))
    val chunked = emb.select($"vec_id", $"embedding", posexplode(
        transform(sequence(lit(0), lit(3)), c =>
          call_function("shiftright", $"sig", c * 4).bitwiseAND(lit(0xfL)))))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
    // multi-probe one side: emit each chunk plus its 4 single-bit
    // flips, so pairs that disagree on one hyperplane per chunk still
    // collide somewhere (recall ~0.46 → ~0.94 at cos 0.35)
    val probed = chunked.select($"vec_id", $"embedding", $"chunk_idx",
      explode(array(
        $"chunk",
        $"chunk".bitwiseXOR(lit(1L)), $"chunk".bitwiseXOR(lit(2L)),
        $"chunk".bitwiseXOR(lit(4L)), $"chunk".bitwiseXOR(lit(8L))))
        .as("chunk"))
    probed.as("x").join(chunked.as("y"),
        $"x.chunk_idx" === $"y.chunk_idx" && $"x.chunk" === $"y.chunk" &&
          $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("vec_a"), $"y.vec_id".as("vec_b"),
        $"x.embedding".as("e_a"), $"y.embedding".as("e_b"))
      .distinct()
      .select($"vec_a", $"vec_b", round(cosineCol($"e_a", $"e_b"), 4).as("cos"))
      .filter($"cos" >= threshold)
  }

  // ── #34 random-hyperplane LSH ANN ─────────────────────────────────

  val PLANES = 16

  /** Deterministic pseudo-random hyperplanes (seeded LCG → values in
    * [-1, 1]); planes are literal arrays folded into codegen.
    */
  private lazy val planes: Array[Array[Double]] = {
    var s = 1234567L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(PLANES)(Array.fill(64)(next()))
  }

  /** 16-bit hyperplane signature of an embedding column (planes as
    * float literals — the native kernel takes array<float> on both
    * sides).
    */
  def lshSignatureCol(emb: Column): Column = {
    val sigBits = planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.toSeq.map(v => lit(v.toFloat)): _*)
      when(dotCol(emb, pl) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    sigBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via multi-probe signature buckets: the 16-bit hyperplane
    * signature is split into 4 chunks of 4 bits; a corpus vector is a
    * candidate when any chunk matches any *probe* of the query's
    * chunk — the chunk itself plus its four single-bit flips
    * (multi-probe LSH: nearby buckets hold near-misses where one
    * hyperplane voted differently). Probing expands only the
    * broadcast query side (5× rows), leaving the corpus scan and
    * bucket join shape unchanged, then exact cosine + top-k over
    * candidates. Rows-only gate; recall vs bruteforceTopK asserted
    * in SimilaritySpec.
    */
  def lshTopK(spark: SparkSession, dir: String,
      nQueries: Int = 5, k: Int = 5): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", lshSignatureCol($"embedding").as("sig"))
    val chunked = emb.select($"vec_id", $"embedding", posexplode(
        transform(sequence(lit(0), lit(3)), c =>
          call_function("shiftright", $"sig", c * 4).bitwiseAND(lit(0xfL)))))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
    val queries = chunked.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"chunk_idx", explode(array(
          $"chunk",
          $"chunk".bitwiseXOR(lit(1L)), $"chunk".bitwiseXOR(lit(2L)),
          $"chunk".bitwiseXOR(lit(4L)), $"chunk".bitwiseXOR(lit(8L))))
          .as("chunk"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    chunked.join(broadcast(queries),
        Seq("chunk_idx", "chunk"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("cand_id"), $"q_emb", $"embedding")
      .distinct()
      .select($"query_id", $"cand_id",
        round(cosineCol($"q_emb", $"embedding"), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
  }

  // ── #34b IVF (inverted-file) ANN ──────────────────────────────────

  /** IVF ANN: assign every vector to its nearest of `nlist` coarse
    * centroids (one broadcast pass — the inverted file), then answer
    * a query by searching only its `nprobe` nearest cells. The
    * centroids here are the first `nlist` corpus vectors — a
    * deterministic stand-in for an offline-trained quantizer (no
    * k-means dependency in-container); the engine shape (assignment
    * scan, cell-restricted search, nprobe recall knob) is what
    * scales: corpus shuffles once on cell_id, queries touch
    * nprobe/nlist of the data.
    */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val cents = emb.filter($"vec_id" < nlist)
      .select($"vec_id".as("cell_id"), $"embedding".as("c_emb"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy($"c_cos".desc, $"cell_id")
    val assigned = emb.join(broadcast(cents), expr("true"))
      .select($"vec_id", $"embedding", $"cell_id",
        cosineCol($"embedding", $"c_emb").as("c_cos"))
      .withColumn("ark", row_number().over(wAssign))
    val cells = assigned.filter($"ark" === 1)
      .select($"vec_id", $"embedding", $"cell_id")
    val probes = assigned.filter($"vec_id" < nQueries && $"ark" <= nprobe)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"cell_id")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    cells.join(broadcast(probes), Seq("cell_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("cand_id"),
        round(cosineCol($"q_emb", $"embedding"), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
  }
}
