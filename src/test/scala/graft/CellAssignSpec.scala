package graft

import graft.operators.{SemDedup, Similarity}
import org.apache.spark.sql.functions._

/** The nearest_cells coarse-assignment kernel
  * (graft.functions.NearestCells): exactness against a driver-side
  * reference running the identical fp ops, the (cos DESC, id ASC)
  * tie-break contract, and — the round-7 point — that nlist ≥ 1024
  * no longer blows up the plan the way the literal-column argmax did
  * (O(nlist·dim) literals + an O(nlist) CASE chain vs one reference
  * object).
  */
class CellAssignSpec extends SparkSpec {

  private val DIM = 64

  /** Same fused-fold cosine as VecCosine/CellAssign (double
    * promotion, ascending accumulation, sqrt(na)*sqrt(nb) denom,
    * zero denom -> 0.0).
    */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Driver-side (cos DESC, id ASC) top-n — the oracle's
    * row_number() ordering.
    */
  private def refNearest(v: Array[Float], cents: Array[(Long, Array[Float])],
      n: Int): Seq[Long] =
    cents.map { case (cid, c) => (cid, cos(v, c)) }
      .sortBy { case (cid, cs) => (-cs, cid) }.take(n).map(_._1).toSeq

  private def randVec(rng: scala.util.Random): Array[Float] =
    Array.fill(DIM)(rng.nextFloat() * 2f - 1f)

  test("kernel assignment equals the driver-side reference exactly (64 cells × 300 vectors)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val cents = Array.tabulate(64)(i => (i.toLong, randVec(rng)))
    val vecs = Array.tabulate(300)(i => (i.toLong, randVec(rng)))
    val got = vecs.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.cellCol($"embedding", cents).as("cell_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refNearest(v, cents, 1).head, s"vec $id misassigned")
    }
  }

  test("a SQL call with wrong argument types fails at analysis with a clear message, not at eval") {
    import org.apache.spark.sql.AnalysisException
    // the registry may wrap the builder's AnalysisException — what
    // matters is (a) it surfaces at sql()/analysis, never as an eval-
    // time ClassCastException, and (b) the message names the fix
    def analysisError(sql: String): String = {
      val e = intercept[Exception] { spark.sql(sql) }
      val isAnalysis = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(5)
        .exists(_.isInstanceOf[AnalysisException])
      assert(isAnalysis, s"expected an AnalysisException chain, got $e")
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(5)
        .map(_.getMessage).mkString(" | ")
    }
    // double centroids (the type a bare SQL array literal produces)
    assert(analysisError(
      """SELECT nearest_cells(array(CAST(1.0 AS FLOAT)),
                              array(array(1.0D)), array(0L), 1)""")
      .contains("array<array<float>>"))
    assert(analysisError(
      """SELECT nearest_cells(array(CAST(1.0 AS FLOAT)),
                              array(array(CAST(1.0 AS FLOAT))), array(0), 1)""")
      .contains("array<bigint>"))
  }

  test("probe lists equal the driver-side (cos DESC, id ASC) top-n, n past nlist clamps") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val cents = Array.tabulate(16)(i => (i.toLong, randVec(rng)))
    val vecs = Array.tabulate(50)(i => (i.toLong, randVec(rng)))
    val got = vecs.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id",
        Similarity.probeCellsCol($"embedding", cents, 4).as("p4"),
        Similarity.probeCellsCol($"embedding", cents, 99).as("pAll"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    vecs.foreach { case (id, v) =>
      val (p4, pAll) = got(id)
      assert(p4 == refNearest(v, cents, 4), s"vec $id probe-4 mismatch")
      assert(pAll == refNearest(v, cents, 16), s"vec $id full ranking mismatch")
    }
  }

  test("ties break to the lowest cell id; zero vectors land in the first cell") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val shared = randVec(rng)
    // cells 2 and 5 are the same direction (scaled) — cosine ties exactly
    val cents = Array.tabulate(8) { i =>
      (i.toLong, if (i == 2 || i == 5) shared.map(_ * (i - 1)) else randVec(rng))
    }
    val rows = Seq(
      (100L, shared),                  // ties between 2 and 5 -> 2
      (101L, Array.fill(DIM)(0.0f)))   // all cosines 0.0 -> first id
    val got = rows.toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.cellCol($"embedding", cents).as("cell_id"),
        Similarity.probeCellsCol($"embedding", cents, 8).as("ranking"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toList
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(100L)._2 == 2L, s"tie did not break to lowest id: ${byId(100L)}")
    // in the full ranking the tied pair stays adjacent, id order
    val rk = byId(100L)._3
    assert(rk.indexOf(2L) + 1 == rk.indexOf(5L), s"tied cells not adjacent: $rk")
    assert(byId(101L)._2 == 0L, s"zero vector not in first cell: ${byId(101L)}")
  }

  test("nlist=1024: assignment plan stays O(1)-sized and whole-stage codegen (the 100 TB posture)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val cents = Array.tabulate(1024)(i => (i.toLong, randVec(rng)))
    // vectors constructed ON a centroid direction (positive scale
    // preserves cosine) — ground truth is the construction
    val vecs = Array.tabulate(4096) { i =>
      val c = cents(i % 1024)._2
      (i.toLong, c.map(_ * (1.0f + (i / 1024) * 0.5f)))
    }
    // RDD-backed, not a local Seq — a LocalTableScan would be
    // constant-folded away and leave no plan to audit
    val df = spark.sparkContext.parallelize(vecs.toSeq, 4).toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.cellCol($"embedding", cents).as("cell_id"))
    val plan = df.queryExecution.executedPlan.toString
    // the literal-argmax formulation produced an O(nlist·dim)-literal
    // tree (~10⁶ chars at this size, with codegen falling back to
    // interpreted); one kernel call keeps the plan constant-sized
    assert(plan.length < 20000, s"plan blew up: ${plan.length} chars")
    assert(plan.contains("*(1"), s"assignment fell out of whole-stage codegen:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.indices.foreach { i =>
      assert(got(i.toLong) == (i % 1024).toLong, s"vec $i misassigned to ${got(i.toLong)}")
    }
  }

  test("nlist=16384 (the SemDeDup-paper scale): plan still O(1), assignment still exact") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val cents = Array.tabulate(16384)(i => (i.toLong, randVec(rng)))
    val vecs = Array.tabulate(256) { i =>
      val c = cents(i * 61 % 16384)._2
      (i.toLong, c.map(_ * 2.0f)) // power-of-2 scale: cosine exactly 1.0
    }
    val df = spark.sparkContext.parallelize(vecs.toSeq, 4).toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.cellCol($"embedding", cents).as("cell_id"))
    assert(df.queryExecution.executedPlan.toString.length < 20000,
      "plan grew with nlist — the kernel contract is broken")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.indices.foreach { i =>
      assert(got(i.toLong) == (i * 61 % 16384).toLong, s"vec $i misassigned")
    }
  }

  test("semanticDedup runs end-to-end at nlist=1024 over a 4096-vector corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val cents = Array.tabulate(1024)(i => (i.toLong, randVec(rng)))
    // 4 co-directional vectors per cell -> every cell pairs internally
    val vecs = Array.tabulate(4096) { i =>
      val c = cents(i % 1024)._2
      (i.toLong, c.map(_ * (1.0f + (i / 1024) * 0.25f)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cellassign").toString
    vecs.toSeq.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SemDedup.semanticDedup(spark, dir, nlist = 1024, tau = 0.9,
      centroids = Some(cents))
    // scaled copies have cosine exactly 1.0: every vec_id >= 1024 is a
    // victim of its cell's base vector
    val drops = out.select($"drop_id", $"keep_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drops.size == 3072, s"expected 3072 victims, got ${drops.size}")
    assert((1024 until 4096).forall(i => drops(i.toLong) == (i % 1024).toLong),
      "victims must keep their cell's lowest-id base vector")
  }
}
