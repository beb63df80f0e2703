package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosineCol on known vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f), 1.0),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "want")
    df.select(Similarity.cosineCol($"a", $"b").as("got"), $"want")
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      }
  }

  test("multi-probe LSH top-k recall ≥ 0.8 over 20 queries (measured 0.94)") {
    val brute = Similarity.bruteforceTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, f"recall=$recall%.2f (${(brute & lsh).size}/${brute.size})")
  }

  test("LSH-blocked near-dup recall ≥ 0.7 vs exhaustive pairs at cos ≥ 0.35") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, SF)
    val a = emb.select($"vec_id".as("va"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("vb"), $"embedding".as("eb"))
    val exact = a.crossJoin(b).filter($"va" < $"vb")
      .select($"va", $"vb", Similarity.cosineCol($"ea", $"eb").as("cos"))
      .filter($"cos" >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no high-cosine pairs in testdata — spec is vacuous")
    val lsh = Similarity.embeddingDedupLsh(spark, SF, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.7, f"recall=$recall%.2f (${(exact & lsh).size}/${exact.size})")
  }

  test("PQ ADC+re-rank top-k recall ≥ 0.6 over 20 queries (measured 0.77)") {
    val brute = Similarity.bruteforceTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the gate config: codes-only ADC builds a shortlist of 50, exact
    // cosine re-ranks it — pure ADC@5 on these near-random synthetic
    // vectors is ~0.2, the re-rank recovers what the 4-bit codes blur
    val pq = Similarity.pqTopK(spark, SF, nQueries = 20, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.6, f"recall=$recall%.2f (${(brute & pq).size}/${brute.size})")
  }

  test("IVF×PQ top-k recall over 20 queries (cells bound, codes price, re-rank refines)") {
    val brute = Similarity.bruteforceTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    // bounded by the IVF cell restriction (~0.85 alone) times PQ
    // shortlist loss; the floor pins both stages stay functional
    assert(recall >= 0.5, f"recall=$recall%.2f (${(brute & ivfpq).size}/${brute.size})")
  }

  test("PQ codebook trainer yields valid books that beat the stand-in on quantization error") {
    import spark.implicits._
    val m = 8; val sub = 8
    val standIn = Similarity.pqBooks(spark, SF, m, 16)
    val trained = Similarity.pqTrainBooks(spark, SF, m = m)
    assert(trained.length == m && trained.forall(b => b.length == 16 &&
      b.forall(_.length == sub)))
    // mean quantization error over the corpus: trained ≤ stand-in
    val vecs = Tables.embeddings(spark, SF).select($"embedding")
      .as[Array[Float]].collect().map { v =>
        val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        v.map(_.toDouble / n)
      }
    def mse(books: Array[Array[Array[Double]]]): Double = vecs.map { v =>
      (0 until m).map { mi =>
        books(mi).map { c =>
          (0 until sub).map { i => val d = v(mi * sub + i) - c(i); d * d }.sum
        }.min
      }.sum
    }.sum / vecs.length
    assert(mse(trained) <= mse(standIn),
      s"trained books quantize worse than the stand-in: ${mse(trained)} vs ${mse(standIn)}")
  }

  test("trained k-means quantizer: balanced cells, recall not below the stand-in") {
    import spark.implicits._
    val trained = Similarity.kmeansCentroids(spark, SF, k = 16)
    assert(trained.length == 16 && trained.map(_._1).toSeq == (0L until 16L),
      "k-means must emit k ascending cell ids")
    // cell balance via Σ cell² — the pair-cost functional SemDedup's
    // cell self-join actually pays. The stand-in (first-16 vectors)
    // leaves assignment to the data order; trained centroids must
    // spread the corpus at least as evenly (5% tolerance: the test
    // vectors are near-random, so both quantizers sit close to
    // uniform and single-vector jitter is noise, not signal)
    def sumSq(cents: Array[(Long, Array[Float])]): Long =
      Tables.embeddings(spark, SF)
        .select(Similarity.cellCol($"embedding", cents).as("cell_id"))
        .groupBy($"cell_id").count()
        .agg(sum($"count" * $"count")).head().getLong(0)
    val standIn = Similarity.firstCentroids(spark, SF, 16)
    val (sqTrained, sqStandIn) = (sumSq(trained), sumSq(standIn))
    assert(sqTrained <= (sqStandIn * 1.05).toLong,
      s"trained quantizer pair cost worse: Σcell² $sqTrained vs $sqStandIn")
    // the k-means objective itself — mean cosine to the assigned
    // centroid — must beat the stand-in (this is the deterministic
    // win; per-query recall at a fixed tiny nprobe is boundary noise
    // on near-random test vectors)
    import org.apache.spark.sql.Column
    def meanBestCos(cents: Array[(Long, Array[Float])]): Double = {
      val best: Column = cents.map { case (_, c) =>
        Similarity.cosineCol($"embedding", typedLit(c.toSeq))
      }.reduce((a, b) => greatest(a, b))
      Tables.embeddings(spark, SF).select(avg(best)).head().getDouble(0)
    }
    assert(meanBestCos(trained) > meanBestCos(standIn),
      s"trained quantizer fits worse: ${meanBestCos(trained)} vs ${meanBestCos(standIn)}")
    // recall vs brute force stays functional (within noise of the
    // stand-in, and above the family floor)
    val brute = Similarity.bruteforceTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(c: Option[Array[(Long, Array[Float])]]): Double = {
      val got = Similarity.ivfTopK(spark, SF, nQueries = 20, centroids = c)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val (rTrained, rStandIn) = (recall(Some(trained)), recall(None))
    assert(rTrained >= rStandIn - 0.1,
      f"trained recall $rTrained%.2f < stand-in $rStandIn%.2f - 0.1")
    assert(rTrained >= 0.5, f"trained recall $rTrained%.2f below floor")
  }

  test("trained quantizer at nlist=1024: covers more cells and cuts pair cost vs the stand-in") {
    import spark.implicits._
    // the 100 TB-posture nlist needs more distinct directions than
    // the test corpus holds, so build a clustered synthetic corpus:
    // 1200 unit prototypes × 3 jittered members, ids cluster-major —
    // exactly the shape where a first-n stand-in goes wrong (its
    // 1024 centroids cover only the first ~342 clusters, and the
    // remaining clusters' members pile onto whichever covered cell
    // is nearest) while k-means spreads its centroids over clusters
    val rng = new scala.util.Random(1234)
    val dim = 64
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)).toFloat
      if (n == 0f) v else v.map(_ / n)
    }
    val protos = Array.fill(1200)(unit(Array.fill(dim)(rng.nextFloat() * 2f - 1f)))
    val vecs = for {
      (p, ci) <- protos.zipWithIndex.toSeq
      m <- 0 until 3
    } yield ((ci * 3 + m).toLong,
      unit(p.map(x => x + (rng.nextFloat() - 0.5f) * 0.02f)))
    val emb = spark.createDataFrame(
        spark.sparkContext.parallelize(vecs, 8))
      .toDF("vec_id", "embedding")
    val k = 1024
    val trained = Similarity.kmeansCentroidsOf(emb, k, sampleMax = vecs.size, iters = 5)
    assert(trained.length == k)
    val standIn = vecs.take(k).map { case (id, v) => (id, v) }.toArray
    def bal(cents: Array[(Long, Array[Float])]): (Long, Long) = {
      val r = emb.select(Similarity.cellCol($"embedding", cents).as("cell_id"))
        .groupBy($"cell_id").count()
        .agg(countDistinct($"cell_id"), sum($"count" * $"count")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (cuTrained, sqTrained) = bal(trained)
    val (cuStandIn, sqStandIn) = bal(standIn)
    // the stand-in reaches all k cells for free (every centroid IS a
    // member vector), and Lloyd may strand a few cells empty — so
    // coverage is asserted as a floor, and the judged axis is the
    // pair-cost functional Σ cell², where training must win outright
    assert(cuTrained >= (k * 95L) / 100,
      s"trained quantizer collapsed cells: $cuTrained of $k used (stand-in $cuStandIn)")
    assert(sqTrained < sqStandIn,
      s"trained pair cost not below stand-in: Σcell² $sqTrained vs $sqStandIn")
  }

  test("brute force returns exactly k neighbors per query") {
    val counts = Similarity.bruteforceTopK(spark, SF, nQueries = 5, k = 5)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 5 && counts.forall(_ == 5))
  }

  test("filtered kNN ≡ per-label brute force; no result leaks outside the query's label") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, SF)
      .select($"vec_id", $"label", $"embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = graft.operators.Similarity.filteredTopK(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byId = emb.map(e => e._1 -> e).toMap
    // scoping: every result shares its query's label
    got.foreach { case (q, c, lab) =>
      assert(byId(q)._2 == lab && byId(c)._2 == lab, s"leak at ($q, $c)") }
    // equivalence: per query, the top-5 of the SAME-label candidates
    got.groupBy(_._1).foreach { case (q, rows) =>
      val (qid, qlab, qv) = byId(q)
      val want = emb.filter(e => e._2 == qlab && e._1 != qid)
        .map(e => (e._1, cos(qv, e._3)))
        .sortBy { case (id, c) =>
          (-math.floor(c * 1e4 + 0.5) / 1e4, id) }
        .take(5).map(_._1).toSeq
      assert(rows.sortBy(_._2).map(_._2).toSeq.sorted == want.sorted,
        s"query $q: got ${rows.map(_._2).toSeq} want $want")
    }
  }

  test("dbscan: crafted core/border/noise roles, min-label clusters, border takes smallest core neighbor label") {
    import spark.implicits._
    val points = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L).toDF("vec_id")
    // triangle 1-2-3 (all core at minPts=2); 4 hangs off 1 (border);
    // 5-6 a lone pair (deg 1 each -> noise); 7 isolated (noise);
    // 8 linked to 9 and 10 (core), 9/10 deg-1 borders of cluster 8
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L),
      (5L, 6L), (8L, 9L), (8L, 10L)).toDF("i", "j")
    val got = Similarity.dbscanOf(points, pairs, minPts = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (4L, "border", 1L), (5L, "noise", -1L), (6L, "noise", -1L),
      (7L, "noise", -1L), (8L, "core", 8L),
      (9L, "border", 8L), (10L, "border", 8L)), s"got $got")
  }

  test("dbscan: a border point between two clusters takes the SMALLER cluster label; pair budget refusal names the LSH valve") {
    import spark.implicits._
    val points = (1L to 9L).toDF("vec_id")
    // two K4 cliques {1,2,3,4} and {5,6,7,8} (every member core at
    // minPts=3); 9 hangs off cores 1 AND 5 with deg 2 < 3 — a border
    // point reachable from BOTH clusters -> takes min(cluster) = 1
    def k4(a: Long, b: Long, c: Long, d: Long) =
      Seq((a, b), (a, c), (a, d), (b, c), (b, d), (c, d))
    val pairs = (k4(1L, 2L, 3L, 4L) ++ k4(5L, 6L, 7L, 8L) ++
      Seq((1L, 9L), (5L, 9L))).toDF("i", "j")
    val m = Similarity.dbscanOf(points, pairs, minPts = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(9L) == ("border", 1L), s"got ${m(9L)}")
    assert(m(5L) == ("core", 5L) && m(8L) == ("core", 5L))
    assert(m(4L) == ("core", 1L))
    val err = intercept[IllegalArgumentException] {
      Similarity.dbscan(spark, SF, pairBudget = 1L).collect()
    }
    assert(err.getMessage.contains("embeddingDedupLsh"))
  }

  test("dbscan-lsh: LSH-blocked pairs are a subset of exact ε-pairs (precision 1), pair recall and role agreement floored vs exact clustering") {
    import spark.implicits._
    val exactPairs = Similarity.dbscanPairs(
      graft.Tables.embeddings(spark, SF).select($"vec_id", $"embedding"),
      simMin = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Similarity.embeddingDedupLsh(spark, SF, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1 by construction: every admitted pair passed the
    // exact rounded-cosine test
    assert((lshPairs -- exactPairs).isEmpty,
      s"false pairs: ${(lshPairs -- exactPairs).take(3)}")
    val recall = (exactPairs & lshPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.5, f"pair recall=$recall%.2f")
    // role agreement: the recall-traded clustering must agree with
    // the exact one on most points (noise can only grow)
    val exact = Similarity.dbscan(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val lsh = Similarity.dbscanLsh(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agree = exact.count { case (v, role) => lsh(v) == role }
    assert(agree.toDouble / exact.size >= 0.7,
      s"role agreement ${agree}/${exact.size}")
  }

  test("silhouette: two exact orthogonal clusters score 1.0; cluster set matches dbscan's non-noise labels") {
    import spark.implicits._
    val a = Array(1.0f, 0.0f)
    val b = Array(0.0f, 1.0f)
    val emb = Seq((1L, a, 0), (2L, a, 0), (3L, a, 0),
      (4L, b, 1), (5L, b, 1), (6L, b, 1))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("sil").toString
    emb.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.dbscanSilhouette(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    // identical members, orthogonal canonicals: a = 0, b = 1, s = 1
    assert(got == Seq((1L, 3L, 1.0), (4L, 3L, 1.0)), s"got $got")
    val clusters = Similarity.dbscan(spark, tmp)
      .filter($"cluster" =!= -1L).select("cluster").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == clusters)
  }
}
