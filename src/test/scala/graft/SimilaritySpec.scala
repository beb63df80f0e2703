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

  test("brute force returns exactly k neighbors per query") {
    val counts = Similarity.bruteforceTopK(spark, SF, nQueries = 5, k = 5)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 5 && counts.forall(_ == 5))
  }
}
