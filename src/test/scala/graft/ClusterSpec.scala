package graft

import graft.operators.Dedup

class ClusterSpec extends SparkSpec {

  test("min-label propagation finds exact connected components") {
    import spark.implicits._
    // two components {1,2,3,4} (path) and {10,11}, plus chain order
    // that forces >1 propagation round
    val pairs = Seq((3L, 4L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("cluster ids are the component minimum on real pairs") {
    import spark.implicits._
    val labels = Dedup.ngramJaccardClusters(spark, SF)
    val pairs = Dedup.ngramJaccardPairs(spark, SF)
    // every edge's two endpoints share a cluster
    val l1 = labels.select($"doc_id".as("doc_a"), $"cluster_id".as("ca"))
    val l2 = labels.select($"doc_id".as("doc_b"), $"cluster_id".as("cb"))
    val broken = pairs.join(l1, "doc_a").join(l2, "doc_b")
      .filter($"ca" =!= $"cb").count()
    assert(broken == 0)
    // each cluster's id is a member of the cluster
    val badId = labels.groupBy($"cluster_id")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("mn"))
      .filter($"cluster_id" =!= $"mn").count()
    assert(badId == 0)
  }

  test("IVF top-k recall ≥ 0.6 at nprobe=4/16 over 20 queries (measured 0.85)") {
    val brute = operators.Similarity.bruteforceTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = operators.Similarity.ivfTopK(spark, SF, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, f"recall=$recall%.2f")
  }
}
