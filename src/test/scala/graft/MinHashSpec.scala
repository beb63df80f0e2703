package graft

import graft.operators.{Dedup, MinHashLSH}
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {

  /** True shingle-Jaccard for all pairs sharing ≥1 shingle (posting
    * join, no lang blocking — ground truth for recall).
    */
  private lazy val truePairs: Map[(Long, Long), Double] = {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
      .select($"doc_id", Dedup.tokensCol($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", Dedup.shinglesCol($"toks", 3).as("sh"))
    val post = docs.select($"doc_id", size($"sh").as("n"),
      explode($"sh").as("shingle"))
    post.as("x").join(post.as("y"),
        $"x.shingle" === $"y.shingle" && $"x.doc_id" < $"y.doc_id")
      .groupBy($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .agg(count(lit(1)).as("c"), first($"x.n").as("na"), first($"y.n").as("nb"))
      .select($"a", $"b", ($"c".cast("double") / ($"na" + $"nb" - $"c")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private lazy val candidates: Map[(Long, Long), Double] =
    MinHashLSH.candidatePairs(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("recall: every pair with true jaccard ≥ 0.8 is a candidate") {
    val must = truePairs.filter(_._2 >= 0.8).keySet
    assert(must.nonEmpty, "testdata has no high-jaccard pairs — spec is vacuous")
    val missed = must -- candidates.keySet
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
  }

  test("estimated jaccard tracks true jaccard for near-duplicates") {
    // testdata's top pairs sit at j≈0.98-0.99 (one shingle edited)
    val dups = truePairs.filter(_._2 >= 0.95).keySet
    assert(dups.nonEmpty, "no pairs with true jaccard ≥ 0.95 — spec is vacuous")
    dups.foreach { p =>
      assert(candidates.contains(p), s"$p not a candidate")
      assert(candidates(p) >= 0.8, s"$p est=${candidates(p)} vs true ≥ 0.95")
    }
  }

  test("native kernel signatures match the explode+aggregate form") {
    import spark.implicits._
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> (1 until r.length).map(r.getLong).toVector).toMap
    val fast = asMap(MinHashLSH.signatureFrame(spark, SF))
    val agg = asMap(MinHashLSH.signatureFrameAgg(spark, SF))
    assert(fast.keySet == agg.keySet,
      s"doc sets differ: only-fast=${fast.keySet -- agg.keySet} " +
        s"only-agg=${agg.keySet -- fast.keySet}")
    fast.foreach { case (id, sig) => assert(agg(id) == sig, s"doc $id") }
  }

  test("precision guard: candidates are not the full cross product") {
    val nDocs = Tables.documents(spark, SF).count()
    assert(candidates.size < nDocs * (nDocs - 1) / 20,
      s"${candidates.size} candidates for $nDocs docs — LSH isn't pruning")
  }
}
