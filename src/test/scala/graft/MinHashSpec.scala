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

  test("lsh band plan: recall monotone in bands, chosen = fewest bands above the floor, one arm re-derived exactly") {
    import graft.operators.{Dedup, MinHashLSH}
    val got = MinHashLSH.lshBandPlan(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.map(_._1) == Seq(64L, 32L, 16L, 8L, 4L))
    assert(got.forall { case (b, r, _, _, _) => b * r == 64L })
    // p = 1-(1-s^r)^b is pointwise increasing in b at fixed b·r, so
    // the expected recall must be too
    val recalls = got.map(_._4)
    assert(recalls == recalls.sorted.reverse, s"not monotone: $recalls")
    assert(recalls.forall(x => x >= 0L && x <= 1000000L))
    // chosen = fewest bands clearing the 900000 floor
    val clearing = got.filter(_._4 >= 900000L)
    val expectChosen =
      if (clearing.nonEmpty) clearing.minBy(_._1)._1 else got.maxBy(_._4)._1
    assert(got.filter(_._5 == 1L).map(_._1) == Seq(expectChosen))
    // re-derive the (16, 4) arm with the same repeated-multiply chain
    val js = Dedup.ngramJaccardPairs(spark, SF)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(js.nonEmpty)
    val ps = js.map { s =>
      var s4 = 1.0; (1 to 4).foreach(_ => s4 *= s)
      var q = 1.0; (1 to 16).foreach(_ => q *= (1.0 - s4))
      math.round((1.0 - q) * 1e6)
    }
    val want = ps.sum / ps.length
    val arm16 = got.find(_._1 == 16L).get
    assert(arm16._3 == js.length.toLong && arm16._4 == want,
      s"arm (16,4): got ${(arm16._3, arm16._4)} want (${js.length}, $want)")
  }
}
