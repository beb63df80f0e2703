package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** PPJoin-style prefix filter: the frequent-shingle release valve for
  * the posting self-join. Two contracts: (1) a heavy-hitter shingle
  * shared by every doc creates ZERO candidate pairs (the naive
  * posting join would create n·(n−1)/2), and (2) the filtered path is
  * lossless — identical output to the exact posting join.
  */
class PrefixFilterSpec extends SparkSpec {

  test("containment catches a wholly-quoted document that jaccard misses") {
    import spark.implicits._
    // doc 1 = a short passage; doc 2 = the same passage inside heavy
    // boilerplate padding. Every shingle of doc 1 appears in doc 2 →
    // containment = 1.0, while the union is padding-dominated →
    // jaccard far below any useful threshold. This is the quote /
    // subset-duplication case the one-sided measure exists for.
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val padding = (1 to 80).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, "en", passage),
      (2L, "en", s"$padding $passage $padding"),
      (3L, "en", "iota kappa lambda mu nu xi omicron pi")) // unrelated
      .toDF("doc_id", "lang", "text")
    val con = graft.operators.Dedup.containmentPairsOf(docs, tNum = 3, tDen = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(con.keySet == Set((1L, 2L)), s"got $con")
    assert(con((1L, 2L)) == 1.0, s"full quote must score 1.0: $con")
    // the same pair under the symmetric measure sits far below 0.5:
    // shared shingles = |doc1| (6 of them), union ≈ 170
    val jacLike = {
      val post = graft.operators.Dedup.shinglePostingsOf(docs)
        .collect().map(r => r.getLong(0) -> r.getString(3))
      val a = post.filter(_._1 == 1L).map(_._2).toSet
      val b = post.filter(_._1 == 2L).map(_._2).toSet
      (a & b).size.toDouble / (a | b).size
    }
    assert(jacLike < 0.1, s"corpus not asymmetric enough: jaccard $jacLike")
  }

  test("containment dominates jaccard: every ≥t jaccard pair is a ≥t containment pair, never scored lower") {
    // containment = common/min ≥ common/union = jaccard pointwise, so
    // the jaccard pair set at threshold t must embed in the
    // containment pair set at the same t — and the asymmetric pairs
    // containment adds are exactly the quote/subset cases
    val jac = graft.operators.Dedup.ngramJaccardPairs(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val con = graft.operators.Dedup.containmentPairs(spark, SF, tNum = 1, tDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.nonEmpty, "no jaccard pairs at this SF — vacuous")
    val missing = jac.keySet -- con.keySet
    assert(missing.isEmpty, s"jaccard pairs absent from containment: $missing")
    jac.foreach { case (pair, j) =>
      assert(con(pair) >= j - 1e-4,
        s"containment ${con(pair)} < jaccard $j for $pair")
    }
  }

  test("degenerate common shingle produces bounded candidates, not n²") {
    import spark.implicits._
    // 50 docs, each: 8 unique shingles + 1 boilerplate shared by ALL.
    // True jaccard of any pair = 1/17 < 0.5; the naive posting join
    // still enumerates all 1225 pairs through the BOILER bucket.
    val post = (1 to 50).flatMap { d =>
      val sh = (1 to 8).map(i => s"u${d}_$i") :+ "BOILER"
      sh.map(s => (d.toLong, "en", 9L, s))
    }.toDF("doc_id", "lang", "n", "shingle")
    val cands = Dedup.prefixCandidates(post, 0.5).count()
    assert(cands == 0,
      s"$cands candidates from a corpus whose only shared shingle is " +
        "the global heavy hitter — prefix filter isn't pruning it")
  }

  test("prefix filter keeps genuinely similar pairs (completeness)") {
    import spark.implicits._
    // doc 1 and 2 share 9 of 10 shingles (jaccard 9/11 ≈ 0.82), and
    // the shared shingles include the corpus-wide heavy hitter
    val common = (1 to 9).map(i => s"c_$i")
    val post = (
      common.map(s => (1L, "en", 10L, s)) ++ Seq((1L, "en", 10L, "only1")) ++
      common.map(s => (2L, "en", 10L, s)) ++ Seq((2L, "en", 10L, "only2")) ++
      (3 to 30).flatMap { d =>
        ((1 to 9).map(i => s"u${d}_$i") :+ "c_1").map(s => (d.toLong, "en", 10L, s))
      }
    ).toDF("doc_id", "lang", "n", "shingle")
    val got = Dedup.verifiedJaccardPairs(post, Dedup.prefixCandidates(post, 0.5), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.8182)), s"got $got")
  }

  test("losslessness holds at non-dyadic thresholds (fp-rounding regression)") {
    import spark.implicits._
    // thresholds whose β = t/(1+t) is not exactly representable as a
    // double (0.25 → 0.2, 0.3 → 3/13) — an fp prefix bound that
    // rounds up shortens the prefix and can drop pairs. Ground truth:
    // verify EVERY pair sharing ≥1 shingle (complete for any t > 0).
    val post = Dedup.shinglePostings(spark, SF).cache()
    val hashed = post.select($"doc_id", $"lang",
      org.apache.spark.sql.functions.xxhash64($"shingle").as("sh_h"))
    val allCand = hashed.as("x").join(hashed.as("y"),
        $"x.sh_h" === $"y.sh_h" && $"x.lang" === $"y.lang" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b")).distinct()
    for (t <- Seq(0.25, 0.3)) {
      val exact = Dedup.verifiedJaccardPairs(post, allCand, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val filtered = Dedup.verifiedJaccardPairs(post,
          Dedup.prefixCandidates(post, t), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact.nonEmpty, s"t=$t has no qualifying pairs — vacuous")
      assert(filtered == exact,
        s"t=$t: missing=${exact -- filtered} extra=${filtered -- exact}")
    }
    post.unpersist()
  }

  test("prefix-filtered path ≡ exact posting join on the test corpus") {
    val exact = Dedup.ngramJaccardPairs(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val filtered = Dedup.ngramJaccardPairsPrefix(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "no ≥0.5 pairs in testdata — spec is vacuous")
    assert(filtered == exact,
      s"missing=${exact -- filtered} extra=${filtered -- exact}")
  }
}
