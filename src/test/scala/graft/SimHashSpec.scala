package graft

import graft.operators.{Dedup, SimHash}
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {

  test("identical texts fingerprint identically; disjoint texts differ") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely unrelated words about spark shuffles")
    ).toDF("doc_id", "text")
    val fps = df.select($"doc_id",
        SimHash.simhashCol(Dedup.tokensCol($"text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("native kernel matches the reference column form") {
    import spark.implicits._
    val ref = Tables.documents(spark, SF)
      .select($"doc_id", SimHash.simhashCol(Dedup.tokensCol($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = SimHash.fingerprints(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.nonEmpty)
    fast.foreach { case (id, s) =>
      assert(ref(id) == s, s"doc $id: ref=${ref(id)} fast=$s")
    }
  }

  test("native kernel matches the explode+aggregate form, same doc set") {
    val agg = SimHash.fingerprintsAgg(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = SimHash.fingerprints(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.keySet == agg.keySet,
      s"doc sets differ: only-fast=${fast.keySet -- agg.keySet} " +
        s"only-agg=${agg.keySet -- fast.keySet}")
    fast.foreach { case (id, s) => assert(agg(id) == s, s"doc $id") }
  }

  test("pigeonhole banding finds all hamming ≤ 3 pairs (vs brute force)") {
    import spark.implicits._
    val fps = SimHash.fingerprints(spark, SF).cache()
    val brute = fps.as("x").join(fps.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"),
        bit_count($"x.simhash".bitwiseXOR($"y.simhash")).as("d"))
      .filter($"d" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SimHash.nearDuplicatesFrom(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "no near-dup pairs in testdata — spec is vacuous")
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} missed=${brute -- banded}")
    fps.unpersist()
  }
}
