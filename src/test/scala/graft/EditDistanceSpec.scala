package graft

import graft.operators.EditDistance

/** PassJoin edit-distance dedup: blocking losslessness against a
  * brute-force re-derivation, plan sanity (no cartesian anywhere).
  */
class EditDistanceSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  // base strings plus edited variants: substitutions, an insertion
  // run, a deletion run, and combined shifts — including pairs at
  // exactly k (must appear) and k+1 (must not). Insertions EARLY in
  // the string shift every later segment, the case naive equal-chunk
  // blocking misses.
  private val corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while seven wizards brew strong black tea"
    Seq(
      1L -> base,
      2L -> base, // exact dup (dist 0)
      3L -> base.replace("quick", "quack"), // 1 substitution
      4L -> ("xx" + base), // 2 early insertions, shifts everything
      5L -> base.drop(3), // 3-char deletion at the front
      6L -> base.replace("seven", "eleven").replace("dog", "cat"), // scattered edits
      7L -> base.replace("quick brown", "slow greenish"), // beyond k
      8L -> "completely unrelated text about parquet files and shuffles in a distributed engine",
      9L -> ("xx" + base.replace("tea", "ale")), // insertions + late subs
      10L -> base.reverse // same chars, far distance
    )
  }

  test("PassJoin candidates are lossless: output equals brute force, distances exact") {
    val k = 4
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(corpus, 3)).toDF("doc_id", "text")
    val got = EditDistance.editDistancePairsOf(df, k, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      (ia, sa) <- corpus; (ib, sb) <- corpus if ia < ib
      d = lev(sa.take(200), sb.take(200)) if d <= k
    } yield (ia, ib, d.toLong)).toSet
    assert(got == expected,
      s"spark-only=${got -- expected} brute-only=${expected -- got}")
    // the fixture must actually exercise the hard cases
    assert(expected.exists(_._3 == 0) && expected.exists(_._3 == k),
      s"fixture lost its boundary pairs: $expected")
    assert(expected.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) },
      "early-insertion pair (segment shift) missing from fixture")
  }

  test("no cartesian product anywhere in the gate plan") {
    val plan = EditDistance.editDistancePairs(spark, SF)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"edit-distance dedup must never go all-pairs:\n$plan")
  }

  test("property: blocking is lossless under random edit scripts (200 seeded trials)") {
    import spark.implicits._
    // random base strings + random ≤6-edit scripts (insert/delete/
    // substitute at random positions): every pair the brute-force
    // O(n²) scan finds at k=4 must survive the PassJoin blocking.
    // Deterministic seed — a failure is reproducible, not flaky.
    val rnd = new scala.util.Random(0xED17D157L)
    val alpha = "abcdef " // small alphabet → near-boundary distances likely
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits) {
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.patch(p, "", 1) // delete
          case 1 => cur.patch(p, alpha(rnd.nextInt(alpha.length)).toString, 0)
          case _ if cur.nonEmpty =>
            cur.patch(p, alpha(rnd.nextInt(alpha.length)).toString, 1)
          case _ => cur
        }
      }
      cur
    }
    val corpus: Seq[(Long, String)] = (0 until 40).flatMap { g =>
      val base = randStr(20 + rnd.nextInt(40))
      Seq((g * 5L) -> base) ++ (1 to 4).map(j =>
        (g * 5L + j) -> mutate(base, 1 + rnd.nextInt(6)))
    }
    val k = 4
    val got = EditDistance.editDistancePairsOf(
        spark.createDataFrame(
          spark.sparkContext.parallelize(corpus, 8)).toDF("doc_id", "text"),
        k, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      (ia, sa) <- corpus; (ib, sb) <- corpus if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet
    assert(expected.size > 100,
      s"fixture too easy: only ${expected.size} true pairs")
    assert(got == expected,
      s"spark-only=${got -- expected}\nbrute-only=${expected -- got}")
  }

  test("gate finds the corpus's planted pairs with nonzero distances at sf0.001") {
    val rows = EditDistance.editDistancePairs(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no pairs found")
    assert(rows.exists(_._3 > 0), "only exact-prefix pairs found — " +
      "threshold no longer exercises real edits")
    rows.foreach { case (a, b, d) =>
      assert(a < b && d >= 0 && d <= 4, s"malformed row ($a,$b,$d)") }
  }
}
