package graft

import graft.functions.JaroWinkler
import graft.operators.EntityResolution
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler kernel: literature vectors, the oracle
  * engine's boundary semantics (empties → 0, boost only above 0.7,
  * ⌊mismatches/2⌋ transpositions), codegen residency, and the
  * blocked entity-resolution gate's invariants.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("literature vectors and oracle-probed boundary values") {
    val eps = 1e-12
    // classic textbook pairs (values probed against the DuckDB oracle)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < eps)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < eps)
    // zero common prefix → pure jaro survives
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < eps)
    // boost threshold: jaro = 0.6 ≤ 0.7 keeps NO winkler boost even
    // with a 4-char common prefix
    assert(math.abs(jw("abcdxxxxxx", "abcdyyyyyy") - 0.6) < eps)
    // odd mismatch count between matched subsequences → t = ⌊3/2⌋ = 1
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < eps)
    // even mismatches, zero prefix
    assert(math.abs(jw("aabbcc", "bbaacc") - 0.8888888888888888) < eps)
    // empties are 0 in BOTH engines (not 1), equal strings are 1
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("a", "a") == 1.0 && jw("same", "same") == 1.0)
    // disjoint alphabets → m = 0 → 0
    assert(jw("aaaa", "bbbb") == 0.0)
  }

  test("symmetry and range over random near-neighbor pairs") {
    val rnd = new scala.util.Random(0x3A20L)
    val alpha = "abcdef "
    def s(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val a = s(1 + rnd.nextInt(24))
      val b = if (rnd.nextBoolean()) s(1 + rnd.nextInt(24))
        else {
          val idx = rnd.nextInt(a.length)
          a.patch(idx, s(rnd.nextInt(3)), math.min(2, a.length - idx))
        }
      val f = jw(a, b); val r = jw(b, a)
      assert(f == r, s"asymmetric: '$a' vs '$b' → $f / $r")
      assert(f >= 0.0 && f <= 1.0, s"out of range: '$a' vs '$b' → $f")
      assert(jw(a, a) == 1.0)
    }
  }

  test("matches the DuckDB oracle on every gate pair (round-trip through the SQL function) and stays in codegen") {
    import spark.implicits._
    // the gate itself re-verifies jw against the oracle at the driver;
    // here: the registered SQL function ≡ the static kernel, inside
    // whole-stage codegen
    val df = Tables.part(spark, SF)
      .select($"p_name", reverse($"p_name").as("q"))
      .select($"p_name", $"q",
        call_function("jaro_winkler", $"p_name", $"q").as("sim"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("jarowinkler") && l.trim.startsWith("*(")),
      s"jaro_winkler fell out of codegen:\n$plan")
    // null propagation through the expression
    val n = spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x') IS NULL")
      .head.getBoolean(0)
    assert(n, "null input must yield null")
  }

  test("gate invariants: ordered pairs, threshold honored, blocking key shared, weights positive") {
    val rows = EntityResolution.jaroNamePairs(spark, SF).collect()
    assert(rows.nonEmpty, "sf0.001 part names must yield near-dup pairs")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"unordered pair ($a, $b)")
      assert(a.split(" ").head == b.split(" ").head,
        s"blocking violated: ($a, $b)")
      assert(r.getDouble(2) >= 0.85 && r.getDouble(2) <= 1.0)
      assert(jw(a, b) >= 0.85, s"threshold must apply to the UNROUNDED score ($a, $b)")
      assert(r.getLong(3) >= 1L)
    }
    // no self-pairs / exact dups leak in (strict < on distinct names)
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
  }

  test("blocking-quality metrics reconcile with a brute-force ground truth") {
    import spark.implicits._
    val names = Tables.part(spark, SF).select($"p_name").distinct()
      .collect().map(_.getString(0)).sorted
    // the truth reuses the operator's own kernel (ONE batched job —
    // the spec must not re-implement the metric)
    val pairSeq = for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield (names(i), names(j))
    val jwMap = pairSeq.toDF("x", "y")
      .select($"x", $"y", org.apache.spark.sql.functions.call_function(
        "jaro_winkler", $"x", $"y").as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    var all = 0L; var cand = 0L; var hits = 0L; var found = 0L
    pairSeq.foreach { case (a, b) =>
      all += 1
      val blocked = a.split(" ").head == b.split(" ").head
      if (blocked) cand += 1
      if (jwMap((a, b)) >= 0.85) { hits += 1; if (blocked) found += 1 }
    }
    val r = graft.operators.EntityResolution.blockingQuality(spark, SF).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((all, cand, hits, found)), s"got $r want ($all,$cand,$hits,$found)")
    assert(r.getLong(4) == (all - cand) * 1000000L / all)
    assert(r.getLong(5) ==
      (if (hits == 0) 1000000L else found * 1000000L / hits))
    // the scheme must actually reduce work; recall should be high on
    // this corpus (first tokens carry the JW prefix weight)
    assert(r.getLong(4) > 500000L, s"reduction too weak: ${r.getLong(4)}")
  }

  test("sorted-neighborhood candidates equal a driver-side sliding window over the sorted vocabulary") {
    import spark.implicits._
    import graft.operators.EntityResolution
    val got = EntityResolution.sortedNeighborhood(spark, SF)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val vocab = Tables.part(spark, SF).select($"p_name").distinct()
      .collect().map(_.getString(0)).sorted
    val exp = (for {
      i <- vocab.indices; d <- 1 to 3 if i + d < vocab.length
      j = jw(vocab(i), vocab(i + d)) if j >= 0.80
    } yield (vocab(i), vocab(i + d), d.toLong,
        math.rint(j * 10000) / 10000)).toSet
    assert(got == exp,
      s"diff: ${(got diff exp).take(3)} / ${(exp diff got).take(3)}")
  }

  test("soundex column matches the published reference codes, incl. the H/W rule") {
    import spark.implicits._
    import graft.operators.EntityResolution
    // the canonical National-Archives examples + phonetic collisions
    val cases = Seq(
      "robert" -> "R163", "rupert" -> "R163",     // collision pair
      "ashcraft" -> "A261", "ashcroft" -> "A261", // s,c merge across h
      "tymczak" -> "T522",                        // z,c adjacent merge
      "pfister" -> "P236",                        // first-letter run drop
      "honeyman" -> "H555",                       // leading h
      "smith" -> "S530", "smyth" -> "S530",       // collision pair
      "washington" -> "W252",                     // leading w
      "lee" -> "L000", "a" -> "A000",             // short names pad
      "jackson" -> "J250", "gutierrez" -> "G362")
    val got = cases.map(_._1).toDF("tok")
      .select($"tok", EntityResolution.soundexCol($"tok").as("sdx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (tok, want) =>
      assert(got(tok) == want, s"soundex($tok) = ${got(tok)}, want $want")
    }
    // block census: every token lands in exactly one block, masses re-add
    val census = EntityResolution.soundexBlocks(spark, SF).collect()
    val vocab = Tables.part(spark, SF)
      .select(substring_index($"p_name", " ", 1)).distinct().count()
    assert(census.map(_.getLong(1)).sum == vocab)
    assert(census.map(_.getLong(2)).sum == Tables.part(spark, SF).count())
  }

  test("entity resolution: transitive near-name matches merge into one entity with the min-key canonical") {
    import spark.implicits._
    import graft.operators.EntityResolution
    val parts = Seq(
      (11L, "blue widgett", "B1", "PROMO", 5),
      (12L, "blue widgettt", "B1", "PROMO", 7),
      (13L, "blue widgetttt", "B1", "PROMO", 9),
      // same block, name too far -> stays out
      (14L, "blue bolt", "B1", "PROMO", 5),
      // different brand -> different block under the fine key
      (15L, "blue widgett", "B2", "PROMO", 5))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    val tmp = java.nio.file.Files.createTempDirectory("er_res").toString
    parts.write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = EntityResolution.resolveEntities(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 11~12 and 12~13 chain into one entity even if 11~13 alone were
    // borderline — the transitive-closure contract
    assert(got.length == 1, s"got ${got.toSeq}")
    assert(got.head == ((11L, 3L, 3L, "blue widgett")), s"got ${got.head}")
  }
}
