package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Order-invariant content fingerprint: layout invariance, single-
  * character sensitivity, field-boundary unambiguity, and exactness
  * vs a plain-scala md5 re-derivation (the property that lets two
  * engines compare copies by exchanging one number).
  */
class FingerprintSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The gate's serialization: per-field md5 (NULL → 32 zeros),
    * concatenated, re-hashed, leading 60 bits, modular sum.
    */
  private def fp(rows: Iterable[Seq[Option[String]]]): (Long, Long) = {
    var sum = BigInt(0)
    var n = 0L
    rows.foreach { fields =>
      val ser = fields.map(_.map(md5hex).getOrElse("0" * 32)).mkString
      sum += BigInt(java.lang.Long.parseLong(md5hex(ser).substring(0, 15), 16))
      n += 1
    }
    (n, (sum % BigInt(2305843009213693951L)).toLong)
  }

  private def corpusRows(): Array[Seq[Option[String]]] =
    Tables.documents(spark, SF)
      .selectExpr("CAST(doc_id AS STRING)", "text", "lang", "source",
        "CAST(n_chars AS STRING)")
      .collect().map(r => (0 until 5).map(i => Option(r.getString(i))))

  test("gate equals the scala per-field md5 modular sum, and survives any layout") {
    val got = Analytics.tableFingerprint(spark, SF).head()
    val (n, digest) = fp(corpusRows())
    assert(got.getLong(0) == n && got.getLong(1) == digest,
      s"got (${got.getLong(0)}, ${got.getLong(1)}) want ($n, $digest)")
    // layout invariance: scrambled order + different partitioning
    // give the identical digest (commutative modular sum)
    val scrambled = Tables.documents(spark, SF)
      .orderBy(hash(col("doc_id"))).repartition(7)
      .select(expr(
        """CAST(conv(substr(md5(concat(
             md5(CAST(doc_id AS STRING)),
             coalesce(md5(text), lpad('', 32, '0')),
             coalesce(md5(lang), lpad('', 32, '0')),
             coalesce(md5(source), lpad('', 32, '0')),
             md5(CAST(n_chars AS STRING)))),
           1, 15), 16, 10) AS BIGINT)""").as("h"))
      .agg(expr("""CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951
                   AS BIGINT)""")).head.getLong(0)
    assert(scrambled == digest, "fingerprint must be layout-invariant")
  }

  test("a single flipped character, a dropped row, and a field-boundary shift all move the digest") {
    val rows = corpusRows()
    val (_, clean) = fp(rows)
    // corrupt one char in the middle of one row's text
    val i = rows.length / 2
    val t = rows(i)(1).get
    val corrupted = rows.updated(i, rows(i).updated(1,
      Some(t.updated(t.length / 2, if (t(t.length / 2) == 'x') 'y' else 'x'))))
    assert(fp(corrupted)._2 != clean, "corruption must move the digest")
    // dropping a row changes it too (n_rows would also catch this,
    // but the digest alone must not be fooled)
    assert(fp(rows.patch(i, Nil, 1))._2 != clean)
    // the delimiter-injection class a '|'-joined serialization gets
    // wrong with probability 1: shifting content across a field
    // boundary must change the digest
    val shifted = fp(Seq(Seq(Some("7"), Some("a|b"), Some("c"),
      Some("s"), Some("3"))))
    val shifted2 = fp(Seq(Seq(Some("7"), Some("a"), Some("b|c"),
      Some("s"), Some("3"))))
    assert(shifted != shifted2, "field-boundary shift must not collide")
    // NULL vs empty string are distinct values, not a skipped field
    assert(fp(Seq(Seq(Some("7"), None, Some("c"), Some("s"), Some("3")))) !=
      fp(Seq(Seq(Some("7"), Some(""), Some("c"), Some("s"), Some("3")))))
  }

  test("winnowing: shared >= w+k-1 substrings guarantee a shared fingerprint; ≡ in-memory replay") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val (k, w) = (8, 4)
    // in-memory reference of the exact same selection
    def refFps(text: String): Set[Long] = {
      val t = text.toLowerCase.trim
      val hs = (0 to t.length - k).map { i =>
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(t.substring(i, i + k).getBytes("UTF-8"))
            .take(6).map("%02x".format(_)).mkString, 16)
      }
      (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
    }
    val shared = "the quick brown fox jumps over it"  // >= 11 chars shared
    val a = s"AAAA $shared BBBB"
    val b = s"CCCCCC $shared DDD"
    val c = "completely different content here with zero overlap at all"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = TextAnalysis.winnowingOf(df, k, w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // gate stats match the reference selection exactly
    Seq((1L, a), (2L, b), (3L, c)).foreach { case (id, text) =>
      val fps = refFps(text)
      val (nGrams, nFps, fpMin, fpSum) = got(id)
      assert(nGrams == text.trim.length - k + 1, s"doc $id n_grams")
      assert(nFps == fps.size, s"doc $id n_fps")
      assert(fpMin == fps.min && fpSum == fps.sum, s"doc $id fp agg")
    }
    // the guarantee: a and b share the long substring → share a fp
    assert(refFps(a).intersect(refFps(b)).nonEmpty,
      "shared substring must yield a shared fingerprint")
    assert(refFps(a).intersect(refFps(c)).isEmpty,
      "disjoint content shares nothing at this scale")
    // density: roughly 2/(w+1) of grams get selected (loose bounds)
    val (ng, nf, _, _) = got(1L)
    assert(nf.toDouble / ng > 0.15 && nf.toDouble / ng < 0.9,
      s"selection density $nf/$ng out of range")
  }

  test("LOCF: gaps carry the last observed value with correct staleness; observed hours carry themselves") {
    import spark.implicits._
    val gate = graft.operators.Events.locfHours(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gate.nonEmpty)
    // re-derive the observation map
    val obs = Tables.events(spark, SF)
      .filter($"event_type" === "purchase")
      .select(expr("unix_timestamp(ts) div 3600").as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy($"h").agg(sum($"vc").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    gate.foreach { case (h, n, carried, age) =>
      if (n > 0L) {
        assert(age == 0L, s"hour $h observed but age $age")
        assert(carried == obs(h), s"hour $h carries itself")
      } else {
        assert(age > 0L && !obs.contains(h), s"hour $h gap flags")
        assert(carried == obs(h - age), s"hour $h carries h-${age}")
        // nothing observed in between
        assert((h - age + 1 to h).forall(x => !obs.contains(x)))
      }
    }
  }

  test("percentile_cont: exact x100 interpolation equals an in-memory sorted computation") {
    import spark.implicits._
    val gate = graft.operators.Olap.percentileContByLang(spark, SF)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val byLang = Tables.documents(spark, SF)
      .select($"lang", $"n_chars".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    byLang.foreach { case (lang, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.length
      Seq(50L, 90L).foreach { p =>
        val pos100 = p * (n - 1)
        val idx = (pos100 / 100L).toInt; val frac = pos100 % 100L
        val hi = math.min(idx + 1, n - 1)
        val want = xs(idx) * (100L - frac) + xs(hi) * frac
        val (gn, gx100) = gate((lang, p))
        assert(gn == n.toLong, s"$lang n")
        assert(gx100 == want, s"$lang p$p: $gx100 vs $want")
      }
    }
  }
}
