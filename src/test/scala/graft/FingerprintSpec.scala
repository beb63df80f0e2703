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
}
