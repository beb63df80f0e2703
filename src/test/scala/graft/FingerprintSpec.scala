package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Order-invariant content fingerprint: layout invariance, single-
  * character sensitivity, and exactness vs a plain-scala md5
  * re-derivation (the property that lets two engines compare copies
  * by exchanging one number).
  */
class FingerprintSpec extends SparkSpec {

  private def fp(rows: Iterable[String]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var sum = BigInt(0)
    var n = 0L
    rows.foreach { s =>
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      sum += BigInt(java.lang.Long.parseLong(hex, 16))
      n += 1
    }
    (n, (sum % BigInt(2305843009213693951L)).toLong)
  }

  test("gate equals the scala md5 modular sum, and survives any layout") {
    import spark.implicits._
    val got = Analytics.tableFingerprint(spark, SF).head()
    val rows = Tables.documents(spark, SF)
      .selectExpr("concat_ws('|', doc_id, text, lang, source, n_chars)")
      .collect().map(_.getString(0))
    val (n, digest) = fp(rows)
    assert(got.getLong(0) == n && got.getLong(1) == digest,
      s"got (${got.getLong(0)}, ${got.getLong(1)}) want ($n, $digest)")
    // layout invariance: scrambled order + different partitioning
    // give the identical digest (commutative modular sum)
    val scrambled = Tables.documents(spark, SF)
      .orderBy(hash($"doc_id")).repartition(7)
      .select(expr(
        """CAST(conv(substr(md5(
             concat_ws('|', doc_id, text, lang, source, n_chars)),
           1, 15), 16, 10) AS BIGINT)""").as("h"))
      .agg(expr("""CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951
                   AS BIGINT)""")).head.getLong(0)
    assert(scrambled == digest, "fingerprint must be layout-invariant")
  }

  test("a single flipped character anywhere changes the digest") {
    val rows = Tables.documents(spark, SF)
      .selectExpr("concat_ws('|', doc_id, text, lang, source, n_chars)")
      .collect().map(_.getString(0))
    val (_, clean) = fp(rows)
    // corrupt one char in the middle of one row
    val i = rows.length / 2
    val r = rows(i)
    val corrupted = rows.updated(i,
      r.updated(r.length / 2, if (r(r.length / 2) == 'x') 'y' else 'x'))
    assert(fp(corrupted)._2 != clean, "corruption must move the digest")
    // dropping a row changes it too (n_rows would also catch this,
    // but the digest alone must not be fooled)
    assert(fp(rows.patch(i, Nil, 1))._2 != clean)
  }
}
