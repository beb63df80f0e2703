package graft

import graft.sources.PgWire
import java.sql.Timestamp
import scala.sys.process._

/** The Postgres-wire round trip the Derby JdbcSinkSpec could not
  * give: the environment has Postgres server binaries but no pgjdbc
  * jar (and no egress to fetch one), so [[PgWire]] speaks the v3
  * simple-query protocol directly and this spec drives a REAL
  * `postgres` process — initdb'd fresh, trust auth, unix-socketless
  * TCP on a scratch port, torn down after. If the binaries are
  * absent the spec cancels with the environmental waiver on record.
  */
class PgWireSpec extends SparkSpec {

  private val Port = 54472
  private def su(cmd: String): Int =
    Seq("su", "nobody", "-s", "/bin/sh", "-c", s"cd /tmp && $cmd").!

  test("Spark → Postgres wire → read-back round trip, multi-partition, quotes/nulls/timestamps intact") {
    import spark.implicits._
    val initdb = new java.io.File("/usr/local/bin/initdb")
    assume(initdb.exists, "postgres not installed in this environment")
    val root = java.nio.file.Files.createTempDirectory("pgwire").toFile
    assume(Seq("chown", "-R", "nobody", root.toString).! == 0,
      "cannot hand the data dir to a non-root user (postgres refuses root)")
    val data = s"$root/data"
    assume(su(s"/usr/local/bin/initdb -D $data -A trust -U graft >/dev/null") == 0,
      "initdb failed")
    assert(su(s"/usr/local/bin/pg_ctl -D $data -o '-k $root -p $Port " +
      s"-c listen_addresses=127.0.0.1' -l $root/log start") == 0,
      "pg_ctl start failed")
    try {
      val rows = Seq(
        (1L, "plain", Some(1.5), Some(Timestamp.valueOf("2024-01-01 00:05:00")), true),
        (2L, "O'Brien — quote", Some(0.1), None, false),
        (3L, "two\nlines\tand a tab", None,
          Some(Timestamp.valueOf("2024-06-30 23:59:59")), true),
        (4L, "ünïcodé 日本語", Some(1.0e10), Some(Timestamp.valueOf("1999-12-31 00:00:00")), false),
        (5L, "", Some(-0.0), None, true))
      val df = rows.toDF("id", "label", "score", "seen_at", "flag")
        .selectExpr("id", "label", "CAST(score AS DOUBLE) AS score",
          "seen_at", "flag")
        .repartition(3) // the write is per-partition sockets — prove >1
      val conn = new PgWire.Conn("127.0.0.1", Port, "postgres", "graft")
      try {
        PgWire.createTable(conn, "roundtrip", df)
        PgWire.writeTable(df, "127.0.0.1", Port, "postgres", "graft",
          "roundtrip", batchRows = 2)
        // (a) server-side aggregate agrees with Spark's
        val (_, agg, _) = conn.query(
          "SELECT count(*), sum(id), count(score) FROM roundtrip")
        assert(agg.head.map(_.get) == Seq("5", "15", "4"), agg.toString)
        // (b) full typed read-back equals the source rows
        val (cols, got, _) = conn.query(
          """SELECT id, label, score, seen_at, flag FROM roundtrip ORDER BY id""")
        assert(cols == Seq("id", "label", "score", "seen_at", "flag"))
        val parsed = got.map { r =>
          (r(0).get.toLong, r(1).get, r(2).map(_.toDouble),
            r(3).map(Timestamp.valueOf), r(4).get == "t")
        }
        val want = rows.map { case (i, s, d, t, b) =>
          (i, s, d.map(x => if (x == 0.0) 0.0 else x), t, b) } // pg folds -0.0
        val gotN = parsed.map { case (i, s, d, t, b) =>
          (i, s, d.map(x => if (x == 0.0) 0.0 else x), t, b) }
        assert(gotN == want, s"got=$gotN want=$want")
        // (c) at-least-once posture is KEYED-target idempotent — a
        // second append really does append (to_sql 'append' semantics)
        PgWire.writeTable(df, "127.0.0.1", Port, "postgres", "graft",
          "roundtrip")
        val (_, n2, _) = conn.query("SELECT count(*) FROM roundtrip")
        assert(n2.head.head.get == "10")
        // (d) errors surface as errors, not silence
        val ex = intercept[java.io.IOException] {
          conn.query("SELECT no_such_column FROM roundtrip")
        }
        assert(ex.getMessage.contains("postgres error"), ex.getMessage)
        // and the connection SURVIVES the error (ReadyForQuery resync)
        assert(conn.query("SELECT 41 + 1")._2.head.head.get == "42")
      } finally conn.close()
      // injection hygiene: the quoting device renders a hostile label
      // inert (it lands as DATA — the table it names survives)
      val evil = Seq((9L, "x'); DROP TABLE roundtrip; --")).toDF("id", "label")
      val c2 = new PgWire.Conn("127.0.0.1", Port, "postgres", "graft")
      try {
        PgWire.createTable(c2, "evil", evil)
        PgWire.writeTable(evil, "127.0.0.1", Port, "postgres", "graft", "evil")
        assert(c2.query("SELECT label FROM evil")._2.head.head.get
          == "x'); DROP TABLE roundtrip; --")
        assert(c2.query("SELECT count(*) FROM roundtrip")._2.head.head.get
          == "10", "injection reached the other table")
      } finally c2.close()
      // (f) COPY fast path, binary lane: one COPY per partition, read
      // back equal to the INSERT path's table cell for cell
      val c3 = new PgWire.Conn("127.0.0.1", Port, "postgres", "graft")
      try {
        PgWire.createTable(c3, "copybin", df)
        PgWire.writeTableCopy(df, "127.0.0.1", Port, "postgres", "graft",
          "copybin")
        val (_, viaInsert, _) = c3.query(
          "SELECT DISTINCT id, label, score, seen_at, flag FROM roundtrip " +
            "ORDER BY id") // roundtrip holds the df twice (step c)
        val (_, viaCopy, _) = c3.query(
          "SELECT id, label, score, seen_at, flag FROM copybin ORDER BY id")
        // pg's float8 DISTINCT/display folds -0 and 0 arbitrarily —
        // normalize the sign of zero like step (b) does
        def z(rows: Seq[Seq[Option[String]]]) =
          rows.map(_.map(_.map(c => if (c == "-0") "0" else c)))
        assert(z(viaCopy) == z(viaInsert), s"copy=$viaCopy insert=$viaInsert")
        // (g) text fallback lane: a numeric column routes the COPY to
        // text format, where the escaping burden is real — prove a
        // label made of every COPY-special character survives
        val hostile = Seq(
          (1L, "tab\there", BigDecimal("12345.67890")),
          (2L, "line\nbreak \\N backslash\\", BigDecimal("-0.00001")),
          (3L, null.asInstanceOf[String], BigDecimal("99999999.99999"))
        ).toDF("id", "label", "amount")
          .selectExpr("id", "label", "CAST(amount AS DECIMAL(13,5)) AS amount")
        PgWire.createTable(c3, "copytxt", hostile)
        PgWire.writeTableCopy(hostile, "127.0.0.1", Port, "postgres",
          "graft", "copytxt")
        val (_, ht, _) = c3.query(
          "SELECT id, label, amount FROM copytxt ORDER BY id")
        assert(ht.map(_(1)) == Seq(Some("tab\there"),
          Some("line\nbreak \\N backslash\\"), None), ht.toString)
        assert(ht.map(_(2).get) ==
          Seq("12345.67890", "-0.00001", "99999999.99999"), ht.toString)
        // (h) a mid-copy server rejection surfaces as the server's
        // error at CopyDone, not silence (domain violation: null into
        // a NOT NULL column)
        c3.exec("CREATE TABLE strict_t (id bigint NOT NULL, label text)")
        val withNull = Seq((1L, "ok"), (2L, "alsoOk")).toDF("id", "label")
          .selectExpr("CAST(NULL AS BIGINT) AS id", "label")
        val exc = intercept[org.apache.spark.SparkException] {
          PgWire.writeTableCopy(withNull, "127.0.0.1", Port, "postgres",
            "graft", "strict_t")
        }
        assert(exc.getMessage.contains("postgres error") ||
          Option(exc.getCause).exists(_.getMessage.contains("postgres error")),
          s"wanted the server's NOT NULL error, got: ${exc.getMessage}")
        // the rejected COPY left nothing behind (COPY is atomic)
        assert(c3.query("SELECT count(*) FROM strict_t")._2.head.head.get == "0")
        // (i) the at-least-once contract, exercised (r15 verdict
        // item 8). Leg 1 — task attempt DIES mid-COPY: frames
        // streamed, connection closed before CopyDone. COPY is
        // transactional per connection, so the dead attempt commits
        // NOTHING and the Spark task retry lands the partition
        // exactly once — for the COPY lane, duplicates cannot come
        // from failures, only from duplicate SUCCESS.
        val rt = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
          .toDF("id", "label")
        PgWire.createTable(c3, "retry_t", rt)
        val dying = new PgWire.Conn("127.0.0.1", Port, "postgres", "graft")
        dying.copyIn("COPY retry_t (\"id\", \"label\") FROM STDIN")
        val partial = "1\talpha\n2\tbeta\n".getBytes("UTF-8")
        dying.copyData(partial, partial.length)
        dying.close() // no CopyDone — the attempt is dead
        assert(c3.query("SELECT count(*) FROM retry_t")._2.head.head.get
          == "0", "a mid-copy death must commit nothing")
        PgWire.writeTableCopy(rt.repartition(1), "127.0.0.1", Port,
          "postgres", "graft", "retry_t") // the retry
        assert(c3.query("SELECT id, label FROM retry_t ORDER BY id")._2
          .map(r => (r(0).get, r(1).get))
          == Seq(("1", "alpha"), ("2", "beta"), ("3", "gamma")))
        // Leg 2 — duplicate SUCCESS (a speculative twin copies the
        // same partition again): rows double, and the keyed dedup
        // read named by the contract (PgWire.writeTableCopy doc)
        // recovers exactness deterministically.
        PgWire.writeTableCopy(rt.repartition(1), "127.0.0.1", Port,
          "postgres", "graft", "retry_t")
        assert(c3.query("SELECT count(*) FROM retry_t")._2.head.head.get
          == "6")
        assert(c3.query(
          "SELECT DISTINCT id, label FROM retry_t ORDER BY id")._2
          .map(r => (r(0).get, r(1).get))
          == Seq(("1", "alpha"), ("2", "beta"), ("3", "gamma")),
          "keyed dedup read must recover the exact partition")
      } finally c3.close()
    } finally {
      su(s"/usr/local/bin/pg_ctl -D $data -m immediate stop")
      ()
    }
  }
}
