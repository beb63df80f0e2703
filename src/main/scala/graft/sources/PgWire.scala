package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Minimal PostgreSQL v3 wire-protocol client + Spark sink/source —
  * the driver-jar-free way to hit a REAL Postgres wire target (the
  * reference's `to_sql` lands in exactly such a table,
  * reference task.py:143). The environment ships Postgres server
  * binaries but no pgjdbc jar and has no egress, so the protocol
  * subset is spoken directly: startup (trust auth), simple-query
  * ('Q'), RowDescription/DataRow/CommandComplete/ErrorResponse/
  * ReadyForQuery. Text format only — every exchanged value is the
  * SQL-literal text Postgres itself prints, which is also what makes
  * the round trip assertable.
  *
  * Scale posture: [[writeTable]] opens ONE socket PER PARTITION
  * inside `foreachPartition` (executor-side, like any JDBC sink) and
  * streams multi-row INSERT batches — rows never collect to the
  * driver, memory is bounded by `batchRows`, and a 1000-executor
  * write is 1000 sockets, which is the same fan-in any JDBC sink
  * imposes (pool in front of the DB at that scale). [[queryAll]] is
  * a driver-side single-socket reader for verification-scale result
  * sets (the spec's read-back); a production-scale reader would
  * range-partition the predicate per task — same shape as
  * spark.read.jdbc's partitionColumn — and is out of scope here.
  * No retries: a failed partition rethrows and Spark's task retry
  * re-runs it, so the sink is at-least-once (idempotent only under
  * a keyed target — documented, matching to_sql 'append').
  */
object PgWire {

  /** One wire connection, simple-query protocol only. Not thread-safe. */
  final class Conn(host: String, port: Int, db: String, user: String)
      extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(sock.getInputStream)
    private val out = new DataOutputStream(sock.getOutputStream)
    startup()

    private def startup(): Unit = {
      val body = new java.io.ByteArrayOutputStream()
      val w = new DataOutputStream(body)
      w.writeInt(196608) // protocol 3.0
      def z(s: String): Unit = { w.write(s.getBytes(UTF_8)); w.write(0) }
      z("user"); z(user); z("database"); z(db); w.write(0)
      out.writeInt(4 + body.size())
      body.writeTo(out)
      out.flush()
      // trust auth: AuthenticationOk then parameter chatter until ReadyForQuery
      var ready = false
      while (!ready) {
        val (tag, payload) = readMessage()
        tag match {
          case 'R' =>
            val code = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
              ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
            require(code == 0,
              s"PgWire supports trust auth only (got auth code $code) — " +
                "start the target with -A trust")
          case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / Notice
          case 'E' => throw new java.io.IOException(errorText(payload))
          case 'Z' => ready = true
          case t => throw new java.io.IOException(s"unexpected startup tag '$t'")
        }
      }
    }

    private def readMessage(): (Char, Array[Byte]) = {
      val tag = in.readByte().toChar
      val len = in.readInt() - 4
      val payload = new Array[Byte](len)
      in.readFully(payload)
      (tag, payload)
    }

    private def errorText(payload: Array[Byte]): String = {
      // error fields: repeated (type byte, cstring), 0-terminated list
      val fields = scala.collection.mutable.Map.empty[Char, String]
      var i = 0
      while (i < payload.length && payload(i) != 0) {
        val t = payload(i).toChar
        val end = payload.indexOf(0.toByte, i + 1)
        fields(t) = new String(payload, i + 1, end - i - 1, UTF_8)
        i = end + 1
      }
      s"postgres error ${fields.getOrElse('C', "?")}: " +
        fields.getOrElse('M', "(no message)")
    }

    /** Run one simple query; return (columnNames, rows as text cells,
      * command tags). Throws on ErrorResponse. Values arrive exactly
      * as Postgres text-formats them; NULL is None.
      */
    def query(sql: String): (Seq[String], Seq[Seq[Option[String]]], Seq[String]) = {
      val bytes = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + bytes.length + 1)
      out.write(bytes); out.writeByte(0)
      out.flush()
      var cols = Seq.empty[String]
      val rows = Seq.newBuilder[Seq[Option[String]]]
      val tags = Seq.newBuilder[String]
      var err: Option[String] = None
      var done = false
      while (!done) {
        val (tag, payload) = readMessage()
        tag match {
          case 'T' =>
            val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
            var i = 2
            cols = (0 until n).map { _ =>
              val end = payload.indexOf(0.toByte, i)
              val name = new String(payload, i, end - i, UTF_8)
              i = end + 1 + 18 // table oid(4) attnum(2) type oid(4) len(2) mod(4) fmt(2)
              name
            }
          case 'D' =>
            val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
            var i = 2
            rows += (0 until n).map { _ =>
              val len = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
                ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
              i += 4
              if (len == -1) None
              else { val v = new String(payload, i, len, UTF_8); i += len; Some(v) }
            }
          case 'C' =>
            tags += new String(payload, 0, payload.length - 1, UTF_8)
          case 'E' => err = Some(errorText(payload)) // ReadyForQuery still follows
          case 'Z' => done = true
          case 'N' | 'S' | 'I' | 'G' | 'H' => () // notices / empty-query / copy chatter
          case t => throw new java.io.IOException(s"unexpected tag '$t'")
        }
      }
      err.foreach(m => throw new java.io.IOException(m))
      (cols, rows.result(), tags.result())
    }

    def exec(sql: String): Seq[String] = query(sql)._3

    /** Start a `COPY ... FROM STDIN`: sends the simple query and
      * reads up to the CopyInResponse ('G'). The caller then streams
      * [[copyData]] frames and finishes with [[copyDone]]. Throws if
      * the server rejects the COPY statement itself (ErrorResponse
      * arrives instead of CopyInResponse, followed by ReadyForQuery).
      */
    def copyIn(sql: String): Unit = {
      val bytes = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + bytes.length + 1)
      out.write(bytes); out.writeByte(0)
      out.flush()
      var err: Option[String] = None
      var inCopy = false
      while (!inCopy) {
        val (tag, payload) = readMessage()
        tag match {
          case 'G' => inCopy = true // CopyInResponse: format byte + per-col formats, irrelevant to the sender
          case 'E' => err = Some(errorText(payload))
          case 'Z' => // ReadyForQuery after a rejected COPY
            throw new java.io.IOException(err.getOrElse("COPY refused with no error"))
          case 'N' | 'S' => ()
          case t => throw new java.io.IOException(s"unexpected tag '$t' awaiting CopyInResponse")
        }
      }
    }

    /** One CopyData frame. Callers batch rows into ~64 KB frames —
      * per-row frames are protocol-legal but syscall-wasteful.
      */
    def copyData(bytes: Array[Byte], len: Int): Unit = {
      out.writeByte('d')
      out.writeInt(4 + len)
      out.write(bytes, 0, len)
    }

    /** CopyDone + drain to ReadyForQuery; returns the row count from
      * the `COPY n` command tag. Throws the server's error if the
      * stream was rejected mid-copy (bad tuple, constraint, …).
      */
    def copyDone(): Long = {
      out.writeByte('c'); out.writeInt(4); out.flush()
      var err: Option[String] = None
      var rows = -1L
      var done = false
      while (!done) {
        val (tag, payload) = readMessage()
        tag match {
          case 'C' =>
            val t = new String(payload, 0, payload.length - 1, UTF_8)
            if (t.startsWith("COPY ")) rows = t.substring(5).trim.toLong
          case 'E' => err = Some(errorText(payload))
          case 'Z' => done = true
          case 'N' | 'S' => ()
          case t => throw new java.io.IOException(s"unexpected tag '$t' after CopyDone")
        }
      }
      err.foreach(m => throw new java.io.IOException(m))
      rows
    }

    override def close(): Unit = {
      try { out.writeByte('X'); out.writeInt(4); out.flush() }
      catch { case _: java.io.IOException => () }
      sock.close()
    }
  }

  /** SQL literal for one Spark value, standard_conforming_strings
    * quoting ('' doubles quotes — the RFC-4180-of-SQL device).
    */
  private[sources] def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => "timestamp '" + t.toString + "'"
    case d: java.sql.Date => "date '" + d.toString + "'"
    case b: Boolean => if (b) "true" else "false"
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, s"non-finite double $d")
      d.toString
    case f: Float =>
      require(!f.isNaN && !f.isInfinite, s"non-finite float $f")
      f.toString
    case d: java.math.BigDecimal => d.toPlainString
    case other => throw new IllegalArgumentException(
      s"PgWire.literal: unsupported type ${other.getClass.getName}")
  }

  /** Spark column type → Postgres DDL type for [[createTable]]. */
  private def pgType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "bigint"
      case IntegerType => "integer"
      case DoubleType => "double precision"
      case StringType => "text"
      case BooleanType => "boolean"
      case TimestampType => "timestamp"
      case DateType => "date"
      case d: DecimalType => s"numeric(${d.precision},${d.scale})"
      case other => throw new IllegalArgumentException(
        s"PgWire: unsupported Spark type $other")
    }
  }

  def createTable(conn: Conn, table: String, df: DataFrame,
      dropFirst: Boolean = true): Unit = {
    if (dropFirst) conn.exec(s"DROP TABLE IF EXISTS $table")
    val cols = df.schema.fields
      .map(f => s""""${f.name}" ${pgType(f.dataType)}""").mkString(", ")
    conn.exec(s"CREATE TABLE $table ($cols)")
  }

  /** Executor-side distributed write: one socket per partition,
    * multi-row INSERT batches of `batchRows`.
    */
  def writeTable(df: DataFrame, host: String, port: Int, db: String,
      user: String, table: String, batchRows: Int = 200): Unit = {
    val names = df.schema.fieldNames
      .map(n => s""""$n"""").mkString("(", ", ", ")")
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = new Conn(host, port, db, user)
        try {
          rows.grouped(batchRows).foreach { chunk =>
            val values = chunk.map(r =>
              r.toSeq.map(literal).mkString("(", ", ", ")")).mkString(", ")
            conn.exec(s"INSERT INTO $table $names VALUES $values")
          }
        } finally conn.close()
      }
    }
  }

  // ---- COPY fast path ------------------------------------------------
  //
  // The INSERT path above pays one full query round-trip per batch
  // (client waits for ReadyForQuery each time). COPY FROM STDIN sends
  // the whole partition as a one-way byte stream and synchronizes
  // ONCE at CopyDone — the bulk-load path every Postgres loader uses.
  // Binary format additionally skips the server's text parser
  // (datums arrive wire-ready) and is immune to escaping entirely.

  /** Postgres epoch (2000-01-01) in java epoch days — binary date/
    * timestamp datums count from here, not from 1970.
    */
  private val PgEpochDay = 10957L

  /** Binary-COPY field encoder for one Spark value: int32 byte length
    * then the datum bytes, big-endian throughout (the formats
    * Postgres's own send/recv functions speak — int8send, float8send,
    * timestamp_send, date_send, boolsend, textsend).
    */
  private def writeBinaryField(w: DataOutputStream, v: Any): Unit = v match {
    case null => w.writeInt(-1)
    case l: Long => w.writeInt(8); w.writeLong(l)
    case i: Int => w.writeInt(4); w.writeInt(i)
    case s: Short => w.writeInt(2); w.writeShort(s)
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, s"non-finite double $d")
      w.writeInt(8); w.writeLong(java.lang.Double.doubleToLongBits(d))
    case f: Float =>
      require(!f.isNaN && !f.isInfinite, s"non-finite float $f")
      w.writeInt(4); w.writeInt(java.lang.Float.floatToIntBits(f))
    case s: String =>
      val b = s.getBytes(UTF_8); w.writeInt(b.length); w.write(b)
    case b: Boolean => w.writeInt(1); w.writeByte(if (b) 1 else 0)
    case d: java.sql.Date =>
      w.writeInt(4); w.writeInt((d.toLocalDate.toEpochDay - PgEpochDay).toInt)
    case t: java.sql.Timestamp =>
      // timestamp WITHOUT time zone: micros since 2000-01-01 00:00 of
      // the LOCAL wall-clock rendering — the same instant the text
      // path's `t.toString` lands, so both paths are read-back equal
      val ldt = t.toLocalDateTime
      val micros = (ldt.toLocalDate.toEpochDay - PgEpochDay) * 86400000000L +
        ldt.toLocalTime.toNanoOfDay / 1000L
      w.writeInt(8); w.writeLong(micros)
    case other => throw new IllegalArgumentException(
      s"PgWire binary COPY: unsupported type ${other.getClass.getName}")
  }

  /** Text-COPY cell (the decimal fallback lane): COPY text format is
    * NOT the SQL-literal syntax — delimiters are escaped with
    * backslashes and NULL is `\N` (PostgreSQL docs, COPY TEXT format).
    */
  private[sources] def copyTextCell(v: Any): String = v match {
    case null => "\\N"
    case s: String =>
      val sb = new java.lang.StringBuilder(s.length + 8)
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' => sb.append("\\\\")
          case '\t' => sb.append("\\t")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    case d: java.math.BigDecimal => d.toPlainString
    case t: java.sql.Timestamp => t.toString
    case d: java.sql.Date => d.toString
    case b: Boolean => if (b) "t" else "f"
    case other => other.toString
  }

  /** True when every column has a binary send/recv encoding above —
    * decimals (numeric's base-10000 digit-group wire format) route
    * through the text lane instead.
    */
  private def binaryCapable(schema: org.apache.spark.sql.types.StructType): Boolean = {
    import org.apache.spark.sql.types._
    schema.fields.forall(_.dataType match {
      case LongType | IntegerType | ShortType | DoubleType | FloatType |
           StringType | BooleanType | DateType | TimestampType => true
      case _ => false
    })
  }

  /** Executor-side distributed bulk load: one socket + ONE
    * `COPY ... FROM STDIN` per partition, rows streamed in ~`frameBytes`
    * CopyData frames, one synchronization at CopyDone. Binary format
    * when every column supports it, text format otherwise; both
    * produce tables read-back-identical to [[writeTable]]. Same
    * at-least-once contract as the INSERT path (task retry re-copies
    * the partition — idempotent only under a keyed target), but with
    * a sharper failure story COPY gives for free: the stream is
    * transactional per connection, so an attempt that dies before
    * CopyDone commits NOTHING — a plain task retry lands the
    * partition exactly once, and duplicates can only come from
    * duplicate SUCCESS (speculative twins), where the keyed dedup
    * read (`SELECT DISTINCT` / key-grouped) recovers exactness.
    * Both legs exercised against a live server in PgWireSpec (i).
    */
  def writeTableCopy(df: DataFrame, host: String, port: Int, db: String,
      user: String, table: String, frameBytes: Int = 65536): Unit = {
    val names = df.schema.fieldNames
      .map(n => s""""$n"""").mkString("(", ", ", ")")
    val binary = binaryCapable(df.schema)
    val nCols = df.schema.size
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = new Conn(host, port, db, user)
        try {
          val fmt = if (binary) " (FORMAT BINARY)" else ""
          conn.copyIn(s"COPY $table $names FROM STDIN$fmt")
          val buf = new java.io.ByteArrayOutputStream(frameBytes + 4096)
          val w = new DataOutputStream(buf)
          def flushFrame(): Unit = if (buf.size > 0) {
            conn.copyData(buf.toByteArray, buf.size); buf.reset()
          }
          if (binary) {
            w.write("PGCOPY\n".getBytes(UTF_8)); w.write(0xff)
            w.write("\r\n".getBytes(UTF_8)); w.write(0)
            w.writeInt(0); w.writeInt(0) // flags, header-extension length
          }
          rows.foreach { r =>
            if (binary) {
              w.writeShort(nCols)
              var i = 0
              while (i < nCols) { writeBinaryField(w, r.get(i)); i += 1 }
            } else {
              w.write(r.toSeq.map(copyTextCell).mkString("\t").getBytes(UTF_8))
              w.write('\n')
            }
            if (buf.size >= frameBytes) flushFrame()
          }
          if (binary) w.writeShort(-1) // file trailer
          flushFrame()
          conn.copyDone()
        } finally conn.close()
      }
      ()
    }
  }

  /** Driver-side read-back for verification-scale result sets: text
    * cells exactly as Postgres renders them (see scale posture above).
    */
  def queryAll(spark: SparkSession, host: String, port: Int, db: String,
      user: String, sql: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val conn = new Conn(host, port, db, user)
    try { val (c, r, _) = conn.query(sql); (c, r) }
    finally conn.close()
  }

  /** Gate `sink_pgwire`: the literal `to_sql` warehouse target
    * (reference task.py:143) board-verified END TO END — a per-user
    * rollup of the events table is bulk-loaded into a REAL initdb'd
    * Postgres through the v3 wire COPY path (executor-side
    * per-partition sockets, binary format), read back over the same
    * wire, and hashed against the plain DuckDB aggregate. The whole
    * server lifecycle (initdb → pg_ctl -w start → load → read →
    * immediate stop → delete) lives inside the gate; PgWireSpec
    * already proves the lifecycle runs in this environment (the
    * round suite passes it un-canceled), so absence of the binaries
    * is REQUIREd loudly rather than silently skipped. Ports probe a
    * small private range so concurrent benchmark passes cannot
    * collide.
    */
  def sinkGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import scala.sys.process._
    import spark.implicits._
    require(new java.io.File("/usr/local/bin/initdb").exists,
      "sink_pgwire: postgres binaries absent")
    val agg = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .repartition(4) // the write is per-partition sockets — prove >1
    val root = java.nio.file.Files.createTempDirectory("pgwire_gate").toFile
    def su(cmd: String): Int =
      Seq("su", "nobody", "-s", "/bin/sh", "-c", s"cd /tmp && $cmd").!
    require(Seq("chown", "-R", "nobody", root.toString).! == 0,
      "sink_pgwire: cannot hand the data dir to nobody")
    val data = s"$root/data"
    require(su(s"/usr/local/bin/initdb -D $data -A trust -U graft >/dev/null") == 0,
      "sink_pgwire: initdb failed")
    // -w: pg_ctl waits and FAILS if the server can't bind — that's
    // what makes the port probe sound
    // pg_ctl chatter is silenced: the gate may run inside Bench,
    // whose harvester parses stdout's final JSON line
    val port = (54480 to 54489).find { p =>
      su(s"/usr/local/bin/pg_ctl -w -D $data -o '-k $root -p $p " +
        s"-c listen_addresses=127.0.0.1' -l $root/log start " +
        ">/dev/null 2>&1") == 0
    }.getOrElse(throw new IllegalStateException(
      "sink_pgwire: no free port in 54480-54489"))
    try {
      val conn = new Conn("127.0.0.1", port, "postgres", "graft")
      try {
        createTable(conn, "user_rollup", agg)
        writeTableCopy(agg, "127.0.0.1", port, "postgres", "graft",
          "user_rollup")
        val (_, rows, _) = conn.query(
          "SELECT user_id, n, cents FROM user_rollup")
        rows.map(r => (r(0).get.toLong, r(1).get.toLong, r(2).get.toLong))
          .toDF("user_id", "n", "cents")
          .orderBy(col("user_id"))
          .localCheckpoint(true)
      } finally conn.close()
    } finally {
      su(s"/usr/local/bin/pg_ctl -D $data -m immediate stop >/dev/null 2>&1")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  val sinkGateSql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                AS cents
       FROM events GROUP BY 1 ORDER BY 1"""
}
