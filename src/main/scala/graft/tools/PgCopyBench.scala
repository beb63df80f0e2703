package graft.tools

import graft.Graft
import graft.sources.PgWire
import org.apache.spark.sql.functions.{concat, expr, lit}
import scala.sys.process._

/** Receipt tool for the PgWire COPY fast path: stands up a throwaway
  * initdb'd Postgres (trust auth, TCP on a scratch port — the same
  * lifecycle PgWireSpec drives), writes the same N-row frame through
  * the multi-row-INSERT sink and the COPY sink (binary lane, plus the
  * text lane via a decimal column), and prints wall seconds + a
  * row-count cross-check per path. The INSERT path pays one full
  * query round-trip per batch; COPY synchronizes once per partition —
  * this tool is the measured difference, quoted in SCALING.md.
  *
  * Usage: runMain graft.tools.PgCopyBench [nRows] [batchRows]
  */
object PgCopyBench {

  private val Port = 54473

  private def su(cmd: String): Int =
    Seq("su", "nobody", "-s", "/bin/sh", "-c", s"cd /tmp && $cmd").!

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val batchRows = if (args.length > 1) args(1).toInt else 200
    val spark = Graft.session(appName = "graft-pgcopy-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    require(new java.io.File("/usr/local/bin/initdb").exists,
      "postgres binaries not installed")
    val root = java.nio.file.Files.createTempDirectory("pgcopybench").toFile
    require(Seq("chown", "-R", "nobody", root.toString).! == 0)
    val data = s"$root/data"
    require(su(s"/usr/local/bin/initdb -D $data -A trust -U graft >/dev/null") == 0)
    require(su(s"/usr/local/bin/pg_ctl -D $data -o '-k $root -p $Port " +
      s"-c listen_addresses=127.0.0.1' -l $root/log start") == 0)
    try {
      val df = spark.range(n.toLong)
        .select($"id",
          concat(lit("label-"), $"id").as("label"),
          ($"id" * 1.5).as("score"),
          ($"id" % 2 === 0).as("flag"))
        .repartition(4)
        .localCheckpoint(true) // freeze the input so both paths write identical bytes

      val conn = new PgWire.Conn("127.0.0.1", Port, "postgres", "graft")
      def count(t: String): Long =
        conn.query(s"SELECT count(*) FROM $t")._2.head.head.get.toLong
      def timed(label: String)(f: => Unit): Double = {
        val t0 = System.nanoTime(); f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$label%-28s $s%8.2f s"); s
      }
      try {
        PgWire.createTable(conn, "t_insert", df)
        PgWire.createTable(conn, "t_copy", df)
        val tIns = timed(s"INSERT batches ($batchRows/batch)") {
          PgWire.writeTable(df, "127.0.0.1", Port, "postgres", "graft",
            "t_insert", batchRows = batchRows)
        }
        val tCopy = timed("COPY binary") {
          PgWire.writeTableCopy(df, "127.0.0.1", Port, "postgres", "graft",
            "t_copy")
        }
        require(count("t_insert") == n && count("t_copy") == n,
          "row-count mismatch between paths")
        // text lane: a decimal column forces the escaped-text format
        val dec = df.withColumn("amount",
          expr("CAST(id AS DECIMAL(18,4)) / 7"))
        PgWire.createTable(conn, "t_copy_text", dec)
        val tText = timed("COPY text (decimal lane)") {
          PgWire.writeTableCopy(dec, "127.0.0.1", Port, "postgres", "graft",
            "t_copy_text")
        }
        require(count("t_copy_text") == n)
        println(f"""{"rows":$n,"insert_sec":$tIns%.2f,"copy_binary_sec":$tCopy%.2f,"copy_text_sec":$tText%.2f,"speedup":${tIns / tCopy}%.1f}""")
      } finally conn.close()
    } finally {
      su(s"/usr/local/bin/pg_ctl -D $data -m immediate stop")
      ()
    }
    spark.stop()
  }
}
