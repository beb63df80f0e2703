package graft.operators

import graft.Tables
import graft.pipeline.ManifestTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate-shaped lakehouse read path: z-order-cluster the documents
  * table into a fresh versioned ManifestTable (temp dir), then answer
  * a 2-D box query through readWhereAll's zone-map skipping. The
  * RESULT is layout-independent — exactly the rows a plain filter
  * over the source table returns — which is what lets a plain DuckDB
  * filter oracle hash-gate the whole write → manifest → skip → read
  * path (clustered staging, per-segment stats, segment pruning,
  * row-level residual filter). Skipping EFFECTIVENESS (that pruning
  * actually prunes) is ZorderSpec's job; this gate pins that skipping
  * never becomes filtering.
  */
object Lake {

  def zorderRead(spark: SparkSession, dir: String,
      idLo: Long = 100, idHi: Long = 399,
      chLo: Long = 150, chHi: Long = 400): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      java.nio.file.Files.createTempDirectory("graft_lake_gate").toString
        + "/documents")
    t.writeClustered(docs, Seq("doc_id", "n_chars"), nSegments = 8)
    t.readWhereAll(Seq(("doc_id", idLo.toDouble, idHi.toDouble),
        ("n_chars", chLo.toDouble, chHi.toDouble)))
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def zorderReadSql(idLo: Long = 100, idHi: Long = 399,
      chLo: Long = 150, chHi: Long = 400): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id BETWEEN $idLo AND $idHi
          AND n_chars BETWEEN $chLo AND $chHi"""

  /** Gate-shaped time travel: commit the short-document slice as v1,
    * append the rest (v2 = the whole table), then read v1 back
    * through the manifest. The v1 snapshot is definitionally the
    * filter that built it, so a plain DuckDB filter hash-gates the
    * versioned write → commit → readVersion path — including that
    * the append did NOT leak v2 rows into the v1 snapshot.
    */
  def timeTravelRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      java.nio.file.Files.createTempDirectory("graft_lake_tt").toString
        + "/documents")
    val v1 = t.write(docs.filter($"n_chars" <= cut))
    t.append(docs.filter($"n_chars" > cut))
    t.readVersion(v1).select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def timeTravelReadSql(cut: Long = 300): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars <= $cut"""
}
