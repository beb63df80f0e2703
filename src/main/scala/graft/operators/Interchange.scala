package graft.operators

import graft.Tables
import graft.sources.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate-shaped interchange-format round trips: land the documents
  * table in a foreign ingest/lake format (JSONL, ORC), read it back
  * through the schema'd [[Readers]], and answer a filtered query.
  * The result is format-independent — exactly what a plain filter
  * over the source parquet returns — so a DuckDB filter oracle
  * hash-gates the whole write → schema'd read → filter path for each
  * format (field typing, null handling, predicate behavior).
  * Reader-feature depth (corrupt-record quarantine, pushdown) is
  * InterchangeSpec's job.
  */
object Interchange {

  def jsonlRead(spark: SparkSession, dir: String,
      minChars: Long = 200): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tmp = graft.util.Scratch.dir("graft_jsonl")
    docs.write.mode("overwrite").json(s"$tmp/documents")
    Readers.jsonl(spark, s"$tmp/documents", docs.schema)
      .filter($"n_chars" >= minChars)
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def jsonlReadSql(minChars: Long = 200): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars >= $minChars"""

  def orcRead(spark: SparkSession, dir: String,
      idLo: Long = 50, idHi: Long = 449): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tmp = graft.util.Scratch.dir("graft_orc")
    docs.write.mode("overwrite").orc(s"$tmp/documents")
    Readers.orc(spark, s"$tmp/documents")
      .filter($"doc_id".between(idLo, idHi))
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def orcReadSql(idLo: Long = 50, idHi: Long = 449): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id BETWEEN $idLo AND $idHi"""

  /** CSV — the reference's own ingest format (task.py reads the
    * Netflix CSV). Document text forces the writer through full
    * quoting (commas, quotes) and the read back goes through the
    * schema'd PERMISSIVE [[Readers.csv]]; multiLine handles any
    * embedded newlines a text corpus may carry (disables intra-file
    * split parallelism — the documented CSV ingest posture: files,
    * not splits, are the parallelism unit; the lake is parquet).
    * Filter on a modulus so the gate exercises numeric typing after
    * the string round trip.
    */
  def csvRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tmp = graft.util.Scratch.dir("graft_csv")
    docs.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$tmp/documents")
    Readers.csv(spark, s"$tmp/documents", docs.schema, multiLine = true)
      .filter($"doc_id" % 7 === 0)
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  val csvReadSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
       WHERE doc_id % 7 = 0"""

  /** PERMISSIVE quarantine gated end-to-end: serialize documents to
    * JSONL, deterministically corrupt every doc_id % 10 == 0 line,
    * read back through the schema'd PERMISSIVE reader, and return the
    * rows that parsed — the oracle states the survivors directly
    * (doc_id % 10 <> 0). The op itself REQUIRES the quarantine count
    * to equal the planted count, so a reader that silently drops (or
    * half-parses) corrupt lines fails loudly rather than the gate
    * passing on the survivor set alone.
    */
  def quarantineRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val docs = Tables.documents(spark, dir)
    val planted = docs.filter($"doc_id" % 10 === 0).count()
    val tmp = graft.util.Scratch.dir("graft_quarantine")
    docs
      .select($"doc_id", to_json(struct(docs.columns.map(col): _*)).as("line"))
      .select(when($"doc_id" % 10 === 0, concat(lit("{corrupt!"), $"line"))
        .otherwise($"line").as("value"))
      .write.mode("overwrite").text(s"$tmp/docs")
    val back = Readers.jsonl(spark, s"$tmp/docs",
      docs.schema.add("_corrupt_record", StringType)).cache()
    val quarantined = back.filter($"_corrupt_record".isNotNull).count()
    require(quarantined == planted,
      s"quarantine captured $quarantined of $planted corrupt lines")
    back.filter($"_corrupt_record".isNull)
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  val quarantineReadSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
       WHERE doc_id % 10 <> 0"""
}
