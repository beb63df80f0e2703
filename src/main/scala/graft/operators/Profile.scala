package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep a curation pipeline runs
  * before training ingest: per column, null count, distinct count,
  * min/max (as strings for a uniform shape). One aggregation computes
  * every column's stats in a single pass over the scan; the per-column
  * rows are unpivoted driver-side from that one result row (O(cols),
  * not O(rows)).
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = df.columns.flatMap { c =>
      // coalesce: sum over zero rows is null, and a profiler must
      // survive an empty input rather than NPE in getLong
      Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.toSeq.tail: _*).collect()(0)
    val out = df.columns.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(4 * i), row.getLong(4 * i + 1),
        Option(row.getString(4 * i + 2)).getOrElse(""),
        Option(row.getString(4 * i + 3)).getOrElse(""))
    }
    out.toSeq.toDF("column", "n_nulls", "n_distinct", "min_val", "max_val")
  }

  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))

  val profileDocumentsSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS "column",
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            coalesce(CAST(min($c) AS VARCHAR), '') AS min_val,
            coalesce(CAST(max($c) AS VARCHAR), '') AS max_val
          FROM documents"""
    }.mkString("\nUNION ALL\n")
  }
}
