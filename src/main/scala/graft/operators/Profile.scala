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

  /** The lineitem numeric columns the correlation profile reads, as
    * integer units (cents / basis points) so every moment sum is
    * exact.
    */
  private val corrVars: Seq[(String, String)] = Seq(
    "qty" -> "CAST(l_quantity AS BIGINT)",
    "price" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "disc" -> "CAST(round(l_discount * 10000) AS BIGINT)",
    "tax" -> "CAST(round(l_tax * 10000) AS BIGINT)")

  private val corrPairs: Seq[(String, String)] =
    for { i <- corrVars.indices; j <- (i + 1) until corrVars.length }
      yield (corrVars(i)._1, corrVars(j)._1)

  /** Pairwise Pearson correlation matrix — the multivariate step
    * after the per-column profile (feature redundancy, leakage
    * screening). ONE map-side-partial aggregate computes all 14
    * moments (4 sums, 4 sum-squares, 6 cross-products) as exact
    * DECIMAL(38,0) over integer units — the [[Olap.regressionByFlag]]
    * device widened to a matrix — and the 6 correlations are each ONE
    * shared double expression over those exact sums, shaped
    * identically in both engines: (n·Sxy − Sx·Sy) / √(n·Sxx − Sx²)
    * / √(n·Syy − Sy²), sqrt being correctly-rounded IEEE in both.
    * Scale: the corpus is scanned once; everything after the
    * aggregate is a 1-row × 14-col frame.
    */
  def correlationsLineitem(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir).select(
      corrVars.map { case (n, e) => expr(e).as(n) }: _*)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        corrVars.map { case (v, _) =>
          sum(col(v).cast("decimal(38,0)")).as(s"s_$v") } ++
        corrVars.map { case (v, _) =>
          sum((col(v) * col(v)).cast("decimal(38,0)")).as(s"s_${v}_$v") } ++
        corrPairs.map { case (a, b) =>
          sum((col(a) * col(b)).cast("decimal(38,0)")).as(s"s_${a}_$b") }
    val sums = base.agg(aggs.head, aggs.tail: _*)
    val withR = corrPairs.foldLeft(sums) { case (df, (a, b)) =>
      df.withColumn(s"r_${a}_$b", round(
        expr(s"""((CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE)
                   - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
                  / sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE)
                         - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)))
                 / sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE)
                        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))"""),
        6))
    }
    val stackArgs = corrPairs
      .map { case (a, b) => s"'$a', '$b', r_${a}_$b" }.mkString(", ")
    withR.select(expr(
      s"stack(${corrPairs.length}, $stackArgs) AS (var_x, var_y, r)"))
      .orderBy($"var_x", $"var_y")
  }

  val correlationsLineitemSql: String = {
    val selVars = corrVars
      .map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val moments =
      corrVars.map { case (v, _) => s"sum($v) AS s_$v" } ++
        corrVars.map { case (v, _) => s"sum($v * $v) AS s_${v}_$v" } ++
        corrPairs.map { case (a, b) => s"sum($a * $b) AS s_${a}_$b" }
    val rows = corrPairs.map { case (a, b) =>
      s"""SELECT '$a' AS var_x, '$b' AS var_y,
            round(((CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE)
                    - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
                   / sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE)
                          - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)))
                  / sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE)
                         - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)), 6)
              AS r
          FROM sums"""
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (SELECT $selVars FROM lineitem),
        sums AS (
          SELECT count(*) AS n, ${moments.mkString(", ")}
          FROM d)
        $rows
        ORDER BY var_x, var_y"""
  }
}
