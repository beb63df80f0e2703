package graft.sources

import org.apache.spark.sql.DataFrame

/** Load step (≙ task.py:143 `to_sql` into Postgres), re-expressed as
  * a partitioned parquet lake: the fact table partitioned by a
  * low-cardinality column (partition pruning at read), dims written
  * plain (they're broadcast at join time, layout doesn't matter).
  *
  * At 100 TB the fact write is the job: `partitionBy` on a
  * low-cardinality key (date, region) keeps file counts sane, and
  * writers scale with upstream partitions — no driver bottleneck,
  * unlike the reference's single-connection to_sql.
  */
object StarSchemaSink {

  /** Write one star: returns the written paths keyed by table name. */
  def write(outDir: String, fact: (String, DataFrame, Seq[String]),
      dims: Seq[(String, DataFrame)]): Map[String, String] = {
    val (fname, fdf, partCols) = fact
    val fpath = s"$outDir/$fname"
    val w = fdf.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(fpath)
    val dimPaths = dims.map { case (name, df) =>
      val p = s"$outDir/$name"
      df.coalesce(1).write.mode("overwrite").parquet(p)
      name -> p
    }
    (dimPaths :+ (fname -> fpath)).toMap
  }
}
