package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Idempotency ledger (≙ task.py:231 `check_history`): a parquet
  * append-log of processed input names, so re-running the pipeline on
  * an already-loaded input is a no-op. At cluster scale the ledger
  * stays tiny (one row per ingested file/batch) and reads are a
  * single small scan.
  */
class History(spark: SparkSession, ledgerPath: String) {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("name", StringType, nullable = false)))

  def processed: Set[String] =
    if (exists) spark.read.schema(schema).parquet(ledgerPath)
      .select($"name").as[String].collect().toSet
    else Set.empty

  def isProcessed(name: String): Boolean = processed.contains(name)

  /** Record `name`; returns false when it was already present
    * (mirrors check_history's boolean contract).
    */
  def recordIfNew(name: String): Boolean =
    if (isProcessed(name)) false
    else {
      Seq(name).toDF("name").write.mode("append").parquet(ledgerPath)
      true
    }

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
