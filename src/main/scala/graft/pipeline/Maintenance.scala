package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Lake maintenance: small-file compaction. Streaming sinks and
  * frequent small merges fragment a table into thousands of tiny
  * parquet files; every downstream scan then pays per-file open +
  * footer-read + scheduling cost. Compaction rewrites a table
  * directory to ~`targetBytes` files (atomic swap via rename), which
  * at 100 TB is the difference between a scan spending its time in
  * IO and spending it in file bookkeeping.
  */
object Maintenance {

  /** @return (filesBefore, filesAfter) */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(dir + "_compacting")
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new Path(dir + "_precompact")
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)
    val after = fs.listStatus(path)
      .count(_.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }
}
