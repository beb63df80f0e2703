package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Lake maintenance: small-file compaction. Streaming sinks and
  * frequent small merges fragment a table into thousands of tiny
  * parquet files; every downstream scan then pays per-file open +
  * footer-read + scheduling cost. Compaction rewrites a table
  * directory to ~`targetBytes` files, then swaps via two renames.
  *
  * Swap semantics: the two-rename swap is NOT reader-atomic — between
  * rename(path→bak) and rename(tmp→path) the table directory does not
  * exist, so a concurrent reader in that window fails its scan (and a
  * crash in the window leaves the table at `_precompact`, recoverable
  * by hand or by the next compact run's stale-backup check). This
  * operator is for maintenance windows where the table is quiesced —
  * for live tables use [[ManifestTable]], whose manifest indirection
  * makes publish (and compaction) reader-atomic.
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
    // HDFS-style rename signals failure by returning false, not by
    // throwing — check every step, and only drop the backup once the
    // swap has definitely landed (a stale backup from a crashed run
    // must not silently absorb the rename either)
    if (fs.exists(bak) && !fs.delete(bak, true))
      throw new java.io.IOException(s"cannot clear stale backup $bak")
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"rename $path -> $bak failed")
    if (!fs.rename(tmp, path)) {
      // restore; table was only at bak — and a failed restore must be
      // loud (it means the table is currently missing entirely)
      if (!fs.rename(bak, path))
        throw new java.io.IOException(
          s"rename $tmp -> $path failed AND restore failed: table data is at $bak")
      throw new java.io.IOException(s"rename $tmp -> $path failed; original restored")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(path)
      .count(_.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }
}
