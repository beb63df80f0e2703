package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** Reader-atomic table publishing via manifest indirection — the
  * piece two-rename swaps (Maintenance.compact) fundamentally can't
  * provide. Layout:
  *
  * {{{
  *   <root>/v00000001-<token>/...parquet   immutable, writer-unique
  *   <root>/v00000002-<token>/...parquet   data directories
  *   <root>/_v00000001.manifest            commit marker; contents =
  *   <root>/_v00000002.manifest            the data directory name
  * }}}
  *
  * The live version is the highest committed manifest; its contents
  * name the data directory. Publishing = atomically creating the
  * manifest file (create-no-overwrite, which every Hadoop FileSystem
  * provides atomically), so a reader resolves either the old version
  * or the new one — never a missing or half-written directory (data
  * lands BEFORE the manifest appears). Each writer stages into its
  * OWN token-suffixed directory, so racing writers never touch each
  * other's files: both race to create the same manifest name,
  * exactly one wins, and the loser deletes only its own staging dir
  * and retries at a fresh version — optimistic concurrency, the
  * contract the lakehouse table formats build on (simplified: the
  * manifest carries just the directory pointer, no schema/stats).
  *
  * Old versions stay readable by in-flight scans until [[vacuum]],
  * the explicit bounded deletion step (which also sweeps abandoned
  * uncommitted staging dirs).
  */
class ManifestTable(spark: SparkSession, root: String) {

  private val rootPath = new Path(root)
  private def fs =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(v: Long) = new Path(rootPath, f"_v$v%08d.manifest")

  private val ManifestName = """_v(\d{8})\.manifest""".r
  private val DataDirName = """v(\d{8})-.*""".r

  /** Highest committed version, if any. */
  def currentVersion: Option[Long] = {
    if (!fs.exists(rootPath)) return None
    val vs = fs.listStatus(rootPath).iterator.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(d) => Some(d.toLong)
        case _ => None
      }
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The committed data directory for version `v`. */
  private def dataDir(v: Long): Path = {
    val in = fs.open(manifest(v))
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    new Path(rootPath, name)
  }

  def read(): DataFrame = {
    val v = currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version under $root"))
    spark.read.parquet(dataDir(v).toString)
  }

  /** Write `df` as the next version and commit it. Returns the
    * committed version. Throws on a commit race loss (another writer
    * claimed the same version) — this writer's staging directory is
    * cleaned up and the caller may retry.
    */
  def write(df: DataFrame): Long = {
    val v = currentVersion.getOrElse(0L) + 1
    val dir = stage(df, v)
    commit(v, dir)
    v
  }

  /** Land the data files for `v` in a writer-unique directory (no
    * commit — invisible to readers). Returns the staged directory.
    */
  def stage(df: DataFrame, v: Long): Path = {
    val dir = new Path(rootPath,
      f"v$v%08d-${java.util.UUID.randomUUID.toString.take(8)}")
    df.write.mode("errorifexists").parquet(dir.toString)
    dir
  }

  /** Atomic create-no-overwrite of the manifest IS the commit; its
    * contents point readers at the staged directory. On a race loss
    * only THIS writer's staged directory is removed — the winner's
    * data is untouched.
    */
  def commit(v: Long, stagedDir: Path): Unit = {
    val out = try fs.create(manifest(v), false)
    catch {
      case e: java.io.IOException =>
        fs.delete(stagedDir, true)
        throw new java.io.IOException(
          s"commit conflict on version $v of $root (concurrent writer won); retry", e)
    }
    try out.write(stagedDir.getName.getBytes(UTF_8)) finally out.close()
  }

  /** Rewrite the live version into ~targetBytes files as a NEW
    * version — readers of the old version are never disturbed.
    * @return (filesBefore, filesAfter)
    */
  def compact(targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val v = currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version under $root"))
    val live = dataDir(v)
    def parquetFiles(p: Path) =
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(live)
    val totalBytes = fs.listStatus(live)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val committed = write(spark.read.parquet(live.toString).repartition(nOut))
    (before, parquetFiles(dataDir(committed)))
  }

  /** Delete committed versions older than the newest `keep`, plus any
    * abandoned staging directory whose version is at or below the
    * current one (a crashed writer's leftovers — by then it can never
    * legally commit). Returns how many committed versions were
    * removed. Manifests are deleted BEFORE their data so a crash
    * mid-vacuum never leaves a manifest pointing at deleted files.
    */
  def vacuum(keep: Int = 1): Int = {
    require(keep >= 1, "must keep at least the live version")
    val cur = currentVersion.getOrElse(return 0)
    val all = fs.listStatus(rootPath).iterator.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(d) => Some(d.toLong)
        case _ => None
      }
    }.toSeq.sorted
    val drop = all.dropRight(keep).filter(_ < cur)
    drop.foreach { v =>
      val dir = dataDir(v)
      fs.delete(manifest(v), false)
      fs.delete(dir, true)
    }
    // sweep staging dirs no manifest references (committed dirs of
    // retained versions are excluded by construction)
    val referenced = (all.toSet -- drop).map(v => dataDir(v).getName)
    fs.listStatus(rootPath).foreach { st =>
      st.getPath.getName match {
        case DataDirName(d) if d.toLong <= cur &&
            !referenced.contains(st.getPath.getName) =>
          fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    drop.size
  }
}
