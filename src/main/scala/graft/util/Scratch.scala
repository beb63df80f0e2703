package graft.util

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories for gate queries that stage a
  * table on disk (lake/interchange round trips). Every dir handed out
  * is registered once with a JVM shutdown hook that removes it
  * recursively, so repeated gate/bench passes in one session no
  * longer accrete table copies under /tmp — they all vanish when the
  * session's JVM exits (Verify, Bench, and forked test JVMs alike).
  */
object Scratch {

  private val created = scala.collection.mutable.ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized { created.foreach(deleteRecursively) }))
    true
  }

  /** A fresh temp directory, removed recursively on JVM exit. */
  def dir(prefix: String): String = {
    require(hookInstalled)
    val p = Files.createTempDirectory(prefix)
    created.synchronized { created += p }
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursively(c)) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
  }
}
