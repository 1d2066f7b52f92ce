package graft.util

/** Per-process /tmp paths shared between a query's parquet writes and the
  * DuckDB oracle that re-reads them, plus bounded-growth cleanup of sibling
  * dirs left by PREVIOUS processes.
  *
  * Staleness is keyed on process LIVENESS, not wall-clock age alone: a
  * validation session legitimately running longer than any fixed cutoff must
  * never have its oracle inputs deleted between its Verify write and the
  * DuckDB read (that was the failure mode of the old 24 h age-only rule).
  * A sibling dir is deleted only when BOTH hold:
  *   - its embedded pid is no longer alive (`/proc/<pid>` absent — the
  *     standard Linux liveness probe; on non-/proc platforms liveness is
  *     unknown and we keep the dir), and
  *   - it is older than a short grace period (default 1 h), because the
  *     driver's DuckDB oracle reads the files AFTER the writing JVM exits.
  */
object PidPaths {

  val pid: Long = ProcessHandle.current().pid()

  /** `/tmp/<prefix>_<pid>` — pid-suffixed so concurrent sessions cannot
    * overwrite each other's oracle inputs. */
  def path(prefix: String): String = s"/tmp/${prefix}_$pid"

  private def pidOf(dirName: String): Option[Long] = {
    val i = dirName.lastIndexOf('_')
    if (i < 0) None
    else scala.util.Try(dirName.substring(i + 1).toLong).toOption
  }

  private def alive(p: Long): Boolean =
    // /proc/<pid> existence — if /proc itself is absent (non-Linux), treat
    // every pid as alive: never delete what we cannot prove dead
    !java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/proc")) ||
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"/proc/$p"))

  /** Recursive delete of an OWN scratch dir (fresh-table-per-invocation
    * semantics for catalog-table queries). No-op when absent. */
  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val w = java.nio.file.Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.deleteIfExists(_))
      finally w.close()
    }
  }

  /** Delete `/tmp/<prefix>_*` dirs of DEAD sibling processes older than the
    * grace period. Own-pid dirs are never touched. Best-effort (races with a
    * concurrent cleaner are harmless — rm -rf of a half-deleted dir). */
  def cleanStaleSiblings(prefix: String, graceMillis: Long = 3600L * 1000): Unit =
    try {
      val cutoff = System.currentTimeMillis() - graceMillis
      val tmp = java.nio.file.Paths.get("/tmp")
      val ls = java.nio.file.Files.list(tmp)
      try ls.filter(p => p.getFileName.toString.startsWith(prefix))
        .filter(p => pidOf(p.getFileName.toString).exists(q => q != pid && !alive(q)))
        .filter(p => java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
        .forEach { p =>
          import scala.sys.process._
          Seq("rm", "-rf", p.toString).!
        }
      finally ls.close()
    } catch { case _: Throwable => }
}
