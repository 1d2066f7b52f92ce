package graft.tools

/** Process CPU accounting from /proc/self/stat — the one shared parser for
  * graft.Bench and the probe tools (the per-tool copies had already drifted).
  * Parses from AFTER the parenthesized comm field, so an executable name
  * containing spaces cannot shift the utime/stime indices. */
object ProcStat {
  private val ticksPerSec = 100.0 // USER_HZ on linux/amd64

  /** (user, sys) CPU seconds of this process. */
  def cpuTimes(): (Double, Double) = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")))
    // fields after the ") " are 1-indexed from state=3; utime=14, stime=15
    val rest = raw.substring(raw.lastIndexOf(')') + 2).split(" ")
    (rest(11).toDouble / ticksPerSec, rest(12).toDouble / ticksPerSec)
  }

  /** user+sys CPU seconds of this process. */
  def cpuSec(): Double = {
    val (u, s) = cpuTimes()
    u + s
  }
}
