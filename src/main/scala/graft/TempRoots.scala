package graft

import java.nio.file.{Files, Path}

/** Tracked temp-directory roots for the bench/verify query harnesses.
  *
  * The §G lakehouse queries each materialize sf-scale table copies
  * under `java.io.tmpdir`; an untracked run leaks ~30 copies per
  * bench/verify pass, eroding the host disk round over round. Queries
  * allocate through [[create]]; [[Bench]] and [[Verify]] call
  * [[cleanup]] once results are materialized, and [[sweepStale]] on
  * startup bounds growth from crashed or killed earlier runs.
  */
object TempRoots {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  /** `Files.createTempDirectory` plus tracking for [[cleanup]]. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Delete every root created since the last cleanup. Call only after
    * the query results reading from them are fully materialized — the
    * returned DataFrames are lazy views over these directories. */
  def cleanup(): Unit = {
    var p = roots.poll()
    while (p != null) {
      try deleteRec(p.toFile) catch { case _: Exception => () }
      p = roots.poll()
    }
  }

  /** Delete `graft_`-prefixed temp dirs older than `maxAgeMs` (default
    * 3 h — far beyond any single run) left by previous crashed runs;
    * concurrent runs keep their fresh dirs. Returns the count removed. */
  def sweepStale(maxAgeMs: Long = 3L * 60 * 60 * 1000): Int = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val kids = tmp.listFiles()
    if (kids == null) return 0
    var n = 0
    kids.foreach { f =>
      if (f.getName.startsWith("graft_") && f.lastModified() < cutoff) {
        try { deleteRec(f); n += 1 } catch { case _: Exception => () }
      }
    }
    n
  }
}
