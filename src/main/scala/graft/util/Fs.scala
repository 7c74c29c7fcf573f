package graft.util

/** Tiny local-FS helpers shared by scratch-dir cleanup, index lifecycle
  * ops, and specs — one recursive-delete implementation instead of a
  * copy per call site (symlink/failure-handling fixes land everywhere). */
object Fs {
  /** Delete `f` and everything under it; no-op when absent. */
  def deleteRecursively(f: java.io.File): Unit = if (f.exists()) {
    val cs = f.listFiles
    if (cs != null) cs.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
