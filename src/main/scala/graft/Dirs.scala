package graft

import java.nio.file.{Files, Path}

/** NIO directory helpers: every `Files.list`/`Files.walk` stream holds
  * an OPEN directory handle until closed, and deleting entries while
  * the stream is still iterating the open directory is
  * platform-dependent behavior. These helpers materialize the listing
  * inside try-with-resources FIRST, then hand back a plain closed list
  * — a long-lived session restarting file streams per graded run must
  * not leak one handle per start. */
object Dirs {

  /** Direct children of `dir`, stream closed before returning. */
  def children(dir: Path): List[Path] = {
    val s = Files.list(dir)
    try {
      val out = List.newBuilder[Path]
      s.forEach(p => out += p)
      out.result()
    } finally s.close()
  }

  /** Recursive listing of `dir`, deepest paths FIRST (delete order),
    * stream closed before returning. */
  def walkDeepestFirst(dir: Path): List[Path] = {
    val s = Files.walk(dir)
    try {
      val out = List.newBuilder[Path]
      s.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(p => out += p)
      out.result()
    } finally s.close()
  }

  /** rm -rf, listing fully materialized (and its handle closed) before
    * the first delete. No-op when `dir` does not exist. */
  def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) walkDeepestFirst(dir).foreach(Files.delete)
}
