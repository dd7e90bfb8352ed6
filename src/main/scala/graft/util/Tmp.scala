package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Local-filesystem temp helpers for query paths that materialize transient
  * store state (e.g. `q_dsir_stream`'s per-invocation KeyedStore). */
object Tmp {

  /** Delete a directory tree, best-effort (a file vanishing mid-walk or an
    * unreadable entry must not fail the query that is merely cleaning up). */
  def deleteRecursively(root: Path): Unit =
    try {
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
        finally walk.close()
      }
    } catch { case _: Throwable => () }

  def deleteRecursively(root: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(root))
}
