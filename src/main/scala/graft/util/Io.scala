package graft.util

import java.nio.file.{Files, Paths}

/** Small driver-side filesystem helpers for the export/eval harnesses. */
object Io {

  /** Delete a directory tree if it exists (closes the walk stream —
    * `Files.walk` holds an open directory handle). */
  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }
}
