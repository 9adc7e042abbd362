package graft.core

import java.nio.file.{Files, Path}
import java.util.stream.{Stream => JStream}

/** Closing wrappers for `Files.walk`/`Files.list` (ADVICE r12 #3):
  * java.nio directory streams hold an open file descriptor until
  * `close()` — relying on GC leaks fds under repeated bench/gate runs.
  * Every directory-stream consumer in the engine goes through these so
  * the close is structural, not a per-site convention.
  */
object DirIO {

  /** `Files.walk(p)` scoped to `f`, closed on exit. */
  def walk[T](p: Path)(f: JStream[Path] => T): T = {
    val s = Files.walk(p)
    try f(s) finally s.close()
  }

  /** `Files.list(p)` scoped to `f`, closed on exit. */
  def list[T](p: Path)(f: JStream[Path] => T): T = {
    val s = Files.list(p)
    try f(s) finally s.close()
  }

  /** Recursive delete (children before parents) — the repo's recurring
    * `Files.walk(...).sorted(reverseOrder)` cleanup idiom, fd-safe. */
  def deleteRecursively(p: Path): Unit = walk(p) { s =>
    s.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => Files.deleteIfExists(q))
  }
}
