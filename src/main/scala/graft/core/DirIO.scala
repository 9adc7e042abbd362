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

  /** Scratch root for engine-internal ephemeral state (streaming
    * checkpoints, staged stream sources, bench scratch): tmpfs when
    * available, java.io.tmpdir otherwise — the round-12 q60 staging
    * lesson (Multimodal.stageRoot) generalized in round 15. Streaming
    * micro-batches pay REAL filesystem latency per batch (offset WAL +
    * commit log + one state-store delta file per shuffle partition, all
    * rename-committed), so on a disk-backed /tmp the gate's measured
    * wall is partly the host's disk weather; on tmpfs the same code
    * path runs at memory speed and the timed span measures the engine.
    * Production note: on a cluster the checkpoint store is a durability
    * choice (HDFS/S3), not a latency accident of the driver box — this
    * helper only chooses where LOCAL ephemeral state lands. */
  def scratchDir(prefix: String): Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm))
      Files.createTempDirectory(Files.createDirectories(
        shm.resolve("graft-scratch")), prefix)
    else Files.createTempDirectory(prefix)
  }
}
