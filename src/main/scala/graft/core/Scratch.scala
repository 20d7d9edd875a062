package graft.core

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicBoolean

/** Process-wide scratch-directory manager for queries that need a local
  * interchange directory (JSONL/ORC/CSV round-trips).
  *
  * One directory per key, reused across invocations (batch writers run with
  * `mode("overwrite")`, so reuse replaces rather than accumulates; the one
  * accumulating caller — the append-mode stream sink, which keys epochs to
  * per-batch subdirectories — calls [[clearDir]] at run start so a reused
  * key never resurrects a prior run's epochs), and ONE
  * JVM shutdown hook for all of them — a long-lived session that invokes the
  * round-trip queries repeatedly neither leaks corpus-sized copies in /tmp
  * nor registers an unbounded number of hooks.
  */
object Scratch {

  private val dirs = scala.collection.concurrent.TrieMap.empty[String, Path]
  private val hookInstalled = new AtomicBoolean(false)

  /** Stable scratch dir for `key`; created lazily, reclaimed at JVM exit. */
  def dir(key: String): String = {
    if (hookInstalled.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        dirs.values.foreach(p => scala.util.Try(deleteRecursively(p)))))
    }
    dirs.getOrElseUpdate(key, Files.createTempDirectory(s"graft-$key")).toString
  }

  /** Empty `dir`'s contents without removing the directory itself (the
    * registry caches the Path, so the mapping stays valid). Append-mode
    * stream sinks call this at run start: they accumulate per-batch epoch
    * subdirectories rather than overwriting, so a reused key must not read
    * back a prior invocation's epochs.
    */
  def clearDir(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (Files.isDirectory(root)) {
      val children = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        children.iterator().asScala.toSeq.foreach(deleteRecursively)
      } finally children.close()
    }
  }

  def deleteRecursively(root: Path): Unit = {
    val walk = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse
        .foreach(p => scala.util.Try(Files.deleteIfExists(p)))
    } finally walk.close()
  }
}
