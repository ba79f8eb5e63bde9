package graft.engine

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Shared recursive delete — ONE implementation per package (r14 review:
  * [[GramArtifactStore]] had re-grown a private copy of [[Catalog]]'s
  * that silently swallowed every exception and never closed the
  * `Files.walk` stream).
  *
  * `bestEffort = false` fails loudly on the first undeletable entry (the
  * [[Catalog]] GC semantics — a failed delete is a real finding there);
  * `bestEffort = true` skips undeletable entries and keeps going (the
  * artifact-store eviction semantics — a live reader may hold the files,
  * and the next sweep retries whatever survived). The walk stream is
  * closed on every path. */
private[graft] object Fs {
  def deleteTree(p: Path, bestEffort: Boolean = false): Unit = {
    if (!Files.exists(p)) return
    // best-effort covers the WALK too, not just per-file deletes: a
    // concurrent sweep can remove entries mid-traversal, surfacing as an
    // IOException from the Files.walk OPEN (outside the per-file catch)
    // or an UncheckedIOException from the iterator (not an IOException
    // at all) — either escaping would fail a commit AFTER its manifest
    // already flipped (r14 review)
    def walk(): Unit = {
      val walked = Files.walk(p)
      try walked.iterator().asScala.toSeq.reverse.foreach { f =>
        if (bestEffort)
          try Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () }
        else Files.delete(f)
      } finally walked.close()
    }
    if (bestEffort)
      try walk()
      catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException => ()
      }
    else walk()
  }
}
