package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Cross-session fixture discipline shared by the queries that amortize a
  * derived layout under the shared `java.io.tmpdir` (bucketed/clustered
  * layouts, the d_incremental band index, streaming landings, the
  * pipeline snapshot pointer): build in a unique scratch, key the
  * published path on a CONTENT fingerprint of the source data, publish by
  * atomic rename.
  *
  * The fingerprint key is what makes the fixtures safe against in-place
  * source regeneration (MakeSf's wipe-and-rebuild of a testdata dir):
  * regenerated data changes the fingerprint, so the stale fixture is
  * simply never addressed again — no manual version-suffix bump needed,
  * no stale-data window until an oracle run happens to notice.
  */
object Fixtures {

  /** Content fingerprint of a source path (recursive name+size+mtime
    * hash) — cheap (metadata only, no data read) but changes whenever the
    * source is rewritten, which is exactly the invalidation event. */
  private[graft] def fingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk) else Seq(f)
    val desc = walk(new java.io.File(path))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5").digest(desc.getBytes("UTF-8"))
    md.take(8).map("%02x".format(_)).mkString
  }

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** `<prefix>_<fp>` for a fixture derived from `sources`, REAPING any
    * sibling `<prefix>_*` with a different fingerprint first: a
    * superseded fixture (its source regenerated in place) is not just
    * never addressed again — it is deleted, so repeated regen cycles
    * cannot strand one full derived layout per cycle under the shared
    * /tmp until ENOSPC. The reap is best-effort (a concurrent OLD-session
    * reader of a stale fixture loses it — the same exposure the previous
    * overwrite-in-place behavior had; rounds on this host are
    * sequential). `prefix` must be an absolute path whose basename is
    * unique to the fixture kind. */
  private[graft] def fingerprintedPath(prefix: String, sources: Seq[String]): String = {
    val fp = sources.map(fingerprint).mkString
    val dir = Paths.get(prefix).getParent.toFile
    val base = Paths.get(prefix).getFileName.toString
    // Stale = same base, then EXACTLY a fingerprint-shaped hex run of this
    // key's length that differs from the current fp (an optional non-hex
    // suffix after it — PipelineQ's ".path" pointer — rides along). The
    // exact shape matters twice: a caller-appended suffix on the CURRENT
    // path must survive its own reap, and a fixture KIND that extends
    // another kind's name ("stream_sessions" vs "stream_sessions_t", with
    // Verify running both queries concurrently) must never be reaped by
    // its prefix sibling — its continuation is not a hex run.
    val hexLen = sources.size * 16
    def hexRun(s: String): Int = s.takeWhile(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')).length
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        f.getName.startsWith(base + "_") && {
          val rest = f.getName.drop(base.length + 1)
          hexRun(rest) == hexLen && !rest.startsWith(fp)
        }
      }
      .foreach(f => try deleteRecursively(f) catch { case _: Exception => () })
    s"${prefix}_$fp"
  }

  /** Publish a fully-built scratch dir to `target` with POSIX rename(2)
    * semantics: `ATOMIC_MOVE` onto an existing non-empty directory FAILS
    * (no copy-into-child fallback, unlike Hadoop LocalFileSystem rename),
    * so racing builders are strictly first-wins and the loser deletes its
    * scratch. Permissions are widened before the publish because
    * `createTempDirectory` makes 0700 dirs and the target lives under the
    * shared /tmp (another OS user must be able to READ a published
    * fixture; the path is user-keyed so they never need to write it).
    *
    * Failure discipline: the scratch is deleted ONLY when the target
    * verifiably exists (someone won the race). A move failure with no
    * published target — e.g. `AtomicMoveNotSupportedException` on an
    * overridden non-POSIX tmpdir — falls back to a plain move, and if
    * that also fails the ORIGINAL error is rethrown: the one wrong answer
    * is silently discarding the only copy and letting the caller fail
    * later with a misleading missing-path read error. */
  private[queries] def publishDir(build: Path, target: String): Unit = {
    import java.nio.file.attribute.PosixFilePermissions
    def widen(f: java.io.File): Unit = {
      try Files.setPosixFilePermissions(f.toPath, PosixFilePermissions.fromString(
        if (f.isDirectory) "rwxr-xr-x" else "rw-r--r--"))
      catch { case _: Exception => () }
      if (f.isDirectory) // recurse: nested dirs (partitioned layouts) too
        Option(f.listFiles()).getOrElse(Array.empty).foreach(widen)
    }
    try widen(build.toFile)
    catch { case _: UnsupportedOperationException => () } // non-POSIX fs
    val dest = Paths.get(target)
    try Files.move(build, dest, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: java.nio.file.FileSystemException =>
      if (Files.exists(dest)) deleteRecursively(build.toFile) // lost the race
      else {
        try Files.move(build, dest) // atomic unsupported: plain move, fresh target
        catch { case _: java.nio.file.FileSystemException =>
          if (Files.exists(dest)) deleteRecursively(build.toFile) // raced mid-fallback
          else throw e
        }
      }
    }
  }
}
