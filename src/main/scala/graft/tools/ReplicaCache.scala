package graft.tools

/** Scheme-versioned /tmp replica-dir cache shared by ScaleCurve and
  * SkewCurve (r15 review: the check/wipe logic was duplicated with
  * DIVERGENT delete semantics — one copy followed symlinks). A cached
  * dir is trusted only when its SCHEME marker matches the current
  * scheme id exactly; otherwise it is wiped (symlink-safe: links are
  * unlinked, never followed — SkewCurve symlinks untouched tables to
  * the READ-ONLY base corpus) and rebuilt. The marker is written LAST,
  * so a half-built dir (crash mid-generation) also rebuilds.
  */
private[tools] object ReplicaCache {

  /** Delete `x` recursively without ever following a symlink. */
  private def rm(x: java.io.File): Unit = {
    if (x.isDirectory && !java.nio.file.Files.isSymbolicLink(x.toPath))
      Option(x.listFiles()).foreach(_.foreach(rm))
    x.delete(); ()
  }

  /** Wipe `dir` unless its SCHEME marker holds exactly `schemeId`. */
  def wipeUnlessScheme(dir: java.io.File, schemeId: String): Unit = {
    if (dir.exists()) {
      val marker = new java.io.File(dir, "SCHEME")
      val cur =
        if (marker.isFile)
          new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
        else ""
      if (cur != schemeId) {
        println(s"[replica-cache] wiping stale dir $dir (scheme '$cur' != '$schemeId')")
        rm(dir)
        // fail fast on a partial wipe (open handle, permissions): the
        // caller's per-table existence checks would otherwise KEEP the
        // surviving old-scheme tables, regenerate the rest, and stamp
        // the new scheme over a mixed dir — poisoning every later run
        require(!dir.exists(),
          s"could not fully remove stale replica dir $dir — remove it manually")
      }
    }
  }

  /** Stamp the marker after EVERY table of the dir has been generated. */
  def stampScheme(dir: java.io.File, schemeId: String): Unit = {
    java.nio.file.Files.write(
      new java.io.File(dir, "SCHEME").toPath, schemeId.getBytes("UTF-8"))
    ()
  }
}
