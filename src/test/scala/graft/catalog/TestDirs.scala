package graft.catalog

/** Shared temp-fixture-dir helper for specs that materialize a derived
  * fixture (SkewFixtureSpec, NullGenSpec): one recursive-delete
  * implementation, registered once per created dir at JVM exit. */
private[catalog] object TestDirs {

  def rmTree(f: java.io.File): Unit = if (f.exists) {
    val kids = f.listFiles
    if (kids != null) kids.foreach(rmTree)
    f.delete(): Unit
  }

  /** Create a temp dir removed at JVM exit. `prefix` must not contain
    * marker substrings plan-grepping tests assert on (e.g. "skew" —
    * FileScan Locations leak paths into plan strings). */
  def tempDirCleanedAtExit(prefix: String): String = {
    val out = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(out.toFile)))
    out.toString
  }
}
