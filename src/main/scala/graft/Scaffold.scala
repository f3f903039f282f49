package graft

/** Shared scaffolding for per-JVM derived stores (staged stream splits,
  * at-rest index copies): source content fingerprints for cache keys and
  * an exit-time cleanup registry. One implementation — the fingerprint
  * rule and the recursive delete must not drift between the caches that
  * rely on them. */
private[graft] object Scaffold {

  /** Content fingerprint of a parquet file or directory: sorted part
    * names with lengths and mtimes. Cheap (a directory listing), and any
    * rewrite — even same-size — bumps an mtime. */
  def fingerprint(path: String): String = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName) else Seq(f)
    files.map(x => s"${x.getName}:${x.length}:${x.lastModified}").mkString("|")
  }

  private val cleanupDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    cleanupDirs.forEach(d => deleteRecursively(new java.io.File(d)))
  }))

  /** Register a scaffolding temp dir for JVM-exit removal. Register the
    * dir IMMEDIATELY after creating it — before any racy cache insert —
    * so a thread that loses a cache race still gets its orphan cleaned. */
  def cleanupOnExit(dir: String): String = { cleanupDirs.add(dir); dir }

  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }
}
