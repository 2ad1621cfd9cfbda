package graft.core

/** Per-JVM build-once scratch artifacts for queries whose SEMANTICS
  * include a storage layout (partitioned/sorted/z-ordered/bloom-keyed
  * lakes, variant-encoded parquet): the layout is built ONCE per
  * (kind, fixture dir) per JVM, and every subsequent invocation —
  * including bench iterations 2..n — measures only the READ the query
  * exists to prove, not a whole-table rewrite.
  *
  * Path hygiene (why this replaces ad-hoc `dir.hashCode` paths under
  * the signature-store root):
  *  - keyed by the FULL sanitized fixture path, so two fixture dirs
  *    can never collide the way a 32-bit String.hashCode can;
  *  - the root is pid-scoped, so two concurrent runs over the same
  *    fixture never clobber each other's artifact mid-read, and a
  *    fixture regenerated in place between runs can never be read
  *    through a stale artifact from an earlier process;
  *  - the root is removed on JVM exit (multi-GB ladder copies don't
  *    accumulate in the temp dir).
  *
  * Scale posture: on a real lake these artifacts are the ingest-time
  * layout jobs (partitioning, sort-clustering, bloom embedding) paid
  * once per corpus version; build-once-per-JVM is the local-mode
  * stand-in for exactly that amortization.
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_scratch_" + sys.props.getOrElse("user.name", "anon") +
        "_" + ProcessHandle.current().pid())
    java.nio.file.Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  private val written =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val guards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Return the scratch path for artifact `kind` derived from fixture
    * `dir`, running `build(path)` the first time this JVM asks for it.
    * Per-key locking: two queries building DIFFERENT artifacts don't
    * serialize on each other's Spark jobs. */
  /** The path [[buildOnce]] would use — for specs that inspect the
    * artifact's on-disk layout after the query built it. */
  def pathFor(kind: String, dir: String): String =
    root.resolve(kind + "__" + sanitize(dir)).toString

  def buildOnce(kind: String, dir: String)(build: String => Unit): String = {
    val out = pathFor(kind, dir)
    if (!written.contains(out)) {
      guards.computeIfAbsent(out, _ => new Object).synchronized {
        if (!written.contains(out)) {
          build(out)
          written.add(out)
        }
      }
    }
    out
  }

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]", "_")

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }
}
