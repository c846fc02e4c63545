package graft

/** Once-per-path JVM shutdown-hook cleanup for per-process scratch
  * directories (built-once artifacts under /tmp, lazy-read roundtrip
  * dirs). Queries return frames that read these paths LAZILY — Verify
  * and Bench materialize them later in the session — so deletion must
  * outlive the query call; a deduplicated exit hook is the pattern, and
  * the dedup matters because query constructors run once per
  * invocation (an unguarded addShutdownHook would grow the JVM's hook
  * set without bound in a long-lived session — a round-14 review
  * finding).
  */
object TmpDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Delete `path` recursively at JVM exit; idempotent per path. */
  def deleteOnExit(path: String): Unit =
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
          f.delete(): Unit
        }
        del(new java.io.File(path))
      }))
}
