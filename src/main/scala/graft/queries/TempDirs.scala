package graft.queries

/** Temp staging roots for the file-stream gates and bench sections,
  * registered for recursive deletion at JVM exit. A query's OUTPUT is
  * read lazily by the caller (Verify/Bench consume the returned frame
  * after the query function returns), so the earliest universally-safe
  * delete is shutdown — and the leak that matters is ACROSS runs (each
  * verify/bench/check round is a fresh JVM, and without this every run
  * left its staged corpus slices + checkpoints under /tmp forever).
  */
object TempDirs {

  private val roots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(p.toFile)
      }
    }, "graft-tempdir-cleanup"))
  }

  /** Create a temp directory deleted (recursively) at JVM exit. */
  def workDir(tag: String): java.nio.file.Path = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(tag)
    roots.add(p)
    p
  }
}
