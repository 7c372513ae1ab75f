package graft

/** One per-JVM scratch root for every transient artifact (model exports,
  * source/sink round-trip dirs, Derby homes). A fresh
  * `createTempDirectory` per call sites leaked a directory per
  * invocation across bench passes / verify sweeps / test runs; here
  * everything nests under a single root that a shutdown hook removes
  * recursively when the JVM exits.
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r.toFile)))
    r
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh empty directory under the per-JVM root. */
  def dir(name: String): String = {
    val d = root.resolve(s"$name-${counter.incrementAndGet()}")
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** A fresh path that does NOT yet exist (Derby insists on creating
    * its database directory itself).
    */
  def path(name: String): String =
    root.resolve(s"$name-${counter.incrementAndGet()}").toString
}
