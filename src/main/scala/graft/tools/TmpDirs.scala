package graft.tools

/** Per-JVM scratch directories for catalog entries that materialize an
  * on-disk artifact mid-plan (the partitioned ANN index, the CSV/ORC
  * round-trips). Keyed on the JVM (pid@host), NOT the Spark
  * applicationId: Bench recycles sessions inside one JVM, and a per-app
  * path would leak one directory per recycle block per run (r9 advice).
  * Concurrent JVMs (gate + bench, forked test runners) still get
  * distinct roots, which is all the isolation the old per-app key was
  * buying; entries inside one JVM run sequentially and write
  * mode("overwrite"). The whole root is removed by a JVM shutdown hook,
  * so nothing accumulates across runs either.
  */
object TmpDirs {
  private lazy val root: java.nio.file.Path = {
    val jvm = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-scratch-$jvm")
    java.nio.file.Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }

  /** Absolute path of a named scratch location under the per-JVM root
    * (the caller's writer creates it; `overwrite` mode handles reuse).
    */
  def path(name: String): String = root.resolve(name).toString
}
