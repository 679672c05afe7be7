package graft

/** Per-process temporary warehouse directories.
  *
  * Bucketed-table queries (q_join_bucketed and friends) write MANAGED
  * tables, so every entry point gives Spark an absolute per-PID
  * `spark.sql.warehouse.dir` — concurrent runs must not delete/rewrite
  * each other's table files mid-read, and the path must not depend on the
  * invoking CWD. The PID suffix that guarantees single-ownership also
  * means nobody else will ever clean the dir up, so creation and deletion
  * are paired here: the JVM that mints the path registers a shutdown hook
  * that recursively deletes it. (A hook rather than post-`spark.stop()`
  * code: Verify/Bench exit through several paths, including exceptions,
  * and the hook covers them all; single-owner means the delete can never
  * race another live process.)
  */
object TempDirs {

  /** Fastest available scratch base: prefer RAM-backed /dev/shm over
    * java.io.tmpdir when present and writable. The sandbox's /tmp sits on
    * a virtual disk an order of magnitude slower than tmpfs (measured
    * 0.25 vs 2.4 GB/s sequential; worse on the many-small-file shuffle
    * pattern), and scratch here is exactly what a production cluster puts
    * on local NVMe: shuffle/spill files (`spark.local.dir`) and the
    * per-run warehouse. Everything minted under it is per-PID and deleted
    * by the same shutdown hook, so nothing outlives the JVM either way. */
  lazy val fastTmpBase: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
  }

  /** Mint the per-PID warehouse path for `role` ("verify" / "bench" /
    * "test") and register its cleanup-at-exit hook. */
  def warehouse(role: String): String = {
    val path = s"$fastTmpBase/graft_warehouse_${role}_${ProcessHandle.current().pid()}"
    val root = java.nio.file.Paths.get(path)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))
    path
  }

  /** Per-PID `spark.local.dir` (shuffle + spill scratch) on the fast
    * base, cleanup-hooked like [[warehouse]]. Spark deletes its own
    * subdirs on clean `spark.stop()`; the hook covers abnormal exits. */
  def localDir(role: String): String = {
    val path = s"$fastTmpBase/graft_local_${role}_${ProcessHandle.current().pid()}"
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(root)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))
    path
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    try if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach { p: Path => try Files.deleteIfExists(p) catch { case _: Throwable => () } }
      finally walk.close()
    } catch { case _: Throwable => () }
  }
}
