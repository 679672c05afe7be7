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

  /** Mint the per-PID warehouse path for `role` ("verify" / "bench" /
    * "test") and register its cleanup-at-exit hook. */
  def warehouse(role: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_${role}_${ProcessHandle.current().pid()}"
    val root = java.nio.file.Paths.get(path)
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
