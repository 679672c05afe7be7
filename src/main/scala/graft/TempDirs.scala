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
    * by the same shutdown hook, so nothing outlives the JVM either way.
    *
    * Guard rails (ADVICE r13): /dev/shm is chosen only when it has real
    * capacity — Docker's default shm mount is 64 MB, and a tmpfs that
    * small would ENOSPC the first shuffle spill and hard-fail bench,
    * verify, and the test suite. The sf0.1 suite's peak concurrent
    * scratch (shuffle files + spill + warehouse) measures well under
    * 2 GB, so we require 4 GB usable as the threshold. `GRAFT_TMP_BASE`
    * overrides everything (set it to a disk path on memory-tight hosts:
    * spilling to tmpfs consumes RAM exactly when Spark spills because
    * memory is tight). */
  lazy val fastTmpBase: String = {
    sys.env.get("GRAFT_TMP_BASE").filter { p =>
      val f = new java.io.File(p); f.isDirectory && f.canWrite
    }.getOrElse {
      val shm = new java.io.File("/dev/shm")
      val minUsable = 4L * 1024 * 1024 * 1024
      if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minUsable) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    }
  }

  /** Reap scratch left by DEAD graft JVMs (r14). The shutdown hook
    * cannot run on SIGKILL (OOM killer, task timeouts), and on a
    * RAM-backed base the leak is severe: one killed 24 GB bench run
    * strands its whole shuffle/warehouse footprint in /dev/shm until
    * reboot — measured this session at 101 GB resident, enough to push
    * the box into swap and read as "box degradation" in every later
    * bench. Deletes only dirs matching our own naming scheme
    * (`graft_<kind>_<role>_<pid>`) whose minting PID is no longer alive;
    * live runs are never touched. Runs once per JVM, at first mint. */
  private lazy val reapStale: Unit = {
    val Named = """graft_(?:warehouse|local)_[A-Za-z]+_(\d+)""".r
    val self = ProcessHandle.current().pid()
    // reap every base this JVM might mint under (incl. the extra
    // GRAFT_SCRATCH_DIRS bases — a killed multi-dir scale run strands
    // scratch on all of them)
    val bases = (fastTmpBase +: sys.env.get("GRAFT_SCRATCH_DIRS")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)).distinct
    bases.foreach { b =>
      Option(new java.io.File(b).listFiles()).getOrElse(Array.empty).foreach { f =>
        f.getName match {
          case Named(pid) if pid.toLong != self &&
              !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) =>
            deleteRecursively(f.toPath)
          case _ => ()
        }
      }
    }
  }

  /** Mint the per-PID warehouse path for `role` ("verify" / "bench" /
    * "test") and register its cleanup-at-exit hook.
    *
    * `SPARK_GRAFT_WAREHOUSE_DIR` (r16, scale-sweep knob): a PERSISTENT
    * warehouse path used verbatim — no PID suffix, no delete hook. The
    * local analog of day-0 standing tables living on durable storage: at
    * scale SFs one JVM cannot hold the construction pass's shuffle AND
    * the serve pass's scratch (the 1000× cluster_incremental serve
    * attempts were kernel-OOM/ENOSPC-bounded all through r15-s2 and
    * r16), but with the standing tables persisted across JVMs the
    * construction run and the serve-timing run each get the whole
    * scratch envelope. Single-owner discipline is the caller's:
    * concurrent JVMs sharing one warehouse race their managed-table
    * writes. Recorded next to any number it produces. */
  def warehouse(role: String): String =
    sys.env.get("SPARK_GRAFT_WAREHOUSE_DIR").filter(_.nonEmpty).getOrElse {
      reapStale
      val path = s"$fastTmpBase/graft_warehouse_${role}_${ProcessHandle.current().pid()}"
      val root = java.nio.file.Paths.get(path)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))
      path
    }

  /** Per-PID `spark.local.dir` (shuffle + spill scratch) on the fast
    * base, cleanup-hooked like [[warehouse]]. Spark deletes its own
    * subdirs on clean `spark.stop()`; the hook covers abnormal exits.
    *
    * `GRAFT_SCRATCH_DIRS` (r15 s2, scale-sweep knob): a comma-separated
    * list of bases — mints one per-PID dir under EACH and returns the
    * comma-joined list, which `spark.local.dir` round-robins blocks
    * across exactly as a cluster node does its local disks. Exists for
    * the single-box ScaleGen envelope runs where one medium alone cannot
    * hold the live shuffle working set (1000× ngram_jaccard needs
    * >107 GB: tmpfs has 126 GB total RAM shared with the JVM, the
    * virtual disk has ~60 GB free — together they hold it). Recorded
    * next to any number it produces, like the shuffle-partitions knob. */
  def localDir(role: String): String = {
    reapStale
    val bases = sys.env.get("GRAFT_SCRATCH_DIRS")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .getOrElse(Seq(fastTmpBase))
    bases.map { b =>
      val path = s"$b/graft_local_${role}_${ProcessHandle.current().pid()}"
      val root = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(root)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))
      path
    }.mkString(",")
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
