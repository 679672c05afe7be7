package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional args: query-name filter (dev micro-benchmarking only; the
    // driver invokes with no args and times the full suite). Two forms:
    //   tools/run.sh graft.Bench --only q_a,q_b   (isolated-run protocol)
    //   tools/run.sh graft.Bench q_a q_b          (positional, same effect)
    // Isolated runs are the regression-diagnosis primitive: full-suite
    // position inflates individual timings up to 5x (BASELINE.md r11 note).
    val wanted: Set[String] = args.toSeq match {
      case Seq("--only", csv) => csv.split(',').map(_.trim).filter(_.nonEmpty).toSet
      case other              => other.toSet
    }
    val unknown = wanted -- SparkEntry.queries.keySet
    if (unknown.nonEmpty)
      System.err.println(s"[bench] WARNING: unknown query keys ignored: ${unknown.toSeq.sorted.mkString(",")}")
    val onlyQueries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (wanted.nonEmpty) SparkEntry.queries.filter { case (k, _) => wanted.contains(k) }
      else SparkEntry.queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Scale-measurement knob (r15): shuffle parallelism defaults to the
    // thread count (the driver's bench contract), but ScaleGen sweeps may
    // override it — at ≥300× the per-task working set under 32 partitions
    // crosses the task-memory envelope (sorts spill, hash builds OOM),
    // which measures the fixed local harness, not the plan. A real
    // cluster sizes shuffle partitions to data volume; the sweep does the
    // same via SPARK_GRAFT_SHUFFLE_PARTITIONS, recorded next to any
    // number it produces.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // Validated BEFORE Spark startup (ADVICE r15): a non-numeric or <1
    // value would otherwise surface only after warmup has already run, as
    // NumberFormatException or an empty-sequence .min in the timed loop.
    val benchRuns = {
      val raw = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2")
      val n = try raw.toInt catch {
        case _: NumberFormatException =>
          sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an integer >= 1, got '$raw'")
      }
      require(n >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $n")
      n
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      // absolute per-PID warehouse, deleted by a shutdown hook (TempDirs)
      .config("spark.sql.warehouse.dir", TempDirs.warehouse("bench"))
      // shuffle/spill scratch on the fast (RAM-backed when available)
      // base — the local-mode analog of local NVMe (TempDirs.fastTmpBase)
      .config("spark.local.dir", TempDirs.localDir("bench"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/FS caches are infrastructure, not query
    // cost — without this the first-listed query absorbs ~4s of startup.
    graft.tables.Tables.names.foreach { t =>
      try {
        val df = if (t == "events") graft.tables.Tables.events(spark, sfDir)
          else graft.tables.Tables.table(spark, sfDir, t)
        df.count()
      } catch { case _: Throwable => () }
    }
    // per-query warmup at the smallest SF: compiles every whole-stage
    // codegen unit (Janino caches by generated source, which depends on
    // plan shape, not data volume), so the timed loop below measures
    // steady-state query execution rather than one-off JIT compilation.
    // warmDir derives from the bench dir (sibling sf0.001, or SPARK_GRAFT
    // _WARM_DIR override); whether warmup ran is logged so warm and cold
    // runs are never silently conflated.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      new java.io.File(sfDir).getParent + "/sf0.001")
    val warmed = new java.io.File(warmDir).isDirectory
    if (warmed)
      onlyQueries.foreach { case (_, fn) =>
        // drop the warmup execution's materialize pins immediately — the
        // timed loop must start without dead pins (see the cleanup note
        // below). PinScope releases only pins this execution created.
        PinScope.scoped(spark) {
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
      }
    System.err.println(
      if (warmed) s"[bench] per-query warmup ran at $warmDir (warm protocol)"
      else s"[bench] warmup SKIPPED: $warmDir absent (cold protocol — not comparable to warm-protocol numbers)")
    // target-SF warmup pass (r16, VERDICT r15 #1a): ONE untimed execution
    // of every query at sfDir before the timed loop. Builds every standing
    // table / scalar manifest at the BENCH SF (the sf0.001 warmup above
    // only built them for warmDir — run 1 of the timed loop was absorbing
    // the day-0 standing builds plus their page-cache/GC pressure, which
    // best-of-2's min() hides from the number but not from the box), so
    // both timed runs measure steady-state execution. Gated off for
    // single-run ScaleGen sweeps (SPARK_GRAFT_BENCH_RUNS=1), where the
    // extra pass would double peak scratch — exactly what that knob
    // exists to halve; override either way with SPARK_GRAFT_WARM_TARGET.
    val warmTarget = sys.env.getOrElse("SPARK_GRAFT_WARM_TARGET",
      if (benchRuns >= 2) "1" else "0") == "1"
    if (warmTarget) {
      onlyQueries.foreach { case (_, fn) =>
        PinScope.scoped(spark) {
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
        }
      }
      // release the warmup pass's shuffle files before the timed loop:
      // ContextCleaner reaps shuffles only when their job objects are
      // GC'd, and at scale SFs the construction pass's shuffle footprint
      // lingering into the timed runs is exactly the r15-s2 ENOSPC
      // mechanism. Untimed, and GC does not touch Spark-managed caches.
      System.gc()
      Thread.sleep(2000)
    }
    System.err.println(
      if (warmTarget) s"[bench] target-SF warmup pass ran at $sfDir (standing tables pre-built)"
      else s"[bench] target-SF warmup pass skipped")
    // best-of-2 per query: the per-round driver machine carries external
    // load (r6 driver numbers ran ~2× idle medians on the heavy queries);
    // the min of two back-to-back runs discards one-off scheduler stalls
    // while still timing real steady-state execution.
    // Between-execution cleanup, OUTSIDE the timed window: queries pin
    // intermediates via Layout.materialize (localCheckpoint), and those
    // blocks outlive the query — over 208×2 executions the block manager
    // accumulates hundreds of dead pinned RDDs, squeezing execution
    // memory and inflating the late-suite heavy queries 2-4× vs their
    // isolated runs (measured: q_graph_pagerank 1.45 s isolated vs
    // 3.5-7 s late-suite before this hook). Each execution rebuilds its
    // own pins (standing tables are parquet, not cached), so dropping
    // each execution's OWN pins between executions changes no result and
    // models what independent per-query sessions would see. PinScope
    // scopes the release to pins the execution created (ADVICE r13), so
    // a future session-lived cache would survive the sweep.
    // Scale-sweep knob (r15 s2): best-of-N executions, default 2 (the
    // driver contract above). At 1000× ScaleGen a single execution's
    // shuffle files are ~60 GB on RAM-backed scratch, and the session's
    // lazy ContextCleaner does not reclaim execution 1's files before
    // execution 2 needs the space — best-of-2 doubles peak scratch and
    // the kernel OOM-kills the JVM (tmpfs pages are unreclaimable).
    // SPARK_GRAFT_BENCH_RUNS=1 halves peak scratch for the single-box
    // envelope runs; recorded next to any number it produces (like the
    // shuffle-partitions knob).
    // (benchRuns parsed and validated above, before Spark startup)
    // The catch keeps one broken query from killing a 214-query sweep,
    // but a swallowed failure must never read as a timing (r16: a 1000×
    // ENOSPC-aborted execution was recorded as a 650 s "result" — the
    // number was time-to-failure). Failures log loudly per execution,
    // and a query whose EVERY execution threw is flagged in the summary
    // line's "failed" field so no protocol can mistake its number.
    val outcomes = onlyQueries.map { case (name, fn) =>
      def once(): (Double, Boolean) = PinScope.scoped(spark) {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] EXECUTION FAILED $name: " +
              e.toString.linesIterator.next())
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val runs = (1 to benchRuns).map(_ => once())
      val good = runs.filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) good.min else runs.map(_._1).min, good.nonEmpty)
    }
    val failed = outcomes.collect { case (n, (_, false)) => n }.toSeq.sorted
    val results = outcomes.map { case (n, (t, _)) => n -> t }
    // 3-decimal seconds keep the whole line (~110 queries) inside the
    // driver's tail-capture window — full-precision doubles overflowed it
    // in round 4 and truncated the per-query map to its last ~68 entries.
    def s3(v: Double): String = f"$v%.3f"
    // The driver keeps the TAIL of stdout, so when the line does overflow
    // it loses entries from the FRONT (r4: 68/108 survived; r8: 78/135).
    // Emit the map fastest-first so what truncation eats is the sub-0.1s
    // noise floor and the slowest — forensically useful — queries sit at
    // the surviving end, whatever the capture-window size.
    val byTime = results.toSeq.sortBy(_._2)
    val qs = byTime.map { case (k, v) => s"\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Compact slowest-25 line (~700 bytes) emitted near the end of stdout:
    // guaranteed inside any plausible tail window, so per-query regression
    // forensics on the heavy queries never depends on the long line at all.
    val top25 = byTime.takeRight(25).reverse
      .map { case (k, v) => s"\"" + k + "\":" + s3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"top25_slowest","queries":$top25,"sf":"$sfDir"}""")
    // Also persist to a file: the driver captures only the tail of stdout,
    // which truncated the per-query map to ~68/108 entries in round 4 and
    // 86/108 in round 5 — the file copy keeps round-over-round per-query
    // diffs complete regardless of capture-window size.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full JSON written to $out")
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    // Short summary LAST: the driver's tail-capture truncated the long
    // line from the front in rounds 5-6, losing the leading "total" field
    // (BENCH_r0{5,6}.json parsed: null). This line is ~120 bytes, so
    // whatever the capture window, the headline number survives.
    // protocol reflects what actually ran (r15 s2 — the string was
    // hardcoded "warm,best-of-2" and misreported cold/single-run sweeps)
    val protocol = (if (warmed) "warm" else "cold") +
      (if (warmTarget) "+target" else "") + s",best-of-$benchRuns"
    val failedField =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // The driver's round-over-round comparator reads the per-query map
    // from THIS final line (PERF_r16: per_query {} both rounds — it parses
    // only the last JSON line, and the capture window is 2000 chars, so
    // the full 214-entry map physically cannot ride here). Emit the
    // slowest-K entries, K chosen so the whole line stays ≤ ~1600 bytes:
    // the final line then always survives the tail window intact AND
    // carries the queries that matter for regression grading. The full
    // map still prints above (fastest-first) and persists to
    // target/bench.json.
    val budget = 1600 -
      (s"""{"metric":"total","value":${s3(total)},"unit":"sec","nqueries":${results.size},"protocol":"$protocol"$failedField,"queries":{},"sf":"$sfDir"}""").length
    val slowFirst = byTime.reverse
    val keep = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    slowFirst.foreach { case (k, v) =>
      val ent = s"\"" + k + "\":" + s3(v)
      if (used + ent.length + 1 <= budget) { keep += ent; used += ent.length + 1 }
    }
    val tailQs = keep.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","nqueries":${results.size},"protocol":"$protocol"$failedField,"queries":$tailQs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
