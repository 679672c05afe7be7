package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming._

/** SURVEY.md §2.8 remaining s_* rows: the allowed-lateness semantic gap
  * (s_late_side_output), the pluggable embedding UDF stub (s_embed_udf),
  * and the console debug sink (s_sink_console). */
class LateDataSpec extends SparkTestBase {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)
  private def ev(id: Long, min: Int, typ: String = "view"): Event =
    Event(id, ts(min), 1L, typ, 1.0)

  test("s_late_side_output: update mode emits revisions for late-but-within-" +
    "watermark rows (Spark's nearest analog to allowedLateness)") {
    // Spark has no per-row late side output; the documented mapping is:
    // update output mode re-emits a window's row whenever late data revises
    // it, until the watermark finally closes the window. This pins that
    // revision behavior.
    val in = MemoryStream[Event]
    val sink = "late_upd"
    val q = in.toDF().withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    try {
      in.addData(ev(1, 65), ev(2, 80))     // window [60,120): n=2
      q.processAllAvailable()
      in.addData(ev(3, 70))                // late vs max ts but within watermark → revision n=3
      q.processAllAvailable()
      val revisions = spark.table(sink).as[(Long, String, Long)].collect()
        .filter(_._1 == 3600L).map(_._3).sorted.toSeq
      assert(revisions === Seq(2L, 3L), "update mode must emit both the original and the revision")
    } finally q.stop()
  }

  test("s_late_side_output: true allowedLateness analog — on-time fire, " +
    "late refire within lateness, side output beyond, state purged") {
    // Flink: window [360,420) min, ooo=10m, allowedLateness=30m.
    // Flink wm = maxTs - 10m; fire at wm >= 420m-1ms; refire per late
    // element until wm >= 450m-1ms; later elements -> side output.
    val W = 3600000L
    val in = MemoryStream[Event]
    val sink = "late_true"
    val q = StreamOps.allowedLatenessCounts(in.toDS(),
        oooMs = 10 * 60000L, latenessMs = 30 * 60000L, windowMs = W,
        sideHorizonMs = 2 * 3600000L)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    def emits(): Seq[LateWindowEmit] =
      spark.table(sink).as[LateWindowEmit].collect()
        .filter(_.win_start == 360L * 60000L).toSeq
    try {
      // window [360,420): two on-time elements (no firing yet — wm behind)
      in.addData(ev(1, 365), ev(2, 380))
      q.processAllAvailable()
      assert(emits().isEmpty, "window must not fire before the watermark passes its end")
      // probe pushes Flink wm to 425m (>= 420m): on-time fire with n=2
      in.addData(ev(100, 435, "probe"))
      q.processAllAvailable()
      assert(emits() === Seq(LateWindowEmit("view", 360L * 60000L, "on_time", 2L, 2.0, -1L)))
      // late element at 370m with wm=425m: within lateness (< 450m) -> refire n=3
      in.addData(ev(3, 370))
      q.processAllAvailable()
      assert(emits().count(_.emit_kind == "late_update") === 1)
      assert(emits().filter(_.emit_kind == "late_update").head.n === 3L)
      // probe pushes Flink wm to 455m (>= 450m): lateness expires, state purged
      in.addData(ev(101, 465, "probe"))
      q.processAllAvailable()
      // element at 375m now: too late even for lateness -> side output row
      in.addData(ev(4, 375))
      q.processAllAvailable()
      val side = emits().filter(_.emit_kind == "side_output")
      assert(side === Seq(LateWindowEmit("view", 360L * 60000L, "side_output", 0L, 1.0, 4L)))
      // and NO new late_update: the purge is real, not just a tag change
      assert(emits().count(_.emit_kind == "late_update") === 1)
      assert(emits().count(_.emit_kind == "on_time") === 1)
    } finally q.stop()
  }

  test("s_late_side_output: window state, fired flag, and cleanup timer " +
    "survive stop/restart (transformWithState checkpoint recovery)") {
    // restart lands between the on-time fire and the late refire: the
    // refire must see the restored (n, sum, fired) register, and the purge
    // must come from the PRE-restart cleanup timer.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_late").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_late_out").toString
    val in = MemoryStream[Event]
    def start() = StreamOps.allowedLatenessCounts(in.toDS(),
        oooMs = 10 * 60000L, latenessMs = 30 * 60000L, windowMs = 3600000L,
        sideHorizonMs = 2 * 3600000L)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def emits(): Seq[LateWindowEmit] =
      spark.read.parquet(outDir).as[LateWindowEmit].collect()
        .filter(_.win_start == 360L * 60000L).toSeq
    val q1 = start()
    in.addData(ev(1, 365), ev(2, 380))
    q1.processAllAvailable()
    in.addData(ev(100, 435, "probe")) // wm -> on-time fire n=2, timers armed
    q1.processAllAvailable(); q1.stop()
    assert(emits() === Seq(LateWindowEmit("view", 360L * 60000L, "on_time", 2L, 2.0, -1L)))
    in.addData(ev(3, 370))            // late refire must see restored n=2+fired
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(emits().filter(_.emit_kind == "late_update")
        === Seq(LateWindowEmit("view", 360L * 60000L, "late_update", 3L, 3.0, -1L)),
        "restored window register must fold the pre-restart elements")
      in.addData(ev(101, 465, "probe")) // pre-restart cleanup timer purges
      q2.processAllAvailable()
      in.addData(ev(4, 375))            // post-purge -> side output
      q2.processAllAvailable()
      assert(emits().filter(_.emit_kind == "side_output").map(_.late_event_id) === Seq(4L))
      assert(emits().count(_.emit_kind == "late_update") === 1,
        "post-purge arrival must not refire — the purge timer survived the restart")
    } finally q2.stop()
  }

  test("s_late_side_output: settled allowedLateness frame equals the batch " +
    "tumble over replayed real events (lateness covering the corpus span)") {
    // Replay sf0.001 events in three ROUND-ROBIN slices: slice 1's max ts
    // drives the watermark near the corpus end, so slices 2-3 arrive almost
    // entirely late and exercise the refire path on real data. Lateness is
    // sized to the corpus span, so nothing is side-output or purged before
    // settling, and the per-window FINAL emission must equal the batch
    // tumble exactly (counts) / to float tolerance (sums fold in a
    // different order than the batch agg).
    val W = 3600000L
    val dir = sf("sf0.001")
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val minT = evs.head.ts.getTime; val maxT = evs.last.ts.getTime
    val maxWinEnd = (Math.floorDiv(maxT, W) + 1L) * W
    val latenessMs = maxWinEnd - Math.floorDiv(minT, W) * W + 2L * W
    val batch = evs.groupBy(e => (e.event_type, Math.floorDiv(e.ts.getTime, W) * W))
      .map { case (k, es) => k -> (es.size.toLong, es.map(_.value).sum) }
    val in = MemoryStream[Event]
    val sink = "late_settle"
    val q = StreamOps.allowedLatenessCounts(in.toDS(),
        oooMs = 10 * 60000L, latenessMs = latenessMs, windowMs = W,
        sideHorizonMs = W)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      (0 until 3).foreach { slice =>
        in.addData(evs.zipWithIndex.collect { case (e, i) if i % 3 == slice => e }.toSeq)
        q.processAllAvailable()
      }
      // final probe: wm past every window END but short of every purge
      // horizon (lateness > span + W guarantees the gap), so each window
      // fires exactly once and no fire races its own purge in one batch
      in.addData(Event(-1L, new Timestamp(maxWinEnd + 10 * 60000L + W), 0L, "probe", 0.0))
      q.processAllAvailable()
      val emitted = spark.table(sink).as[LateWindowEmit].collect()
        .filter(e => e.event_type != "probe")
      assert(emitted.forall(_.emit_kind != "side_output"),
        "lateness covers the corpus span — nothing may be side-output")
      assert(emitted.exists(_.emit_kind == "late_update"),
        "round-robin slices must exercise the late refire path")
      val settled = emitted.groupBy(e => (e.event_type, e.win_start))
        .map { case (k, es) => k -> es.maxBy(_.n) }
      assert(settled.keySet === batch.keySet, "window key sets diverge from batch")
      batch.foreach { case (k, (n, sum)) =>
        assert(settled(k).n === n, s"count diverges from batch tumble at $k")
        assert(math.abs(settled(k).sum_value - sum) <= 1e-6 * math.max(1.0, math.abs(sum)),
          s"sum diverges from batch tumble at $k")
      }
    } finally q.stop()
  }

  test("s_embed_udf: pluggable embedding surface with a deterministic stub") {
    // The production surface is udf(text => model.encode(text)); offline the
    // encoder is a STUB: a seeded hash-ngram embedder. Deterministic, fixed
    // dim, unit-norm — the properties downstream similarity ops rely on.
    val dim = 16
    val embed = udf { (text: String) =>
      val v = new Array[Float](dim)
      text.split(" ").filter(_.nonEmpty).foreach { tok =>
        val h = scala.util.hashing.MurmurHash3.stringHash(tok, 42)
        v(math.floorMod(h, dim)) += (if (h % 2 == 0) 1.0f else -1.0f)
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val df = Seq("spark join scan", "spark join scan", "window agg").toDF("text")
      .select($"text", embed($"text").as("emb"))
    val rows = df.collect().map(_.getAs[scala.collection.Seq[Float]]("emb"))
    assert(rows(0) === rows(1), "same text → same embedding (deterministic)")
    assert(rows(0) !== rows(2))
    assert(rows.forall(_.length == dim))
    rows.foreach { r =>
      val n = math.sqrt(r.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, "stub embedder emits unit vectors")
    }
  }

  test("s_sink_console: console debug sink accepts a micro-batch") {
    val in = MemoryStream[Event]
    val q = in.toDF().writeStream.format("console")
      .option("truncate", "false").outputMode("append").start()
    try {
      in.addData(ev(1, 61), ev(2, 62))
      q.processAllAvailable()
      assert(q.lastProgress == null || q.lastProgress.sink.description.contains("Console"))
    } finally q.stop()
  }
}
