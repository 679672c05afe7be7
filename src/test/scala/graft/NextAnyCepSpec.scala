package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.streaming._

/** Semantics anchors for the r14 second-batch CEP surface: strict
  * contiguity (`next`, greedy surface — q_cep_next), and the all-matches
  * NO_SKIP surface (`matchBatchAll` / `sealAll`) carrying `followedByAny`
  * (q_cep_any), non-greedy kleene multiplicity (q_cep_reluctant),
  * `allowCombinations` subsets, and branched optionals. Hand-computed
  * matches per semantic corner, builder shape-rule enforcement, and
  * streaming ≡ batch reversed-replay equivalences over real events for
  * both new surfaces. */
class NextAnyCepSpec extends SparkTestBase {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)
  private def mk(id: Long, min: Int, tp: String, user: Long = 1L): Event =
    Event(id, ts(min), user, tp, 1.0)
  private val h = 60L * 60000 // 1-hour horizon

  private def matchIds(pat: Pattern, evs: Seq[Event]): Seq[Seq[Long]] =
    pat.matchBatch(spark.createDataset(evs)).collect()
      .sortBy(m => (m.first_ms, m.event_ids.head)).map(_.event_ids).toSeq

  private def allIds(pat: Pattern, evs: Seq[Event]): Set[Seq[Long]] =
    pat.matchBatchAll(spark.createDataset(evs)).collect().map(_.event_ids.toSeq).toSet

  // ---------------- strict contiguity (next) ----------------

  private val nextPat = Pattern
    .begin("a")(_.event_type == "A")
    .next("b")(_.event_type == "B")
    .within(h)

  test("s_cep_next: adjacent B matches; ANY intervening event kills the attempt") {
    assert(matchIds(nextPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"))) === Seq(Seq(1L, 2L)))
    // an interloper of a type no stage accepts still breaks adjacency —
    // this is the whole difference vs followedBy
    assert(matchIds(nextPat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B"))) === Seq())
    // whereas the relaxed twin matches through the interloper
    val relaxed = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")((_: Event).event_type == "B").within(h)
    assert(matchIds(relaxed, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B")))
      === Seq(Seq(1L, 3L)))
  }

  test("next: a second head immediately before B wins over an earlier separated head") {
    // A1's successor is A2 (miss -> abort); A2's successor is B3 (match)
    assert(matchIds(nextPat, Seq(mk(1, 1, "A"), mk(2, 2, "A"), mk(3, 3, "B")))
      === Seq(Seq(2L, 3L)))
  }

  test("next: the window edge bounds adjacency too") {
    // B is adjacent but outside the 1h window
    assert(matchIds(nextPat, Seq(mk(1, 1, "A"), mk(2, 70, "B"))) === Seq())
  }

  test("next composes after a relaxed stage: A ... B next C") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
      .next("c")(_.event_type == "C")
      .within(h)
    // relaxed gap to B, then C must be immediate
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B"), mk(4, 4, "C")))
      === Seq(Seq(1L, 3L, 4L)))
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "X"), mk(4, 4, "C")))
      === Seq())
  }

  test("next shape rules: no strict head, none after optional/kleene, no guard into it, " +
       "no quantifier/optional on it; greedy surface only rejects anyMode") {
    def A = (e: Event) => e.event_type == "A"
    def B = (e: Event) => e.event_type == "B"
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).followedBy("b")(B).optional.next("c")(A))
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).followedBy("b")(B).oneOrMore.next("c")(A))
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).notFollowedBy("x")(B).next("c")(A))
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).next("b")(B).optional)
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).next("b")(B).oneOrMore)
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).next("b")(B).times(2))
    // all-matches surface rejects strict stages
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).next("b")(B).within(h).compiledAll)
    // greedy surface rejects anyMode stages
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).followedByAny("b")(B).within(h).compiled)
    // guards are greedy-surface only
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).notFollowedBy("x")(B).followedBy("c")(A).within(h).compiledAll)
    // allowCombinations needs a kleene stage
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).followedBy("b")(B).allowCombinations)
  }

  test("s_cep_not_next: only the IMMEDIATE successor is guarded; deeper gap events are free") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .notNext("x")(_.event_type == "X")
      .followedBy("b")(_.event_type == "B")
      .within(h)
    // immediate successor is the guard type: attempt dies
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B"))) === Seq())
    // guard type DEEPER in the gap is fine (the notFollowedBy contrast)
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "Y"), mk(3, 3, "X"), mk(4, 4, "B")))
      === Seq(Seq(1L, 4L)))
    // whereas the whole-gap guard kills it
    val relaxedGuard = Pattern
      .begin("a")((_: Event).event_type == "A")
      .notFollowedBy("x")((_: Event).event_type == "X")
      .followedBy("b")((_: Event).event_type == "B")
      .within(h)
    assert(matchIds(relaxedGuard,
      Seq(mk(1, 1, "A"), mk(2, 2, "Y"), mk(3, 3, "X"), mk(4, 4, "B"))) === Seq())
    // no interloper at all: both match
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"))) === Seq(Seq(1L, 2L)))
  }

  test("notNext composes with next: the immediate event must satisfy the stage AND no guard") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .notNext("hot")(e => e.event_type == "B" && e.value > 10.0)
      .next("b")(_.event_type == "B")
      .within(h)
    assert(pat.matchBatch(spark.createDataset(Seq(
      mk(1, 1, "A"), Event(2, ts(2), 1L, "B", 5.0)))).collect().map(_.event_ids.toSeq).toSeq
      === Seq(Seq(1L, 2L)))
    // guard outranks the positive stage on the same event
    assert(pat.matchBatch(spark.createDataset(Seq(
      mk(1, 1, "A"), Event(2, ts(2), 1L, "B", 50.0)))).collect().isEmpty)
  }

  test("notNext shape rules: not after optional/kleene, not dangling, greedy surface only") {
    def A = (e: Event) => e.event_type == "A"
    def B = (e: Event) => e.event_type == "B"
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).followedBy("b")(B).optional.notNext("x")(A))
    intercept[IllegalArgumentException](
      Pattern.begin("a")(A).followedBy("b")(B).oneOrMore.notNext("x")(A))
    intercept[IllegalArgumentException]( // dangling
      Pattern.begin("a")(A).notNext("x")(B).within(h).compiled)
    intercept[IllegalArgumentException]( // all-matches surface rejects strict guards
      Pattern.begin("a")(A).notNext("x")(B).followedBy("b")(B).within(h).compiledAll)
  }

  // ---------------- all-matches surface (sealAll) ----------------

  private val anyPat = Pattern
    .begin("a")(_.event_type == "A")
    .followedByAny("b")(_.event_type == "B")
    .within(h)

  test("s_cep_any followedByAny: every (A, later in-window B) combination is a match") {
    assert(allIds(anyPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "A"), mk(4, 4, "B")))
      === Set(Seq(1L, 2L), Seq(1L, 4L), Seq(3L, 4L)))
    // window bounds the combinations per head
    assert(allIds(anyPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 70, "B")))
      === Set(Seq(1L, 2L)))
  }

  test("all-matches followedBy (deterministic) still takes only the FIRST match per state") {
    val pat = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")((_: Event).event_type == "B").within(h)
    // NO_SKIP heads: both As match, each with the first B after it
    assert(allIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "A"), mk(3, 3, "B"), mk(4, 4, "B")))
      === Set(Seq(1L, 3L), Seq(2L, 3L)))
  }

  test("s_cep_reluctant kleene: every repetition count emits (prefix family)") {
    val pat = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")((_: Event).event_type == "B").oneOrMore.within(h)
    assert(allIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"), mk(4, 4, "B")))
      === Set(Seq(1L, 2L), Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 4L)))
    // repetitions are deterministic first-match chains: no gap-skipping
    // subsets without allowCombinations
    assert(!allIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B")))
      .contains(Seq(1L, 3L)))
  }

  test("allowCombinations: repetition SUBSETS in arrival order (2^n - 1 per head)") {
    val pat = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")((_: Event).event_type == "B").oneOrMore.allowCombinations
      .within(h)
    assert(allIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"), mk(4, 4, "B")))
      === Set(
        Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L),
        Seq(1L, 2L, 3L), Seq(1L, 2L, 4L), Seq(1L, 3L, 4L),
        Seq(1L, 2L, 3L, 4L)))
  }

  test("all-matches optional branches: both the with- and without- variants emit") {
    val pat = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")((_: Event).event_type == "B").optional
      .followedBy("c")((_: Event).event_type == "C").within(h)
    assert(allIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "C")))
      === Set(Seq(1L, 3L), Seq(1L, 2L, 3L)))
  }

  test("convergent branches dedup: an event matching two reachable stages emits once per id-set") {
    // X matches both the optional b-stage and the closer c-stage
    val x = (e: Event) => e.event_type == "X"
    val pat = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")(x).optional
      .followedBy("c")(x).within(h)
    // [1,2] via c directly; [1,2,3] via b then c — and no duplicates
    val ms = Pattern.begin("a")((_: Event).event_type == "A")
      .followedBy("b")(x).optional.followedBy("c")(x).within(h)
      .matchBatchAll(spark.createDataset(Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "X"))))
      .collect().map(_.event_ids.toSeq).toSeq
    assert(ms.size === ms.distinct.size, s"duplicate emissions in $ms")
    assert(ms.toSet === Set(Seq(1L, 2L), Seq(1L, 2L, 3L)))
    assert(pat.compiledAll.nonEmpty)
  }

  test("sealAll maxMatches bounds combinatorial output loudly") {
    import graft.streaming.{BufEv, PatternMatcher, PosStage}
    val stages = Seq(
      PosStage((e: Event) => e.event_type == "A", optional = false, Nil),
      PosStage((e: Event) => e.event_type == "B", optional = false, Nil, anyMode = true))
    val evs = (1 to 10).map(i => BufEv(i.toLong, i * 1000L, if (i == 1) "A" else "B", 0.0))
    intercept[IllegalStateException](
      PatternMatcher.sealAll(1L, evs, stages, 60000L, Long.MaxValue, maxMatches = 3))
  }

  test("sealAll is stack-safe on a deep deterministic kleene chain (ADVICE r14: " +
      "explicit-stack DFS, not JVM recursion)") {
    import graft.streaming.{BufEv, PatternMatcher, PosStage}
    // one head + 20k chained kleene repetitions: the recursive DFS nested one
    // JVM frame per repetition (one emission per level) and overflowed the
    // default thread stack long before the maxMatches guard could fire
    val n = 20000
    val stages = Seq(
      PosStage((e: Event) => e.event_type == "A", optional = false, Nil),
      PosStage((e: Event) => e.event_type == "B", optional = false, Nil, kleene = true))
    val evs = BufEv(0L, 0L, "A", 0.0) +:
      (1 to n).map(i => BufEv(i.toLong, i.toLong, "B", 0.0))
    val (ms, rest) = PatternMatcher.sealAll(1L, evs, stages, n + 10L, Long.MaxValue)
    assert(rest.isEmpty)
    // flink NO_SKIP kleene: one match per repetition count, each a prefix chain
    assert(ms.size === n)
    assert(ms.map(_.event_ids.length).sorted === (2 to n + 1).toSeq)
    assert(ms.last.event_ids === (0L to n.toLong).toSeq || ms.head.event_ids === (0L to n.toLong).toSeq)
  }

  test("sealAll adversarial key skew: 10^6 anyMode matches on ONE key complete in one seal " +
      "and prune the buffer to empty (r16 throughput datapoint)") {
    import graft.streaming.{BufEv, PatternMatcher, PosStage}
    // the skew shape a census processor sees when one hot key owns the
    // stream: 200 heads, each pairing with all 5000 later partners in the
    // window — 10^6 emissions, just under the 1<<20 maxMatches bound the
    // loud-error test above pins. The datapoint this measures: the
    // explicit-stack DFS sustains ~10^5-10^6 matches/s per key per seal
    // (recorded in BASELINE.md), and the post-seal keep-set — what the
    // streaming processor would retain in ListState — is EMPTY once the
    // watermark passes every head's horizon, so a hot key's state does not
    // outlive its window even when its match volume is combinatorial.
    val heads = 200
    val partners = 5000
    val stages = Seq(
      PosStage((e: Event) => e.event_type == "A", optional = false, Nil),
      PosStage((e: Event) => e.event_type == "B", optional = false, Nil, anyMode = true))
    val evs = (1 to heads).map(i => BufEv(i.toLong, i.toLong, "A", 0.0)) ++
      (1 to partners).map(i => BufEv((heads + i).toLong, (heads + i).toLong, "B", 0.0))
    val t0 = System.nanoTime()
    val (ms, rest) = PatternMatcher.sealAll(1L, evs, stages, 10000L, Long.MaxValue)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"sealAll skew: ${ms.size} matches in $sec%.2f s (${ms.size / sec}%.0f matches/s)")
    assert(ms.size === heads * partners, "every (head, later partner) pair must emit")
    assert(rest.isEmpty, "fully-sealed hot key must retain no buffer state")
    // generous CI bound — the point is completing without pathological
    // blowup, not a tight perf gate on a shared box
    assert(sec < 120.0, f"combinatorial seal took $sec%.1f s — DFS throughput regressed")
  }

  test("streaming processorAll == matchBatchAll (reversed replay, q_cep_any backing)") {
    val pat = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .followedByAny("purchase")((e: Event) => e.event_type == "purchase")
      .within(86400000L)
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .where($"event_type".isin("signup", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatchAll(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    assert(expected.nonEmpty, "any-pattern should match on sf0.001 events")
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_any_snk"
    val q = in.toDS().withWatermark("ts", "35 days")
      .groupByKey(_.user_id)
      .transformWithState(pat.processorAll, TimeMode.EventTime(), OutputMode.Append())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      val (h1, h2) = evs.sortBy(e => -e.ts.getTime).splitAt(evs.length / 2)
      in.addData(h1.toSeq); q.processAllAvailable()
      in.addData(h2.toSeq); q.processAllAvailable()
      val sentTs = new Timestamp(maxMs + 50L * 24 * 3600000)
      in.addData(Event(-1L, sentTs, -99L, "sentinel", 0.0)); q.processAllAvailable()
      in.addData(Event(-2L, sentTs, -99L, "sentinel", 0.0)); q.processAllAvailable()
      val streamed = spark.table(sink).as[PatternMatch].collect()
        .filter(_.user_id != -99L)
        .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
      assert(streamed === expected,
        s"any streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }

  test("s_cep_any checkpoint recovery: buffered alternatives survive stop/restart") {
    val pat = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .followedByAny("purchase")((e: Event) => e.event_type == "purchase")
      .within(h)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_any").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_any_out").toString
    val in = MemoryStream[Event]
    def stream = in.toDS().withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .transformWithState(pat.processorAll, TimeMode.EventTime(), OutputMode.Append())
    // append-mode memory sink can't recover from a checkpoint — file sink
    // (the EwmaProcessor recovery test's convention)
    def start() = stream.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    // head + first alternative arrive BEFORE the restart; the head's
    // window is still unsealed, so both live only in ListState
    in.addData(mk(1, 1, "signup"), mk(2, 2, "purchase"))
    q1.processAllAvailable(); q1.stop()
    // second alternative + watermark advance arrive after the restart:
    // the sealed head must emit BOTH pairs, proving the buffer survived
    in.addData(mk(3, 3, "purchase"), mk(-1, 600, "sentinel", user = -99L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      in.addData(mk(-2, 601, "sentinel", user = -99L))
      q2.processAllAvailable()
      val ms = spark.read.parquet(outDir).as[PatternMatch].collect()
        .filter(_.user_id != -99L)
      assert(ms.map(_.event_ids.toSeq).toSet === Set(Seq(1L, 2L), Seq(1L, 3L)),
        s"buffered alternatives lost across restart: ${ms.toSeq}")
    } finally q2.stop()
  }

  test("streaming processor == matchBatch for the strict pattern over ALL event types " +
       "(reversed replay, q_cep_next backing — interlopers must be buffered)") {
    val pat = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .next("purchase")((e: Event) => e.event_type == "purchase")
      .within(3600000L)
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatch(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_next_snk"
    val q = in.toDS().withWatermark("ts", "35 days")
      .groupByKey(_.user_id)
      .transformWithState(pat.processor, TimeMode.EventTime(), OutputMode.Append())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      val (h1, h2) = evs.sortBy(e => -e.ts.getTime).splitAt(evs.length / 2)
      in.addData(h1.toSeq); q.processAllAvailable()
      in.addData(h2.toSeq); q.processAllAvailable()
      val sentTs = new Timestamp(maxMs + 50L * 24 * 3600000)
      in.addData(Event(-1L, sentTs, -99L, "sentinel", 0.0)); q.processAllAvailable()
      in.addData(Event(-2L, sentTs, -99L, "sentinel", 0.0)); q.processAllAvailable()
      val streamed = spark.table(sink).as[PatternMatch].collect()
        .filter(_.user_id != -99L)
        .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
      assert(streamed === expected,
        s"strict streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }
}
