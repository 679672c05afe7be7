package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.streaming._

/** Semantics anchors for unbounded Kleene (`oneOrMore` / `+` / `{a,}`,
  * r14 — VERDICT r13 #3): hand-computed matches for each corner of the
  * greedy-unbounded semantics, builder and grammar shape rules, and the
  * streaming ≡ batch reversed-replay equivalence over real events (the
  * q_cep_kleene streaming half). */
class KleeneCepSpec extends SparkTestBase {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)
  private def mk(id: Long, min: Int, tp: String, user: Long = 1L): Event =
    Event(id, ts(min), user, tp, 1.0)
  private val h = 60L * 60000 // 1-hour horizon

  private def matchIds(pat: Pattern, evs: Seq[Event]): Seq[Seq[Long]] =
    pat.matchBatch(spark.createDataset(evs)).collect()
      .sortBy(m => (m.first_ms, m.event_ids.head)).map(_.event_ids).toSeq

  private val tailPat = Pattern
    .begin("a")(_.event_type == "A")
    .followedBy("b")(_.event_type == "B").oneOrMore
    .within(h)

  test("s_cep_kleene tail B+: greedy — every in-window B is consumed") {
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"), mk(4, 4, "B")))
      === Seq(Seq(1L, 2L, 3L, 4L)))
    // relaxed contiguity: non-matching events in the gap are ignored
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B"), mk(4, 4, "B")))
      === Seq(Seq(1L, 3L, 4L)))
  }

  test("kleene needs >= 1 occurrence: a head with no B matches nothing, consumes nothing") {
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"))) === Seq())
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"), mk(2, 2, "C"))) === Seq())
  }

  test("window edge bounds the repetitions; consumption splits across heads") {
    // B(90min) is outside head 1's window
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 90, "B")))
      === Seq(Seq(1L, 2L)))
    // greedy reach: ALL in-window Bs belong to head 1 — even one arriving
    // after a second head, which is then left with nothing
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"),
      mk(4, 4, "A"), mk(5, 5, "B"))) === Seq(Seq(1L, 2L, 3L, 5L)))
    // a B past head 1's window edge goes to the second head instead
    assert(matchIds(tailPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"),
      mk(4, 70, "A"), mk(5, 75, "B"))) === Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("mid-pattern kleene A B+ C: repetitions then the closer; leftovers stay free") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B").oneOrMore
      .followedBy("c")(_.event_type == "C")
      .within(h)
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"),
      mk(4, 4, "C"), mk(5, 5, "B"))) === Seq(Seq(1L, 2L, 3L, 4L)))
    // no C in window: the satisfied kleene alone does not complete the match
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"))) === Seq())
  }

  test("greedy tie-break: an event matching both the kleene stage and the next stage repeats the kleene") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .followedBy("bc")(e => e.event_type == "B" || e.event_type == "C").oneOrMore
      .followedBy("c")(_.event_type == "C")
      .within(h)
    // both Cs match the kleene stage first (greedy-earliest over the
    // reachable set), so the closer stage never fills — no match. The
    // documented cost of greedy-unbounded semantics with overlapping
    // DEFINEs; disjoint DEFINEs (the common case) are unaffected.
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "C"), mk(4, 4, "C")))
      === Seq())
  }

  test("kleene head A+: one greedy match takes every in-window occurrence") {
    val pat = Pattern.begin("a")(_.event_type == "A").oneOrMore.within(h)
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "A"), mk(3, 3, "A")))
      === Seq(Seq(1L, 2L, 3L)))
    // single occurrence is a complete match (one-OR-more)
    assert(matchIds(pat, Seq(mk(1, 1, "A"))) === Seq(Seq(1L)))
  }

  test("matchRecognize '+' and '{a,}' == builder oneOrMore; shape rules hold") {
    val defs = Seq(
      "a" -> ((e: Event) => e.event_type == "A"),
      "b" -> ((e: Event) => e.event_type == "B"))
    val evs = Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"), mk(4, 4, "B"))
    val plus = Pattern.matchRecognize("a b+ within 1h")(defs: _*)
    assert(matchIds(plus, evs) === matchIds(tailPat, evs))
    // {1,} is exactly +
    assert(matchIds(Pattern.matchRecognize("a b{1,} within 1h")(defs: _*), evs)
      === matchIds(plus, evs))
    // {2,}: two required occurrences, then unbounded
    val atLeast2 = Pattern.matchRecognize("a b{2,} within 1h")(defs: _*)
    assert(matchIds(atLeast2, evs) === Seq(Seq(1L, 2L, 3L, 4L)))
    assert(matchIds(atLeast2, Seq(mk(1, 1, "A"), mk(2, 2, "B"))) === Seq())
    intercept[IllegalArgumentException]( // guard after a kleene stage
      Pattern.begin("a")((_: Event).event_type == "A")
        .followedBy("b")((_: Event).event_type == "B").oneOrMore
        .notFollowedBy("x")((_: Event).event_type == "X"))
    intercept[IllegalArgumentException]( // one canonical star order: oneOrMore THEN optional
      Pattern.begin("a")((_: Event).event_type == "A")
        .followedBy("b")((_: Event).event_type == "B").optional.oneOrMore)
  }

  // ---------------- zero-or-more (r15: oneOrMore().optional(), `*`, `{0,}`) ----------------

  private val starPat = Pattern
    .begin("a")(_.event_type == "A")
    .followedBy("b")(_.event_type == "B").oneOrMore.optional
    .within(h)

  test("s_cep_kleene_star tail B*: zero reps completes head-only; reps consume greedily") {
    // no B in window: the head alone is a complete match
    assert(matchIds(starPat, Seq(mk(1, 1, "A"))) === Seq(Seq(1L)))
    // every in-window B is consumed greedily once entered
    assert(matchIds(starPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B")))
      === Seq(Seq(1L, 2L, 3L)))
    // relaxed contiguity still skips non-matching gap events
    assert(matchIds(starPat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B")))
      === Seq(Seq(1L, 3L)))
    // window edge: a B past head+h is out of reach — head-only match
    assert(matchIds(starPat, Seq(mk(1, 1, "A"), mk(2, 90, "B"))) === Seq(Seq(1L)))
  }

  test("star consumption: an earlier head's consumed range leaves a later head empty-handed") {
    // h1 consumes both Bs; h2 (also in window of b2) completes head-only
    assert(matchIds(starPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "A"), mk(4, 4, "B")))
      === Seq(Seq(1L, 2L, 4L), Seq(3L)))
  }

  test("mid-pattern star: A B* C — zero-rep and multi-rep variants both match greedily") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B").oneOrMore.optional
      .followedBy("c")(_.event_type == "C")
      .within(h)
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "C"))) === Seq(Seq(1L, 2L)))
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"), mk(4, 4, "C")))
      === Seq(Seq(1L, 2L, 3L, 4L)))
    // no C in window: the star reps alone cannot complete a required tail
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"))) === Seq())
    // greedy-earliest (deterministic, no backtracking — the oneOrMore rule
    // applied to star): an event matching both the star and the closer
    // repeats the star, so an all-overlap stream leaves C unsatisfied
    val both = Pattern
      .begin("a")(_.event_type == "A")
      .followedBy("b")(e => e.event_type == "B" || e.event_type == "Y").oneOrMore.optional
      .followedBy("c")(_.event_type == "Y")
      .within(h)
    assert(matchIds(both, Seq(mk(1, 1, "A"), mk(2, 2, "Y"), mk(3, 3, "Y"))) === Seq())
  }

  test("grammar: 'b*' and 'b{0,}' == builder oneOrMore.optional; star shape rules hold") {
    val defs = Seq(
      "a" -> ((e: Event) => e.event_type == "A"),
      "b" -> ((e: Event) => e.event_type == "B"))
    val evs = Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"))
    val star = Pattern.matchRecognize("a b* within 1h")(defs: _*)
    assert(matchIds(star, evs) === matchIds(starPat, evs))
    assert(matchIds(Pattern.matchRecognize("a b{0,} within 1h")(defs: _*), evs)
      === matchIds(star, evs))
    assert(matchIds(star, Seq(mk(1, 1, "A"))) === Seq(Seq(1L)))
    // the head cannot be a star (required head)
    intercept[IllegalArgumentException](
      Pattern.matchRecognize("a* b within 1h")(defs: _*))
    // guards adjacent to a star stay rejected (same ambiguity as kleene/optional)
    intercept[IllegalArgumentException](
      Pattern.matchRecognize("a b* !a b within 1h")(defs: _*))
    // next after a star stays rejected
    intercept[IllegalArgumentException](
      Pattern.begin("a")((_: Event).event_type == "A")
        .followedBy("b")((_: Event).event_type == "B").oneOrMore.optional
        .next("c")((_: Event).event_type == "C"))
  }

  test("all-matches star: every repetition count INCLUDING ZERO emits (flink NO_SKIP)") {
    val ms = starPat.matchBatchAll(spark.createDataset(
        Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "B"))))
      .collect().map(_.event_ids.toSeq).toSet
    assert(ms === Set(Seq(1L), Seq(1L, 2L), Seq(1L, 2L, 3L)))
  }

  test("streaming processor == matchBatch for the star pattern (reversed replay, " +
       "q_cep_kleene_star backing)") {
    val pat = Pattern.matchRecognize("signup click* within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatch(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    assert(expected.nonEmpty, "star pattern should match on sf0.001 events")
    assert(expected.exists(_._4.size == 1), "some head-only (zero-rep) match expected")
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_star_snk"
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
        s"star streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }

  test("streaming processor == matchBatch for the kleene pattern (reversed replay, " +
       "q_cep_kleene backing)") {
    val pat = Pattern.matchRecognize("signup click+ within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatch(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    assert(expected.nonEmpty, "kleene pattern should match on sf0.001 events")
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_kleene_snk"
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
        s"kleene streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }
}
