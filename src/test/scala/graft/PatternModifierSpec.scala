package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.streaming._

/** Semantics anchors for the flink-cep stage modifiers (r6): `optional`
  * and `notFollowedBy` — hand-computed expected matches for each semantic
  * corner, builder shape-rule enforcement, and a streaming ≡ batch
  * equivalence replay for a guarded + optional pattern over real events.
  */
class PatternModifierSpec extends SparkTestBase {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)
  private def mk(id: Long, min: Int, tp: String, user: Long = 1L): Event =
    Event(id, ts(min), user, tp, 1.0)
  private val h = 60L * 60000 // 1-hour horizon

  private def matchIds(pat: Pattern, evs: Seq[Event]): Seq[Seq[Long]] =
    pat.matchBatch(spark.createDataset(evs)).collect()
      .sortBy(m => (m.first_ms, m.event_ids.head)).map(_.event_ids).toSeq

  private val optPat = Pattern
    .begin("a")(_.event_type == "A")
    .followedBy("b")(_.event_type == "B").optional
    .followedBy("c")(_.event_type == "C")
    .within(h)

  test("s_cep_modifiers optional: consumed when present (greedy), skipped when absent") {
    assert(matchIds(optPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "C")))
      === Seq(Seq(1L, 2L, 3L)))
    assert(matchIds(optPat, Seq(mk(1, 1, "A"), mk(2, 2, "C"))) === Seq(Seq(1L, 2L)))
  }

  test("optional: C arriving before any B closes the match without waiting") {
    // at t=2 the scan sees C; B? is skippable, so the match closes as [1,2];
    // the leftover B(3), C(4) have no A head and match nothing
    assert(matchIds(optPat, Seq(mk(1, 1, "A"), mk(2, 2, "C"), mk(3, 3, "B"), mk(4, 4, "C")))
      === Seq(Seq(1L, 2L)))
  }

  private val negPat = Pattern
    .begin("a")(_.event_type == "A")
    .notFollowedBy("x")(_.event_type == "X")
    .followedBy("b")(_.event_type == "B")
    .within(h)

  test("notFollowedBy: a guard hit invalidates the head; nothing is consumed") {
    assert(matchIds(negPat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B"))) === Seq())
    // the invalidated head's events stay free for later heads
    assert(matchIds(negPat, Seq(mk(1, 1, "A"), mk(2, 2, "X"), mk(3, 3, "B"),
      mk(4, 4, "A"), mk(5, 5, "B"))) === Seq(Seq(4L, 5L)))
  }

  test("notFollowedBy: the guard closes once the next stage is consumed") {
    // X after B is outside the guarded gap — irrelevant
    assert(matchIds(negPat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "X")))
      === Seq(Seq(1L, 2L)))
  }

  test("tie-break: negative outranks positive when an event matches both") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .notFollowedBy("noB")(_.event_type == "B")
      .followedBy("b")(_.event_type == "B")
      .within(h)
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"))) === Seq())
  }

  test("an aborting event can still head its own later attempt") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .notFollowedBy("a2")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
      .within(h)
    // head A(1): gap event A(2) hits the guard, attempt aborts; head A(2):
    // B(3) completes — the guard event was never consumed
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "A"), mk(3, 3, "B")))
      === Seq(Seq(2L, 3L)))
  }

  test("guards are per-attempt: an aborted head does not block later disjoint matches") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .notFollowedBy("x")(_.event_type == "X")
      .followedBy("b")(_.event_type == "B")
      .within(h)
    // match [1,2] closes before X; head A(3) aborts on X(4); A(5)+B(6) match
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"), mk(3, 3, "A"),
      mk(4, 4, "X"), mk(5, 5, "A"), mk(6, 6, "B")))
      === Seq(Seq(1L, 2L), Seq(5L, 6L)))
  }

  test("builder shape rules reject ambiguous patterns") {
    intercept[IllegalArgumentException] {
      Pattern.begin("a")(_ => true).optional
    }
    intercept[IllegalArgumentException] { // dangling guard at the end
      Pattern.begin("a")(_ => true).notFollowedBy("x")(_ => true).within(h).compiled
    }
    intercept[IllegalArgumentException] { // guard declared after an optional stage
      Pattern.begin("a")(_ => true).followedBy("b")(_ => true).optional
        .notFollowedBy("x")(_ => true)
    }
    intercept[IllegalArgumentException] { // optional on a guarded stage
      Pattern.begin("a")(_ => true).notFollowedBy("x")(_ => true)
        .followedBy("b")(_ => true).optional
    }
    intercept[IllegalArgumentException] { // times on an optional stage
      Pattern.begin("a")(_ => true).followedBy("b")(_ => true).optional.times(2)
    }
    intercept[IllegalArgumentException] { // inverted range
      Pattern.begin("a")(_ => true).times(3, 2)
    }
  }

  test("trailing optional: match closes with or without the tail event") {
    val pat = Pattern
      .begin("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B").optional
      .within(h)
    assert(matchIds(pat, Seq(mk(1, 1, "A"), mk(2, 2, "B"))) === Seq(Seq(1L, 2L)))
    assert(matchIds(pat, Seq(mk(1, 1, "A"))) === Seq(Seq(1L)))
  }

  test("times(from, to): greedy between-range occurrence count") {
    val pat = Pattern.begin("e")(_.event_type == "E").times(2, 3).within(h)
    assert(pat.stages.length === 3, "times(2,3) desugars to 2 required + 1 optional")
    // three E's in window: greedy takes all three
    assert(matchIds(pat, Seq(mk(1, 1, "E"), mk(2, 2, "E"), mk(3, 3, "E")))
      === Seq(Seq(1L, 2L, 3L)))
    // exactly two: the optional third is skipped
    assert(matchIds(pat, Seq(mk(1, 1, "E"), mk(2, 2, "E"))) === Seq(Seq(1L, 2L)))
    // one alone: below the minimum, no match
    assert(matchIds(pat, Seq(mk(1, 1, "E"))) === Seq())
    // four: greedy [1,2,3]; the leftover E(4) cannot reach two occurrences
    assert(matchIds(pat, Seq(mk(1, 1, "E"), mk(2, 2, "E"), mk(3, 3, "E"), mk(4, 4, "E")))
      === Seq(Seq(1L, 2L, 3L)))
  }

  test("streaming processor == matchBatch for a guarded + optional pattern (reversed replay)") {
    val pat = Pattern
      .begin("signup")(_.event_type == "signup")
      .notFollowedBy("err")(_.event_type == "error")
      .followedBy("click")(_.event_type == "click")
      .followedBy("view")(_.event_type == "view").optional
      .followedBy("purchase")(_.event_type == "purchase")
      .within(7L * 24 * 3600000)
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatch(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    assert(expected.nonEmpty, "guarded pattern should match on sf0.001 events")
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_mod_snk"
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
      // deterministic: sentinel 1 raises the batch's max event time,
      // sentinel 2's batch then runs with the advanced watermark and
      // seals every window; processAllAvailable is synchronous — no
      // wall-clock poll needed, and a mismatch reports the actual diff
      val streamed = spark.table(sink).as[PatternMatch].collect()
        .filter(_.user_id != -99L)
        .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
      assert(streamed === expected,
        s"streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }

  test("streaming processor == matchBatch for an alternation pattern (reversed replay, " +
       "q_cep_alternation backing)") {
    // the parsed (click|view) group drives the SAME PosStage model through
    // transformWithState — the streaming half of the q_cep_alternation
    // contract, replayed fully reversed
    val pat = Pattern.matchRecognize("signup (click|view) purchase within 24h")(
      "signup"   -> ((e: Event) => e.event_type == "signup"),
      "click"    -> ((e: Event) => e.event_type == "click"),
      "view"     -> ((e: Event) => e.event_type == "view"),
      "purchase" -> ((e: Event) => e.event_type == "purchase"))
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .where($"event_type".isin("signup", "click", "view", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatch(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    assert(expected.nonEmpty, "alternation pattern should match on sf0.001 events")
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_alt_snk"
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
        s"alternation streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }

  test("PERMUTE: hand-computed anchors for either-order matching") {
    val pat = Pattern.permute(
      "a" -> ((e: Event) => e.event_type == "A"),
      "b" -> ((e: Event) => e.event_type == "B")).within(h)
    def run(evs: Event*): Seq[Seq[Long]] =
      pat.matchBatch(spark.createDataset(evs.toSeq)).collect().toSeq
        .sortBy(_.first_ms).map(_.event_ids)
    // reversed order matches too (the point of PERMUTE)
    assert(run(mk(1, 0, "B"), mk(2, 10, "A")) === Seq(Seq(1L, 2L)))
    assert(run(mk(1, 0, "A"), mk(2, 10, "B")) === Seq(Seq(1L, 2L)))
    // no reuse: one B cannot serve two As; leftmost A wins, second A dead
    assert(run(mk(1, 0, "A"), mk(2, 5, "A"), mk(3, 10, "B")) === Seq(Seq(1L, 3L)))
    // outside the horizon: no match
    assert(run(mk(1, 0, "A"), mk(2, 90, "B")) === Seq.empty)
    // same-type-only stream: no match
    assert(run(mk(1, 0, "A"), mk(2, 10, "A")) === Seq.empty)
    // two disjoint pairs, interleaved heads: A1(B3) then A2(B4)
    assert(run(mk(1, 0, "A"), mk(2, 5, "A"), mk(3, 10, "B"), mk(4, 20, "B"))
      === Seq(Seq(1L, 3L), Seq(2L, 4L)))
    // a failed head stays dead: B1 has no partner in window, but B1 also
    // cannot be consumed later (partners must follow their head)
    assert(run(mk(1, 0, "B"), mk(2, 90, "A"), mk(3, 100, "B"))
      === Seq(Seq(2L, 3L)))
  }

  test("streaming processor == matchBatch for PERMUTE (reversed replay, q_cep_permute backing)") {
    val pat = Pattern.permute(
      "click"    -> ((e: Event) => e.event_type == "click"),
      "purchase" -> ((e: Event) => e.event_type == "purchase"))
      .within(24L * 3600000)
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .where($"event_type".isin("click", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val expected = pat.matchBatch(spark.createDataset(evs.toSeq)).collect()
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids)).toSet
    assert(expected.nonEmpty, "permute pattern should match on sf0.001 events")
    val maxMs = evs.map(_.ts.getTime).max
    val in = MemoryStream[Event]
    val sink = "pat_perm_snk"
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
        s"permute streaming≡batch diverged; missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }
}
