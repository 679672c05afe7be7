package graft

import java.sql.Timestamp
import graft.streaming._

/** The MATCH_RECOGNIZE-lite string surface (r7): the parsed form must be
  * indistinguishable from the hand-built builder form — same compiled
  * stage model, same match sets on real data — and malformed specs must
  * fail with the builder's own shape rules, not silently degrade.
  */
class MatchRecognizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)
  private def mk(id: Long, min: Int, tp: String, user: Long = 1L): Event =
    Event(id, ts(min), user, tp, 1.0)

  private val defs: Seq[(String, Event => Boolean)] = Seq(
    "signup" -> (_.event_type == "signup"),
    "error"  -> (_.event_type == "error"),
    "click"  -> (_.event_type == "click"),
    "promo"  -> (_.event_type == "promo"))

  test("parsed guarded pattern reproduces q_cep_guarded's match set on real events") {
    val dir = sf("sf0.001")
    val pat = Pattern.matchRecognize("signup !error click within 24h")(defs: _*)
    val evs = graft.tables.Tables.events(spark, dir)
      .where($"event_type".isin("signup", "click", "error"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    val got = pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .collect().sorted.toSeq
    val expected = SparkEntry.queries("q_cep_guarded")(spark, dir)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("quantifiers compile to the builder's exact stage model") {
    def stages(p: Pattern): Seq[(Boolean, Seq[Int])] =
      p.compiled.map(s => (s.optional, s.negs.map(_ => 0)))
    val parsed = Pattern.matchRecognize("signup !error click{2,4} promo? within 1h")(defs: _*)
    val built = Pattern
      .begin("signup")(_.event_type == "signup")
      .notFollowedBy("error")(_.event_type == "error")
      .followedBy("click")(_.event_type == "click").times(2, 4)
      .followedBy("promo")(_.event_type == "promo").optional
      .within(3600000L)
    assert(stages(parsed) === stages(built))
    // exactly-n form
    assert(stages(Pattern.matchRecognize("signup click{3}")(defs: _*)) ===
      stages(Pattern.begin("signup")(_ => true).followedBy("click")(_ => true).times(3)))
  }

  test("parsed and built patterns produce identical matches (optional + guard + times)") {
    val evs = Seq(
      mk(1, 1, "signup"), mk(2, 2, "click"), mk(3, 3, "click"), mk(4, 4, "promo"),
      mk(5, 10, "signup"), mk(6, 11, "error"), mk(7, 12, "click"), mk(8, 13, "click"),
      mk(9, 30, "signup"), mk(10, 31, "click"), mk(11, 32, "click"))
    val parsed = Pattern.matchRecognize("signup !error click{1,2} promo? within 1h")(defs: _*)
    val built = Pattern
      .begin("signup")(_.event_type == "signup")
      .notFollowedBy("error")(_.event_type == "error")
      .followedBy("click")(_.event_type == "click").times(1, 2)
      .followedBy("promo")(_.event_type == "promo").optional
      .within(3600000L)
    def run(p: Pattern) =
      p.matchBatch(spark.createDataset(evs)).collect()
        .sortBy(m => (m.first_ms, m.event_ids.head)).map(_.event_ids).toSeq
    val got = run(parsed)
    assert(got === run(built))
    // sanity anchor: head 1 consumes clicks 2,3 then promo 4 (greedy);
    // head 5 is killed by the error in the gap; head 9 takes both clicks
    assert(got === Seq(Seq(1L, 2L, 3L, 4L), Seq(9L, 10L, 11L)))
  }

  test("q_cep_quantified: string {1,3} spec == builder times(1,3) on real data; fills are 1..3") {
    val parsed = Pattern.matchRecognize("signup click{1,3} within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val built = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .followedBy("click")((e: Event) => e.event_type == "click")
      .times(1, 3)
      .within(86400000L)
    import spark.implicits._
    val evs = graft.tables.Tables.events(spark, sf("sf0.001"))
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    def run(p: Pattern) = p.matchBatch(evs).collect()
      .sortBy(m => (m.user_id, m.first_ms, m.event_ids.head)).toSeq
    val got = run(parsed)
    assert(got === run(built), "string-spec and builder quantifier matches diverged")
    assert(got.nonEmpty)
    for (m <- got) {
      assert(m.event_ids.length >= 2 && m.event_ids.length <= 4,
        s"match ${m.event_ids} outside head+{1,3} size bounds")
      assert(m.last_ms - m.first_ms <= 86400000L, "match exceeded its window")
    }
    // greedy actually fills: on real data some match must use >1 click
    assert(got.exists(_.event_ids.length > 2), "no match consumed an optional replica")
  }

  test("duration units parse to milliseconds") {
    def hz(spec: String): Long =
      Pattern.matchRecognize(spec)(defs: _*).horizonMs.get
    assert(hz("signup within 500ms") === 500L)
    assert(hz("signup within 90s") === 90000L)
    assert(hz("signup within 5m") === 300000L)
    assert(hz("signup within 24h") === 86400000L)
    assert(hz("signup within 2d") === 172800000L)
  }

  test("malformed specs fail loudly with the builder's shape rules") {
    def bad(spec: String): String =
      intercept[IllegalArgumentException](
        Pattern.matchRecognize(spec)(defs: _*)).getMessage
    // r14: 'click+' is the legal unbounded-kleene form (KleeneCepSpec);
    // r15: 'click*' is legal TAILWARD (oneOrMore().optional()) but a star
    // HEAD is still rejected — the head stage must be required
    assert(bad("click* signup").contains("head stage cannot be optional"))
    assert(bad("signup mystery").contains("no DEFINE entry"))
    assert(bad("!error signup").contains("cannot start"))
    assert(bad("signup !error").contains("dangling"))          // builder rule via compiled-less end state
    assert(bad("signup? click").contains("head"))              // head cannot be optional
    assert(bad("signup within 7parsecs").contains("duration"))
    assert(bad("signup within 24h click").contains("penultimate"))
    assert(bad("signup {2}").contains("unparseable"))
  }

  test("a guard followed by a positive stage is legal and attaches to it") {
    val p = Pattern.matchRecognize("signup !error click")(defs: _*)
    assert(p.compiled.map(_.negs.size) === Seq(0, 1))
  }

  test("alternation (a|b): one stage, OR'd predicate — parsed == hand-built OR on a planted stream") {
    // q_cep_alternation backing: (click|promo) must consume whichever
    // member arrives first, greedily, exactly like a builder stage with an
    // explicit OR predicate
    val evs = Seq(
      mk(1, 1, "signup"), mk(2, 2, "promo"), mk(3, 3, "click"),  // match 1: 1/2 (promo first)
      mk(4, 10, "signup"), mk(5, 11, "click"),                   // match 2: 4/5
      mk(6, 30, "signup"), mk(7, 31, "error"))                   // no member -> no match
    val parsed = Pattern.matchRecognize("signup (click|promo) within 1h")(defs: _*)
    val built = Pattern
      .begin("signup")(_.event_type == "signup")
      .followedBy("click|promo")(e => e.event_type == "click" || e.event_type == "promo")
      .within(3600000L)
    def run(p: Pattern): Seq[Seq[Long]] =
      p.matchBatch(spark.createDataset(evs)).collect()
        .sortBy(_.first_ms).map(_.event_ids.toSeq).toSeq
    assert(run(parsed) === Seq(Seq(1L, 2L), Seq(4L, 5L)))
    assert(run(parsed) === run(built))
  }

  test("alternation groups take quantifiers; bare a|b parses unquantified; malformed groups fail") {
    def stages(p: Pattern): Seq[Boolean] = p.compiled.map(_.optional)
    // (a|b){1,3} == one required + two trailing optional replicas
    assert(stages(Pattern.matchRecognize("signup (click|promo){1,3}")(defs: _*)) ===
      Seq(false, false, true, true))
    assert(stages(Pattern.matchRecognize("signup (click|promo)?")(defs: _*)) ===
      Seq(false, true))
    // bare (unparenthesized, unquantified) alternation is the same stage
    assert(stages(Pattern.matchRecognize("signup click|promo")(defs: _*)) ===
      Seq(false, false))
    def bad(spec: String): String =
      intercept[IllegalArgumentException](
        Pattern.matchRecognize(spec)(defs: _*)).getMessage
    assert(bad("signup (click|mystery)").contains("no DEFINE entry"))
    assert(bad("signup (click|click)").contains("duplicate symbol"))
    assert(bad("signup click|promo{1,3}").contains("unparseable"),
      "a quantifier on a bare alternation is ambiguous and must be rejected (use parens)")
  }
}
