package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** One declared positive stage of a [[Pattern]]: name, predicate, the
  * flink-cep `optional` flag, and the `notFollowedBy` gap guards declared
  * between the previous positive stage and this one. r14 second batch
  * adds the remaining contiguity modes: `strict` (flink `.next()` —
  * greedy surface), `anyMode` (flink `.followedByAny()` — all-matches
  * surface) and `combinations` (flink `.allowCombinations()` on a
  * oneOrMore stage — all-matches surface). */
final case class StageDef(name: String, pred: Event => Boolean,
    optional: Boolean, negsBefore: Seq[(String, Event => Boolean)],
    kleene: Boolean = false, strict: Boolean = false,
    anyMode: Boolean = false, combinations: Boolean = false,
    negsNextBefore: Seq[(String, Event => Boolean)] = Nil)

/** Flink-CEP-style pattern builder — the `Pattern.begin(..).followedBy(..)
  * .within(..)` surface over the generic linear matcher. TWO emission
  * surfaces share this one builder (r14 second batch):
  *
  *   - GREEDY ([[matchBatch]] / [[processor]]): SKIP-PAST-LAST-ROW
  *     consumed-set semantics — one maximal match per head, no event
  *     reuse. Carries `next` / `notNext` / `notFollowedBy` (adjacency
  *     and guards are properties of the single consumed chain).
  *   - ALL-MATCHES ([[matchBatchAll]] / [[processorAll]], flink NO_SKIP):
  *     every alternative emits — `followedByAny` branching, optional
  *     with/without variants, per-repetition-count kleene,
  *     `allowCombinations` subsets. No consumption, events shared.
  *
  * On the greedy surface, two deliberate deviations from flink-cep
  * remain: `optional` emits only the single greedy match (the NO_SKIP
  * branching variant lives on the all-matches surface), and an event
  * matching both a gap guard and a positive stage counts as the guard —
  * negatives outrank positives, a local tie-break flink-cep leaves
  * unspecified:
  *
  * {{{
  * val pat = Pattern
  *   .begin("signup")(_.event_type == "signup")
  *   .notFollowedBy("churn")(_.event_type == "cancel")
  *   .followedBy("click")(_.event_type == "click")
  *   .followedBy("promo")(_.event_type == "promo").optional
  *   .followedBy("purchase")(_.event_type == "purchase")
  *   .within(24L * 3600 * 1000)
  * stream.groupByKey(_.user_id)
  *   .transformWithState(pat.processor, TimeMode.EventTime(), OutputMode.Append())
  * // or, bounded input:
  * pat.matchBatch(eventsDs)
  * }}}
  *
  * Semantics are [[PatternMatcher]]'s: relaxed contiguity (followedBy),
  * leftmost-greedy, no event reuse (AFTER MATCH SKIP PAST LAST ROW-style
  * consumption), each match completing within `within` of its head.
  * `notFollowedBy` guards the gap before the NEXT positive stage: an event
  * matching the guard while that gap is open invalidates the head's
  * attempt (flink-cep NOT-next-relaxed). `optional` marks the last
  * declared stage skippable; greedy — a matching event is still consumed
  * in preference to skipping. The streaming and batch surfaces share the
  * matcher core, so a bounded replay of any stream yields identical
  * matches (asserted in ProcessorsSpec; the all-required batch surface is
  * additionally oracle-checked as q_cep_pattern_seq).
  *
  * Shape rules (enforced at build time, keeping greedy matching
  * unambiguous): the head stage is required and unguarded; a pattern
  * cannot end on a dangling `notFollowedBy`; a guarded gap sits between
  * two REQUIRED stages (no `optional` adjacent to a guard — whether a
  * skipped optional's guards apply to the merged gap would otherwise be
  * ambiguous). Trailing OPTIONAL stages are legal (`times(from, to)`
  * desugars to them): a match completes when every unsatisfied remaining
  * stage is optional, its extent decided by the events inside the head's
  * sealed window.
  *
  * Scale posture (batch): one shuffle on the key; per-key work is a sort +
  * linear scan of that key's events — the inherent MATCH_RECOGNIZE
  * partition contract. State never crosses keys, so 1000 executors split
  * the corpus by user with no driver involvement.
  */
final case class Pattern private (
    stages: Seq[StageDef],
    pendingNegs: Seq[(String, Event => Boolean)],
    horizonMs: Option[Long],
    pendingStrictNegs: Seq[(String, Event => Boolean)] = Nil) {

  def followedBy(name: String)(pred: Event => Boolean): Pattern =
    copy(stages = stages :+ StageDef(name, pred, optional = false, pendingNegs,
        negsNextBefore = pendingStrictNegs),
      pendingNegs = Nil, pendingStrictNegs = Nil)

  /** flink-cep `.next(..)` (r14): STRICT contiguity — the stage must be
    * satisfied by the IMMEDIATELY following AVAILABLE (unconsumed) event
    * in the key's (ts, id) stream order; any other available event in
    * between (matching or not) kills the head's attempt, while events
    * consumed by an earlier match are invisible to adjacency (same
    * availability semantics as [[notNext]]; keeps incremental ≡ one-shot
    * since pruning drops consumed events from the buffer). Greedy
    * surface only ([[matchBatch]] / [[processor]]): adjacency is a
    * property of the single consumed chain, so [[matchBatchAll]] rejects
    * strict stages. Shape rules: must directly follow a plain required
    * stage (across a skipped optional or an open-ended oneOrMore,
    * "immediately after" is ambiguous), and no guards may be pending (a
    * guard before a zero-length gap can never fire). */
  def next(name: String)(pred: Event => Boolean): Pattern = {
    require(stages.nonEmpty, "next needs a preceding stage (begin cannot be strict)")
    require(!stages.last.optional && !stages.last.kleene,
      "next after an optional or oneOrMore stage is ambiguous " +
        "('immediately after' what?); make the previous stage plain required")
    require(pendingNegs.isEmpty,
      "notFollowedBy before next guards a zero-length gap and can never fire")
    // a pending notNext shares the strict stage's position: the immediate
    // event must satisfy the stage AND no strict guard (guards outrank)
    copy(stages = stages :+ StageDef(name, pred, optional = false, Nil, strict = true,
        negsNextBefore = pendingStrictNegs),
      pendingStrictNegs = Nil)
  }

  /** flink-cep `.followedByAny(..)` (r14): NON-DETERMINISTIC relaxed
    * contiguity — EVERY later in-window event satisfying the stage
    * continues a separate alternative, not just the first. Only
    * meaningful under the all-matches surface ([[matchBatchAll]] /
    * [[processorAll]], flink NO_SKIP); the greedy surface rejects it at
    * compile ([[compiled]]) because consumed-set semantics cannot share
    * events across matches. */
  def followedByAny(name: String)(pred: Event => Boolean): Pattern = {
    require(stages.nonEmpty, "followedByAny needs a preceding stage")
    require(pendingNegs.isEmpty && pendingStrictNegs.isEmpty,
      "notFollowedBy/notNext guards are a greedy-surface construct; the " +
        "all-matches surface that followedByAny requires does not support them")
    copy(stages = stages :+ StageDef(name, pred, optional = false, Nil, anyMode = true))
  }

  /** flink-cep `.allowCombinations()` (r14): on a oneOrMore stage, the
    * repetitions branch non-deterministically — every matching event may
    * be taken or skipped as the next repetition, enumerating event
    * SUBSETS (in arrival order) instead of the deterministic first-match
    * chain. All-matches surface only; exponential in the per-window
    * repetition count (the blow-up flink documents), bounded by
    * [[PatternMatcher.sealAll]]'s maxMatches. */
  def allowCombinations: Pattern = {
    require(stages.nonEmpty && stages.last.kleene,
      "allowCombinations applies to a oneOrMore stage")
    require(!stages.last.combinations, "stage already allows combinations")
    copy(stages = stages.init :+ stages.last.copy(combinations = true))
  }

  /** flink-cep `.notNext(..)` (r14 second batch): STRICT gap guard — the
    * IMMEDIATELY following available event must not match `pred`; events
    * further into the gap are unconstrained (vs [[notFollowedBy]]'s
    * whole-gap scope). Attaches to the NEXT positive stage; a pattern may
    * not end on one. Same availability semantics as [[next]] (consumed
    * events are invisible; the streaming processor buffers all events for
    * adjacency-sensitive patterns), greedy surface only. */
  def notNext(name: String)(pred: Event => Boolean): Pattern = {
    require(stages.nonEmpty, "notNext needs a preceding stage")
    require(!stages.last.optional && !stages.last.kleene,
      "notNext after an optional or oneOrMore stage is ambiguous " +
        "('immediately after' what?); make the previous stage plain required")
    copy(pendingStrictNegs = pendingStrictNegs :+ (name -> pred))
  }

  /** flink-cep `.notFollowedBy(..)`: no event matching `pred` may occur
    * between the previous positive stage and the next one. Attaches to
    * the NEXT `followedBy`; a pattern may not end on one. */
  def notFollowedBy(name: String)(pred: Event => Boolean): Pattern = {
    require(stages.nonEmpty, "notFollowedBy needs a preceding stage")
    require(!stages.last.optional,
      "notFollowedBy after an optional stage is ambiguous (merged-gap guards); " +
        "make the previous stage required")
    require(!stages.last.kleene,
      "notFollowedBy after a oneOrMore stage is ambiguous (guards straddling " +
        "repetitions); make the previous stage a plain required stage")
    copy(pendingNegs = pendingNegs :+ (name -> pred))
  }

  /** flink-cep `.optional()`: the last declared stage may be skipped.
    * Greedy: an event matching it is still consumed in preference to
    * skipping ahead. On a `oneOrMore` stage this is flink's ZERO-OR-MORE
    * composition (`oneOrMore().optional()`, SQL `*` / `{0,}`, r15): the
    * stage may be skipped entirely OR repeat greedily once entered — a
    * head whose window holds no matching event still completes, with the
    * star stage contributing nothing. Not allowed on the head, on a
    * guarded stage, or with gap guards pending (see shape rules). */
  def optional: Pattern = {
    require(stages.length >= 2, "the head stage cannot be optional")
    require(!stages.last.strict,
      "optional on a strict (next) stage is ambiguous: skipping it makes the " +
        "following stage's adjacency target unclear")
    require(stages.last.negsBefore.isEmpty && stages.last.negsNextBefore.isEmpty,
      "optional on a guarded stage is ambiguous (merged-gap guards); " +
        "guards must sit between two required stages")
    require(pendingNegs.isEmpty && pendingStrictNegs.isEmpty,
      "declare notFollowedBy/notNext AFTER optional's followedBy, not before it")
    copy(stages = stages.init :+ stages.last.copy(optional = true))
  }

  /** flink-cep `.oneOrMore()` (r14): the LAST stage repeats UNBOUNDED —
    * it must occur at least once, and once satisfied it greedily consumes
    * every further matching in-window event in preference to advancing
    * (an event matching both the kleene stage and the next stage repeats
    * the kleene stage — the greedy-earliest rule applied to the
    * reachable-set {kleene, next, ...}). Unlike `times(a, b)` there is no
    * bounded desugar: the matcher's pointer simply stays on a satisfied
    * kleene stage. Compose `.oneOrMore.optional` (that order) for flink's
    * zero-or-more (r15). Not allowed directly on an optional stage (one
    * canonical spelling), on a guarded stage, or with gap guards pending — the
    * same merged-gap ambiguity argument as `optional` (a guard straddling
    * the repetitions would be silently ignored by the pointer-stage guard
    * check). */
  def oneOrMore: Pattern = {
    require(stages.nonEmpty, "oneOrMore needs a stage to repeat")
    require(!stages.last.optional,
      "oneOrMore on an optional stage: spell zero-or-more the flink way, " +
        "oneOrMore THEN optional (one canonical order keeps shape rules simple)")
    require(!stages.last.strict,
      "oneOrMore on a strict (next) stage (flink consecutive()) is not supported")
    require(!stages.last.anyMode,
      "oneOrMore on a followedByAny stage is ambiguous — use oneOrMore + " +
        "allowCombinations for non-deterministic repetitions")
    require(!stages.last.kleene, "stage is already oneOrMore")
    require(stages.last.negsBefore.isEmpty && stages.last.negsNextBefore.isEmpty,
      "oneOrMore on a guarded stage is ambiguous (guards straddling repetitions); " +
        "guards must sit between two plain required stages")
    require(pendingNegs.isEmpty && pendingStrictNegs.isEmpty,
      "declare notFollowedBy/notNext AFTER oneOrMore's followedBy, not before it")
    copy(stages = stages.init :+ stages.last.copy(kleene = true))
  }

  /** flink-cep `.times(n)` — the LAST stage must occur n times total
    * (relaxed contiguity between occurrences), desugared to n chained
    * followedBy stages sharing the predicate. Gap guards and optionality
    * do not replicate (guards keep guarding only the first occurrence's
    * gap; a repeated stage is required). */
  def times(n: Int): Pattern = times(n, n)

  /** flink-cep `.times(from, to)` — the LAST stage occurs between `from`
    * and `to` times (greedy: extra occurrences inside the window are
    * consumed), desugared to `from` required + `to - from` optional
    * replicas. Trailing optional replicas are legal: a match's verdict —
    * including how many optionals filled — is decided by the events inside
    * the head's window, all present at seal time. */
  def times(from: Int, to: Int): Pattern = {
    require(from >= 1 && to >= from, s"times($from, $to): need 1 <= from <= to")
    require(stages.nonEmpty, "times needs a stage to repeat")
    require(!stages.last.optional, "times on an optional stage is ambiguous")
    require(!stages.last.strict && !stages.last.anyMode,
      "times on a strict (next) or followedByAny stage is not supported; " +
        "quantify a plain followedBy stage")
    require(!stages.last.kleene,
      "times on a oneOrMore stage is ambiguous; quantify before oneOrMore")
    require(pendingNegs.isEmpty && pendingStrictNegs.isEmpty,
      "dangling notFollowedBy/notNext before times")
    val last = stages.last
    copy(stages = stages ++
      (2 to from).map(i => StageDef(s"${last.name}#$i", last.pred, optional = false, Nil)) ++
      (from + 1 to to).map(i =>
        StageDef(s"${last.name}#$i", last.pred, optional = true, Nil)))
  }

  def within(ms: Long): Pattern = copy(horizonMs = Some(ms))

  /** Positive-stage predicates in order (all-required patterns only need
    * these; kept for the original surface and tests). */
  def predicates: Seq[Event => Boolean] = stages.map(_.pred)

  /** Compile to the GREEDY matcher's stage model ([[PatternMatcher.seal]]),
    * enforcing the shape rules. Rejects the all-matches-only modes
    * (followedByAny / allowCombinations) — use [[compiledAll]]. */
  def compiled: Seq[PosStage] = {
    require(stages.nonEmpty, "empty pattern")
    require(pendingNegs.isEmpty,
      s"pattern ends on dangling notFollowedBy(${pendingNegs.map(_._1).mkString(",")}); " +
        "a guard needs a following stage")
    require(pendingStrictNegs.isEmpty,
      s"pattern ends on dangling notNext(${pendingStrictNegs.map(_._1).mkString(",")}); " +
        "a guard needs a following stage")
    require(!stages.head.optional && stages.head.negsBefore.isEmpty &&
        stages.head.negsNextBefore.isEmpty,
      "the head stage must be required and unguarded")
    require(stages.forall(st => !st.anyMode && !st.combinations),
      s"stage(s) ${stages.filter(st => st.anyMode || st.combinations).map(_.name).mkString(",")} " +
        "use followedByAny/allowCombinations — all-matches semantics; use " +
        "matchBatchAll / processorAll instead of the greedy surface")
    stages.zipWithIndex.foreach { case (st, i) =>
      if (st.negsBefore.nonEmpty) {
        require(!st.optional && !stages(i - 1).optional &&
            !st.kleene && !stages(i - 1).kleene,
          s"stage ${st.name}: guards must sit between two plain required stages")
      }
      if (st.strict || st.negsNextBefore.nonEmpty)
        require(!stages(i - 1).optional && !stages(i - 1).kleene,
          s"stage ${st.name}: next/notNext must directly follow a plain required stage")
    }
    stages.map(st =>
      PosStage(st.pred, st.optional, st.negsBefore.map(_._2), st.kleene, st.strict,
        negsNext = st.negsNextBefore.map(_._2)))
  }

  /** Compile to the ALL-MATCHES matcher's stage model
    * ([[PatternMatcher.sealAll]], flink NO_SKIP). Rejects the
    * greedy-surface-only modes (next / notFollowedBy) — see the matcher's
    * scaladoc for why each construct belongs to exactly one surface. */
  def compiledAll: Seq[PosStage] = {
    require(stages.nonEmpty, "empty pattern")
    require(pendingNegs.isEmpty && pendingStrictNegs.isEmpty &&
        stages.forall(st => st.negsBefore.isEmpty && st.negsNextBefore.isEmpty),
      "notFollowedBy/notNext guards require the greedy surface (matchBatch/processor): " +
        "invalidating 'the attempt' is well-defined only with one attempt per head")
    require(stages.forall(st => !st.strict),
      "next (strict) stages require the greedy surface: adjacency is a property " +
        "of the single consumed chain")
    require(!stages.head.optional, "the head stage must be required")
    stages.map(st =>
      PosStage(st.pred, st.optional, Nil, st.kleene,
        anyMode = st.anyMode, combinations = st.combinations))
  }

  private def horizon: Long = horizonMs.getOrElse(
    throw new IllegalArgumentException("Pattern requires .within(ms)"))

  /** Streaming surface: a state processor for
    * `groupByKey(_.user_id).transformWithState`. */
  def processor: PatternSequenceProcessor =
    new PatternSequenceProcessor(compiled, horizon)

  /** Batch surface: one-shot matching per user over a bounded Dataset —
    * equivalent to replaying it through [[processor]] and sealing every
    * window (PatternMatcher's property-tested invariant). */
  def matchBatch(evs: Dataset[Event]): Dataset[PatternMatch] = {
    val stgs = compiled
    val h = horizon
    implicit val enc = Encoders.product[PatternMatch]
    implicit val keyEnc = Encoders.scalaLong
    evs.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[Event]) =>
      val buf = it.map(e => BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)).toSeq
      // wm = MaxValue seals every head's window in one shot (event epochs
      // are ~2^41 ms; head.ts + within stays far from overflow)
      val (matches, rest) = PatternMatcher.seal(uid, buf, stgs, h, Long.MaxValue)
      assert(rest.isEmpty, "final seal must drain the buffer")
      matches.iterator
    }
  }

  /** All-matches streaming surface (flink NO_SKIP, r14): a state processor
    * over [[PatternMatcher.sealAll]] for
    * `groupByKey(_.user_id).transformWithState`. */
  def processorAll: PatternAnyProcessor =
    new PatternAnyProcessor(compiledAll, horizon)

  /** All-matches batch surface (flink NO_SKIP, r14): every head's full
    * alternative set — followedByAny branches, per-repetition-count
    * kleene emission, optional variants, allowCombinations subsets.
    * Equivalent to replaying through [[processorAll]] and sealing every
    * window (the same property-tested invariant as [[matchBatch]]; the
    * argument is stronger here — sealAll has no cross-head state at
    * all). */
  def matchBatchAll(evs: Dataset[Event]): Dataset[PatternMatch] = {
    val stgs = compiledAll
    val h = horizon
    implicit val enc = Encoders.product[PatternMatch]
    implicit val keyEnc = Encoders.scalaLong
    evs.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[Event]) =>
      val buf = it.map(e => BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)).toSeq
      val (matches, rest) = PatternMatcher.sealAll(uid, buf, stgs, h, Long.MaxValue)
      assert(rest.isEmpty, "final seal must drain the buffer")
      matches.iterator
    }
  }
}

/** SQL-MATCH_RECOGNIZE `PERMUTE(A, B, …)` as a whole-pattern surface:
  * one event per member, ANY arrival order, all within the horizon —
  * greedy member-SET semantics (see [[PatternMatcher.sealPermute]] for
  * the documented deviation from the standard's n!-alternation desugar;
  * for type-disjoint DEFINEs the two coincide). Built via
  * `Pattern.permute("click" -> p1, "purchase" -> p2).within(ms)`; batch
  * and streaming surfaces share the sealPermute core, so a bounded
  * replay of any stream yields identical matches (ProcessorsSpec). */
final case class PermutePattern private[streaming] (
    members: Seq[(String, Event => Boolean)], horizonMs: Option[Long]) {
  require(members.size >= 2, "PERMUTE needs at least two members")
  require(members.map(_._1).distinct.size == members.size,
    s"duplicate PERMUTE member among ${members.map(_._1).mkString(", ")}")

  def within(ms: Long): PermutePattern = copy(horizonMs = Some(ms))

  private def horizon: Long = horizonMs.getOrElse(
    throw new IllegalArgumentException("PermutePattern requires .within(ms)"))

  /** Streaming surface for `groupByKey(_.user_id).transformWithState`. */
  def processor: PermuteProcessor =
    new PermuteProcessor(members.map(_._2), horizon)

  /** Batch surface: one-shot matching per user — equivalent to replaying
    * through [[processor]] and sealing every window. */
  def matchBatch(evs: Dataset[Event]): Dataset[PatternMatch] = {
    val preds = members.map(_._2)
    val h = horizon
    implicit val enc = Encoders.product[PatternMatch]
    implicit val keyEnc = Encoders.scalaLong
    evs.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[Event]) =>
      val buf = it.map(e => BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)).toSeq
      val (matches, rest) = PatternMatcher.sealPermute(uid, buf, preds, h, Long.MaxValue)
      assert(rest.isEmpty, "final seal must drain the buffer")
      matches.iterator
    }
  }
}

object Pattern {
  /** Start a pattern with its first stage predicate. */
  def begin(name: String)(pred: Event => Boolean): Pattern =
    Pattern(Seq(StageDef(name, pred, optional = false, Nil)), Nil, None)

  /** SQL PATTERN `PERMUTE(A, B, …)` whole-pattern surface — see
    * [[PermutePattern]]. */
  def permute(members: (String, Event => Boolean)*): PermutePattern =
    PermutePattern(members.toSeq, None)

  private val DurRe = """(\d+)(ms|s|m|h|d)""".r
  private val NegRe = """!([A-Za-z_][A-Za-z0-9_]*)""".r
  private val SymRe = """([A-Za-z_][A-Za-z0-9_]*)(\?|\+|\*|\{(\d+)\}|\{(\d+),(\d+)\}|\{(\d+),\})?""".r
  private val AltRe = """\(([A-Za-z_][A-Za-z0-9_]*(?:\|[A-Za-z_][A-Za-z0-9_]*)+)\)(\?|\+|\*|\{(\d+)\}|\{(\d+),(\d+)\}|\{(\d+),\})?""".r
  private val BareAltRe = """([A-Za-z_][A-Za-z0-9_]*(?:\|[A-Za-z_][A-Za-z0-9_]*)+)""".r

  /** MATCH_RECOGNIZE-lite: compile a SQL-PATTERN-clause-flavored string
    * spec to a [[Pattern]], with the symbol→predicate map playing the
    * DEFINE clause — the Flink Table-API entry point for users who reach
    * for the SQL form before the builder:
    *
    * {{{
    * val pat = Pattern.matchRecognize("signup !error click{1,3} promo? within 24h")(
    *   "signup" -> (_.event_type == "signup"),
    *   "error"  -> (_.event_type == "error"),
    *   "click"  -> (_.event_type == "click"),
    *   "promo"  -> (_.event_type == "promo"))
    * }}}
    *
    * Grammar (whitespace-separated tokens, left to right):
    *   - `sym`          required stage       (builder `followedBy`)
    *   - `sym?`         optional stage       (builder `.optional`)
    *   - `sym{n}`       exactly n            (builder `.times(n)`)
    *   - `sym{a,b}`     between a and b      (builder `.times(a, b)`)
    *   - `sym+`         one or more, unbounded (builder `.oneOrMore`, r14)
    *   - `sym*`         zero or more, unbounded (builder `.oneOrMore.optional`
    *                    — the flink `oneOrMore().optional()` composition, r15)
    *   - `sym{a,}`      at least a, unbounded (`.times(a)` + `.oneOrMore`;
    *                    `{0,}` ≡ `*`)
    *   - `(a|b)`        ALTERNATION: one stage accepting either symbol
    *                    (SQL PATTERN `(A|B)`), desugared to a single stage
    *                    whose predicate is the OR of the member DEFINEs —
    *                    so every downstream semantics (greedy consumption,
    *                    guards, quantifiers, the matcher core) is
    *                    untouched. Quantifiers bind the whole group:
    *                    `(a|b)?`, `(a|b){2}`, `(a|b){1,3}`. Bare `a|b`
    *                    (no parens) is accepted when unquantified.
    *   - `!sym`         gap guard before the next positive stage
    *                    (builder `notFollowedBy`)
    *   - `within <n><ms|s|m|h|d>`  horizon, must be the final two tokens
    *
    * Everything funnels through
    * the public builder
    * methods, so every shape rule (head required/unguarded, no dangling
    * guard, no guard adjacent to an optional) is enforced identically to
    * hand-built patterns, and the compiled [[PosStage]] model — hence
    * matcher semantics, streaming processor, and batch surface — is
    * byte-for-byte the builder's. */
  def matchRecognize(spec: String)(define: (String, Event => Boolean)*): Pattern = {
    val defs = define.toMap
    require(defs.size == define.size,
      s"duplicate DEFINE symbol among ${define.map(_._1).mkString(", ")}")
    def predOf(sym: String): Event => Boolean = defs.getOrElse(sym,
      throw new IllegalArgumentException(
        s"symbol '$sym' has no DEFINE entry (defined: ${defs.keys.toSeq.sorted.mkString(", ")})"))
    val toks = spec.trim.split("""\s+""").toList.filter(_.nonEmpty)
    val (patToks, horizon) = toks.indexOf("within") match {
      case -1 => (toks, None)
      case i =>
        require(i == toks.length - 2,
          "'within' must be the penultimate token: ... within <n><ms|s|m|h|d>")
        val ms = toks(i + 1) match {
          case DurRe(n, u) =>
            n.toLong * (u match {
              case "ms" => 1L; case "s" => 1000L; case "m" => 60000L
              case "h" => 3600000L; case "d" => 86400000L
            })
          case bad => throw new IllegalArgumentException(
            s"bad duration '$bad' (want <n><ms|s|m|h|d>)")
        }
        (toks.take(i), Some(ms))
    }
    require(patToks.nonEmpty, "empty pattern spec")
    var pat: Pattern = null
    // alternation: OR the member DEFINEs into one stage predicate; the
    // stage keeps the group spelling as its name
    def altPred(syms: String): Event => Boolean = {
      val members = syms.split('|').toSeq
      require(members.distinct.size == members.size,
        s"duplicate symbol in alternation ($syms)")
      val preds = members.map(predOf)
      e => preds.exists(_(e))
    }
    def addStage(name: String, pred: Event => Boolean, quant: String,
                 n: String, from: String, to: String, atLeast: String): Unit = {
      pat = if (pat == null) begin(name)(pred) else pat.followedBy(name)(pred)
      quant match {
        case null => ()
        case "?" => pat = pat.optional
        case "+" => pat = pat.oneOrMore
        case "*" => pat = pat.oneOrMore.optional // zero-or-more (r15)
        case _ if n != null => pat = pat.times(n.toInt)
        case _ if atLeast != null =>
          // {a,}: a required occurrences (times desugar), then the last
          // replica repeats unbounded; {0,} is the star composition
          if (atLeast.toInt > 1) pat = pat.times(atLeast.toInt)
          pat = pat.oneOrMore
          if (atLeast.toInt == 0) pat = pat.optional
        case _ => pat = pat.times(from.toInt, to.toInt)
      }
    }
    patToks.foreach {
      case NegRe(sym) =>
        require(pat != null, "a pattern cannot start with a !guard")
        pat = pat.notFollowedBy(sym)(predOf(sym))
      case AltRe(syms, quant, n, from, to, atLeast) =>
        addStage(syms, altPred(syms), quant, n, from, to, atLeast)
      case BareAltRe(syms) =>
        addStage(syms, altPred(syms), null, null, null, null, null)
      case SymRe(sym, quant, n, from, to, atLeast) =>
        addStage(sym, predOf(sym), quant, n, from, to, atLeast)
      case t => throw new IllegalArgumentException(s"unparseable pattern token '$t'")
    }
    val built = horizon.fold(pat)(pat.within)
    built.compiled // eager shape validation: a bad spec fails at parse, not first use
    built
  }
}
