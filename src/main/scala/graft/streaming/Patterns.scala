package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** Flink-CEP-style pattern builder — the `Pattern.begin(..).followedBy(..)
  * .within(..)` surface over the generic linear matcher, so a reference
  * user's CEP program maps 1:1 onto this engine:
  *
  * {{{
  * val pat = Pattern
  *   .begin("signup")(_.event_type == "signup")
  *   .followedBy("click")(_.event_type == "click")
  *   .within(24L * 3600 * 1000)
  * stream.groupByKey(_.user_id)
  *   .transformWithState(pat.processor, TimeMode.EventTime(), OutputMode.Append())
  * // or, bounded input:
  * pat.matchBatch(eventsDs)
  * }}}
  *
  * Semantics are [[PatternMatcher]]'s: relaxed contiguity (followedBy),
  * leftmost-greedy, no event reuse (AFTER MATCH SKIP PAST LAST ROW-style
  * consumption), each match completing within `within` of its head. The
  * streaming and batch surfaces share the matcher core, so a bounded replay
  * of any stream yields identical matches (asserted in ProcessorsSpec; the
  * batch surface is additionally oracle-checked as q_cep_pattern_seq).
  *
  * Scale posture (batch): one shuffle on the key; per-key work is a sort +
  * linear scan of that key's events — the inherent MATCH_RECOGNIZE
  * partition contract. State never crosses keys, so 1000 executors split
  * the corpus by user with no driver involvement.
  */
final case class Pattern private (
    stages: Seq[(String, Event => Boolean)],
    horizonMs: Option[Long]) {

  def followedBy(name: String)(pred: Event => Boolean): Pattern =
    copy(stages = stages :+ (name -> pred))

  /** flink-cep `.times(n)` — the LAST stage must occur n times total
    * (relaxed contiguity between occurrences), desugared to n chained
    * followedBy stages sharing the predicate. */
  def times(n: Int): Pattern = {
    require(n >= 1, s"times($n): need n >= 1")
    require(stages.nonEmpty, "times(n) needs a stage to repeat")
    val (name, pred) = stages.last
    copy(stages = stages ++ (2 to n).map(i => s"$name#$i" -> pred))
  }

  def within(ms: Long): Pattern = copy(horizonMs = Some(ms))

  def predicates: Seq[Event => Boolean] = stages.map(_._2)

  private def horizon: Long = horizonMs.getOrElse(
    throw new IllegalArgumentException("Pattern requires .within(ms)"))

  /** Streaming surface: a state processor for
    * `groupByKey(_.user_id).transformWithState`. */
  def processor: PatternSequenceProcessor =
    new PatternSequenceProcessor(predicates, horizon)

  /** Batch surface: one-shot matching per user over a bounded Dataset —
    * equivalent to replaying it through [[processor]] and sealing every
    * window (PatternMatcher's property-tested invariant). */
  def matchBatch(evs: Dataset[Event]): Dataset[PatternMatch] = {
    val preds = predicates
    val h = horizon
    implicit val enc = Encoders.product[PatternMatch]
    implicit val keyEnc = Encoders.scalaLong
    evs.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[Event]) =>
      val buf = it.map(e => BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)).toSeq
      // wm = MaxValue seals every head's window in one shot (event epochs
      // are ~2^41 ms; head.ts + within stays far from overflow)
      val (matches, rest) = PatternMatcher.seal(uid, buf, preds, h, Long.MaxValue)
      assert(rest.isEmpty, "final seal must drain the buffer")
      matches.iterator
    }
  }
}

object Pattern {
  /** Start a pattern with its first stage predicate. */
  def begin(name: String)(pred: Event => Boolean): Pattern =
    Pattern(Seq(name -> pred), None)
}
