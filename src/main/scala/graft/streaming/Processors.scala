package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** SURVEY.md §2.8 — transformWithState StatefulProcessors: the closest
  * Spark 4 analog of Flink's KeyedProcessFunction + keyed state + timers
  * (near- but not 1:1 — the CEP builder's two documented deviations, greedy
  * single-match `optional` and negatives-outrank-positives, are in
  * [[graft.streaming.Pattern]]'s scaladoc). Each
  * processor below is a classic from the Flink-training canon, re-expressed
  * on Spark's arbitrary-state API.
  *
  * Scale posture: state lives in the per-partition StateStore keyed by the
  * group key. Per-event state is bounded — count windows flush at n, CEP
  * lists prune to their time horizon, timer state clears on fire — with one
  * deliberate exception: [[BandBucketProcessor]] maintains a standing band
  * index that grows linearly with the corpus (it IS the index; see its
  * scaladoc for the retention contract), and the pair-dedup state that
  * [[StreamOps.bandedDedupStream]] composes after it is the verified
  * near-dup set itself.
  */

/** Shared cent quantization for processors whose batch twins use Spark
  * SQL `round()` (HALF_UP, away from zero). Java `math.round` rounds half
  * toward +infinity, which disagrees on negative exact half-cents
  * (-0.025 → -2 vs HALF_UP's -3); settle-equivalence is integer equality,
  * so streaming must quantize with the batch semantics (ADVICE r11). */
private[streaming] object Quantize {
  def cents(v: Double): Long =
    BigDecimal(v * 100.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
}

/** Count-based window (Flink countWindow(n)): buffer per key, flush an
  * aggregate every n records. Emits (key, windowIndex, count, sum). */
case class CountWindowResult(user_id: Long, window_idx: Long, n: Long, sum_value: Double)

class CountWindowProcessor(n: Int)
    extends StatefulProcessor[Long, Event, CountWindowResult] {
  @transient private var buf: ListState[Double] = _
  @transient private var windows: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Double]("buf", Encoders.scalaDouble, TTLConfig.NONE)
    windows = getHandle.getValueState[Long]("windows", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[CountWindowResult] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[CountWindowResult]
    rows.foreach { e =>
      buf.appendValue(e.value)
      val vals = buf.get().toArray
      if (vals.length >= n) {
        val idx = if (windows.exists()) windows.get() else 0L
        out += CountWindowResult(key, idx, vals.length.toLong, vals.sum)
        windows.update(idx + 1)
        buf.clear()
      }
    }
    out.iterator
  }
}

/** Streaming twin of batch `q_ts_fill_forward` (SURVEY §2.8
  * s_ts_fill_forward, r13): LOCF as live enrichment — per user ONE
  * ValueState long (the last observed purchase amount in cents, floor
  * semantics matching the batch window's floor(value·100)); every
  * arriving event emits its filled value, None before the first
  * observation. The minimal stateful-enrichment contract (a keyed
  * ValueState richMap, Flink's introductory state example) next to the
  * multi-stage CEP/funnel processors. The state is a LEFT FOLD of the
  * event order, so order IS the semantics: within a micro-batch rows
  * fold in (ts, event_id) order (shuffle-arrival is not trusted); across
  * batches arrival order is the KeyedProcessFunction contract — the
  * settle test replays in order and asserts BITWISE equality against
  * the batch [[graft.ops.TimeWindows.tsFillForwardRows]] frame. */
case class FilledPoint(user_id: Long, event_id: Long, is_obs: Boolean,
    filled_c: Option[Long])

class FillForwardProcessor extends StatefulProcessor[Long, Event, FilledPoint] {
  @transient private var last: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[Long]("last", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[FilledPoint] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FilledPoint]
    rows.toSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id)).foreach { e =>
      val obs = e.event_type == "purchase"
      if (obs) last.update(math.floor(e.value * 100.0).toLong)
      out += FilledPoint(key, e.event_id, obs,
        if (last.exists()) Some(last.get()) else None)
    }
    out.iterator
  }
}

/** Streaming twin of batch `q_ts_ewma` (SURVEY §2.8 s_ts_ewma): per-key
  * truncated EWMA with α = ½ over the last 16 values, scaled by 2¹⁶ so
  * every emitted point is the EXACT int64 the batch window computes —
  * settle-equivalence is integer equality, not float tolerance. State is
  * the 16-deep ring of recent cent values (bounded, ~128 bytes/key).
  * Within a micro-batch rows fold in (ts, event_id) order (the iterator's
  * arrival order is shuffle-dependent); across batches arrival order is
  * trusted, the KeyedProcessFunction contract. */
case class EwmaPoint(user_id: Long, event_id: Long, n_terms: Int, ewma_x65536: Long)

class EwmaProcessor extends StatefulProcessor[Long, Event, EwmaPoint] {
  @transient private var ring: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getListState[Long]("ring", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[EwmaPoint] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[EwmaPoint]
    var buf = ring.get().toVector // oldest..newest
    // epoch-SECOND then event_id — the batch window's exact sort key (its
    // t column is epochS; ms-precision ordering could disagree on ties)
    rows.toSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id)).foreach { e =>
      buf = (buf :+ Quantize.cents(e.value)).takeRight(16)
      val s = buf.reverseIterator.zipWithIndex
        .map { case (c, k) => c * (1L << (15 - k)) }.sum
      out += EwmaPoint(key, e.event_id, buf.length, s)
    }
    ring.clear()
    buf.foreach(ring.appendValue)
    out.iterator
  }
}

/** Streaming twin of batch `q_ts_similarity` (SURVEY §2.8
  * s_ts_similarity) — live template matching over unbounded series: per
  * key, a ring of the last `template.length` cent values; every event
  * that completes a window emits its exact-integer squared Euclidean
  * distance to the broadcast template. This is the shape the
  * streaming-similarity literature runs ("alert when the last k ticks
  * look like pattern P") — the batch query's top-10 cut becomes a
  * downstream threshold/rank over this score stream. State: ≤ k longs
  * per key; distances are int64-exact so the settle test is equality. */
case class SimScore(user_id: Long, t_end: Long, dist2: Long)

class TemplateMatchProcessor(template: Array[Long])
    extends StatefulProcessor[Long, Event, SimScore] {
  @transient private var ring: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getListState[Long]("ring", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[SimScore] = {
    val k = template.length
    val out = scala.collection.mutable.ArrayBuffer.empty[SimScore]
    var buf = ring.get().toVector // oldest..newest
    rows.toSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id)).foreach { e =>
      buf = (buf :+ Quantize.cents(e.value)).takeRight(k)
      if (buf.length == k) {
        var d = 0L; var i = 0
        while (i < k) { val x = buf(i) - template(i); d += x * x; i += 1 }
        out += SimScore(key, e.ts.getTime / 1000L, d)
      }
    }
    ring.clear()
    buf.foreach(ring.appendValue)
    out.iterator
  }
}

/** Streaming twin of batch `q_cep_ascending` (SURVEY §2.8
  * s_cep_ascending) — a true Flink-style IterativeCondition: the accept
  * predicate compares each event to the PREVIOUS accepted event ("keeps
  * strictly rising"), state is O(1) per key (last cents + current run
  * register), and a completed run ≥ minLen emits exactly when the
  * ascent BREAKS. Runs still open when the stream pauses are
  * (correctly) unreported — the batch query sees them only because its
  * input ends; tests close them with a sentinel break event. */
case class AscendRun(user_id: Long, run_len: Long, t_start: Long, t_end: Long,
                     cents_first: Long, cents_last: Long)
case class AscendState(lastCents: Long, len: Long, tStart: Long,
                       centsFirst: Long, tLast: Long)

class AscendingRunProcessor(minLen: Int)
    extends StatefulProcessor[Long, Event, AscendRun] {
  @transient private var st: ValueState[AscendState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[AscendState]("run",
      Encoders.product[AscendState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[AscendRun] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AscendRun]
    var s = if (st.exists()) st.get() else null
    // epoch-second + event_id order, the batch sort key (see EwmaProcessor)
    rows.toSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id)).foreach { e =>
      val t = e.ts.getTime / 1000L
      val c = Quantize.cents(e.value)
      if (s == null) s = AscendState(c, 1L, t, c, t)
      else if (c > s.lastCents) // the ITERATIVE condition: vs previous accepted
        s = AscendState(c, s.len + 1, s.tStart, s.centsFirst, t)
      else { // ascent breaks: close the run, start a new one at this event
        if (s.len >= minLen)
          out += AscendRun(key, s.len, s.tStart, s.tLast, s.centsFirst, s.lastCents)
        s = AscendState(c, 1L, t, c, t)
      }
    }
    if (s != null) st.update(s)
    out.iterator
  }
}

/** Streaming twin of batch `q_win_streak` (SURVEY §2.8 s_win_streak):
  * per-user consecutive-day streak maintenance — the live engagement
  * counter a dashboard reads ("current streak / best streak"), folded
  * from O(1) state per key: last active day, current run (len, start),
  * best run (len, start, end; EARLIEST start wins ties, the batch R1
  * rule), and total active days. In-batch rows fold in day order;
  * duplicate days are absorbed; across batches arrival order is trusted
  * (the KeyedProcessFunction contract, same as [[EwmaProcessor]]).
  * Emits a snapshot per trigger tagged with a revision; the settled
  * frame equals the batch query exactly. */
case class StreakState(lastDay: Long, curLen: Long, curStart: Long,
                       bestLen: Long, bestStart: Long, bestEnd: Long, nDays: Long)
case class StreakRow(user_id: Long, rev: Long, n_active_days: Long,
                     longest_streak: Long, streak_start: Long, streak_end: Long)

class StreakProcessor extends StatefulProcessor[Long, Event, StreakRow] {
  @transient private var st: ValueState[StreakState] = _
  @transient private var revState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[StreakState]("streak",
      Encoders.product[StreakState], TTLConfig.NONE)
    revState = getHandle.getValueState[Long]("rev", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[StreakRow] = {
    var s = if (st.exists()) st.get()
      else StreakState(Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.toSeq.map(_.ts.getTime / 86400000L).sorted.foreach { day =>
      if (day != s.lastDay) {
        val (len, start) =
          if (day == s.lastDay + 1) (s.curLen + 1, s.curStart) else (1L, day)
        // strictly-greater keeps the EARLIEST start on equal length
        val (bl, bs, be) =
          if (len > s.bestLen) (len, start, day) else (s.bestLen, s.bestStart, s.bestEnd)
        s = StreakState(day, len, start, bl, bs, be, s.nDays + 1)
      }
    }
    st.update(s)
    val rev = (if (revState.exists()) revState.get() else 0L) + 1L
    revState.update(rev)
    Iterator.single(StreakRow(key, rev, s.nDays, s.bestLen, s.bestStart, s.bestEnd))
  }
}

/** Streaming twin of batch `q_sample_reservoir` (SURVEY §2.8
  * s_sample_reservoir): per-key bounded priority reservoir — keep the
  * top-k docs by (priority desc, doc_id asc) over an unbounded ingest
  * stream. Priorities are the batch op's exact integers (content-keyed,
  * computed upstream), so the settled reservoir EQUALS the batch top-k
  * rows — integer equality, no sampling tolerance. State: ≤ k (prio,
  * doc_id) pairs per key, cardinality-independent — the streaming
  * reservoir never materializes a stratum, the same bound the batch
  * plan's WindowGroupLimit gives. Each trigger emits a full snapshot
  * tagged with a per-key revision; readers keep the max revision. */
case class ReservoirDoc(doc_id: Long, lang: String, n_chars: Long, prio: Long)
case class ReservoirRow(lang: String, rev: Long, rk: Int, doc_id: Long, prio: Long)

class ReservoirProcessor(k: Int)
    extends StatefulProcessor[String, ReservoirDoc, ReservoirRow] {
  @transient private var entries: ListState[(Long, Long)] = _ // (prio, doc_id)
  @transient private var revState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    entries = getHandle.getListState[(Long, Long)]("entries",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    revState = getHandle.getValueState[Long]("rev", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[ReservoirDoc],
      timers: TimerValues): Iterator[ReservoirRow] = {
    // .distinct: at-least-once replays must absorb idempotently — a
    // re-sent doc already in the reservoir would otherwise occupy two
    // slots and evict a legitimate k-th entry (ADVICE r11)
    val merged = (entries.get().toSeq ++ rows.map(d => (d.prio, d.doc_id)))
      .distinct.sortBy { case (p, id) => (-p, id) }.take(k)
    entries.clear()
    merged.foreach(entries.appendValue)
    val rev = (if (revState.exists()) revState.get() else 0L) + 1L
    revState.update(rev)
    merged.iterator.zipWithIndex.map { case ((p, id), i) =>
      ReservoirRow(key, rev, i + 1, id, p)
    }
  }
}

/** One banded vector id routed to its band bucket: bkey = band·2¹⁶ | bits
  * (band < 24, bits < 2¹⁶ — the packing is collision-free). Ids only —
  * the bucket index never carries embeddings (r16 state-size fix; the
  * embeddings live once per verify hop in [[EmbedAttachProcessor]] /
  * [[EmbedVerifyProcessor]]). */
case class BandId(bkey: Long, vec_id: Long)
/** A message on the verify path, keyed by `key`. Three shapes share the
  * encoder: a REGISTRATION (a == Long.MinValue, emb = the vector, key =
  * its vec_id), an unverified CANDIDATE from the band stage (emb empty,
  * key = b), and an emb_b-ATTACHED candidate from the attach stage
  * (emb = b's embedding, key = a). */
case class VerifyMsg(key: Long, a: Long, b: Long, emb: Array[Float])
/** The single stored embedding copy per vector per verify hop. */
case class EmbState(e: Array[Float])
/** A verified near-dup pair — same columns as the batch
  * q_dedup_embed_banded_prod contract row. */
case class NearDupPair(vec_a: Long, vec_b: Long, cos: Double)

/** Exact batch-twin float math for the streaming near-dup verifier:
  * cosine as the same left-to-right double fold the codegen'd
  * [[graft.functions.CosineSimilarity]] emits (None for empty/zero-norm,
  * matching its NULL), and round-half-up at 4 decimals exactly as Spark
  * SQL `round()` — so settle-equivalence against the batch row is
  * BITWISE equality on the cos column, not a float tolerance (the
  * Quantize.cents discipline). */
private[streaming] object ExactCosine {
  def cos(x: Array[Float], y: Array[Float]): Option[Double] = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (n == 0 || na == 0.0 || nb == 0.0) None
    else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}

/** Band stage of the streaming production-threshold banded near-dup row
  * (SURVEY §2.8 `s_dedup_embed_banded`): one band bucket per key — the
  * keyed state IS the standing band index the batch path pins
  * ([[graft.ops.LlmVector.prodBandTable]] under Layout.materialize),
  * maintained live as vectors arrive, but holding IDS ONLY (8 bytes per
  * band row — r16: the r15 shape carried the full embedding in every one
  * of a vector's 24 band buckets, a 24× state bill the 100 TB posture
  * can't pay). Each arrival pairs against the bucket's member ids and
  * emits UNVERIFIED candidates (key = the larger id, emb empty); the
  * exact-cosine verify happens downstream on the read side
  * ([[EmbedAttachProcessor]] → [[EmbedVerifyProcessor]], one embedding
  * copy per hop). A pair colliding in several bands emits once per band,
  * deduped by the final keyed pair-dedup that
  * [[StreamOps.bandedDedupStream]] composes (Flink would need the same
  * keyBy(pair) dedup after its per-bucket CoProcess). Re-sent vectors
  * absorb via bucket membership (the at-least-once discipline every
  * census processor follows). State across all 24 buckets ≡ the batch
  * band table's (band, bits, vec_id) rows — 24 longs per vector, linear
  * in corpus, hash-partitioned by bucket like every keyed state. */
class BandBucketProcessor
    extends StatefulProcessor[Long, BandId, VerifyMsg] {
  @transient private var members: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[Long]("members",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[BandId],
      timers: TimerValues): Iterator[VerifyMsg] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[VerifyMsg]
    var cur = members.get().toVector
    val seen = scala.collection.mutable.HashSet.empty[Long]
    cur.foreach(seen += _)
    // vec_id order inside the micro-batch: the pair SET is arrival-order-
    // insensitive (every unordered pair meets exactly once), the sort just
    // keeps replays deterministic (the FillForward convention)
    rows.toSeq.sortBy(_.vec_id).foreach { v =>
      if (seen.add(v.vec_id)) {
        cur.foreach { m =>
          val (lo, hi) = if (m < v.vec_id) (m, v.vec_id) else (v.vec_id, m)
          out += VerifyMsg(hi, lo, hi, Array.emptyFloatArray)
        }
        members.appendValue(v.vec_id)
        cur = cur :+ v.vec_id
      }
    }
    out.iterator
  }
}

/** Attach stage of the streaming banded near-dup verify path: keyed by
  * the candidate's LARGER id b, holds exactly ONE embedding copy per
  * vector (ValueState — registrations are idempotent under at-least-once
  * replay), and forwards each candidate re-keyed to its smaller id a with
  * b's embedding attached. Candidates can only be generated after both
  * ids passed the band stage, and registrations ride the same micro-batch
  * as their source rows, so b's embedding is always in state (or in this
  * very batch — registrations are applied first) by the time a candidate
  * arrives; the pending list is pure at-least-once armor and is empty in
  * steady state. */
class EmbedAttachProcessor
    extends StatefulProcessor[Long, VerifyMsg, VerifyMsg] {
  @transient private var emb: ValueState[EmbState] = _
  @transient private var pending: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    emb = getHandle.getValueState[EmbState]("emb",
      Encoders.product[EmbState], TTLConfig.NONE)
    pending = getHandle.getListState[Long]("pending",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[VerifyMsg],
      timers: TimerValues): Iterator[VerifyMsg] = {
    val rs = rows.toVector
    // registrations first: a candidate and its b-registration can share a
    // micro-batch (intra-batch discovery)
    rs.foreach { r => if (r.a == Long.MinValue) emb.update(EmbState(r.emb)) }
    val out = scala.collection.mutable.ArrayBuffer.empty[VerifyMsg]
    val cands = rs.filter(_.a != Long.MinValue).map(_.a) ++
      (if (pending.exists()) { val p = pending.get().toVector; pending.clear(); p }
       else Vector.empty)
    if (cands.nonEmpty) {
      if (emb.exists()) {
        val e = emb.get().e
        // sorted: replay-deterministic output order (FillForward convention)
        cands.distinct.sorted.foreach(a => out += VerifyMsg(a, a, key, e))
      } else cands.foreach(pending.appendValue) // armor; see scaladoc
    }
    out.iterator
  }
}

/** Verify stage of the streaming banded near-dup path: keyed by the
  * candidate's SMALLER id a, holds the second (and last) embedding copy,
  * and runs the exact batch-twin cosine gate — raw-cos threshold FIRST,
  * round(,4) on emission, the batch plan's filter-then-project order — so
  * settle-equivalence against q_dedup_embed_banded_prod stays BITWISE. */
class EmbedVerifyProcessor(threshold: Double)
    extends StatefulProcessor[Long, VerifyMsg, NearDupPair] {
  @transient private var emb: ValueState[EmbState] = _
  @transient private var pending: ListState[VerifyMsg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    emb = getHandle.getValueState[EmbState]("emb",
      Encoders.product[EmbState], TTLConfig.NONE)
    pending = getHandle.getListState[VerifyMsg]("pending",
      Encoders.product[VerifyMsg], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[VerifyMsg],
      timers: TimerValues): Iterator[NearDupPair] = {
    val rs = rows.toVector
    rs.foreach { r => if (r.a == Long.MinValue) emb.update(EmbState(r.emb)) }
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
    val cands = rs.filter(_.a != Long.MinValue) ++
      (if (pending.exists()) { val p = pending.get().toVector; pending.clear(); p }
       else Vector.empty)
    if (cands.nonEmpty) {
      if (emb.exists()) {
        val ea = emb.get().e
        cands.sortBy(_.b).foreach { c =>
          ExactCosine.cos(ea, c.emb)
            .filter(_ >= threshold)
            .foreach(v => out += NearDupPair(c.a, c.b, ExactCosine.round4(v)))
        }
      } else cands.foreach(pending.appendValue)
    }
    out.iterator
  }
}

/** Temperature-rise alert (the canonical KeyedProcessFunction + timer
  * example): if a key's value rises and keeps rising for `horizonMs` of
  * event time, emit an alert when the event-time timer fires. A falling
  * value cancels the pending timer. */
case class RisingAlert(user_id: Long, since_ms: Long, last_value: Double)

class TimerAlertProcessor(horizonMs: Long)
    extends StatefulProcessor[Long, Event, RisingAlert] {
  @transient private var lastValue: ValueState[Double] = _
  @transient private var timerTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastValue = getHandle.getValueState[Double]("last", Encoders.scalaDouble, TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[RisingAlert] = {
    rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val prev = if (lastValue.exists()) Some(lastValue.get()) else None
      lastValue.update(e.value)
      prev match {
        case Some(p) if e.value > p && !timerTs.exists() =>
          val fireAt = e.ts.getTime + horizonMs
          getHandle.registerTimer(fireAt)
          timerTs.update(fireAt)
        case Some(p) if e.value <= p && timerTs.exists() =>
          getHandle.deleteTimer(timerTs.get())
          timerTs.clear()
        case _ => ()
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[RisingAlert] = {
    timerTs.clear()
    Iterator.single(RisingAlert(key,
      expired.getExpiryTimeInMs() - horizonMs,
      if (lastValue.exists()) lastValue.get() else Double.NaN))
  }
}

/** Login-fail CEP (flink-cep Pattern.begin("fail").times(3).within(10 min)):
  * ≥3 failures for a key within the sliding horizon emit an alert keyed by
  * the completing event. List state prunes to the horizon as events arrive. */
case class LoginEvent(user_id: Long, ts: java.sql.Timestamp, success: Boolean)
case class FailBurst(user_id: Long, n_fails: Long, first_ms: Long, last_ms: Long)

class LoginFailProcessor(horizonMs: Long, threshold: Int)
    extends StatefulProcessor[Long, LoginEvent, FailBurst] {
  @transient private var fails: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    fails = getHandle.getListState[Long]("fails", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[LoginEvent],
      timers: TimerValues): Iterator[FailBurst] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FailBurst]
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      if (e.success) {
        fails.clear() // a success resets the pattern (Flink `next` strictness)
      } else {
        val t = e.ts.getTime
        val recent = (fails.get().toArray :+ t).filter(_ > t - horizonMs).sorted
        fails.put(recent.map(Long.box))
        if (recent.length >= threshold)
          out += FailBurst(key, recent.length.toLong, recent.head, recent.last)
      }
    }
    out.iterator
  }
}

/** Streaming funnel (CEP followedBy chain, batch twin: q_funnel_order):
  * tracks the MINIMUM event time of each funnel stage per user and settles
  * the verdict with an event-time timer that keeps sliding to
  * last-seen + horizon — the verdict is evaluated once, when the watermark
  * proves the user has gone quiet. Emitting on arrival instead would be
  * wrong under out-of-order input: a late earlier-stage event can flip an
  * already-emitted conversion (append mode cannot retract). Min-tracking
  * makes the state ORDER-INSENSITIVE (min is associative/commutative), so
  * the settled verdict equals the batch query on any replay order —
  * asserted in ProcessorsSpec. After settlement a tombstone flag suppresses
  * re-tracking, so stragglers cannot trigger a second partial verdict.
  * State: three longs + a tombstone + one timer per user. */
case class FunnelConversion(user_id: Long, t_signup: Long, t_click: Long, t_purchase: Long)

class FunnelProcessor(horizonMs: Long)
    extends StatefulProcessor[Long, Event, FunnelConversion] {
  @transient private var minTs: MapState[String, Long] = _
  @transient private var timerTs: ValueState[Long] = _
  @transient private var settled: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    minTs = getHandle.getMapState[String, Long]("mins",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
    settled = getHandle.getValueState[Boolean]("settled",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[FunnelConversion] = {
    // once settled, the verdict for this user is final: a straggler funnel
    // event arriving after the timer fired must NOT restart tracking —
    // append mode cannot retract, so a second (partial) verdict for the
    // same user would diverge from the batch twin's one-row-per-user
    // contract. The tombstone makes "evaluated once" enforced, not assumed.
    if (settled.exists() && settled.get()) return Iterator.empty
    var maxSeen = if (timerTs.exists()) timerTs.get() - horizonMs else Long.MinValue
    rows.foreach { e =>
      if (e.event_type == "signup" || e.event_type == "click" || e.event_type == "purchase") {
        val t = e.ts.getTime
        if (!minTs.containsKey(e.event_type) || t < minTs.getValue(e.event_type))
          minTs.updateValue(e.event_type, t)
      }
      if (e.ts.getTime > maxSeen) maxSeen = e.ts.getTime
    }
    // slide the settlement timer to quiet-time = last activity + horizon
    if (timerTs.exists()) getHandle.deleteTimer(timerTs.get())
    val fireAt = maxSeen + horizonMs
    getHandle.registerTimer(fireAt)
    timerTs.update(fireAt)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[FunnelConversion] = {
    timerTs.clear()
    val out = for {
      s <- if (minTs.containsKey("signup")) Some(minTs.getValue("signup")) else None
      c <- if (minTs.containsKey("click")) Some(minTs.getValue("click")) else None
      p <- if (minTs.containsKey("purchase")) Some(minTs.getValue("purchase")) else None
      if s < c && c < p
    } yield FunnelConversion(key, s / 1000L, c / 1000L, p / 1000L)
    minTs.clear()
    settled.update(true) // tombstone: suppress re-tracking of stragglers
    out.iterator
  }
}

/** Hot-items top-N (THE canonical Flink-training example: windowed count →
  * per-window TopN via ProcessWindowFunction + state + timer). Keyed by the
  * tumbling-window start; a MapState holds item→count for the open window;
  * the event-time timer at window end fires once the watermark passes it,
  * emitting the N hottest items ranked by (count desc, item asc) and
  * clearing the window's state — O(distinct items) state per open window,
  * nothing unbounded. */
case class HotItem(window_start_ms: Long, rank: Long, item: String, n: Long)

class HotItemsProcessor(topN: Int, windowSizeMs: Long)
    extends StatefulProcessor[Long, Event, HotItem] {
  @transient private var counts: MapState[String, Long] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[HotItem] = {
    rows.foreach { e =>
      val prev = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, prev + 1L)
    }
    if (!armed.exists()) { // one timer per window key, at window end
      getHandle.registerTimer(key + windowSizeMs)
      armed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[HotItem] = {
    val ranked = counts.iterator().toSeq
      .sortBy { case (item, n) => (-n, item) }
      .take(topN).zipWithIndex
      .map { case ((item, n), i) => HotItem(key, i + 1L, item, n) }
    counts.clear()
    armed.clear()
    ranked.iterator
  }
}

/** Update-mode hot-items — the emit-on-update half of the Flink hot-items
  * flagship that the append-mode [[HotItemsProcessor]] (emit once at
  * window close) doesn't exercise: every micro-batch that changes a
  * window's counts emits a fresh, fully-ranked top-N SNAPSHOT for that
  * window under a bumped revision number, so a late-but-in-watermark
  * event visibly REVISES the standings (Flink: early-firing trigger /
  * retract-stream of the windowed TopN). Downstream reads the newest
  * revision per window as current truth; revision `is_final = true` is
  * emitted by the window-close timer, after which the watermark filter
  * guarantees no further input for the key — the final snapshot is the
  * sealed verdict and equals the batch q_hot_items frame (asserted on
  * scrambled replayed real events in StreamingSpec).
  *
  * Emitting the whole ≤ topN snapshot per revision (not a diff) keeps the
  * contract idempotent-read: consumers never reconstruct state from
  * deltas, and a skipped intermediate revision is harmless. State is the
  * same O(distinct items) MapState as append mode plus two scalars. */
case class HotItemRev(window_start_ms: Long, rev: Long, rank: Long,
    item: String, n: Long, is_final: Boolean)

class HotItemsUpdateProcessor(topN: Int, windowSizeMs: Long)
    extends StatefulProcessor[Long, Event, HotItemRev] {
  @transient private var counts: MapState[String, Long] = _
  @transient private var rev: ValueState[Long] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    rev = getHandle.getValueState[Long]("rev", Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  private def snapshot(key: Long, r: Long, fin: Boolean): Seq[HotItemRev] =
    counts.iterator().toSeq
      .sortBy { case (item, n) => (-n, item) }
      .take(topN).zipWithIndex
      .map { case ((item, n), i) => HotItemRev(key, r, i + 1L, item, n, fin) }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[HotItemRev] = {
    rows.foreach { e =>
      val prev = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, prev + 1L)
    }
    if (!armed.exists()) {
      getHandle.registerTimer(key + windowSizeMs)
      armed.update(true)
    }
    val r = (if (rev.exists()) rev.get() else 0L) + 1L
    rev.update(r)
    snapshot(key, r, fin = false).iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[HotItemRev] = {
    val fin = snapshot(key, (if (rev.exists()) rev.get() else 0L) + 1L, fin = true)
    counts.clear(); rev.clear(); armed.clear()
    fin.iterator
  }
}

/** Order-timeout CEP (created but not paid within the horizon): store the
  * pending order, arm an event-time timer; payment cancels it; the timer
  * firing means the watermark passed created+horizon with no payment. */
case class OrderEvent(order_id: Long, ts: java.sql.Timestamp, status: String)
case class OrderTimeout(order_id: Long, created_ms: Long)

class OrderTimeoutProcessor(horizonMs: Long)
    extends StatefulProcessor[Long, OrderEvent, OrderTimeout] {
  @transient private var createdMs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    createdMs = getHandle.getValueState[Long]("created", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[OrderEvent],
      timers: TimerValues): Iterator[OrderTimeout] = {
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      e.status match {
        case "created" =>
          createdMs.update(e.ts.getTime)
          getHandle.registerTimer(e.ts.getTime + horizonMs)
        case "paid" if createdMs.exists() =>
          getHandle.deleteTimer(createdMs.get() + horizonMs)
          createdMs.clear()
        case _ => ()
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[OrderTimeout] = {
    if (createdMs.exists()) {
      val created = createdMs.get()
      createdMs.clear()
      Iterator.single(OrderTimeout(key, created))
    } else Iterator.empty
  }
}

/** Buffered event inside [[PatternSequenceProcessor]] state (ms epoch, no
  * Timestamp — keeps the state encoder primitive). */
case class BufEv(event_id: Long, ts_ms: Long, event_type: String, value: Double)

/** One emitted pattern match: the head/tail event times plus the consumed
  * event ids in stage order. */
case class PatternMatch(user_id: Long, first_ms: Long, last_ms: Long, event_ids: Seq[Long])

/** A compiled positive pattern stage: its predicate, whether the stage may
  * be skipped (flink-cep `optional`), the negative gap guards between
  * the previous positive stage and this one (flink-cep `notFollowedBy` —
  * an event matching any guard while the gap is open invalidates the
  * head's attempt), and whether the stage repeats unbounded after its
  * first occurrence (flink-cep `oneOrMore`, r14 — greedy: once the stage
  * has consumed one event it keeps consuming every further matching
  * in-window event in preference to advancing). The [[Pattern]] builder
  * enforces the shape rules that keep greedy matching unambiguous: the
  * head stage is required and guarded gaps sit between two plain required
  * stages. A stage that is BOTH optional and kleene is ZERO-OR-MORE
  * (r15, flink's `oneOrMore().optional()` / SQL `*`): skippable before
  * its first occurrence, greedy-unbounded after it.
  *
  * r14 second batch adds the remaining flink-cep contiguity modes:
  *   - `strict` (flink-cep `.next()`): the stage must be satisfied by the
  *     IMMEDIATELY following event in the key's (ts, id) stream order —
  *     any other event in between (including one consumed by an earlier
  *     match) kills the head's attempt. Greedy-surface only ([[
  *     PatternMatcher.seal]]); rejected by [[PatternMatcher.sealAll]].
  *   - `anyMode` (flink-cep `.followedByAny()`): non-deterministic relaxed
  *     contiguity — EVERY later in-window event satisfying the stage
  *     continues a separate alternative. All-matches surface only
  *     ([[PatternMatcher.sealAll]]); rejected by the greedy matcher,
  *     whose consumed-set semantics cannot express event sharing.
  *   - `combinations` (flink-cep `.allowCombinations()`, on a kleene
  *     stage): repetitions branch non-deterministically — every matching
  *     event may be taken or skipped as the next repetition, enumerating
  *     event SUBSETS instead of the deterministic first-match chain.
  *     All-matches surface only.
  *   - `negsNext` (flink-cep `.notNext()`): STRICT gap guards — the
  *     IMMEDIATELY following available event (only) must not match any
  *     of them, vs `negs`' whole-gap scope; checked once per pointer
  *     arrival, before the stage's relaxed matching begins. Greedy
  *     surface only, same availability semantics as `strict`. */
final case class PosStage(pred: Event => Boolean, optional: Boolean,
    negs: Seq[Event => Boolean], kleene: Boolean = false,
    strict: Boolean = false, anyMode: Boolean = false,
    combinations: Boolean = false,
    negsNext: Seq[Event => Boolean] = Nil)

/** The pure matcher core of [[PatternSequenceProcessor]], factored out so
  * its central invariant — incremental matching at successive watermark
  * seals ≡ one-shot matching over the fully sorted stream — is
  * property-testable without a streaming harness (PropertySpec exercises
  * random streams × random seal schedules, including optional and negated
  * stages). */
object PatternMatcher {
  /** One partial-match state of [[sealAll]]'s explicit-stack DFS: the
    * pointer stage, whether a kleene pointer is satisfied, the index of
    * the last accepted event, the consumed ids (reversed), and the last
    * accepted event's ts. */
  private final case class MatchState(stage: Int, sat: Boolean, lastIdx: Int,
      ids: List[Long], lastMs: Long)

  /** All-required convenience overload (the original surface). */
  def seal(key: Long, buffer: Seq[BufEv], stages: Seq[Event => Boolean],
      withinMs: Long, wm: Long): (Seq[PatternMatch], Seq[BufEv]) =
    seal(key, buffer, stages.map(p => PosStage(p, optional = false, Nil)), withinMs, wm)

  /** Run leftmost-greedy matching over `buffer` for every head whose
    * window the watermark seals (head.ts + within ≤ wm). Returns
    * (matches in head order, surviving buffer). `buffer` need not be
    * sorted; `key` is echoed into the emitted rows and the predicates'
    * Event view.
    *
    * Stage semantics per gap event, in precedence order:
    *   1. negative guard hit → the head's attempt is invalidated (no
    *      match from this head; nothing consumed). Negatives outrank
    *      positives when an event matches both — documented tie-break.
    *   2. greedy-earliest positive: the event consumes the FIRST stage it
    *      matches among the reachable ones (the pointer stage, plus any
    *      directly following stages reachable by skipping optionals; a
    *      required stage is never skipped).
    *   3. no match → relaxed contiguity, event ignored — UNLESS the
    *      pointer stage is strict (flink `.next()`, r14): the first
    *      available (unconsumed) event after the last accepted one must
    *      satisfy a strict pointer, so a miss aborts the head's attempt.
    *
    * Seal safety with negatives: every event that can decide a head's
    * verdict (consume a stage OR invalidate the attempt) lies inside
    * [head, head+within] — gaps close no later than the window — so a
    * sealed window's verdict is final, and the incremental ≡ one-shot
    * property is preserved (PropertySpec).
    *
    * Shape precondition (asserted): head required and unguarded; a
    * guarded stage and its predecessor both required. The gap-guard check
    * below consults only the POINTER stage's negs, which is sound only
    * under these shapes — with a guard reachable across a skipped
    * optional, the guard would be silently ignored. The [[Pattern]]
    * builder can't produce such shapes; direct [[PosStage]] callers get
    * the same rules enforced here rather than a silent semantic hole. */
  def seal(key: Long, buffer: Seq[BufEv], stages: Seq[PosStage],
      withinMs: Long, wm: Long)(implicit d: DummyImplicit): (Seq[PatternMatch], Seq[BufEv]) = {
    require(stages.nonEmpty, "empty stage list")
    require(!stages.head.optional && stages.head.negs.isEmpty,
      "shape: the head stage must be required and unguarded")
    // optional && kleene is ZERO-OR-MORE (r15, flink oneOrMore().optional()):
    // skippable before its first occurrence (the optional arm of the
    // reachability scan), greedy-unbounded after it (the satisfied-kleene
    // pointer) — both arms below already compose, no extra state needed
    require(stages.forall(st => !st.anyMode && !st.combinations),
      "shape: followedByAny/allowCombinations stages require the all-matches " +
        "matcher (sealAll) — the greedy consumed-set surface cannot share events")
    require(!stages.head.strict, "shape: the head stage has no predecessor to be strict after")
    var k = 1
    while (k < stages.length) {
      if (stages(k).negs.nonEmpty)
        require(!stages(k).optional && !stages(k - 1).optional &&
            !stages(k).kleene && !stages(k - 1).kleene,
          s"shape: guarded stage $k must sit between two plain required stages " +
            "(a guard across a skipped optional, or straddling a oneOrMore's " +
            "repetitions, would be silently ignored)")
      if (stages(k).strict)
        require(!stages(k).optional && !stages(k).kleene && stages(k).negs.isEmpty &&
            !stages(k - 1).optional && !stages(k - 1).kleene,
          s"shape: strict (next) stage $k must be plain required with no guards, " +
            "directly after a plain required stage — 'immediately after' is " +
            "ambiguous across a skipped optional or an open-ended oneOrMore, and " +
            "a guard before a zero-length gap can never fire")
      if (stages(k).negsNext.nonEmpty)
        require(!stages(k).optional && !stages(k).kleene &&
            !stages(k - 1).optional && !stages(k - 1).kleene,
          s"shape: notNext-guarded stage $k must be plain required directly after " +
            "a plain required stage — 'the immediate successor' is ambiguous " +
            "across a skipped optional or an open-ended oneOrMore")
      k += 1
    }
    require(stages.head.negsNext.isEmpty,
      "shape: the head stage has no predecessor for a notNext guard")
    def toEvent(b: BufEv): Event =
      Event(b.event_id, new java.sql.Timestamp(b.ts_ms), key, b.event_type, b.value)
    val events = buffer.sortBy(e => (e.ts_ms, e.event_id)).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
    val consumed = scala.collection.mutable.HashSet.empty[Long]
    var i = 0
    while (i < events.length && events(i).ts_ms + withinMs <= wm) { // sealing is ts-monotone
      val head = events(i)
      if (!consumed(head.event_id) && stages.head.pred(toEvent(head))) {
        val ids = scala.collection.mutable.ArrayBuffer(head.event_id)
        // pointer invariant: `stage` is the next stage that can consume;
        // a kleene pointer with >=1 rep (pointerSat) is SATISFIED — it
        // may keep consuming (greedy) or be skipped past, and it counts
        // as done at completion
        var stage = if (stages.head.kleene) 0 else 1
        var pointerSat = stages.head.kleene
        var lastMs = head.ts_ms
        var aborted = false
        // true until the first AVAILABLE event after the last acceptance
        // has been examined — the window where a notNext guard applies
        var firstAvail = true
        var j = i + 1
        while (!aborted && stage < stages.length && j < events.length
            && events(j).ts_ms <= head.ts_ms + withinMs) {
          val e = events(j)
          // strict (next) pointer: only the immediately following
          // AVAILABLE (unconsumed) event can satisfy it — if that event
          // misses the predicate, the head's attempt dies (no retry with
          // a later event). Adjacency over unconsumed events, not raw
          // stream positions, keeps incremental ≡ one-shot: the prune
          // drops consumed events from the buffer, so a definition that
          // let a consumed event break adjacency would abort in one-shot
          // but match after an incremental prune. Callers decide what
          // "adjacent" means by what they feed/buffer (the processor
          // buffers ALL events for strict patterns, see handleInputRows).
          if (!consumed(e.event_id)) {
            val strictPtr = stages(stage).strict
            val ev = toEvent(e)
            if (firstAvail && stages(stage).negsNext.exists(n => n(ev))) {
              aborted = true // strict gap guard: the immediate successor matched a notNext
            } else if (stages(stage).negs.exists(n => n(ev))) {
              aborted = true // gap guard hit: this head can never match
            } else {
              // greedy-earliest among reachable stages: pointer stage,
              // then onward while stages are skippable — optional, or
              // the pointer itself when it is a satisfied kleene
              // (required blocks; an unsatisfied kleene is required)
              var t = stage
              var hit = -1
              var scanning = true
              while (scanning && t < stages.length) {
                if (stages(t).pred(ev)) { hit = t; scanning = false }
                else if (stages(t).optional || (t == stage && pointerSat)) t += 1
                else scanning = false
              }
              if (hit >= 0) {
                ids += e.event_id; lastMs = e.ts_ms
                if (stages(hit).kleene) { stage = hit; pointerSat = true }
                else { stage = hit + 1; pointerSat = false }
                firstAvail = true // a new gap opens behind the acceptance
              } else if (strictPtr) {
                aborted = true // the immediate available successor missed a strict stage
              } else {
                firstAvail = false // gap continues past its first available event
              }
            }
          }
          j += 1
        }
        // completion: every remaining stage is skippable — optional, or
        // the pointer as a satisfied kleene (trailing optionals and a
        // kleene tail fill greedily from the window's events and close
        // at the window edge)
        if (!aborted && (stage until stages.length).forall(t =>
            stages(t).optional || (t == stage && pointerSat))) {
          ids.foreach(consumed += _)
          out += PatternMatch(key, head.ts_ms, lastMs, ids.toSeq)
        }
      }
      i += 1
    }
    // prune: consumed events are spent; an unconsumed sealed event can
    // neither head a future match (just tried) nor join a later head
    // (later heads seal later and were also just tried) nor invalidate
    // one (a gap event follows its head, but unsealed heads start at
    // ts > wm − within ≥ any sealed event's ts) — only the undecided
    // tail survives
    val keep = events.filter(e => !consumed(e.event_id) && e.ts_ms + withinMs > wm)
    (out.toSeq, keep.toSeq)
  }

  /** All-matches (flink NO_SKIP) matching over `buffer` for every head the
    * watermark seals — the second matcher surface (r14), carrying the
    * flink-cep constructs the greedy consumed-set surface CANNOT express:
    * `followedByAny` (every later matching event continues a separate
    * alternative), non-greedy `oneOrMore` multiplicity (a match per
    * repetition count — flink's default emission, vs [[seal]]'s single
    * greedy maximal match), `allowCombinations` (repetition subsets), and
    * branched `optional` (both the with- and without- variants emit, the
    * deviation [[Pattern]]'s scaladoc documents for the greedy surface).
    *
    * Semantics per flink-cep with AfterMatchSkipStrategy.noSkip():
    *   - EVERY sealed event matching the head stage starts an attempt;
    *     events are never consumed and freely shared across matches.
    *   - From a partial-match state, a DETERMINISTIC stage (followedBy /
    *     oneOrMore without combinations) extends by the FIRST later
    *     in-window event matching it; an `anyMode` stage (followedByAny)
    *     or a `combinations` kleene extends by EVERY such event, each a
    *     separate branch. An event matching several reachable stages
    *     branches on each (reachability = the pointer, then onward across
    *     skippable stages exactly as in [[seal]]).
    *   - A state whose remaining stages are all skippable EMITS a match
    *     and keeps extending — so a kleene stage emits at every
    *     repetition count and trailing optionals emit both variants.
    *     Duplicate id-sequences from convergent branches emit once.
    *
    * Shape preconditions (asserted): no `strict` stages (next is a
    * greedy-surface modifier: "the immediate successor" is a property of
    * the single consumed chain) and no gap guards (a notFollowedBy that
    * invalidates an ATTEMPT is well-defined only when a head has exactly
    * one attempt; flink couples NOT-patterns to skip strategies the same
    * way). `combinations` only on kleene stages; head required.
    *
    * Seal safety is STRONGER than [[seal]]'s: with no consumed set there
    * is no cross-head coupling at all — a head's match set depends only
    * on events in [head, head+within], so sealed verdicts are final and
    * incremental ≡ one-shot trivially (still property-tested). Pruning
    * keeps exactly the unsealed events: a sealed event cannot partner a
    * future head (a partner's ts ≥ its head's ts, so the partner's window
    * seals no earlier than the head's — if the partner is sealed, every
    * head it could serve is sealed too, and was just enumerated).
    *
    * `maxMatches` bounds the per-key output (anyMode chains are
    * multiplicative and `combinations` is exponential in the per-window
    * repetition count — the same blow-up flink documents); exceeding it
    * throws rather than silently truncating. */
  def sealAll(key: Long, buffer: Seq[BufEv], stages: Seq[PosStage],
      withinMs: Long, wm: Long, maxMatches: Int = 1 << 20): (Seq[PatternMatch], Seq[BufEv]) = {
    require(stages.nonEmpty, "empty stage list")
    require(!stages.head.optional, "shape: the head stage must be required")
    // optional && kleene is ZERO-OR-MORE (r15): the zero-repetition branch
    // arises from the optional arm of the reachability scan (and the
    // completion rule); each repetition count still emits separately
    require(stages.forall(st => !st.strict),
      "shape: strict (next) stages require the greedy matcher — adjacency is a " +
        "property of the single consumed chain, not of branched alternatives")
    require(stages.forall(st => st.negs.isEmpty && st.negsNext.isEmpty),
      "shape: notFollowedBy/notNext guards require the greedy matcher — invalidating " +
        "'the attempt' is well-defined only when a head has exactly one attempt")
    require(stages.forall(st => !st.combinations || st.kleene),
      "shape: allowCombinations applies to a oneOrMore stage")
    def toEvent(b: BufEv): Event =
      Event(b.event_id, new java.sql.Timestamp(b.ts_ms), key, b.event_type, b.value)
    val events = buffer.sortBy(e => (e.ts_ms, e.event_id)).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
    var i = 0
    while (i < events.length && events(i).ts_ms + withinMs <= wm) { // sealing is ts-monotone
      val head = events(i)
      if (stages.head.pred(toEvent(head))) {
        val horizon = head.ts_ms + withinMs
        val seen = scala.collection.mutable.HashSet.empty[Seq[Long]]
        // completion: every remaining stage is skippable — optional, or
        // the pointer as a satisfied kleene (same rule as the greedy seal)
        def complete(stage: Int, sat: Boolean): Boolean =
          (stage until stages.length).forall(t =>
            stages(t).optional || (t == stage && sat))
        // DFS over partial-match states on an EXPLICIT stack (the JVM call
        // stack would overflow on deep deterministic-kleene chains — a key
        // with ~10k matching events in one window recursed that deep —
        // long before maxMatches fired its designed loud error); children
        // are pushed in reverse so pop order replicates the recursive
        // pre-order exactly, keeping emission order byte-identical. ids
        // accumulates in reverse.
        val stack = scala.collection.mutable.ArrayDeque(
          if (stages.head.kleene) MatchState(0, sat = true, i, List(head.event_id), head.ts_ms)
          else MatchState(1, sat = false, i, List(head.event_id), head.ts_ms))
        val children = scala.collection.mutable.ArrayBuffer.empty[MatchState]
        while (stack.nonEmpty) {
          val st = stack.removeHead()
          if (complete(st.stage, st.sat)) {
            val seq = st.ids.reverse
            if (seen.add(seq)) {
              if (out.length >= maxMatches) throw new IllegalStateException(
                s"sealAll: key $key exceeds $maxMatches matches — anyMode/" +
                  "allowCombinations patterns are combinatorial; narrow the " +
                  "window or the predicates, or raise maxMatches deliberately")
              out += PatternMatch(key, head.ts_ms, st.lastMs, seq)
            }
          }
          if (st.stage < stages.length) {
            // deterministic stages take only their FIRST matching event per
            // state; anyMode / combinations stages take every matching event
            children.clear()
            val dead = new java.util.BitSet(stages.length)
            var j = st.lastIdx + 1
            while (j < events.length && events(j).ts_ms <= horizon) {
              val ev = toEvent(events(j))
              var t = st.stage
              var scanning = true
              while (scanning && t < stages.length) {
                if (!dead.get(t) && stages(t).pred(ev)) {
                  children += (
                    if (stages(t).kleene)
                      MatchState(t, sat = true, j, events(j).event_id :: st.ids, events(j).ts_ms)
                    else
                      MatchState(t + 1, sat = false, j, events(j).event_id :: st.ids, events(j).ts_ms))
                  if (!(stages(t).anyMode || (stages(t).kleene && stages(t).combinations)))
                    dead.set(t)
                }
                if (stages(t).optional || (t == st.stage && st.sat)) t += 1 else scanning = false
              }
              j += 1
            }
            children.reverseIterator.foreach(stack.prepend)
          }
        }
      }
      i += 1
    }
    val keep = events.filter(e => e.ts_ms + withinMs > wm)
    (out.toSeq, keep.toSeq)
  }

  /** SQL-MATCH_RECOGNIZE `PERMUTE(A, B, …)` under this engine's greedy
    * SKIP-PAST-LAST-ROW semantics: collect ONE event per member, in ANY
    * arrival order, all within `withinMs` of the head. Leftmost-greedy:
    * the earliest unconsumed sealed event matching any member heads the
    * attempt (claiming the FIRST member it satisfies, in declared order —
    * relevant only for overlapping DEFINEs); each later in-window event
    * consumes the first still-outstanding member it matches; the match
    * completes when no member is outstanding, consuming its events.
    *
    * Documented deviation from SQL PERMUTE (a third next to the builder's
    * two, see [[Pattern]]): the standard desugars to an alternation of
    * the n! orderings with lexicographic preference and backtracking;
    * this engine matches the member SET greedily — for the common case of
    * type-disjoint DEFINEs the two coincide (each event can extend the
    * match in exactly one way, so the earliest-completion ordering IS the
    * only ordering), and the set form stays linear-scan per key instead
    * of n!-way backtracking.
    *
    * Seal contract, incremental ≡ one-shot, and pruning mirror [[seal]]:
    * a head's verdict depends only on events in [head, head+within], and
    * an unconsumed sealed event is dead (just tried as head; a future
    * unsealed head starts later than every sealed event, and partners
    * must follow their head) — property-tested against a consumed-set
    * reference in PropertySpec. */
  def sealPermute(key: Long, buffer: Seq[BufEv], members: Seq[Event => Boolean],
      withinMs: Long, wm: Long): (Seq[PatternMatch], Seq[BufEv]) = {
    require(members.size >= 2, "PERMUTE needs at least two members")
    def toEvent(b: BufEv): Event =
      Event(b.event_id, new java.sql.Timestamp(b.ts_ms), key, b.event_type, b.value)
    val events = buffer.sortBy(e => (e.ts_ms, e.event_id)).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
    val consumed = scala.collection.mutable.HashSet.empty[Long]
    var i = 0
    while (i < events.length && events(i).ts_ms + withinMs <= wm) {
      val head = events(i)
      if (!consumed(head.event_id)) {
        val hIdx = members.indexWhere(_(toEvent(head)))
        if (hIdx >= 0) {
          val outstanding = scala.collection.mutable.LinkedHashSet(
            members.indices.filterNot(_ == hIdx): _*)
          val ids = scala.collection.mutable.ArrayBuffer(head.event_id)
          var lastMs = head.ts_ms
          var j = i + 1
          while (outstanding.nonEmpty && j < events.length
              && events(j).ts_ms <= head.ts_ms + withinMs) {
            val e = events(j)
            if (!consumed(e.event_id)) {
              val ev = toEvent(e)
              outstanding.find(members(_)(ev)).foreach { k =>
                outstanding -= k; ids += e.event_id; lastMs = e.ts_ms
              }
            }
            j += 1
          }
          if (outstanding.isEmpty) {
            ids.foreach(consumed += _)
            out += PatternMatch(key, head.ts_ms, lastMs, ids.toSeq)
          }
        }
      }
      i += 1
    }
    val keep = events.filter(e => !consumed(e.event_id) && e.ts_ms + withinMs > wm)
    (out.toSeq, keep.toSeq)
  }
}

/** Generic linear CEP pattern — MATCH_RECOGNIZE-lite / flink-cep
  * `Pattern.begin(a).followedBy(b)….within(h)`, generalizing the
  * special-cased processors above (login-fail, funnel, order-timeout) to
  * an arbitrary predicate sequence.
  *
  * Semantics (deterministic, append-mode safe):
  *   - a match is `stages.length` events in event-time order (total order:
  *     ts, then event_id) each satisfying its stage predicate, with
  *     relaxed contiguity (followedBy — non-matching events in between are
  *     skipped), completing within `withinMs` of its first element;
  *   - leftmost-greedy with AFTER MATCH SKIP PAST LAST ROW: the earliest
  *     viable head wins, consumed events are never reused, overlapping
  *     matches are not emitted;
  *   - out-of-order input is absorbed by buffering: a head only feeds the
  *     matcher once the watermark SEALS its window (head.ts + within ≤ wm)
  *     — past that point no event inside the window can still arrive, so
  *     the verdict is final (append mode cannot retract). Sealing is
  *     monotone in head time, so incremental (per-watermark-advance)
  *     matching emits exactly what one-shot matching over the fully sorted
  *     stream would — asserted against an independent in-memory reference
  *     matcher in ProcessorsSpec.
  *
  * State per key: the unconsumed buffer, pruned every fire to events whose
  * window the watermark has not sealed — bounded by horizon × per-key event
  * rate (the login-fail prune contract); plus one sliding timer. Events no
  * stage predicate accepts are never buffered — negative gap guards count
  * as acceptors (an invalidating event must survive to its seal) — EXCEPT
  * when the pattern has a strict (next) stage: there every event is
  * buffered, because a non-matching event breaks adjacency and must be
  * visible to the matcher exactly as it is to a batch caller feeding the
  * full event set. */
class PatternSequenceProcessor(stageDefs: Seq[PosStage], withinMs: Long)
    extends StatefulProcessor[Long, Event, PatternMatch] {

  /** All-required convenience constructor (the original surface). */
  def this(preds: Seq[Event => Boolean], withinMs: Long)(implicit d: DummyImplicit) =
    this(preds.map(p => PosStage(p, optional = false, Nil)), withinMs)
  @transient private var buf: ListState[BufEv] = _
  @transient private var timerTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[BufEv]("buf", Encoders.product[BufEv], TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def toEvent(key: Long, b: BufEv): Event =
    Event(b.event_id, new java.sql.Timestamp(b.ts_ms), key, b.event_type, b.value)

  private def slideTimer(fireAt: Long): Unit =
    if (!timerTs.exists() || timerTs.get() != fireAt) {
      if (timerTs.exists()) getHandle.deleteTimer(timerTs.get())
      getHandle.registerTimer(fireAt)
      timerTs.update(fireAt)
    }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[PatternMatch] = {
    // strict contiguity AND notNext guards both key on "the immediately
    // following available event" — ANY event can be that event, so
    // adjacency-sensitive patterns buffer everything (a batch caller
    // feeding the full set must see identical verdicts)
    val hasAdjacency = stageDefs.exists(s => s.strict || s.negsNext.nonEmpty)
    rows.foreach { e =>
      val b = BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)
      val ev = toEvent(key, b)
      if (hasAdjacency || stageDefs.exists(s => s.pred(ev) || s.negs.exists(n => n(ev))))
        buf.appendValue(b)
    }
    // fire just past the current watermark: each advance re-runs sealing
    slideTimer(timers.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[PatternMatch] = {
    timerTs.clear()
    val wm = timers.getCurrentWatermarkInMs()
    val (out, keep) = PatternMatcher.seal(key, buf.get().toSeq, stageDefs, withinMs, wm)
    buf.clear()
    keep.foreach(buf.appendValue)
    if (keep.nonEmpty) slideTimer(wm + 1)
    out.iterator
  }
}

/** Streaming surface of [[PatternMatcher.sealAll]] (flink NO_SKIP, r14) —
  * identical watermark-driven buffering/sealing protocol to
  * [[PatternSequenceProcessor]], with the all-matches matcher core:
  * followedByAny branches, per-repetition-count kleene emission, optional
  * variants, allowCombinations subsets. Seal safety needs no consumed-set
  * argument here — sealAll carries no cross-head state, so a sealed
  * head's alternative set is final by window containment alone. State per
  * key: the unsealed buffer (events no stage accepts are never buffered;
  * there are no gap guards on this surface) plus one sliding timer. */
class PatternAnyProcessor(stageDefs: Seq[PosStage], withinMs: Long)
    extends StatefulProcessor[Long, Event, PatternMatch] {
  @transient private var buf: ListState[BufEv] = _
  @transient private var timerTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[BufEv]("buf", Encoders.product[BufEv], TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def toEvent(key: Long, b: BufEv): Event =
    Event(b.event_id, new java.sql.Timestamp(b.ts_ms), key, b.event_type, b.value)

  private def slideTimer(fireAt: Long): Unit =
    if (!timerTs.exists() || timerTs.get() != fireAt) {
      if (timerTs.exists()) getHandle.deleteTimer(timerTs.get())
      getHandle.registerTimer(fireAt)
      timerTs.update(fireAt)
    }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[PatternMatch] = {
    rows.foreach { e =>
      val b = BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)
      if (stageDefs.exists(_.pred(toEvent(key, b)))) buf.appendValue(b)
    }
    slideTimer(timers.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[PatternMatch] = {
    timerTs.clear()
    val wm = timers.getCurrentWatermarkInMs()
    val (out, keep) = PatternMatcher.sealAll(key, buf.get().toSeq, stageDefs, withinMs, wm)
    buf.clear()
    keep.foreach(buf.appendValue)
    if (keep.nonEmpty) slideTimer(wm + 1)
    out.iterator
  }
}

/** Streaming surface of [[PatternMatcher.sealPermute]] — identical
  * watermark-driven buffering/sealing protocol to
  * [[PatternSequenceProcessor]], with the member-SET matcher core. */
class PermuteProcessor(members: Seq[Event => Boolean], withinMs: Long)
    extends StatefulProcessor[Long, Event, PatternMatch] {
  @transient private var buf: ListState[BufEv] = _
  @transient private var timerTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[BufEv]("buf", Encoders.product[BufEv], TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def toEvent(key: Long, b: BufEv): Event =
    Event(b.event_id, new java.sql.Timestamp(b.ts_ms), key, b.event_type, b.value)

  private def slideTimer(fireAt: Long): Unit =
    if (!timerTs.exists() || timerTs.get() != fireAt) {
      if (timerTs.exists()) getHandle.deleteTimer(timerTs.get())
      getHandle.registerTimer(fireAt)
      timerTs.update(fireAt)
    }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[PatternMatch] = {
    rows.foreach { e =>
      val b = BufEv(e.event_id, e.ts.getTime, e.event_type, e.value)
      if (members.exists(_(toEvent(key, b)))) buf.appendValue(b)
    }
    slideTimer(timers.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[PatternMatch] = {
    timerTs.clear()
    val wm = timers.getCurrentWatermarkInMs()
    val (out, keep) = PatternMatcher.sealPermute(key, buf.get().toSeq, members, withinMs, wm)
    buf.clear()
    keep.foreach(buf.appendValue)
    if (keep.nonEmpty) slideTimer(wm + 1)
    out.iterator
  }
}

/** SCD2 retract-stream changelog (the streaming twin of ops.Advanced
  * .cdcScd2): each user's event_type stream is a changelog of their
  * "current activity" attribute; this processor emits the Flink
  * toRetractStream view of the type-2 dimension — `+I` opens a version,
  * and every in-run event or run change emits a `-U`/`+U` retract pair
  * (Flink RowKind UPDATE_BEFORE/UPDATE_AFTER), so a downstream sink
  * folding the changelog always holds exactly the batch SCD2 table
  * (equivalence asserted in ProcessorsSpec by folding the full stream).
  *
  * Rows are processed in (ts, event_id) order within each batch; cross-
  * batch order is the replay's responsibility (the batch query is the
  * arbiter for out-of-order history — same contract as Flink's
  * changelog-source assumption). State per key is ONE open-run record —
  * O(1), no buffers, no timers. */
case class Scd2Change(user_id: Long, kind: String, version: Long,
    event_type: String, valid_from_s: Long, valid_to_s: Option[Long],
    n_events: Long)
case class Scd2Open(version: Long, event_type: String, from_s: Long, n: Long)

class Scd2Processor extends StatefulProcessor[Long, Event, Scd2Change] {
  @transient private var open: ValueState[Scd2Open] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    open = getHandle.getValueState[Scd2Open]("open", Encoders.product[Scd2Open], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[Scd2Change] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Change]
    // epoch-SECOND granularity + event_id tiebreak — the exact total order
    // the batch query uses (R3), so sub-second timestamps cannot split
    // runs differently across the two engines
    rows.toSeq.sortBy(e => (e.ts.getTime / 1000, e.event_id)).foreach { e =>
      val t = e.ts.getTime / 1000
      if (!open.exists()) {
        open.update(Scd2Open(1L, e.event_type, t, 1L))
        out += Scd2Change(key, "+I", 1L, e.event_type, t, None, 1L)
      } else {
        val cur = open.get()
        if (cur.event_type == e.event_type) {
          out += Scd2Change(key, "-U", cur.version, cur.event_type, cur.from_s, None, cur.n)
          out += Scd2Change(key, "+U", cur.version, cur.event_type, cur.from_s, None, cur.n + 1)
          open.update(cur.copy(n = cur.n + 1))
        } else {
          out += Scd2Change(key, "-U", cur.version, cur.event_type, cur.from_s, None, cur.n)
          out += Scd2Change(key, "+U", cur.version, cur.event_type, cur.from_s, Some(t), cur.n)
          out += Scd2Change(key, "+I", cur.version + 1, e.event_type, t, None, 1L)
          open.update(Scd2Open(cur.version + 1, e.event_type, t, 1L))
        }
      }
    }
    out.iterator
  }
}

/** Event-time TEMPORAL (versioned-table) join — Flink's `FOR SYSTEM_TIME
  * AS OF` probe ⋈ versioned-dimension join, the streaming twin of the
  * batch as-of join (q_join_asof): each probe row joins the dimension
  * version valid AT THE PROBE'S EVENT TIME (latest version ts ≤ probe
  * ts, ties by event_id), NOT the latest version seen — a plain
  * stream-static or broadcast join gets this wrong the moment either
  * stream is out of order.
  *
  * Out-of-order safety is the watermark contract: a probe buffers until
  * the watermark passes its timestamp (one event-time timer per pending
  * probe ts), by which point every dimension version with ts ≤ probe_ts
  * has arrived — so the emitted row equals the batch as-of join under
  * ANY replay order within the watermark bound (asserted against an
  * independent reference in ProcessorsSpec, reversed replay included).
  * Probes with no version at-or-before their time emit matched=false
  * (LEFT temporal join; drop them for the inner form).
  *
  * State GC on every timer fire — versions strictly older than the last
  * one at-or-before the watermark are shadowed for every future probe
  * (probes behind the watermark are late-dropped upstream) and deleted:
  * Flink's temporal-join state cleanup. State per key: pruned version
  * list + pending probes + their timers. */
case class TemporalMatch(user_id: Long, probe_id: Long, t_probe_s: Long,
    version_id: Long, version_value: Double, matched: Boolean)

class TemporalJoinProcessor(dimType: String, probeType: String)
    extends StatefulProcessor[Long, Event, TemporalMatch] {
  @transient private var versions: ListState[(Long, Long, Double)] = _ // (ts_ms, event_id, value)
  @transient private var pending: ListState[(Long, Long)] = _          // (ts_ms, probe_id)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    versions = getHandle.getListState[(Long, Long, Double)]("versions",
      Encoders.product[(Long, Long, Double)], TTLConfig.NONE)
    pending = getHandle.getListState[(Long, Long)]("pending",
      Encoders.product[(Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[TemporalMatch] = {
    rows.foreach { e =>
      if (e.event_type == dimType) {
        versions.appendValue((e.ts.getTime, e.event_id, e.value))
        // watermark-driven cleanup for DIM-ONLY keys: Flink's temporal
        // join prunes state as the watermark advances whether or not
        // probes arrive, but our GC lives in handleExpiredTimer — a key
        // that only ever receives dimension versions would otherwise
        // grow its ListState unboundedly (TTLConfig.NONE). A timer at
        // the version's own event time fires once the watermark passes
        // it; with no pending probes the handler just runs the prune,
        // keeping dim-only keys at one version ≤ watermark + the tail.
        getHandle.registerTimer(e.ts.getTime)
      } else if (e.event_type == probeType) {
        pending.appendValue((e.ts.getTime, e.event_id))
        getHandle.registerTimer(e.ts.getTime)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[TemporalMatch] = {
    val wm = expired.getExpiryTimeInMs()
    val vs = versions.get().toArray.sortBy(v => (v._1, v._2))
    val (ready, rest) = pending.get().toArray.partition(_._1 <= wm)
    val out = ready.sortBy(identity).iterator.map { case (pt, pid) =>
      vs.filter(_._1 <= pt).lastOption match {
        case Some((_, vid, vv)) => TemporalMatch(key, pid, pt / 1000L, vid, vv, matched = true)
        case None => TemporalMatch(key, pid, pt / 1000L, -1L, Double.NaN, matched = false)
      }
    }
    pending.clear(); rest.foreach(pending.appendValue)
    // GC: keep the newest version at-or-before the watermark (still the
    // as-of answer for any future probe) plus everything after it
    val cutIdx = vs.lastIndexWhere(_._1 <= wm)
    val kept = if (cutIdx > 0) vs.drop(cutIdx) else vs
    versions.clear(); kept.foreach(versions.appendValue)
    out
  }
}

/** Per-window aggregate register for [[AllowedLatenessProcessor]]:
  * `fired` records that the window's first (on-time) result was emitted,
  * so later in-lateness arrivals emit tagged revisions. */
case class LateWinAgg(n: Long, sum: Double, fired: Boolean)

/** One emission of the allowed-lateness window operator. `emit_kind`:
  *   - `on_time`     — the window's first firing (watermark passed end)
  *   - `late_update` — a revision fired by an element that arrived after
  *                     the on-time firing but within allowedLateness
  *   - `side_output` — the element itself, too late even for lateness
  *                     (the Flink late-data side-output tag, expressed as
  *                     a tagged row on the single output — Spark has no
  *                     multi-output operator; consumers split by filter,
  *                     the same mapping s_side_output documents).
  * For window firings `late_event_id` is -1; for side-output rows `n` is 0
  * and `sum_value` carries the late element's value. */
case class LateWindowEmit(event_type: String, win_start: Long, emit_kind: String,
                          n: Long, sum_value: Double, late_event_id: Long)

/** TRUE allowedLateness analog (SURVEY §2.8 `s_late_side_output`, r16 —
  * upgrades the documented update-mode-revision mapping to Flink's actual
  * WindowOperator semantics): a tumbling event-time window aggregate that
  *   1. fires once when the watermark passes window end (EventTimeTrigger),
  *   2. RE-FIRES per element for late arrivals within `latenessMs`
  *      (Flink's per-element late firing under allowedLateness),
  *   3. routes elements later than end-1+latenessMs to a side output, and
  *   4. purges window state at the Flink cleanup time end-1+latenessMs —
  *      state per key is O(live windows), never corpus-bound.
  *
  * The one structural gap this has to bridge: Spark drops rows older than
  * the watermark BEFORE they reach any stateful operator, so rows Flink
  * would refire or side-output would never be seen under the natural
  * delay. The operator therefore runs under an ENLARGED Spark watermark
  * delay D = oooBound + lateness + sideHorizon and reconstructs the Flink
  * watermark inside the processor: sparkWm = maxTs - D and flinkWm =
  * maxTs - oooBound, so flinkWm = sparkWm + `shiftMs` with shiftMs =
  * D - oooBound = lateness + sideHorizon. Timers are registered in
  * shifted (Spark) time for the same reason. `sideHorizon` bounds how
  * long side-output capture stays live after a window's lateness expires
  * — the price of bounded state; Flink's side output is unbounded-lookback
  * only because it never frees the operator from the row (documented
  * deviation). Spark's initial watermark is 0 (not -inf); a 0 watermark is
  * treated as "none yet" so early windows don't misroute (the epoch-0
  * caveat every event-time timer test in this suite carries).
  *
  * Flink boundary conventions are kept exactly: a window [s, s+W) has
  * maxTimestamp = s+W-1; it fires when flinkWm >= maxTimestamp and an
  * element is side-output iff maxTimestamp + lateness <= flinkWm. */
class AllowedLatenessProcessor(windowMs: Long, latenessMs: Long, shiftMs: Long)
    extends StatefulProcessor[String, Event, LateWindowEmit] {
  @transient private var agg: MapState[Long, LateWinAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getMapState[Long, LateWinAgg]("agg",
      Encoders.scalaLong, Encoders.product[LateWinAgg], TTLConfig.NONE)

  private def flinkWm(timers: TimerValues): Long = {
    val w = timers.getCurrentWatermarkInMs()
    if (w <= 0L) Long.MinValue else w + shiftMs
  }

  override def handleInputRows(key: String, rows: Iterator[Event],
      timers: TimerValues): Iterator[LateWindowEmit] = {
    val wmF = flinkWm(timers)
    val out = scala.collection.mutable.ArrayBuffer.empty[LateWindowEmit]
    // (ts, event_id) order: emission ORDER is replay-deterministic (the
    // FillForward convention); the settled emission SET is order-free
    rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val s = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
      val maxTs = s + windowMs - 1
      if (wmF != Long.MinValue && maxTs + latenessMs <= wmF) {
        out += LateWindowEmit(key, s, "side_output", 0L, e.value, e.event_id)
      } else {
        val first = !agg.containsKey(s)
        val cur = if (first) LateWinAgg(0L, 0.0, fired = false) else agg.getValue(s)
        var upd = LateWinAgg(cur.n + 1L, cur.sum + e.value, cur.fired)
        if (first) {
          // Flink registers the cleanup timer on every element add; one
          // registration per window suffices here because the window key
          // set only grows until cleanup. The on-time fire timer is only
          // ahead of the watermark when the window hasn't fired yet.
          if (wmF < maxTs) getHandle.registerTimer(maxTs - shiftMs)
          getHandle.registerTimer(maxTs + latenessMs - shiftMs)
        }
        if (wmF != Long.MinValue && wmF >= maxTs) {
          // late-but-in-lateness: Flink's EventTimeTrigger FIREs per
          // element once the watermark sits past maxTimestamp
          out += LateWindowEmit(key, s,
            if (upd.fired) "late_update" else "on_time", upd.n, upd.sum, -1L)
          upd = upd.copy(fired = true)
        }
        agg.updateValue(s, upd)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[LateWindowEmit] = {
    // one expiry timestamp can mean fire for one window AND cleanup for an
    // older one (when lateness is a multiple of the window size); check
    // both interpretations against live state
    val tF = expired.getExpiryTimeInMs() + shiftMs
    val out = scala.collection.mutable.ArrayBuffer.empty[LateWindowEmit]
    val fireStart = tF + 1L - windowMs            // maxTs == tF
    if (Math.floorMod(fireStart, windowMs) == 0 && agg.containsKey(fireStart)) {
      val cur = agg.getValue(fireStart)
      if (!cur.fired) {
        out += LateWindowEmit(key, fireStart, "on_time", cur.n, cur.sum, -1L)
        agg.updateValue(fireStart, cur.copy(fired = true))
      }
    }
    val purgeStart = tF + 1L - latenessMs - windowMs  // maxTs + lateness == tF
    if (Math.floorMod(purgeStart, windowMs) == 0 && agg.containsKey(purgeStart))
      agg.removeKey(purgeStart)
    out.iterator
  }
}
