package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable heavy-hitters sketch as a typed Aggregator — Misra-Gries
  * frequent-items (the deterministic counter algorithm behind SpaceSaving)
  * with the Agarwal et al. "Mergeable Summaries" merge: two summaries add
  * counter-wise, then subtract the (k+1)-th largest count from every
  * counter and drop the non-positive ones, which preserves the n/(k+1)
  * error envelope under ANY merge tree. Completes the engine's mergeable
  * sketch family: HLL (distinct), Bloom (membership), KLL (quantiles),
  * MG (frequencies) — each a bounded value partials build map-side and a
  * pipeline can persist and re-merge across days.
  *
  * Guarantees (classic MG): for every token,
  * true_count − n/(k+1) ≤ estimate ≤ true_count, and any token with
  * true_count > n/(k+1) is guaranteed present in the summary — both
  * asserted in HeavyHittersSpec against exact counts. State is ≤ k
  * counters per group, so map-side partial aggregation reduces each
  * partition to one k-counter summary before the shuffle.
  *
  * Like the KLL sketch, the surviving counter SET is order-exact only
  * per merge tree (bounded, not bitwise, under reordering) — hence the
  * contract query is `oracle: no` with unit-asserted envelopes. */
case class MGBuf(items: Map[String, Long])

class HeavyHitters(k: Int, top: Int) extends Aggregator[String, MGBuf, String] {

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, tok: String): MGBuf =
    if (b.items.contains(tok)) MGBuf(b.items.updated(tok, b.items(tok) + 1L))
    else if (b.items.size < k) MGBuf(b.items.updated(tok, 1L))
    else MGBuf(b.items.collect { case (t, c) if c > 1L => t -> (c - 1L) })

  override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
    val sum = (b1.items.keySet ++ b2.items.keySet).iterator
      .map(t => t -> (b1.items.getOrElse(t, 0L) + b2.items.getOrElse(t, 0L))).toMap
    if (sum.size <= k) MGBuf(sum)
    else {
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      MGBuf(sum.collect { case (t, c) if c > cut => t -> (c - cut) })
    }
  }

  /** Top `top` counters by (estimate desc, token asc), one string for the
    * driver's comparator (like TopKKeys). Delimiters are the ASCII
    * separator controls — unit separator 0x1F between token and estimate,
    * record separator 0x1E between entries — because corpus tokens are
    * whitespace-split with punctuation RETAINED, so printable candidates
    * like ':' or '/' can occur inside a token and would make the encoding
    * ambiguous (a "12:30" token parsed as token "12"). Control chars
    * cannot survive the whitespace tokenizer's input (documents are
    * printable text), so the parse is unambiguous by construction. */
  override def finish(b: MGBuf): String =
    b.items.toSeq.sortBy { case (t, c) => (-c, t) }.take(top)
      .map { case (t, c) => s"$t\u001F$c" }.mkString("\u001E")

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
