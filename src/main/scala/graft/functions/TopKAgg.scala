package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k aggregate: keeps the k largest (score, id) pairs per group —
  * score descending, ties broken by id ascending — and emits the ids as a
  * '/'-joined string (string form because the driver's comparator can't
  * hash array cells).
  *
  * Why a custom Aggregator instead of the window-rank formulation
  * (`row_number().over(partitionBy(g).orderBy(score.desc)) <= k`):
  * the window form materializes and SORTS every row of every group before
  * discarding all but k — at 100 TB that is a full shuffle + sort of the
  * fact table. This aggregate's state is a bounded k-element buffer, so
  * partial (map-side) aggregation reduces each partition to ≤ k candidates
  * per group before the shuffle; only k·groups tiny rows ever move. Same
  * trade Spark itself makes in `TakeOrderedAndProjectExec` for global
  * top-k, applied per group.
  *
  * Determinism: the (−score, id) total order has no ties by construction
  * (id is unique), so the result is independent of partitioning and merge
  * order — safe under SURVEY §2 rule R1.
  */
case class TopKBuf(items: Seq[(Double, Long)])

class TopKKeys(k: Int) extends Aggregator[(Double, Long), TopKBuf, String] {
  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
    TopKBuf(trim(b.items :+ a))
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(trim(b1.items ++ b2.items))
  override def finish(r: TopKBuf): String =
    trim(r.items).map(_._2).mkString("/")
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
