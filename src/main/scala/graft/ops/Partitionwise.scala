package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2.2/2.3/2.6 unit-tested rows: partition-lifecycle map
  * (RichMapFunction analog), typed cogroup, connect/co-map over a tagged
  * union, and a typed accumulator aggregate (AggregateFunction analog).
  */
object Partitionwise {

  /** RichMapFunction.open/close analog: per-partition resource lifecycle
    * around a row transform. `open` runs once per partition (connection
    * setup, codec init…), `close` once at exhaustion — the distributed
    * version of Flink's operator lifecycle, without any driver involvement. */
  def richMap[T, R, U: Encoder](ds: Dataset[T])(open: () => R)(
      f: (R, T) => U)(close: R => Unit): Dataset[U] =
    ds.mapPartitions { it =>
      val resource = open()
      new Iterator[U] {
        private var closed = false
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !closed) { close(resource); closed = true }
          h
        }
        def next(): U = f(resource, it.next())
      }
    }

  /** coGroup analog: both sides' per-key iterators in one function. */
  def cogroupStats[K: Encoder, A, B](a: Dataset[A], b: Dataset[B])(
      keyA: A => K, keyB: B => K)(
      implicit e: Encoder[(K, Long, Long)]): Dataset[(K, Long, Long)] =
    a.groupByKey(keyA).cogroup(b.groupByKey(keyB)) { (k, as, bs) =>
      Iterator.single((k, as.size.toLong, bs.size.toLong))
    }

  /** ConnectedStreams + CoMapFunction analog: two differently-typed inputs
    * mapped into one output type and unioned (the tagged-union encoding —
    * downstream operators see a single dataset, per-type logic stays in
    * the two map sides). */
  def connectComap[A, B, U: Encoder](a: Dataset[A], b: Dataset[B])(
      fa: A => U)(fb: B => U): Dataset[U] =
    a.map(fa).union(b.map(fb))

  /** Async I/O enrichment (Flink AsyncDataStream.orderedWait analog): each
    * partition keeps up to `concurrency` lookups in flight and emits
    * results in INPUT ORDER — the ordered-wait contract. The sliding
    * future-queue shape means a slow lookup backpressures only its own
    * partition, and per-element latency overlaps instead of serializing
    * (the whole point of Flink's async operator). No driver involvement;
    * the capacity bound caps per-task memory exactly like Flink's operator
    * capacity. `unorderedWait` would emit on completion order — not offered
    * here because deterministic tests (and most enrich-join uses) want
    * order preserved. Like Flink's orderedWait, a per-lookup `timeout` is
    * mandatory-by-default: a lookup that never completes fails the task
    * (java.util.concurrent.TimeoutException) instead of hanging it forever. */
  def asyncEnrichOrdered[T, U: Encoder](ds: Dataset[T], concurrency: Int,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(30, java.util.concurrent.TimeUnit.SECONDS))(
      lookup: T => scala.concurrent.Future[U]): Dataset[U] =
    ds.mapPartitions { it =>
      import scala.concurrent.{Await, Future}
      new Iterator[U] {
        private val inFlight = scala.collection.mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (inFlight.size < concurrency && it.hasNext)
            inFlight.enqueue(lookup(it.next()))
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): U = { fill(); Await.result(inFlight.dequeue(), timeout) }
      }
    }

  /** Typed accumulator aggregate (Flink AggregateFunction<IN,ACC,OUT>
    * analog): average via an explicit (sum, count) accumulator, usable both
    * as a typed Dataset agg and registered through functions.udaf. */
  class AvgAggregator extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(acc: (Double, Long), v: Double): (Double, Long) = (acc._1 + v, acc._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(acc: (Double, Long)): Double = if (acc._2 == 0) Double.NaN else acc._1 / acc._2
    def bufferEncoder: Encoder[(Double, Long)] = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
  }
}
