package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values (bottom-k / theta) distinct sketch as a typed
  * Aggregator — the SET-ALGEBRA member of the sketch family. HLL
  * ([[Hll]]) unions cheaply but cannot intersect: its registers carry no
  * sample of the set. A KMV sketch IS a uniform sample — the k smallest
  * hash values of the distinct input — so two sketches support
  * INTERSECTION (and difference) estimates, the audience-overlap /
  * segment-Jaccard question a marketing or dedup ledger asks that no
  * union-only sketch answers.
  *
  * Mechanics (Beyer et al. 2007 / the theta-sketch formulation): hash
  * every value with the splitmix64 finalizer, keep into [0, 2⁶³) via a
  * logical shift, and retain the k smallest DISTINCT hashes, sorted
  * ascending. θ = the k-th smallest (the sketch's sampling threshold);
  * a sketch holding fewer than k values is EXACT (θ = 2⁶³, every
  * distinct value is present). Estimators over the uniform sample:
  *   distinct(A)  ≈ (k−1) · 2⁶³ / θ_A          (full sketch)
  *   |A ∩ B|      ≈ |{x ∈ A∩B : x < θ}| · 2⁶³/θ,  θ = min(θ_A, θ_B)
  * Both collapse to exact counts in exact mode. Merge = k smallest of
  * the union of retained hashes — associative, commutative, idempotent,
  * so the final array is a pure function of the input SET (run-to-run
  * deterministic; rows-only because no cross-engine SQL reproduces the
  * hash). Relative standard error ≈ 1/√(k−2) — k = 512 gives ~4.4%.
  *
  * State: ≤ k sorted longs (4 KB at k = 512) per group; reduce keeps a
  * scratch sorted buffer, merge is one linear merge pass. The output is
  * a plain BIGINT ARRAY a pipeline can persist per segment/day and
  * re-merge or intersect later — the same persist-and-remerge contract
  * as [[HllRegisters]]. */
object Kmv {
  /** Hash to [0, 2⁶³): splitmix64 finalizer, sign bit cleared. */
  def hash(x: Long): Long = Hll.mix(x) >>> 1

  /** Sampling threshold of a sketch array (ascending, ≤ k entries). */
  def theta(arr: Array[Long], k: Int): Double =
    if (arr.length < k) math.pow(2.0, 63) else arr(arr.length - 1).toDouble

  /** Distinct estimate from a sketch array. */
  def estimate(arr: Array[Long], k: Int): Long =
    if (arr.length < k) arr.length.toLong
    else math.round((k - 1).toDouble * math.pow(2.0, 63) / arr(k - 1).toDouble)

  /** Intersection estimate of two sketch arrays (both ascending). */
  def intersect(a: Array[Long], b: Array[Long], k: Int): Long = {
    val th = math.min(theta(a, k), theta(b, k))
    // sorted-merge intersection count below θ (arrays are distinct+sorted)
    var i = 0; var j = 0; var shared = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { if (a(i) < th) shared += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    math.round(shared * math.pow(2.0, 63) / th)
  }

  /** k smallest of the merged DISTINCT values of two ascending arrays. */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}

case class KmvBuf(hashes: Array[Long])

/** Long input → ascending array of the k smallest distinct hashes. */
class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
  def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  def reduce(b: KmvBuf, x: Long): KmvBuf = {
    val h = Kmv.hash(x)
    val arr = b.hashes
    // common path after warm-up: h ≥ current θ → drop without allocating
    if (arr.length >= k && h >= arr(arr.length - 1)) b
    else {
      val pos = java.util.Arrays.binarySearch(arr, h)
      if (pos >= 0) b // already retained
      else {
        val ins = -pos - 1
        val keep = math.min(k, arr.length + 1)
        val out = new Array[Long](keep)
        System.arraycopy(arr, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(arr, ins, out, ins + 1, keep - ins - 1)
        KmvBuf(out)
      }
    }
  }

  def merge(a: KmvBuf, b: KmvBuf): KmvBuf = KmvBuf(Kmv.union(a.hashes, b.hashes, k))

  def finish(b: KmvBuf): Array[Long] = b.hashes

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
