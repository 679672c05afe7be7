package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog distinct-count sketch as a typed Aggregator —
  * the classic Flajolet et al. dense HLL: m = 2^p byte registers, each
  * holding the maximum leading-zero rank seen for hashes routed to it,
  * with the harmonic-mean estimator plus linear-counting small-range
  * correction. Completes the first-class sketch family next to KLL
  * (quantiles) and MG (heavy hitters): `approx_count_distinct` gives the
  * same estimate shape, but its HLL++ buffer is engine-internal — this
  * one is a VALUE a pipeline can persist per day/shard and re-merge,
  * the distinct-accounting primitive a dedup ledger needs.
  *
  * Unlike the KLL and MG summaries, the merge here (register-wise max)
  * is associative, commutative, AND idempotent — the final buffer is a
  * pure function of the input SET, independent of merge tree, partition
  * layout, or duplication. The estimate is therefore run-to-run
  * deterministic; it stays `oracle: no` only because no cross-engine
  * SQL reproduces this exact register/estimator formula.
  *
  * Hash = splitmix64 finalizer over the input Long (public-domain
  * mixer; full-avalanche, which is all HLL needs). Standard error ≈
  * 1.04/√m — p=10 (1024 registers, 1 KB state) gives ~3.3%; the spec
  * asserts a 10% (3σ) envelope against exact distincts plus bitwise
  * fold-order determinism. Registers copy-on-write in reduce: after
  * warm-up almost every row leaves the buffer untouched, so the common
  * path allocates nothing. */
case class HllBuf(regs: Array[Byte])

/** The register algebra, shared by every HLL aggregator below (and by the
  * rollup query's merge path, which consumes PERSISTED register arrays). */
object Hll {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Absorb one value into the registers (copy-on-write; see reduce note
    * in [[HllDistinct]]). */
  def absorb(b: HllBuf, x: Long, p: Int): HllBuf = {
    val h = mix(x)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, +1 (capped by width)
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (b.regs(idx) >= rank) b
    else { val r = b.regs.clone(); r(idx) = rank.toByte; HllBuf(r) }
  }

  /** Register-wise max — associative, commutative, idempotent. */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val m = a.length
    val r = new Array[Byte](m)
    var i = 0
    while (i < m) { r(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    r
  }

  /** Harmonic-mean estimator + linear-counting small-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << (regs(i) & 0xff))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(corrected)
  }
}

class HllDistinct(p: Int) extends Aggregator[Long, HllBuf, Long] {
  private val m = 1 << p

  override def zero: HllBuf = HllBuf(new Array[Byte](m))

  override def reduce(b: HllBuf, x: Long): HllBuf = Hll.absorb(b, x, p)

  override def merge(b1: HllBuf, b2: HllBuf): HllBuf =
    HllBuf(Hll.union(b1.regs, b2.regs))

  override def finish(b: HllBuf): Long = Hll.estimate(b.regs)

  override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** [[HllDistinct]] that emits the raw REGISTER ARRAY instead of the
  * estimate — the persistable form: a pipeline stores one 2^p-byte value
  * per group/day/shard and later answers "distinct over ANY union of
  * groups" by register-max merging the stored buffers, never re-touching
  * the rows (see `q_distinct_sketch_rollup`). */
class HllRegisters(p: Int) extends Aggregator[Long, HllBuf, Array[Byte]] {
  override def zero: HllBuf = HllBuf(new Array[Byte](1 << p))
  override def reduce(b: HllBuf, x: Long): HllBuf = Hll.absorb(b, x, p)
  override def merge(b1: HllBuf, b2: HllBuf): HllBuf =
    HllBuf(Hll.union(b1.regs, b2.regs))
  override def finish(b: HllBuf): Array[Byte] = b.regs
  override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge-side aggregator: folds PRE-BUILT register arrays (the output of
  * [[HllRegisters]]) into one estimate. Input rows are sketch-sized, not
  * data-sized — this is the rollup that never re-reads the corpus. */
class HllMerge(p: Int) extends Aggregator[Array[Byte], HllBuf, Long] {
  override def zero: HllBuf = HllBuf(new Array[Byte](1 << p))
  override def reduce(b: HllBuf, regs: Array[Byte]): HllBuf =
    HllBuf(Hll.union(b.regs, regs))
  override def merge(b1: HllBuf, b2: HllBuf): HllBuf =
    HllBuf(Hll.union(b1.regs, b2.regs))
  override def finish(b: HllBuf): Long = Hll.estimate(b.regs)
  override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
