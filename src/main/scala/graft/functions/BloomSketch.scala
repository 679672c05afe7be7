package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** First-class mergeable Bloom membership sketch — the fourth member of the
  * sketch family (KLL quantiles, MG heavy hitters, HLL distinct): a
  * persistable m-bit array answering "might this key be in the set?" with
  * false positives only, never false negatives. Like HLL (and unlike
  * KLL/MG), the merge — bitwise OR — is associative, commutative, AND
  * idempotent, so the bit array is a pure function of the input SET:
  * deterministic across runs, merge trees, and partition layouts.
  *
  * Spark's own `DataFrameStatFunctions.bloomFilter` builds an equivalent
  * sketch, but its probe (`BloomFilterMightContain`) is not public API —
  * which is why the engine's Bloom prefilter historically gated through a
  * Scala UDF (the one UDF in a hot path, documented at Layout.scala). This
  * sketch closes that gap: build via a typed [[Aggregator]] (map-side
  * partial bit arrays, OR-merged — never a row collect), probe via the
  * reference-held [[BloomMightContain]] expression (same design as
  * [[NearestCentroid]]: the bit array rides in the serialized expression,
  * not as literal children, so the generated plan shape is
  * build-invariant and codegen caches).
  *
  * Hashing: double hashing h_i = h1 + i·h2 (Kirsch-Mitzenmacher — k
  * indexes from two splitmix64-mixed hashes, the standard construction
  * with per-probe cost of one multiply-add). Keys are Long by contract;
  * hash wider keys with xxhash64 first (both call sites already join on
  * hashes). */
object Bloom {
  /** (mBits rounded to a 64-bit word multiple, k) for a target size/fpp —
    * the textbook m = −n·ln p /(ln 2)², k = (m/n)·ln 2 sizing. */
  def params(expectedItems: Long, fpp: Double): (Int, Int) = {
    val n = math.max(1L, expectedItems)
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val m = math.min(1L << 30, math.max(64L, (mRaw + 63) / 64 * 64)).toInt
    val k = math.max(1, math.round(m.toDouble / n.toDouble * ln2).toInt)
    (m, k)
  }

  private def mix2(x: Long): Long = Hll.mix(x ^ 0x9e3779b97f4a7c15L) | 1L

  /** Bit index of probe i for key x in an m-bit array (m a power-of-two
    * multiple of 64 is NOT required — remainderUnsigned handles any m). */
  private def bitOf(x: Long, i: Int, mBits: Int): Int =
    java.lang.Long.remainderUnsigned(Hll.mix(x) + i.toLong * mix2(x), mBits.toLong).toInt

  /** IN-PLACE insert (returns its argument). Unlike the HLL registers'
    * copy-on-write reduce — where 1 KB buffers and a high hit rate make
    * clones rare and cheap — a Bloom build sets fresh bits on almost every
    * insert until near saturation, and the array is MBs for
    * decontamination-sized filters: cloning per row turned the r9 build
    * quadratic (measured 2.4× on q_decontaminate_bloom before this was
    * made mutating). Spark typed Aggregators explicitly permit buffer
    * mutation in reduce/merge. */
  def insert(words: Array[Long], x: Long, k: Int): Array[Long] = {
    val mBits = words.length * 64
    var i = 0
    while (i < k) {
      val b = bitOf(x, i, mBits)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
    words
  }

  def contains(words: Array[Long], x: Long, k: Int): Boolean = {
    val mBits = words.length * 64
    var i = 0
    while (i < k) {
      val b = bitOf(x, i, mBits)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    val r = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) | b(i); i += 1 }
    r
  }

  /** a |= b, returning a — the combiner for tree-aggregate builds where
    * partials are single-owner and allocation per merge is waste. */
  def orInPlace(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def bitsSet(words: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < words.length) { s += java.lang.Long.bitCount(words(i)); i += 1 }
    s
  }

  /** Little-endian word serialization — the persistable/shippable form. */
  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val lb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val r = new Array[Long](lb.remaining())
    lb.get(r)
    r
  }

  /** Cardinality estimate from the fill level: n̂ = −(m/k)·ln(1 − X/m)
    * (Swamidass-Baldi). Saturated filters estimate as m (can't do better). */
  def estimate(words: Array[Long], k: Int): Long = {
    val m = words.length * 64.0
    val x = bitsSet(words).toDouble
    if (x >= m) m.toLong
    else math.round(-(m / k) * math.log1p(-x / m))
  }
}

case class BloomWords(words: Array[Long])

/** Build-side aggregator: Long keys → the serialized m-bit array. Map-side
  * partial bit arrays OR-merge — the distributed-build contract of
  * `stat.bloomFilter`, as a first-class persistable VALUE. */
class BloomBits(mWords: Int, k: Int)
    extends Aggregator[Long, BloomWords, Array[Byte]] {
  override def zero: BloomWords = BloomWords(new Array[Long](mWords))
  override def reduce(b: BloomWords, x: Long): BloomWords = {
    Bloom.insert(b.words, x, k); b
  }
  override def merge(a: BloomWords, b: BloomWords): BloomWords =
    BloomWords(Bloom.or(a.words, b.words))
  override def finish(b: BloomWords): Array[Byte] = Bloom.toBytes(b.words)
  override def bufferEncoder: Encoder[BloomWords] = Encoders.product[BloomWords]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge-side aggregator: folds PERSISTED bit arrays (the [[BloomBits]]
  * output) into one — sketch-sized input rows, the rollup that never
  * re-reads the corpus (mirror of `HllMerge`). */
class BloomUnion(mWords: Int)
    extends Aggregator[Array[Byte], BloomWords, Array[Byte]] {
  override def zero: BloomWords = BloomWords(new Array[Long](mWords))
  override def reduce(b: BloomWords, bytes: Array[Byte]): BloomWords =
    BloomWords(Bloom.or(b.words, Bloom.fromBytes(bytes)))
  override def merge(a: BloomWords, b: BloomWords): BloomWords =
    BloomWords(Bloom.or(a.words, b.words))
  override def finish(b: BloomWords): Array[Byte] = Bloom.toBytes(b.words)
  override def bufferEncoder: Encoder[BloomWords] = Encoders.product[BloomWords]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Row-local membership probe against a BROADCAST bit array — the
  * public-API stand-in for Spark's internal `BloomFilterMightContain`,
  * replacing the Scala UDF gate: CodegenFallback (one virtual call per
  * row around k multiply-add probes — the [[NearestCentroid]] argument),
  * false positives only by construction. Unlike NearestCentroid's k×d
  * codebook (a few KB, fine in every task closure), a decontamination-
  * sized filter is ~1 MB — holding the raw array in the expression ships
  * it per TASK; the Broadcast handle ships bytes per EXECUTOR once, which
  * is also exactly what the Scala-UDF predecessor did. */
case class BloomMightContain(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Long]], k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override def nullSafeEval(input: Any): Any =
    Bloom.contains(bc.value, input.asInstanceOf[Long], k)
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Per-row stats of a serialized bit-array column: (bits_set, est_uv) —
  * lets the membership-ledger query report fill level and cardinality
  * declaratively over sketch-sized frames. */
case class BloomStats(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("bits_set", LongType, nullable = false),
    StructField("est_uv", LongType, nullable = false)))
  override def prettyName: String = "graft_bloom_stats"
  override def nullSafeEval(input: Any): Any = {
    val words = Bloom.fromBytes(input.asInstanceOf[Array[Byte]])
    org.apache.spark.sql.catalyst.InternalRow(
      Bloom.bitsSet(words), Bloom.estimate(words, k))
  }
  override protected def withNewChildInternal(newChild: Expression): BloomStats =
    copy(child = newChild)
}

object BloomFunctions {
  def bloom_might_contain(key: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Long]], k: Int): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bc, k))
  def bloom_stats(bytes: Column, k: Int): Column =
    GraftBridge.column(BloomStats(GraftBridge.expression(bytes), k))
}
