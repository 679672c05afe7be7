package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text-sketch kernels, each a single Catalyst expression:
  * one eval call per document computes the whole sketch in compiled JVM
  * code — no explode, no per-token rows, no signature groupBy.
  *
  * Why expressions rather than the explode→groupBy formulation (SURVEY
  * §4.2 step (b)): a sketch is a PER-DOCUMENT reduction, so routing every
  * token/shingle through exploded rows and a hash aggregate shuffles the
  * entire token stream to compute what a tight loop produces in-place.
  * At 100 TB the explode form shuffles the corpus; this form shuffles
  * NOTHING for signature building — sketches are born partition-local,
  * and only the (tiny) signature relations ever hit the network.
  *
  * These use CodegenFallback deliberately: the interpreted-call overhead
  * is per DOCUMENT (one virtual call), not per token, so whole-stage
  * codegen would buy nothing measurable while tripling the code.
  *
  * Hash family: Spark's XXH64 (same primitive the built-in xxhash64 uses),
  * chained per n-gram. Sketch values are engine-internal — oracle-checked
  * outputs (Jaccard pairs) depend only on hash DISTINCTNESS, not values. */
object TextSketches {

  /** trim + single-space split, matching `split(trim(col), " ")` — the
    * tokenization every graft text operator uses. */
  private[functions] def tokenize(s: UTF8String): Array[UTF8String] = {
    val trimmed = s.trim()
    trimmed.split(UTF8String.fromString(" "), -1)
  }

  private final val Seed = 42L

  private[functions] def tokenHashes(s: UTF8String): Array[Long] = {
    val toks = tokenize(s)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = XXH64.hashUTF8String(toks(i), Seed)
      i += 1
    }
    out
  }

  /** Sorted distinct hashes of the n-gram shingles of `s` (n consecutive
    * tokens, hash-chained). Empty when the doc has fewer than n tokens. */
  private[functions] def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val th = tokenHashes(s)
    if (th.length < n) return Array.emptyLongArray
    val m = th.length - n + 1
    val sh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      sh(i) = h
      i += 1
    }
    java.util.Arrays.sort(sh)
    // in-place dedup of the sorted run
    var w = 1
    var r = 1
    while (r < m) {
      if (sh(r) != sh(w - 1)) { sh(w) = sh(r); w += 1 }
      r += 1
    }
    if (w == m) sh else java.util.Arrays.copyOf(sh, w)
  }
}

/** Sorted distinct array<bigint> of token n-gram hashes of a string column.
  * The building block of exact-Jaccard and MinHash dedup. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextSketches.shingleHashes(input.asInstanceOf[UTF8String], n))
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** 64-bit SimHash of a string column: bit i of the result is the sign of
  * Σ over TOKENS of ±1 driven by bit i of the token's hash. One pass over
  * the tokens; duplicate tokens vote once per occurrence (bag semantics,
  * matching the explode-based formulation). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def nullSafeEval(input: Any): Any = {
    val th = TextSketches.tokenHashes(input.asInstanceOf[UTF8String])
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature: array<bigint> of length `nPerm`, entry i = min over
  * the doc's distinct n-gram shingles of hash-perm i (chained rehash of the
  * shingle hash with the permutation index). NULL for docs with no
  * shingles (< n tokens) — they carry no similarity evidence and must not
  * band-collide with each other. */
case class MinHashSignature(child: Expression, n: Int, nPerm: Int)
    extends UnaryExpression with CodegenFallback {
  require(nPerm >= 1, "need at least one permutation")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val sh = TextSketches.shingleHashes(input.asInstanceOf[UTF8String], n)
    if (sh.isEmpty) return null
    val sig = new Array[Long](nPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var p = 0
      while (p < nPerm) {
        val h = XXH64.hashLong(sh(i), p.toLong)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object TextSketchFunctions {
  /** Sorted distinct n-gram shingle hashes of a text column. */
  def shingle_hashes(c: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), n))
  /** 64-bit SimHash of a text column. */
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  /** MinHash signature (nPerm mins over n-gram shingles) of a text column. */
  def minhash_sig(c: Column, n: Int, nPerm: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), n, nPerm))
}
