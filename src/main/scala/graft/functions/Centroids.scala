package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid assignment against a small driver-held codebook — the
  * IVF/k-means inner loop as ONE expression call per vector.
  *
  * The codebook is an ordinary constructor field (shipped in the serialized
  * expression, referenced via `references` in generated code), NOT literal
  * children: embedding the centroids as literals changes the generated
  * source every Lloyd iteration, so Janino recompiles the whole stage per
  * pass — measured as the dominant cost of the training loop. With a
  * reference-held codebook the plan SHAPE is iteration-invariant: codegen
  * compiles once, every pass (and every bench run) reuses it.
  *
  * CodegenFallback is deliberate (same argument as TextSketches): one
  * virtual call per row, k·d fused multiply-adds inside compiled Scala.
  * Assignment is row-local — the corpus is labeled in its scan stage with
  * NO join and NO shuffle, which is what makes a Lloyd pass "one
  * distributed map + one k-group aggregate" at any corpus size.
  *
  * Ties (equal cosine) resolve to the smallest centroid id, matching a
  * `row_number over (order by cos desc, id)` pick. Zero-norm vectors or an
  * empty codebook yield the first id (cosine NULL-vs-0 never arises here:
  * test embeddings are non-degenerate, and ANY consistent choice keeps the
  * assignment deterministic). */
case class NearestCentroid(child: Expression, cents: Seq[(Int, Seq[Float])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  // precomputed primitive codebook (ids ascending for smallest-id ties)
  @transient private lazy val sorted = cents.sortBy(_._1)
  @transient private lazy val ids: Array[Int] = sorted.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Float]] = sorted.map(_._2.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val m = math.min(n, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val xi = e.getFloat(i).toDouble
        val yi = cv(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val cos = if (m == 0 || na == 0.0 || nb == 0.0) Double.NegativeInfinity
        else dot / (math.sqrt(na) * math.sqrt(nb))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    if (ids.isEmpty) 0 else ids(best)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature: bit i of the result is set iff the
  * vector's dot product with plane i is positive. One expression call per
  * vector — row-local, so signature building shuffles NOTHING; the bucket
  * (or a band slice of it) becomes the shuffle key of the downstream
  * banded join. Same design choices as [[NearestCentroid]]:
  *
  *   - planes are a reference-held constructor field, not literal children
  *     — the generated plan shape is seed-invariant so codegen caches;
  *   - CodegenFallback: one virtual call per row amortized over
  *     planes×dims fused multiply-adds in compiled Scala (replaces the
  *     interpreted `zip_with`+`aggregate` HOF pipeline, which walked
  *     16 ArrayTransform/ArrayAggregate trees per row);
  *   - each dot is a left-to-right double fold — bit-identical to the HOF
  *     formulation it replaces, so bucket ids (rows-only contract) do not
  *     shift.
  *
  * At most 64 planes (bits of a long). */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  require(planes.length <= 64, "signature is packed into one long")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hyperplane_sig"

  @transient private lazy val pl: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    var sig = 0L
    var b = 0
    while (b < pl.length) {
      val w = pl(b)
      val m = math.min(n, w.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += e.getFloat(i).toDouble * w(i); i += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object CentroidFunctions {
  /** Nearest-centroid id (ties → smallest id) of an array<float> column
    * against a driver-held codebook. */
  def nearest_centroid(emb: Column, cents: Seq[(Int, Seq[Float])]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(emb), cents))

  /** Packed sign-bit LSH signature of an array<float> column against a
    * driver-held plane set (≤ 64 planes). */
  def hyperplane_sig(emb: Column, planes: Seq[Seq[Double]]): Column =
    GraftBridge.column(HyperplaneSignature(GraftBridge.expression(emb), planes))
}
