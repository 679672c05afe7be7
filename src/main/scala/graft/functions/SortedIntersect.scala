package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED array<bigint> columns
  * via a single merge walk — the verification kernel of set-similarity
  * joins (n-gram Jaccard, overlap, containment).
  *
  * Why an Expression (SURVEY §4.2 preference order, step (b)): the HOF
  * formulation `size(array_intersect(a, b))` is interpreted (no doGenCode)
  * AND hash-based (O(n+m) allocations per call); this emits a tight
  * primitive two-pointer loop into whole-stage codegen — zero allocation,
  * O(n+m) long comparisons. On the candidate-verify path of
  * q_dedup_ngram_jaccard that loop runs once per candidate pair, so it is
  * the hot kernel at any scale.
  *
  * CONTRACT: both inputs must be sorted ascending with distinct elements
  * (as produced by `array_sort(array_distinct(...))`); the merge walk is
  * meaningless otherwise. Inputs are never null-element-bearing in engine
  * use; null ARRAYS propagate as null results. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** First (smallest) common element of two sorted-distinct array<bigint>
  * columns, NULL if disjoint — the deduplication WITNESS of a set-similarity
  * join: an inverted-index join emits a candidate pair once per shared
  * index element, and keeping only the row whose join element equals the
  * pair's first common element yields exactly one row per pair WITHOUT a
  * pair-level groupBy/distinct (the witness is computable row-locally,
  * the aggregation is not). Same sortedness contract as
  * [[SortedIntersectSize]]. Interpreted (CodegenFallback): the early-exit
  * merge walk is a few comparisons per call and never the hot loop. */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_first_common"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) return xi
      else if (xi < yj) i += 1
      else j += 1
    }
    null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstCommon =
    copy(left = newLeft, right = newRight)
}
