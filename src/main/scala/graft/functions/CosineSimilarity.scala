package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity between two float-array
  * columns, computed as a single fused loop in double precision.
  *
  * Why an Expression rather than a UDF or higher-order functions:
  *   - full whole-stage-codegen participation ([[doGenCode]] emits a tight
  *     primitive loop; measured ~15× over the interpreted `aggregate()` HOF
  *     formulation on the O(n²) near-dup scan);
  *   - no serialization boundary (a Scala UDF boxes both arrays per call);
  *   - deterministic bit-exact result: each accumulator (dot, ‖a‖², ‖b‖²)
  *     is a left-to-right double fold — the same sequence of IEEE adds as
  *     DuckDB's `list_cosine_similarity` over DOUBLE[], hence hash-stable
  *     across engines (SURVEY.md rule R4).
  *
  * Preference order per SURVEY §4.2: compose built-ins (a) was the v1
  * implementation; this is step (b), taken because the pairwise scan made
  * the fold the hot path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<float> columns; callers own the contract (the
  // ExpectsInputTypes mixin is private[sql] on Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // cosine is undefined for empty or all-zero vectors: result is NULL, not
  // NaN — NaN compares true under >= in neither engine consistently and
  // would flow silently through threshold filters
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (n == 0 || na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $a.getFloat($i);
         |  final double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if ($n == 0 || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL surface for the engine's native functions. */
object GraftFunctions {
  /** Cosine similarity of two array<float> columns (codegen'd, double). */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** |a ∩ b| of two sorted-distinct array<bigint> columns (codegen'd). */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** First common element of two sorted-distinct array<bigint> columns
    * (NULL if disjoint) — the set-similarity-join dedup witness. */
  def sorted_first_common(a: Column, b: Column): Column =
    GraftBridge.column(SortedFirstCommon(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register SQL-callable names on a session (idempotent):
    * `SELECT graft_cosine(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_size",
      exprs => SortedIntersectSize(exprs.head, exprs(1)), "built-in")
  }
}

/** SparkSessionExtensions hook (the plug-in path a deployment would use:
  * `spark.sql.extensions=graft.functions.GraftExtensions`). Injects the
  * native function and the as-of-join planner strategy into every session
  * built with the extension. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs.head, exprs(1))))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
