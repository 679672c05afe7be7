package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native CosineSimilarity expression: interpreted vs codegen parity,
  * agreement with the HOF formulation it replaced, SQL registration, and
  * the SparkSessionExtensions injection path. */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("cosine expression is bit-identical to the HOF left-fold formulation") {
    val e = graft.tables.Tables.embeddings(spark, sf("sf0.001"))
    val a = e.where($"vec_id" < 20).select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = e.where($"vec_id" >= 20 && $"vec_id" < 40)
      .select($"vec_id".as("ib"), $"embedding".as("eb"))
    val both = a.crossJoin(b)
      .select($"ia", $"ib",
        GraftFunctions.cosine_sim($"ea", $"eb").as("native"),
        hofCosine($"ea", $"eb").as("hof"))
      .collect()
    assert(both.length === 400)
    both.foreach { r =>
      val n = r.getAs[Double]("native")
      val h = r.getAs[Double]("hof")
      assert(java.lang.Double.doubleToLongBits(n) === java.lang.Double.doubleToLongBits(h),
        s"bit mismatch at (${r.get(0)}, ${r.get(1)}): $n vs $h")
    }
  }

  test("cosine expression: identity, symmetry, null propagation") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(1.0f, 2.0f, 3.0f))),
      (Some(Array(1.0f, 0.0f, 0.0f)), Some(Array(0.0f, 1.0f, 0.0f))),
      (None, Some(Array(1.0f, 2.0f, 3.0f))))
      .toDF("a", "b")
    val out = df.select(GraftFunctions.cosine_sim($"a", $"b").as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).getDouble(0) === 0.0)
    assert(out(2).isNullAt(0), "null input must propagate null")
    // symmetry
    val sym = df.limit(2).select(
      GraftFunctions.cosine_sim($"a", $"b").as("ab"),
      GraftFunctions.cosine_sim($"b", $"a").as("ba")).collect()
    sym.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("SQL registration: SELECT graft_cosine(...) works after register()") {
    GraftFunctions.register(spark)
    graft.tables.Tables.embeddings(spark, sf("sf0.001"))
      .limit(5).createOrReplaceTempView("fx_emb")
    val n = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM fx_emb").collect()
    assert(n.length === 5)
    n.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("SparkSessionExtensions injection path registers the function") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate() returns the active session (ignoring withExtensions) —
    // clear it so a genuinely new session is built over the same context,
    // then restore the shared session for the remaining suites.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val out = s2.sql(
        "SELECT graft_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c")
        .collect()
      assert(math.abs(out.head.getDouble(0) - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
