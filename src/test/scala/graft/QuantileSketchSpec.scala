package graft

import graft.functions.{KllBuf, QuantileSketch}

/** Bounds for the KLL-style mergeable quantile sketch: exactness below
  * capacity, the ε rank guarantee on real data against the true empirical
  * ranks, and merge-order robustness (the property that makes map-side
  * partials sound regardless of Spark's merge tree). */
class QuantileSketchSpec extends SparkTestBase {

  private val eps = 0.05

  /** True rank interval of value v in xs: [P(x < v), P(x ≤ v)]. An
    * estimate for quantile q is correct-within-ε iff this interval
    * intersects [q−ε, q+ε]. */
  private def rankOk(xs: Seq[Double], v: Double, q: Double): Boolean = {
    val n = xs.size.toDouble
    val below = xs.count(_ < v) / n
    val atOrBelow = xs.count(_ <= v) / n
    below - eps <= q && q <= atOrBelow + eps
  }

  test("below-capacity groups return exact order statistics") {
    val sketch = new QuantileSketch(128)
    val xs = Seq(9.0, 1.0, 5.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    val buf = xs.foldLeft(sketch.zero)(sketch.reduce)
    val out = sketch.finish(buf)
    val sorted = xs.sorted
    // rank walk with all weights 1 picks the item whose cumulative count
    // first exceeds q·(n−1): over 10 items q=0.5 → index 4 (cum 5 > 4.5),
    // q=0.9 → index 8 (cum 9 > 8.1), q=0.99 → index 8 (cum 9 > 8.91)
    assert(out.p50 === sorted(4), s"p50 ${out.p50}")
    assert(out.p90 === sorted(8), s"p90 ${out.p90}")
    assert(out.p99 === sorted(8), s"p99 ${out.p99}")
  }

  test("compacted sketch stays within eps rank error (deterministic stream, n >> k)") {
    val sketch = new QuantileSketch(128)
    // multiplicative-hash ordering: values 0..10006 visited in scrambled order
    val xs = (1 to 20000).map(i => ((i * 2654435761L) % 10007L).toDouble)
    val buf = xs.foldLeft(sketch.zero)(sketch.reduce)
    val out = sketch.finish(buf)
    for ((q, v) <- Seq(0.5 -> out.p50, 0.9 -> out.p90, 0.99 -> out.p99))
      assert(rankOk(xs, v, q), s"quantile $q estimate $v outside eps rank band")
  }

  test("merge is associative within the rank bound — any merge tree is sound") {
    val sketch = new QuantileSketch(128)
    val xs = (1 to 30000).map(i => ((i * 2654435761L) % 99991L).toDouble)
    val chunks = xs.grouped(10000).toSeq
    def sk(c: Seq[Double]): KllBuf = c.foldLeft(sketch.zero)(sketch.reduce)
    val Seq(a, b, c) = chunks.map(sk)
    val leftTree = sketch.finish(sketch.merge(sketch.merge(a, b), c))
    val rightTree = sketch.finish(sketch.merge(a, sketch.merge(b, c)))
    for ((q, v) <- Seq(0.5 -> leftTree.p50, 0.9 -> leftTree.p90, 0.99 -> leftTree.p99))
      assert(rankOk(xs, v, q), s"left-assoc $q estimate $v outside band")
    for ((q, v) <- Seq(0.5 -> rightTree.p50, 0.9 -> rightTree.p90, 0.99 -> rightTree.p99))
      assert(rankOk(xs, v, q), s"right-assoc $q estimate $v outside band")
  }

  test("sketch aggregates in streaming update mode: final revision passes the rank bound") {
    // the same typed Aggregator drives an unbounded update-mode aggregate
    // unchanged — the batch/streaming unification the mergeable-state
    // design buys (partial sketches merge per micro-batch revision)
    import org.apache.spark.sql.functions.{count, lit, udaf}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val xs = (1 to 4000).map(i => ((i * 2654435761L) % 9973L).toDouble)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val sk = udaf(new QuantileSketch(128))
    val q = in.toDF().toDF("v")
      .groupBy(lit(1).as("g"))
      .agg(sk($"v").as("qs"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("qsk_stream").outputMode("update").start()
    try {
      val (h1, h2) = xs.splitAt(2000)
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val fin = spark.table("qsk_stream").orderBy($"n".desc).head()
      assert(fin.getLong(2) === xs.size.toLong)
      val est = fin.getStruct(1)
      for ((qq, v) <- Seq(0.5 -> est.getDouble(0), 0.9 -> est.getDouble(1), 0.99 -> est.getDouble(2)))
        assert(rankOk(xs, v, qq), s"streaming quantile $qq estimate $v outside eps band")
    } finally q.stop()
  }

  test("q_quantile_sketch: every estimate's true rank is within eps of its target at sf0.001") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("q_quantile_sketch")(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = graft.tables.Tables.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq)
    for (r <- rows) {
      val flag = r.getString(0)
      val xs = li(flag)
      assert(r.getLong(4) === xs.size.toLong, s"$flag count")
      for ((q, v) <- Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3)))
        assert(rankOk(xs, v, q), s"$flag quantile $q estimate $v outside eps band")
    }
  }
}
