package graft

import graft.functions.{HllBuf, HllDistinct}

/** HLL sketch invariants: the 3σ accuracy envelope on real data, and the
  * algebraic properties (order-insensitive, idempotent, union-merging)
  * that make it safely mergeable across partitions and days. */
class HllSketchSpec extends SparkTestBase {

  private val agg = new HllDistinct(10) // 1024 registers, σ ≈ 3.3%

  private def fold(xs: Seq[Long]): HllBuf = xs.foldLeft(agg.zero)(agg.reduce)

  test("q_distinct_sketch: estimate within 10% (3 sigma) of the exact distinct count") {
    val rows = SparkEntry.queries("q_distinct_sketch")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= math.max(1L, (0.10 * exact).toLong),
        s"${r.getString(0)}: estimate $est vs exact $exact outside 3-sigma envelope")
    }
  }

  test("buffer is a pure function of the input SET: order, chunking, duplication irrelevant") {
    val xs = (1L to 5000L).map(i => i * 2654435761L % 100000L)
    val a = fold(xs)
    val b = fold(xs.reverse)
    val chunked = xs.grouped(613).map(fold).reduce(agg.merge)
    val duplicated = agg.merge(fold(xs ++ xs), a)
    for (other <- Seq(b, chunked, duplicated))
      assert(java.util.Arrays.equals(a.regs, other.regs),
        "register arrays diverged — merge/reduce is not order-insensitive")
  }

  test("q_distinct_sketch_rollup: every scope (incl. <all>) inside the 3-sigma envelope; " +
       "merged global == direct single-sketch pass") {
    val rows = SparkEntry.queries("q_distinct_sketch_rollup")(spark, sf("sf0.001")).collect()
    assert(rows.length >= 2, "expected per-type rows plus the <all> rollup row")
    val scopes = rows.map(_.getString(0))
    assert(scopes.contains("<all>"), "global rollup row missing")
    for (r <- rows) {
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= math.max(1L, (0.10 * exact).toLong),
        s"${r.getString(0)}: estimate $est vs exact $exact outside 3-sigma envelope")
    }
    // merge losslessness: the <all> estimate produced by register-max
    // merging the per-type buffers must equal a direct single-sketch fold
    // over every user_id — registers are a pure function of the input SET,
    // so the rollup path gives the same number, not merely a close one
    import spark.implicits._
    val allUsers = graft.tables.Tables.events(spark, sf("sf0.001"))
      .select($"user_id").as[Long].collect().toSeq
    val direct = agg.finish(fold(allUsers))
    val rolled = rows.find(_.getString(0) == "<all>").get.getLong(1)
    assert(rolled === direct,
      s"rollup-merged global $rolled != direct single-pass sketch $direct")
  }

  test("merge is union: disjoint sketches combine to the union's sketch; idempotent") {
    val xs = (1L to 3000L).toSeq
    val ys = (3001L to 6000L).toSeq
    val merged = agg.merge(fold(xs), fold(ys))
    assert(java.util.Arrays.equals(merged.regs, fold(xs ++ ys).regs))
    assert(java.util.Arrays.equals(agg.merge(merged, merged).regs, merged.regs))
    // small-range regime: linear counting holds the same 10% envelope
    // (this exact input/hash draw sits ~6 low — statistical, not a bug)
    val small = agg.finish(fold((1L to 100L).toSeq))
    assert(math.abs(small - 100L) <= 10L, s"linear-counting estimate $small for 100 distinct")
  }
}
