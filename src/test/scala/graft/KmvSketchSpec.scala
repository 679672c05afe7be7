package graft

import graft.functions.{Kmv, KmvBuf, KmvSketch}
import graft.ops.Aggregations

/** KMV/theta sketch invariants: exact-mode equality, the full-sketch
  * accuracy envelope on synthetic sets with KNOWN overlap, and the
  * set-algebra properties (order/chunk/duplication-insensitive merge)
  * that make per-segment sketches safely persistable and re-mergeable. */
class KmvSketchSpec extends SparkTestBase {

  private val k = 512
  private val agg = new KmvSketch(k)

  private def fold(xs: Seq[Long]): KmvBuf = xs.foldLeft(agg.zero)(agg.reduce)

  test("exact mode: below-k sets retain every hash; estimate and intersect are exact") {
    val a = (1L to 300L)
    val b = (201L to 500L) // overlap 100
    val (sa, sb) = (fold(a).hashes, fold(b).hashes)
    assert(sa.length === 300 && sb.length === 300)
    assert(sa.toSeq === sa.sorted.toSeq, "sketch array must be ascending")
    assert(Kmv.estimate(sa, k) === 300L)
    assert(Kmv.intersect(sa, sb, k) === 100L)
  }

  test("full sketches: distinct and overlap estimates within 3x RSE of known truth") {
    // A = [0, 60k), B = [30k, 90k): 60k distinct each, true overlap 30k.
    // RSE ≈ 1/sqrt(k-2) ≈ 4.4%; 3x envelope = 14%. Overlap estimation
    // compounds two thetas — allow the same envelope on the larger base.
    val a = (0L until 60000L)
    val b = (30000L until 90000L)
    val (sa, sb) = (fold(a).hashes, fold(b).hashes)
    assert(sa.length === k && sb.length === k, "sketches must be full")
    assert(math.abs(Kmv.estimate(sa, k) - 60000L) <= 8400,
      s"distinct estimate ${Kmv.estimate(sa, k)} off by >14%")
    assert(math.abs(Kmv.intersect(sa, sb, k) - 30000L) <= 8400,
      s"overlap estimate ${Kmv.intersect(sa, sb, k)} off by >14% of the base")
  }

  test("sketch is a pure function of the input SET: order, chunking, duplication irrelevant") {
    val xs = (1L to 20000L).map(i => i * 2654435761L % 1000000L)
    val a = fold(xs)
    val b = fold(xs.reverse)
    val chunked = xs.grouped(613).map(fold).reduce(agg.merge)
    val duplicated = agg.merge(fold(xs ++ xs), a)
    for (other <- Seq(b, chunked, duplicated))
      assert(other.hashes.toSeq === a.hashes.toSeq,
        "sketch depended on fold order / chunking / duplication")
  }

  test("union algebra: merged sketch == sketch of the concatenated input") {
    val xs = (1L to 5000L)
    val ys = (3000L to 8000L)
    val merged = agg.merge(fold(xs), fold(ys)).hashes
    val direct = fold(xs ++ ys).hashes
    assert(merged.toSeq === direct.toSeq)
  }

  test("mixed regime: partial x full pair scales by the full side's theta (ADVICE r11)") {
    // type "small": 400 distinct users (< k=512, partial sketch);
    // type "big": 2000 distinct users (full sketch), superset of small's —
    // true overlap 400. The pair must scale the retained shared count
    // (~400*512/2000 ~= 102) by 2^63/theta_big back to ~400; a 2^63 theta
    // (the pre-fix either-side-partial collapse) would emit ~102, 4x low.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmv_mixed").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ((0L until 2000L).map(u => (u, t0, u, "big", 1.0, "{}")) ++
     (0L until 400L).map(u => (2000L + u, t0, u, "small", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(tmp + "/events.parquet")
    val r = Aggregations.aggOverlapSketch(spark, tmp)
      .select("type_a", "type_b", "est_overlap", "exact_overlap", "est_a", "est_b")
      .collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "big" && row.getString(1) === "small")
    assert(row.getLong(3) === 400L)
    // exact same arithmetic as the driver-side reference implementation
    val (sBig, sSmall) = (fold(0L until 2000L).hashes, fold(0L until 400L).hashes)
    assert(sBig.length === k && sSmall.length === 400)
    assert(row.getLong(2) === Kmv.intersect(sBig, sSmall, k),
      "DataFrame estimator must match Kmv.intersect in the mixed regime")
    assert(math.abs(row.getLong(2) - 400L) <= 120,
      s"mixed-regime overlap ${row.getLong(2)} outside the 30% envelope of 400")
    assert(row.getLong(5) === 400L, "partial side's distinct estimate must be exact")
  }

  test("q_overlap_sketch: exact-mode rows equal their exact twin columns; estimator engages at sf0.1") {
    // sf0.001: 150 users < k — every sketch exact, est columns == exact columns
    val rows = SparkEntry.queries("q_overlap_sketch")(spark, sf("sf0.001"))
      .select("type_a", "type_b", "est_a", "est_b", "est_overlap",
        "exact_a", "exact_b", "exact_overlap")
      .collect()
    assert(rows.length === 10, "5 types must give 10 unordered pairs")
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(5) && r.getLong(3) === r.getLong(6)
        && r.getLong(4) === r.getLong(7),
        s"${r.getString(0)}x${r.getString(1)}: exact-mode estimates must equal exact counts")
    }
    // sf0.1: 1500 users > k — full sketches; 14% envelope vs exact twins
    val full = SparkEntry.queries("q_overlap_sketch")(spark, sf("sf0.1"))
      .select("type_a", "type_b", "est_overlap", "exact_overlap", "est_a", "exact_a")
      .collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      assert(math.abs(est - exact) <= math.max(1L, (0.14 * exact).toLong),
        s"${r.getString(0)}x${r.getString(1)}: overlap $est vs $exact outside envelope")
      assert(math.abs(r.getLong(4) - r.getLong(5)) <= (0.14 * r.getLong(5)).toLong,
        s"${r.getString(0)}: distinct estimate outside envelope")
    }
  }
}
