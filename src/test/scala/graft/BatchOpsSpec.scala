package graft

import org.apache.spark.sql.functions._
import graft.ops.Partitionwise

/** SURVEY.md §2.2/2.3/2.4/2.7 unit-only rows: partition lifecycle, cogroup,
  * connect/co-map, typed UDAF, scalar UDF, map-type functions, collection
  * source — semantics pinned on tiny literal datasets. */
class BatchOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("s_source_collection: in-memory bounded source") {
    val ds = spark.createDataset(Seq(1, 2, 3))
    assert(ds.collect().sorted.toSeq === Seq(1, 2, 3))
    assert(spark.range(5).count() === 5)
  }

  test("s_richmap_lifecycle: open/close run once per partition") {
    val acc = spark.sparkContext.longAccumulator("opens")
    val closeAcc = spark.sparkContext.longAccumulator("closes")
    val ds = spark.range(0, 100).repartition(4).as[Long]
    val out = Partitionwise.richMap(ds) { () => { acc.add(1); new StringBuilder("res") } } {
      (r, x) => x * 2
    } { r => closeAcc.add(1) }
    assert(out.collect().sorted.toSeq === (0L until 100L).map(_ * 2))
    assert(acc.value === 4L, "open once per partition")
    assert(closeAcc.value === 4L, "close once per partition")
  }

  test("s_cogroup: both sides' iterables per key") {
    val a = Seq((1, "x"), (1, "y"), (2, "z")).toDS()
    val b = Seq((1, 10.0), (3, 30.0)).toDS()
    val out = Partitionwise.cogroupStats(a, b)(_._1, _._1).collect().toSet
    assert(out === Set((1, 2L, 1L), (2, 1L, 0L), (3, 0L, 1L)))
  }

  test("s_connect_comap: two typed inputs → one output type") {
    val words = Seq("a", "bb").toDS()
    val nums = Seq(3, 4).toDS()
    val out = Partitionwise.connectComap(words, nums)(w => s"w:${w.length}")(n => s"n:$n")
    assert(out.collect().toSet === Set("w:1", "w:2", "n:3", "n:4"))
  }

  test("s_async_enrich: ordered-wait async lookups — order kept, concurrency bounded, overlapped") {
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    // counters live in a JVM-static object (valid in local mode): closure
    // serialization would otherwise hand the executor COPIES of captured
    // AtomicIntegers and the driver would read zeros
    BatchOpsSpec.asyncActive.set(0); BatchOpsSpec.asyncPeak.set(0)
    val ds = spark.range(0, 60).as[Long].repartition(1)
    val out = Partitionwise.asyncEnrichOrdered(ds, concurrency = 4) { id =>
      Future {
        val now = BatchOpsSpec.asyncActive.incrementAndGet()
        BatchOpsSpec.asyncPeak.accumulateAndGet(now, Math.max(_, _))
        Thread.sleep(3 + (id % 5)) // uneven latency: tests ordering under reordering-prone completion
        BatchOpsSpec.asyncActive.decrementAndGet()
        id * 10
      }
    }.collect()
    assert(out.toSeq === (0L until 60L).map(_ * 10), "ordered-wait emits in input order")
    val peak = BatchOpsSpec.asyncPeak.get()
    assert(peak <= 4, s"capacity exceeded: $peak")
    assert(peak >= 2, "lookups never overlapped — async pipeline not engaged")
  }

  test("s_async_enrich: a lookup exceeding the timeout fails the task instead of hanging") {
    import scala.concurrent.duration._
    val ds = spark.range(0, 3).as[Long].repartition(1)
    val ex = intercept[org.apache.spark.SparkException] {
      Partitionwise.asyncEnrichOrdered(ds, concurrency = 2, timeout = 300.millis) { _ =>
        scala.concurrent.Promise[Long]().future // never completes
      }.collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected a TimeoutException cause, got: $ex")
  }

  test("s_udaf_typed: Aggregator as typed agg and as registered udaf") {
    val agg = new Partitionwise.AvgAggregator
    val typed = Seq(1.0, 2.0, 3.0).toDS().select(agg.toColumn).head()
    assert(typed === 2.0)
    spark.udf.register("g_avg", org.apache.spark.sql.functions.udaf(agg))
    val viaSql = Seq(2.0, 4.0).toDF("v").selectExpr("g_avg(v)").head().getDouble(0)
    assert(viaSql === 3.0)
  }

  test("s_udf_scalar: registered scalar UDF (ScalarFunction analog)") {
    val hash4 = udf((s: String) => s.hashCode % 10000)
    val out = Seq("flink", "spark").toDF("s")
      .select(hash4($"s").as("h")).collect().map(_.getInt(0))
    assert(out.toSeq === Seq("flink".hashCode % 10000, "spark".hashCode % 10000))
  }

  test("s_map_funcs: map type create/access") {
    val df = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "name", "v")
      .select($"k", map_from_arrays(array(lit("name"), lit("v")),
        array($"name", $"v".cast("string"))).as("m"))
    val rows = df.select($"k", element_at($"m", "name"), element_at($"m", "v"))
      .as[(Int, String, String)].collect().toSet
    assert(rows === Set((1, "a", "10"), (2, "b", "20")))
  }

  test("s_sink_foreach (batch form): Dataset.foreach receives every row") {
    val seen = SparkTestBase.foreachSink
    seen.clear()
    Seq(1L, 2L, 3L).toDS().foreach { v: Long => SparkTestBase.foreachSink.add(v); () }
    assert(seen.size() === 3)
  }

  test("s_udtf_lateral: LATERAL VIEW explode (TableFunction analog) in SQL") {
    Seq((1, "a b"), (2, "c")).toDF("id", "text").createOrReplaceTempView("g_lat")
    val rows = spark.sql(
      """SELECT id, w FROM g_lat
        |LATERAL VIEW explode(split(text, ' ')) t AS w
        |ORDER BY id, w""".stripMargin)
      .as[(Int, String)].collect().toSeq
    assert(rows === Seq((1, "a"), (1, "b"), (2, "c")))
  }

  test("q_join_nullsafe: NULL keys match under <=> but vanish under ===") {
    val dir = sf("sf0.001")
    val li = graft.tables.Tables.lineitem(spark, dir)
    val nNull = li.where($"l_returnflag" === "N").count()
    val out = graft.ops.Joins.joinNullsafe(spark, dir)
      .select("flag_label", "n").as[(String, Long)].collect().toMap
    assert(out.getOrElse("none", 0L) === nNull,
      "null-safe join must keep every NULL-keyed row in the 'none' group")
    // the same join under plain equality drops the NULL group entirely
    val left = li.select(nullif($"l_returnflag", lit("N")).as("k"))
    val dim = left.distinct().select($"k".as("dk"))
    val eqGroups = left.join(dim, $"k" === $"dk").where($"k".isNull).count()
    assert(eqGroups === 0L, "=== should not match NULL = NULL")
  }

  test("q_intersect_all/q_except_all: multiset arithmetic = least / floored difference of per-key counts") {
    val dir = sf("sf0.001")
    val c = graft.tables.Tables.customer(spark, dir)
      .groupBy($"c_nationkey".as("nk")).count()
      .as[(Long, Long)].collect().toMap
    val su = graft.tables.Tables.supplier(spark, dir)
      .groupBy($"s_nationkey".as("nk")).count()
      .as[(Long, Long)].collect().toMap
    val gotI = graft.ops.SetOps.intersectAllKeys(spark, dir)
      .as[(Long, Long)].collect().toMap
    val expI = (c.keySet intersect su.keySet).map(k => k -> math.min(c(k), su(k)))
      .filter(_._2 > 0).toMap
    assert(gotI === expI, "INTERSECT ALL multiplicity != min(left, right)")
    val gotE = graft.ops.SetOps.exceptAllKeys(spark, dir)
      .as[(Long, Long)].collect().toMap
    val expE = c.map { case (k, n) => k -> (n - su.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    assert(gotE === expE, "EXCEPT ALL multiplicity != max(left - right, 0)")
  }
}

object BatchOpsSpec {
  /** JVM-static counters for the async-enrich test (see note there). */
  val asyncActive = new java.util.concurrent.atomic.AtomicInteger(0)
  val asyncPeak = new java.util.concurrent.atomic.AtomicInteger(0)
}
