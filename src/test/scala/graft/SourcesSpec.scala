package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink breadth beyond parquet (Flink readTextFile / CSV / JSON
  * connector analogs) + the metrics surface (observe + streaming listener,
  * SURVEY §2.10's Spark mapping for Flink's metrics system). */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("s_source_text: line-oriented text source drives wordcount") {
    val dir = Files.createTempDirectory("graft_text")
    Files.writeString(dir.resolve("a.txt"), "hello world\nhello graft\n")
    val counts = spark.read.text(dir.toString)
      .select(explode(split($"value", " ")).as("w"))
      .groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("hello" -> 2L, "world" -> 1L, "graft" -> 1L))
  }

  test("csv sink/source round-trip with header and schema inference") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.orderBy($"id").collect().map(_.toSeq).toSeq ===
      df.orderBy($"id").collect().map(_.toSeq).toSeq)
  }

  test("q_scan_csv: round-trip is faithful on adversarial text — newlines, quotes, " +
       "backslashes, null and empty (ADVICE r10 #1)") {
    // plant a documents table whose text exercises every CSV hazard the
    // pinned write/read options must survive; the contract query itself
    // (not a re-implementation) does the round-trip
    val tmp = Files.createTempDirectory("graft_csv_adv").toString
    val docs = Seq(
      (1L, "plain text", "en", "s", 10L),
      (2L, "embedded\nnewline\r\nand crlf", "en", "s", 25L),
      (3L, "a \"quoted\" phrase, with commas", "en", "s", 30L),
      (4L, "back\\slash and trailing space ", "en", "s", 30L),
      (5L, null.asInstanceOf[String], "en", "s", 0L),
      (6L, "", "en", "s", 0L),
      (7L, "the \\N sentinel as real text", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(tmp + "/documents.parquet")
    val back = graft.ops.Scans.scanCsv(spark, tmp)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val want = docs.orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(back === want, "CSV round-trip corrupted adversarial text")
  }

  test("q_scan_jsonl: round-trip is faithful on adversarial text — control chars, " +
       "unicode, JSON metachars, null and empty (VERDICT r11 #5)") {
    // same fixture discipline as the CSV case: the contract query itself
    // round-trips a planted documents table whose text holds every JSON
    // string hazard (quote/backslash escaping, literal braces, \n \t \r
    // control chars, a unicode surrogate pair, the literal word null)
    val tmp = Files.createTempDirectory("graft_jsonl_adv").toString
    val docs = Seq(
      (1L, "plain text", "en", "s", 10L),
      (2L, "line\nbreak\ttab\rcarriage", "en", "s", 24L),
      (3L, "she said \"hi\" and \\ backslash", "en", "s", 30L),
      (4L, "{\"looks\": [\"like\", \"json\"]}", "en", "s", 27L),
      (5L, null.asInstanceOf[String], "en", "s", 0L),
      (6L, "", "en", "s", 0L),
      (7L, "emoji 😀 and accents éü", "en", "s", 24L),
      (8L, "null", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(tmp + "/documents.parquet")
    val back = graft.ops.Scans.scanJsonl(spark, tmp)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val want = docs.orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(back === want, "JSONL round-trip corrupted adversarial text")
  }

  test("json sink/source round-trip preserves nested structure") {
    val dir = Files.createTempDirectory("graft_json").toString + "/out"
    val df = Seq((1L, Seq(1, 2), Map("k" -> 9L))).toDF("id", "arr", "m")
    df.write.json(dir)
    val back = spark.read.json(dir).orderBy($"id")
    assert(back.select($"id", $"arr", $"m.k").collect().head.toSeq === Seq(1L, Seq(1, 2), 9L))
  }

  test("observe(): named metrics come back on the listener-free path") {
    val observed = graft.tables.Tables.lineitem(spark, sf("sf0.001"))
      .observe("li_metrics", count(lit(1)).as("rows"), sum($"l_quantity").as("qty"))
    observed.collect()
    val m = observed.queryExecution.observedMetrics("li_metrics")
    assert(m.getAs[Long]("rows") === 6000L)
    assert(m.getAs[Double]("qty") > 0)
  }

  test("StreamingQueryListener receives progress events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = { seen.incrementAndGet(); () }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val in = MemoryStream[Int]
      val q = in.toDS().writeStream.format("memory").queryName("obs_snk")
        .outputMode("append").start()
      in.addData(1, 2, 3)
      q.processAllAvailable()
      q.stop()
      val deadline = System.currentTimeMillis() + 10000
      while (seen.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.get() > 0, "listener should observe at least one progress event")
    } finally spark.streams.removeListener(listener)
  }

  test("q_layout_zorder: z-prefix blocks bound BOTH dimension spans (≤ 63) — the skipping guarantee") {
    val rows = graft.ops.Scans.layoutZorder(spark, sf("sf0.001"))
      .select("zblock", "n", "min_part", "max_part", "min_supp", "max_supp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length > 1, "degenerate: a single z-block proves nothing")
    rows.foreach { case (zb, _, mnP, mxP, mnS, mxS) =>
      // fixing all but the low 12 z-bits leaves 6 free bits per dimension
      assert(mxP - mnP <= 63, s"block $zb: partkey span ${mxP - mnP} breaks the z guarantee")
      assert(mxS - mnS <= 63, s"block $zb: suppkey span ${mxS - mnS} breaks the z guarantee")
    }
    // mass conservation: blocks partition the table
    assert(rows.map(_._2).sum === graft.tables.Tables.lineitem(spark, sf("sf0.001")).count())
  }
}
