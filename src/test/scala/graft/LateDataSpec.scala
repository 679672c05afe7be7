package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming._

/** SURVEY.md §2.8 remaining s_* rows: the allowed-lateness semantic gap
  * (s_late_side_output), the pluggable embedding UDF stub (s_embed_udf),
  * and the console debug sink (s_sink_console). */
class LateDataSpec extends SparkTestBase {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)
  private def ev(id: Long, min: Int, typ: String = "view"): Event =
    Event(id, ts(min), 1L, typ, 1.0)

  test("s_late_side_output: update mode emits revisions for late-but-within-" +
    "watermark rows (Spark's nearest analog to allowedLateness)") {
    // Spark has no per-row late side output; the documented mapping is:
    // update output mode re-emits a window's row whenever late data revises
    // it, until the watermark finally closes the window. This pins that
    // revision behavior.
    val in = MemoryStream[Event]
    val sink = "late_upd"
    val q = in.toDF().withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    try {
      in.addData(ev(1, 65), ev(2, 80))     // window [60,120): n=2
      q.processAllAvailable()
      in.addData(ev(3, 70))                // late vs max ts but within watermark → revision n=3
      q.processAllAvailable()
      val revisions = spark.table(sink).as[(Long, String, Long)].collect()
        .filter(_._1 == 3600L).map(_._3).sorted.toSeq
      assert(revisions === Seq(2L, 3L), "update mode must emit both the original and the revision")
    } finally q.stop()
  }

  test("s_embed_udf: pluggable embedding surface with a deterministic stub") {
    // The production surface is udf(text => model.encode(text)); offline the
    // encoder is a STUB: a seeded hash-ngram embedder. Deterministic, fixed
    // dim, unit-norm — the properties downstream similarity ops rely on.
    val dim = 16
    val embed = udf { (text: String) =>
      val v = new Array[Float](dim)
      text.split(" ").filter(_.nonEmpty).foreach { tok =>
        val h = scala.util.hashing.MurmurHash3.stringHash(tok, 42)
        v(math.floorMod(h, dim)) += (if (h % 2 == 0) 1.0f else -1.0f)
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val df = Seq("spark join scan", "spark join scan", "window agg").toDF("text")
      .select($"text", embed($"text").as("emb"))
    val rows = df.collect().map(_.getAs[scala.collection.Seq[Float]]("emb"))
    assert(rows(0) === rows(1), "same text → same embedding (deterministic)")
    assert(rows(0) !== rows(2))
    assert(rows.forall(_.length == dim))
    rows.foreach { r =>
      val n = math.sqrt(r.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, "stub embedder emits unit vectors")
    }
  }

  test("s_sink_console: console debug sink accepts a micro-batch") {
    val in = MemoryStream[Event]
    val q = in.toDF().writeStream.format("console")
      .option("truncate", "false").outputMode("append").start()
    try {
      in.addData(ev(1, 61), ev(2, 62))
      q.processAllAvailable()
      assert(q.lastProgress == null || q.lastProgress.sink.description.contains("Console"))
    } finally q.stop()
  }
}
