package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times sub-plans of the heavy queries so
  * optimization effort lands on the actual bottleneck, not a guess.
  * Usage: tools/run.sh graft.Profile [sfDir]
  */
object Profile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // warm the JVM on the full query once
    graft.ops.LlmText.dedupNgramJaccard(spark, sfDir).count()

    println("== q_dedup_ngram_jaccard stages ==")
    val docs = graft.tables.Tables.table(spark, sfDir, "documents")
    def docSh() = docs
      .select($"doc_id", split(trim($"text"), " ").as("tk"))
      .withColumn("n", size($"tk"))
      .where($"n" >= 3)
      .select($"doc_id", array_distinct(
        transform(sequence(lit(1), $"n" - 2),
          i => xxhash64(element_at($"tk", i), element_at($"tk", i + 1),
            element_at($"tk", i + 2)))).as("sh_arr"))
      .select($"doc_id", size($"sh_arr").cast("long").as("n_sh"), $"sh_arr")

    time("docSh (arrays, no checkpoint)")(docSh().count())
    val t0 = System.nanoTime()
    val ck = docSh()
      .select($"doc_id", size($"sh_arr").cast("long").as("n_sh"),
        org.apache.spark.sql.functions.array_sort($"sh_arr").as("sh_arr"))
      .localCheckpoint(true)
    println(f"  checkpoint build: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    val pref = ck.select($"doc_id", $"n_sh",
      explode(slice($"sh_arr", lit(1), ($"n_sh" / 2 + 1).cast("int"))).as("shingle"))
    val a = pref.select($"doc_id".as("doc_a"), $"n_sh".as("n_a"), $"shingle")
    val b = pref.select($"doc_id".as("doc_b"), $"n_sh".as("n_b"), $"shingle")
    val joined = a.join(b, Seq("shingle")).where($"doc_a" < $"doc_b" &&
      $"n_a" * 2 >= $"n_b" && $"n_b" * 2 >= $"n_a")
    time("prefix self-join")(joined.count())
    val cands = joined.groupBy($"doc_a", $"n_a", $"doc_b", $"n_b").agg(count(lit(1)).as("_c")).drop("_c")
    time("candidate groupBy")(cands.count())
    val verified = cands
      .join(broadcast(ck.select($"doc_id".as("doc_a"), $"sh_arr".as("arr_a"))), Seq("doc_a"))
      .join(broadcast(ck.select($"doc_id".as("doc_b"), $"sh_arr".as("arr_b"))), Seq("doc_b"))
      .withColumn("n_shared", graft.functions.GraftFunctions.sorted_intersect_size($"arr_a", $"arr_b"))
    time("verify (broadcast + intersect)")(verified.count())
    time("full query again")(graft.ops.LlmText.dedupNgramJaccard(spark, sfDir).count())
    time("full query 3rd")(graft.ops.LlmText.dedupNgramJaccard(spark, sfDir).count())

    println("== q_ann_ivf ==")
    val emb = graft.tables.Tables.table(spark, sfDir, "embeddings")
    val tk0 = System.nanoTime()
    val cs = graft.ops.LlmVector.kmeansCentroids(emb, 16, 2)
    println(f"  kmeans train (3 driver passes): ${(System.nanoTime() - tk0) / 1e9}%6.2f s (k=${cs.size})")
    time("full")(graft.ops.LlmVector.annIvf(spark, sfDir).count())
    time("full 2nd")(graft.ops.LlmVector.annIvf(spark, sfDir).count())
    println("== q_dedup_simhash ==")
    time("full")(graft.ops.LlmText.dedupSimhash(spark, sfDir).count())
    spark.stop()
  }
}
