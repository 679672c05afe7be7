package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.LlmText
import graft.tables.Tables

/** Sliced standing-warehouse builder for q_dedup_cluster_incremental's
  * day-0 tables — dev tooling like [[ScaleGen]], not a query surface.
  *
  * Why it exists: the query's own standing build runs the base×base pair
  * discovery as ONE lineage, and a single JVM accumulates every stage's
  * shuffle files until the lazy ContextCleaner gets around to them — at
  * the 1000× scale factor that peak exceeds any scratch medium this box
  * has (measured r16: ENOSPC with /tmp-weighted scratch, kernel OOM with
  * tmpfs-weighted, ENOSPC again even under zstd shuffle compression). A
  * real pipeline builds day-0 standing tables on a cluster whose
  * aggregate local disk dwarfs one node; this tool is the single-box
  * analog: it builds the pair table in `slices` probe-side slices keyed
  * by doc_b % slices, forcing a GC (the Bench warmup-reap precedent)
  * after each so slice k's shuffle files are reaped before slice k+1
  * needs the space — peak scratch drops to ~1/slices of the monolithic
  * build plus one standing-index exchange.
  *
  * Correctness: doc_b determines the slice, so the per-slice candidate
  * sets are DISJOINT and exhaustive; their union is exactly the
  * single-pass set, and every expression comes from the same
  * [[LlmText]] incClu* helpers the query itself uses — the standing
  * tables are bit-identical to the query's own build (spec-asserted in
  * IncCluWarehouseSpec). After the pair slices assemble, the tool runs
  * the query once so the remaining standing tables (labels, prefix
  * postings) land through their own Layout.standing calls, then the
  * parts directory is removed.
  *
  * Idempotent/resumable: completed slices (and completed standing
  * tables) are skipped on re-run, so an interrupted build ratchets
  * forward instead of restarting.
  *
  * Usage:
  *   SPARK_GRAFT_WAREHOUSE_DIR=/path/to/durable/warehouse \
  *     tools/run.sh graft.IncCluWarehouse <sfDir> [slices=8]
  * (SPARK_GRAFT_WAREHOUSE_DIR should point at a PERSISTENT path so a
  * later serve-timing JVM reads these tables instead of rebuilding.)
  */
object IncCluWarehouse {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val slices = if (args.length > 1) args(1).toInt else 8
    require(slices >= 1, s"slices must be >= 1, got $slices")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempDirs.warehouse("inccluwh"))
      .config("spark.local.dir", TempDirs.localDir("inccluwh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, dir, slices)
    spark.stop()
  }

  /** Build (or resume building) the standing warehouse; exposed so the
    * spec can drive it against a test session and assert bit-equality
    * with the query's own single-pass build. */
  def build(spark: SparkSession, dir: String, slices: Int): Unit = {
    val cut = LlmText.incCluCut(spark, dir)
    val key = LlmText.incCluKey(dir, cut)
    val docs = Tables.documents(spark, dir)
    val baseDocSh = graft.tables.Layout.standing(spark, s"incclu_${key}_sh",
      LlmText.incCluShingled(docs.where(col("doc_id") < cut)))
    val idx = LlmText.incCluPrefix(baseDocSh, "doc_a", "n_a")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val partsBase = s"$wh/_standing/incclu_${key}_pairs_parts"
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    (0 until slices).foreach { i =>
      if (exists(s"$partsBase/p$i/_SUCCESS"))
        println(s"[inccluwh] pairs slice $i/$slices already present, skipping")
      else {
        val probe = LlmText.incCluPrefix(
          baseDocSh.where(pmod(col("doc_id"), lit(slices.toLong)) === i.toLong),
          "doc_b", "n_b")
        LlmText.incCluVerified(LlmText.incCluCandidates(idx, probe), baseDocSh)
          .write.mode("overwrite").parquet(s"$partsBase/p$i")
        println(s"[inccluwh] pairs slice $i/$slices written")
        // reap this slice's shuffle files before the next slice runs —
        // the whole reason the sliced build fits where one pass cannot
        System.gc()
        Thread.sleep(3000)
      }
    }
    graft.tables.Layout.standing(spark, s"incclu_${key}_pairs",
      spark.read.parquet((0 until slices).map(i => s"$partsBase/p$i"): _*))
    println(s"[inccluwh] standing pair table assembled (incclu_${key}_pairs)")
    // labels + prefix postings + a first (untimed) delta pass land through
    // the query's own Layout.standing calls
    val served = LlmText.dedupClusterIncremental(spark, dir).count()
    println(s"[inccluwh] remaining standing tables built; delta pass rows=$served")
    val pp = new org.apache.hadoop.fs.Path(partsBase)
    pp.getFileSystem(hconf).delete(pp, true)
    println(s"[inccluwh] parts cleaned; warehouse ready at $wh")
  }
}
