package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Dev-only action/job census (guide §1.5 / VERDICT r16 #1a): for every
  * declared query, count the Spark JOBS, stages and tasks one steady-state
  * execution submits. The suite is fixed-cost-bound at sf0.1 (8-core total
  * ≈ 32-core total), so job count × per-job setup is the number to shrink;
  * this tool says where the jobs are. Usage:
  *   tools/run.sh graft.JobCensus [sfDir] [q_a,q_b,...]
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempDirs.warehouse("census"))
      .config("spark.local.dir", TempDirs.localDir("census"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val verbose = sys.env.get("GRAFT_CENSUS_VERBOSE").contains("1")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = j.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
          println(f"    job ${j.jobId}%4d stages=${j.stageInfos.size}%2d tasks=${j.stageInfos.map(_.numTasks).sum}%4d  $cs")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    val qs = SparkEntry.queries.filter { case (k, _) => only.forall(_.contains(k)) }
    // warm pass: JIT + standing-table builds land outside the census
    qs.foreach { case (_, fn) =>
      PinScope.scoped(spark) { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
    }
    val rows = qs.toSeq.map { case (name, fn) =>
      // settle listener events from the previous query (the bus is
      // private[spark]; a short sleep drains it in local mode)
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      PinScope.scoped(spark) { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      (name, jobs.get, stages.get, tasks.get, sec)
    }
    println(f"${"query"}%-34s jobs stages tasks   sec")
    rows.sortBy(-_._2).foreach { case (n, j, st, t, sec) =>
      println(f"$n%-34s $j%4d $st%6d $t%5d $sec%6.2f")
    }
    println(f"TOTAL jobs=${rows.map(_._2).sum} stages=${rows.map(_._3).sum} tasks=${rows.map(_._4).sum} sec=${rows.map(_._5).sum}%.1f over ${rows.size} queries")
    spark.stop()
  }
}
