package graft
import org.apache.spark.sql.SparkSession
// Temporary diagnostic — deleted after use.
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("src", "v")
    val rep = df.repartition(4, $"src")
    println("pre-checkpoint executedPlan partitioning: " +
      rep.queryExecution.executedPlan.outputPartitioning)
    val pinned = rep.localCheckpoint(true)
    println("pinned analyzed: " + pinned.queryExecution.analyzed)
    println("pinned executedPlan partitioning: " +
      pinned.queryExecution.executedPlan.outputPartitioning)
    val other = (1 to 100).map(i => (i.toLong % 50, i.toLong)).toDF("node", "r")
    val j = pinned.join(other.hint("shuffle_hash"), $"src" === $"node")
    j.collect()
    println(j.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("RDD")).mkString("\n"))
    spark.stop()
  }
}
