package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. Small parallelism keeps the
  * streaming micro-batch tests snappy; UTC matches the driver harness. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf(dir: String): String = s"/root/testdata/$dir"
}

object SparkTestBase {
  /** Shared JVM-static sink for foreach tests (valid in local mode). */
  val foreachSink: java.util.List[Long] =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir", TempDirs.warehouse("test"))
      // shuffle/spill + state-store scratch on the fast base (TempDirs)
      .config("spark.local.dir", TempDirs.localDir("test"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
