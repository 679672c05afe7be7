package graft
import org.apache.spark.sql.SparkSession

/** Scoped release of per-query cache pins (ADVICE r13).
  *
  * Verify and Bench drop dead `Layout.materialize` pins (localCheckpoint
  * blocks) between query executions — without it, 208×2 executions
  * accumulate hundreds of pinned RDDs in one JVM and inflate late-suite
  * heavies 2-4× (measured r13). The original hygiene blanket-unpersisted
  * EVERY persistent RDD, which was safe only under the invariant that no
  * query caches across calls; a future session-lived cache or a
  * still-referenced localCheckpoint would be silently dropped, and a
  * localCheckpointed RDD cannot be recomputed — later reuse would fail
  * with missing checkpoint blocks.
  *
  * This helper makes the invariant structural instead of documentary:
  * snapshot the persistent-RDD id set before the query, and release only
  * the ids the query ADDED. Anything pinned before the query (a standing
  * cache, a shared checkpoint) survives untouched.
  */
object PinScope {
  /** Run `body`, then unpersist only the RDDs it newly pinned. */
  def scoped[A](spark: SparkSession)(body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }
}
