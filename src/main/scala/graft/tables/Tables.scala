package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that scan-level concerns
  * (format, pushdown, future partitioning/bucketing of a real deployment)
  * have a single home. At 100 TB these would be partitioned/bucketed
  * tables in a catalog; the loader keeps call sites agnostic to that.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Single entry point for scans: parquet with Catalyst pushdown/pruning.
    *
    * The READ PLAN is memoized per (session, path) — r17: a bare
    * `spark.read.parquet` pays a schema-inference job (parquet footer
    * read) on every call, measured as one "parquet at Tables.scala" job
    * per base-table reference per query execution, ~300 wasted jobs per
    * 214-query sweep. The memo holds metadata only (schema + file listing
    * of an immutable input — exactly what Spark's catalog caches for
    * named tables); every execution still scans the parquet from disk,
    * with pushdown/pruning per consumer unchanged (pruning binds at the
    * consuming plan, not the cached relation). */
  private val reads = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    reads.computeIfAbsent(s"${System.identityHashCode(spark)}#$sfDir/$name", _ =>
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` has shipped in two physical layouts across driver testdata
    * generations, so the loader adapts to the file actually present:
    *   - parquet TIMESTAMP(NANOS) (rounds 1-9), which Spark 4.x rejects
    *     outright ([PARQUET_TYPE_ILLEGAL]): read nanos as a long, then
    *     rebuild a TimestampType via integer ns→µs division — integer
    *     `div`, not `/`, because ~1.7e18 ns exceeds double's 53-bit
    *     mantissa and float division would corrupt sub-second precision;
    *   - parquet TIMESTAMP(MICROS) (round 10+), which arrives as a
    *     timestamp already — only normalized NTZ→session-TZ (UTC here, so
    *     the same instant DuckDB sees) for one downstream type.
    * Either way engine code sees a plain µs TimestampType column
    * (floor-truncated, matching how DuckDB compares at ≥1s granularity
    * under rule R3). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
