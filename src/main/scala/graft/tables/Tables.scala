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

  /** Single entry point for scans: parquet with Catalyst pushdown/pruning. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4.x rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as a long, then rebuild a
    * proper TimestampType via integer ns→µs division — integer `div`, not
    * `/`, because ~1.7e18 ns exceeds double's 53-bit mantissa and float
    * division would corrupt sub-second precision. All engine code downstream
    * sees a plain µs timestamp column (floor-truncated, matching how DuckDB
    * compares at ≥1s granularity under rule R3). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
