package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Determinism helpers implementing SURVEY.md §2 rules R1–R5.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL, so every float that reaches the output must be bit-identical
  * across engines. The strategy:
  *   - money / 2dp columns: cast to exact DECIMAL before any aggregation
  *     (R2). DECIMAL(12,2) for amounts (< 1e10), DECIMAL(4,2) for rates in
  *     [0,10) — sized so products stay within precision 38 in BOTH engines
  *     (no silent precision-loss rounding on the Spark side).
  *   - averages: exact decimal SUM cast to double, divided by COUNT —
  *     IEEE double division is correctly rounded, hence identical.
  *   - time: bucket on floor(epoch seconds) only (R3); never emit raw
  *     timestamps (parquet physical encodings differ).
  *   - vector folds: left-to-right `aggregate()` HOF, round(…, 4) at the
  *     boundary (R4).
  */
object Util {
  /** Money-ish 2dp column → exact decimal (amounts up to 10^10). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small 2dp rate (discount/tax in [0,10)) → exact decimal. */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum of a 2dp double column, emitted as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact average of a 2dp double column: decimal sum → double → / count. */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c)

  /** Event-time → epoch seconds (floor), the only time representation that
    * survives the ns(parquet) vs µs(Spark) precision gap. */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** Long epoch-day bucket. */
  def epochDay(c: Column): Column = floor(unix_timestamp(c) / 86400L).cast(LongType)

  def asInt(c: Column): Column = c.cast(IntegerType)
  def asLong(c: Column): Column = c.cast(LongType)
  def asDouble(c: Column): Column = c.cast(DoubleType)
}
