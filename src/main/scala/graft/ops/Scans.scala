package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.1 — scans / file sources.
  *
  * Scale posture: both queries are pure parquet scans; Catalyst prunes the
  * read schema to the selected columns and `orderBy(...).limit(n)` plans as
  * `TakeOrderedAndProject` (per-partition top-k + single small reduce), so
  * neither performs a global sort at 100 TB.
  */
object Scans {

  /** Full-table scan + total order + limit (rules R1/R5). */
  def scanParquet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
    // (l_orderkey, l_linenumber) alone is not unique in this data (R1):
    // partkey+suppkey complete the row key.
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice",
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_date"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .limit(100)
  }

  val scanParquetSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  l_quantity, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- compaction
  /** Small-file compaction planner (r9) — the maintenance half of the
    * layout story q_layout_zorder starts: a 100 TB table accretes
    * streaming/ingest files far below the scan-efficient size, and an
    * OPTIMIZE-style pass must group them into target-size rewrite jobs.
    * The load-bearing scale property: planning runs on the FILE MANIFEST
    * (one stats row per file — ~10⁶ rows where the data is 10¹² — here
    * simulated as one (event_type, epoch-day) file per ingest partition
    * with exact byte stats), never on the data; the data is only touched
    * by the rewrite jobs this plan emits.
    *
    * Policy = sequential packing by size descending (the classic FFD
    * approximation bin-packing OPTIMIZE implementations use): within each
    * partition, files order by (bytes desc, day), and a file joins the
    * group numbered by its EXCLUSIVE running-sum prefix `div` target — so
    * groups fill to ≥ the 256 KiB target before a new one opens and an
    * oversized file claims its own group. One window pair over the
    * manifest; the stats themselves are ONE map-side-partial hash agg.
    * All exact integer arithmetic (R2); (bytes desc, day) is a total
    * order per partition, so group ids are deterministic (R1). */
  def layoutCompaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val target = 256L * 1024L
    val files = events(s, dir)
      .groupBy($"event_type", epochDay($"ts").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(octet_length($"props").cast("bigint")) + count(lit(1)) * 48L)
          .as("bytes"))
    val order = Window.partitionBy($"event_type")
      .orderBy($"bytes".desc, $"day")
    val prefix = sum($"bytes").over(order.rowsBetween(Window.unboundedPreceding, -1))
    val planned = files
      .withColumn("grp", (coalesce(prefix, lit(0L)) / target).cast("bigint"))
    val g = Window.partitionBy($"event_type", $"grp")
    planned
      .withColumn("grp_files", count(lit(1)).over(g))
      .withColumn("grp_bytes", sum($"bytes").over(g))
      .select($"event_type", $"day", $"n_rows", $"bytes",
        $"grp", $"grp_files", $"grp_bytes")
      .orderBy($"event_type", $"grp", $"bytes".desc, $"day")
  }

  val layoutCompactionSql: String =
    """WITH f AS (
      |  SELECT event_type,
      |    CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
      |    COUNT(*) AS n_rows,
      |    CAST(SUM(strlen(props)) + COUNT(*) * 48 AS BIGINT) AS bytes
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT *,
      |    CAST(COALESCE(SUM(bytes) OVER (PARTITION BY event_type
      |      ORDER BY bytes DESC, day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // 262144 AS BIGINT) AS grp
      |  FROM f)
      |SELECT event_type, day, n_rows, bytes, grp,
      |  COUNT(*) OVER (PARTITION BY event_type, grp) AS grp_files,
      |  CAST(SUM(bytes) OVER (PARTITION BY event_type, grp) AS BIGINT) AS grp_bytes
      |FROM p ORDER BY event_type, grp, bytes DESC, day""".stripMargin

  /** Multi-file scan as one relation (here: same file listed twice — the
    * multi-path API; a real deployment would glob a partitioned directory). */
  def scanUnionFiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = s.read.parquet(s"$dir/orders.parquet", s"$dir/orders.parquet")
    df.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sumMoney($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus")
  }

  val scanUnionFilesSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Z-order (Morton curve) layout profile — the multi-dimensional
    * data-skipping complement to bucketing (q_join_bucketed): interleave
    * the bits of two scan dimensions into one z-value and block the data
    * by z-prefix. Fixing all but the low 12 z-bits fixes all but the low
    * 6 bits of EACH dimension, so every block's min/max span is ≤ 63 on
    * BOTH dims — a mathematical guarantee (unit-asserted in SourcesSpec),
    * not a data accident. Sorting a 100 TB table by z before writing
    * parquet therefore makes row-group min/max statistics prune scans on
    * either dimension (a single-column sort layout prunes only its own
    * column; this is the Delta/Iceberg OPTIMIZE ZORDER rationale, built
    * from public bit arithmetic).
    *
    * The z-value is a 32-term unrolled shift/mask sum — pure codegen'd
    * integer arithmetic, no UDF; blocks come from the VALUE (z >> 12),
    * not from row_number, so there is no global sort and the profile
    * aggregates with ordinary map-side partials. The DuckDB oracle's
    * interleave expression is GENERATED from the same term list, so the
    * two engines cannot drift. */
  def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.LongType
    val x = ($"l_partkey" % 65536L).cast(LongType)
    val y = ($"l_suppkey" % 65536L).cast(LongType)
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    lineitem(s, dir)
      .select(x.as("x"), y.as("y"), z.as("z"))
      .groupBy(shiftright($"z", 12).as("zblock"))
      .agg(count(lit(1)).as("n"),
        min($"x").as("min_part"), max($"x").as("max_part"),
        min($"y").as("min_supp"), max($"y").as("max_supp"))
      .orderBy($"zblock")
  }

  val layoutZorderSql: String = {
    val terms = (0 until 16).map { i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH d AS (
      |  SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y FROM lineitem),
      |zt AS (SELECT x, y, $terms AS z FROM d)
      |SELECT z >> 12 AS zblock, COUNT(*) AS n,
      |  MIN(x) AS min_part, MAX(x) AS max_part,
      |  MIN(y) AS min_supp, MAX(y) AS max_supp
      |FROM zt GROUP BY zblock ORDER BY zblock""".stripMargin
  }

  // ---------------------------------------------------------------- text sources
  /** CSV source round-trip (r10) — the delimited-text file source every
    * Flink learning repo starts from (readTextFile / CsvTableSource): the
    * documents table writes as quoted CSV into the per-PID warehouse and
    * reads back through `spark.read.csv` with an EXPLICIT schema (no
    * inference pass — schema inference is a second full scan at 100 TB),
    * header on, quoting exercised by the free-text column. The contract
    * output is the round-tripped table itself in total order, so the
    * DuckDB twin (reading the ORIGINAL parquet) hash-matching cell-exactly
    * PROVES format fidelity for every value, not just row counts. */
  def scanCsv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = s.conf.get("spark.sql.warehouse.dir") + "/roundtrip_csv"
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    // Write/read options pinned SYMMETRICALLY (ADVICE r10 #1): free text
    // may contain record delimiters, quotes, backslashes, or be null/empty
    // — fidelity must come from the options, not from the current corpus
    // happening to avoid those characters. multiLine on the read parses
    // quoted embedded newlines (costs splittability on that file — an
    // accepted trade for a correctness-checked round-trip; the 100 TB scan
    // path is parquet, q_scan_parquet); explicit escape pins the
    // quote-escape convention on both sides; nullValue/emptyValue keep
    // NULL distinct from '' through the text form.
    // Shared: \N null sentinel; whitespace preserved (the writer TRIMS
    // trailing whitespace by default — a silent corruption).
    val opts = Map("header" -> "true", "quote" -> "\"", "escape" -> "\\",
      "nullValue" -> "\\N",
      "ignoreLeadingWhiteSpace" -> "false", "ignoreTrailingWhiteSpace" -> "false")
    documents(s, dir).select(cols.map(col): _*)
      .write.mode("overwrite")
      // empty string written QUOTED ("") — unquoted empty reads back as
      // null, erasing the ''/NULL distinction the \N sentinel preserves
      .options(opts + ("emptyValue" -> "\"\""))
      .csv(out)
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .options(opts + ("multiLine" -> "true", "emptyValue" -> ""))
      .csv(out)
      .orderBy($"doc_id")
  }

  val scanCsvSql: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** JSONL source round-trip (r10) — the other ubiquitous text format
    * (line-delimited JSON, the interchange format of most LLM data
    * pipelines): same fidelity contract as [[scanCsv]], explicit schema
    * (a JSON inference pass reads the corpus twice), read back in total
    * order and hash-matched against the original parquet via DuckDB. */
  def scanJsonl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = s.conf.get("spark.sql.warehouse.dir") + "/roundtrip_jsonl"
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    documents(s, dir).select(cols.map(col): _*)
      .write.mode("overwrite").json(out)
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .json(out)
      .orderBy($"doc_id")
  }

  val scanJsonlSql: String = scanCsvSql

  // ---------------------------------------------------------------- partition pruning
  /** Partition-pruned scan (r10) — the remaining member of the layout
    * trio (q_join_bucketed co-locates joins, q_layout_zorder interleaves
    * scan dims; this is hive-style directory partitioning, the first
    * layout decision any 100 TB table makes): documents written
    * `partitionBy(lang)`, then a lang-filtered aggregate whose physical
    * scan lists ONLY the matching partition directory — the filter shows
    * under `PartitionFilters` (not data filters), so pruning happens at
    * file-listing time, before a single row or footer of the other
    * partitions is read (plan-asserted in PlanSpec). The oracle reads the
    * ORIGINAL unpartitioned parquet with a WHERE — identical results
    * prove the partitioned layout loses nothing. */
  def scanPartitionPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = s.conf.get("spark.sql.warehouse.dir") + "/part_docs"
    documents(s, dir).write.mode("overwrite").partitionBy("lang").parquet(out)
    s.read.parquet(out)
      .where($"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"source")
  }

  val scanPartitionPruneSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang = 'en'
      |GROUP BY source ORDER BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_partition_prune" -> (scanPartitionPrune _),
    "q_scan_csv"         -> (scanCsv _),
    "q_scan_jsonl"       -> (scanJsonl _),
    "q_scan_parquet"     -> (scanParquet _),
    "q_scan_union_files" -> (scanUnionFiles _),
    "q_layout_zorder"    -> (layoutZorder _),
    "q_layout_compaction" -> (layoutCompaction _))

  def oracle: Map[String, String] = Map(
    "q_scan_partition_prune" -> scanPartitionPruneSql,
    "q_scan_csv"         -> scanCsvSql,
    "q_scan_jsonl"       -> scanJsonlSql,
    "q_scan_parquet"     -> scanParquetSql,
    "q_scan_union_files" -> scanUnionFilesSql,
    "q_layout_zorder"    -> layoutZorderSql,
    "q_layout_compaction" -> layoutCompactionSql)
}
