package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-measurement corpus generator (VERDICT r12 #6) — dev tooling, not a
  * query surface: writes a `factor`× copy of an existing sfDir so the heavy
  * queries can be benched at two sizes and their scaling exponents measured,
  * instead of the 100 TB posture resting on analytic claims alone.
  *
  * Construction: `factor` disjoint shifted copies of every table — each
  * copy's keys offset by copy × (max key + 1), so the result is `factor`
  * structurally-identical sub-corpora. That is the honest scaling shape:
  * per-key densities (basket sizes, node degrees, docs per lang) stay at
  * their sfDir values while global row counts, distinct-key counts, and
  * shuffle volumes grow ×factor — exactly how a real corpus grows when new
  * days of data arrive. Content is DECORRELATED across copies so the
  * near-dup/ANN relations scale linearly too, instead of every base row
  * acquiring `factor−1` planted twins (which would grow pair outputs
  * quadratically and measure an artifact, not the engine):
  *   - documents: every token gets a per-copy suffix (`_c<i>`), so copies
  *     share no shingles (Jaccard/containment/substring/decontamination
  *     relations are per-copy); n_chars recomputed (source invariant
  *     n_chars = length(text) holds by construction);
  *   - embeddings: per-copy deterministic sign-flip pattern over the 64
  *     dims (bit i·φ of a splitmix stream) — norms and per-dim marginals
  *     preserved, cross-copy cosines decorrelated (copy 0 untouched, so
  *     the vec_id < 5 probe set is the base one at every factor);
  *   - events/lineitem/orders/customer/supplier/part: pure key shifts
  *     (event/user/order/part/supp/cust keys); values, timestamps, and
  *     dimension text unchanged — time-bucket densities grow ×factor, the
  *     realistic load shape for censuses and windows;
  *   - nation/region: dimension tables, copied as-is.
  *
  * Usage: tools/run.sh graft.ScaleGen <srcDir> <outDir> [factor=10] [tables=csv]
  * The optional 4th arg restricts output to a comma-separated table subset
  * (e.g. `documents`) — single-query scale sweeps don't need the ~16 GB of
  * unrelated 1000× tables; construction is identical for the tables kept.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional table subset (csv); empty = every table
    val only: Set[String] =
      if (args.length > 3) args(3).split(',').map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempDirs.warehouse("scalegen"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    def shifted(name: String, keys: Seq[String],
                perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val base = tbl(name)
      val offs = keys.map(k => k -> maxOf(base, k)).toMap
      val copies = (0 until factor).map { i =>
        val k = keys.foldLeft(base) { (d, c) =>
          d.withColumn(c, col(c) + lit(i.toLong * offs(c))) }
        perCopy(k, i)
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name x$factor written")
    }

    // documents: suffix every token per copy so copies share no shingles
    shifted("documents", Seq("doc_id"), (d, i) =>
      if (i == 0) d
      else d
        .withColumn("text",
          array_join(transform(split(trim($"text"), " "),
            t => concat(t, lit(s"_c$i"))), " "))
        .withColumn("n_chars", length($"text").cast("long")))

    // embeddings: per-copy sign-flip mask decorrelates cross-copy cosines
    shifted("embeddings", Seq("vec_id"), (d, i) => {
      if (i == 0) d
      else {
        // splitmix-style per-copy bit stream; bit j decides dim j's sign
        var x = i.toLong * 0x9E3779B97F4A7C15L
        x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
        x ^= x >>> 27; x *= 0x94D049BB133111EBL
        x ^= x >>> 31
        val mask = x
        val flips = (0 until 64).map(j => ((mask >>> j) & 1L) == 1L)
        d.withColumn("embedding",
          zip_with($"embedding",
            typedLit(flips.map(f => if (f) -1.0f else 1.0f)),
            (v, s) => v * s))
      }
    })

    shifted("events", Seq("event_id", "user_id"))
    shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("customer", Seq("c_custkey"))
    shifted("supplier", Seq("s_suppkey"))
    shifted("part", Seq("p_partkey"))
    // dimension tables: copied unchanged
    Seq("nation", "region").filter(t => only.isEmpty || only.contains(t)).foreach { t =>
      tbl(t).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t copied")
    }
    spark.stop()
  }
}
