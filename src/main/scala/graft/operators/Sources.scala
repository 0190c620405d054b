package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: JSONL and CSV
  * round-trips of the documents table. Each op writes the corpus out
  * through the format's sink, reads it back through the format's
  * source with an explicit schema (schema-on-read — no inference scan
  * at scale), and aggregates. The oracle runs the same aggregation on
  * the original parquet, so any lossiness in either direction
  * (quoting, escaping, type coercion, row loss) hash-fails: the
  * per-group `min(md5(text))` pins byte-exact text survival, not just
  * row counts.
  *
  * Scale shape: both sinks/sources are splittable line formats —
  * write and read are embarrassingly parallel per partition; the
  * aggregation is the only shuffle. (Exception: the CSV read uses
  * multiLine — see [[readCsv]].)
  */
object Sources {

  /** Fixed per-op scratch path (overwritten each invocation) — a
    * fresh createTempDirectory per call would leak a full corpus copy
    * under /tmp on every bench/gate iteration.
    */
  private def scratch(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-scratch/$name"

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def summarize(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(md5(col("text").cast(BinaryType))).as("min_fp"))
      .orderBy("lang", "source")

  val summarizeSql: String = """
    SELECT lang, source, COUNT(*) AS n_docs,
      CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      MIN(md5(text)) AS min_fp
    FROM documents GROUP BY lang, source ORDER BY lang, source"""

  /** documents → JSONL sink → JSONL source (explicit schema) → agg. */
  def sourceJsonl(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${scratch("jsonl")}/docs"
    Tables.documents(spark, dir).write.mode("overwrite").json(out)
    summarize(spark.read.schema(DocSchema).json(out))
  }

  /** CSV sink/source with one pinned dialect so the round-trip is
    * lossless by construction (spec-verified on newline / quote /
    * empty / null texts): RFC-4180 doubled-quote escaping (escape set
    * to the quote char on both sides), nulls as the Hive `\N`
    * sentinel — distinct from an empty field, so empty-string text
    * survives instead of collapsing to null — and `multiLine` on read
    * because the writer quotes embedded newlines (without it a quoted
    * newline splits one doc into two corrupt rows). multiLine costs
    * file-level rather than block-level split granularity at scale —
    * the documented trade for correctness on corpora with newlines;
    * JSONL stays the splittable fast path.
    */
  def writeCsv(docs: DataFrame, out: String): Unit =
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("nullValue", "\\N")
      // both sides: Spark's CSV trims unquoted whitespace by default,
      // silently mutating texts with leading/trailing spaces
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(DocSchema)
      .option("header", "true").option("escape", "\"")
      .option("nullValue", "\\N").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def sourceCsv(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${scratch("csv")}/docs"
    writeCsv(Tables.documents(spark, dir), out)
    summarize(readCsv(spark, out))
  }

  /** documents → ORC sink → ORC source → agg: the second columnar
    * format next to parquet. ORC is binary and typed, so the round
    * trip is lossless by construction (no dialect pinning needed —
    * nulls, empty strings, newlines, and the CSV `\N` sentinel all
    * survive; the md5 fingerprint still proves it against the parquet
    * oracle). Scale shape matches parquet: splittable stripes,
    * column pruning, min/max predicate pushdown — the explicit schema
    * skips the footer-merge inference pass over every file.
    */
  def sourceOrc(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${scratch("orc")}/docs"
    Tables.documents(spark, dir).write.mode("overwrite").orc(out)
    summarize(spark.read.schema(DocSchema).orc(out))
  }

  /** Bucketed-table layout: write orders and lineitem bucketed (8
    * buckets) AND sorted by the join key, then sort-merge-join them
    * with NO shuffle on either side — Spark reads each bucket pair
    * co-located, so the join exchanges nothing (the only Exchange in
    * the plan belongs to the final tiny groupBy; the spec pins
    * exactly that). This is the layout move that matters most at
    * 100 TB: a fact-fact join on pre-bucketed tables skips the
    * dominant shuffle entirely, every run, for the cost of one
    * bucketed write. `hint("merge")` pins SMJ so the plan shape (and
    * the zero-shuffle property) is stable across stats changes.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$out/orders").saveAsTable("graft_orders_b")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$out/lineitem").saveAsTable("graft_lineitem_b")
    val o = spark.table("graft_orders_b")
    val l = spark.table("graft_lineitem_b")
    l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val bucketedJoinSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n_items,
      CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Partition-pruned (hive-layout) scan — the other half of the
    * layout story next to bucketing: orders written
    * `partitionBy(o_year)`, then read with a year predicate. The
    * filter resolves against directory names, so non-matching years
    * are never listed, opened, or scanned (`PartitionFilters` in the
    * scan node — the spec pins it); at 100 TB partitioning on the
    * dominant filter column is the difference between scanning one
    * year and scanning all of them. The oracle runs the same
    * aggregation + predicate over the unpartitioned original, so any
    * row lost or duplicated by the layout round-trip hash-fails.
    */
  val PartYear = 1997

  def partitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${scratch("partitioned")}/orders"
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .where(col("o_year") === PartYear)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue"))
      .orderBy("status")
  }

  val partitionedScanSql: String = s"""
    SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders WHERE EXTRACT(year FROM o_orderdate) = $PartYear
    GROUP BY 1 ORDER BY 1"""

  def ops: Seq[Op] = Seq(
    Op("source_jsonl", sourceJsonl, Some(summarizeSql)),
    Op("source_csv", sourceCsv, Some(summarizeSql)),
    Op("source_orc", sourceOrc, Some(summarizeSql)),
    Op("source_bucketed", bucketedJoin, Some(bucketedJoinSql)),
    Op("source_partitioned", partitionedScan, Some(partitionedScanSql)),
  )
}
