package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

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
  * aggregation is the only shuffle.
  */
object Sources {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

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
    val out = s"${tmpDir("graft-jsonl")}/docs"
    Tables.documents(spark, dir).write.mode("overwrite").json(out)
    summarize(spark.read.schema(DocSchema).json(out))
  }

  /** documents → CSV sink (header, quoted) → CSV source → agg. */
  def sourceCsv(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${tmpDir("graft-csv")}/docs"
    Tables.documents(spark, dir).write.mode("overwrite")
      .option("header", "true").csv(out)
    summarize(spark.read.schema(DocSchema).option("header", "true").csv(out))
  }

  def ops: Seq[Op] = Seq(
    Op("source_jsonl", sourceJsonl, Some(summarizeSql)),
    Op("source_csv", sourceCsv, Some(summarizeSql)),
  )
}
