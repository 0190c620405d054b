package graft

import graft.operators.{Relational, Sources}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("jsonl, csv, and orc round-trips preserve the corpus byte-exactly") {
    val direct = rowsOf(Sources.summarize(Tables.documents(spark, sfDir)))
    assert(rowsOf(Sources.sourceJsonl(spark, sfDir)) === direct)
    assert(rowsOf(Sources.sourceCsv(spark, sfDir)) === direct)
    assert(rowsOf(Sources.sourceOrc(spark, sfDir)) === direct)
  }

  test("csv dialect survives newline / quote / empty / null / sentinel texts") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line one\nline two\n\nline four", "en", "web", 27L),
      (2L, "she said \"hi\", then \"bye\"", "en", "web", 25L),
      (3L, "", "en", "book", 0L),          // empty string, not null
      (4L, null.asInstanceOf[String], "de", "web", 0L), // genuine null
      (6L, "trailing space ", "fr", "web", 15L),
      (7L, "comma,sep;and\ttab", "fr", "book", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-scratch/csv-spec"
    Sources.writeCsv(nasty, out)
    val back = Sources.readCsv(spark, out)
      .orderBy("doc_id").collect()
    val orig = nasty.orderBy("doc_id").collect()
    assert(back.length === orig.length)
    orig.zip(back).foreach { case (o, b) => assert(b === o, s"doc ${o.getLong(0)}") }
    // Documented sentinel collision (same convention as Hive text
    // tables): a text that IS the literal 2-char string \N reads back
    // as NULL. JSONL is the lossless path for such corpora.
    val sentinel = Seq((9L, "\\N", "de", "book", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Sources.writeCsv(sentinel, out)
    assert(Sources.readCsv(spark, out).collect().head.isNullAt(1))
  }

  test("q_skew_agg: salted two-phase equals direct aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("l_suppkey")
    assert(rowsOf(Relational.qSkewAgg(spark, sfDir)) === rowsOf(direct))
  }

  test("q_grouping_sets: grand total equals sum of status marginals") {
    val out = Relational.qGroupingSets(spark, sfDir).collect()
    val grand = out.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    val statusMarginals = out.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(statusMarginals.map(_.getLong(3)).sum === grand.head.getLong(3))
    assert(math.abs(statusMarginals.map(_.getDouble(2)).sum - grand.head.getDouble(2)) < 1e-6)
    // no priority-only marginal was computed (that's the point vs cube)
    assert(!out.exists(r => r.getString(0) == "ALL" && r.getString(1) != "ALL"))
  }

  test("bucketedJoin: the fact-fact join itself exchanges nothing") {
    val df = graft.operators.Sources.bucketedJoin(spark, sfDir)
    val byStatus = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inspect the final (post-AQE) plan: sparkPlan predates
    // EnsureRequirements and never shows exchanges
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // final AQE plan only
    assert(plan.contains("SortMergeJoin"))
    // everything BELOW the join — its two bucketed scan inputs — must
    // be exchange-free; the groupBy/sort shuffles above it are fine
    val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"),
      s"bucketed join sides should not shuffle, plan:\n$plan")
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus === direct)
  }

  test("partitionedScan: the year predicate prunes partitions at the scan") {
    val df = graft.operators.Sources.partitionedScan(spark, sfDir)
    val out = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the filter must be a partition filter on the scan, not a data filter
    val scan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("o_year"), s"expected o_year in PartitionFilters, got: $scan")
    val direct = Tables.orders(spark, sfDir)
      .where(year(col("o_orderdate")) === graft.operators.Sources.PartYear)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === direct)
  }
}
