package graft

import graft.operators.{Relational, Sources}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("jsonl and csv round-trips preserve the corpus byte-exactly") {
    val direct = rowsOf(Sources.summarize(Tables.documents(spark, sfDir)))
    assert(rowsOf(Sources.sourceJsonl(spark, sfDir)) === direct)
    assert(rowsOf(Sources.sourceCsv(spark, sfDir)) === direct)
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
}
