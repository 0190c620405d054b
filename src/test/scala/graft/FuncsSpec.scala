package graft

import graft.operators.Funcs
import org.apache.spark.sql.functions._

class FuncsSpec extends SparkSpec {

  test("q_histogram: width_bucket edges match the floor formula incl. under/overflow") {
    import spark.implicits._
    val probe = Seq(-1.0, 0.0, 9999.99, 10000.0, 250000.0, 499999.99, 500000.0, 600000.0)
      .toDF("v")
      .select(col("v"),
        width_bucket(col("v"), lit(Funcs.HistLo), lit(Funcs.HistHi), lit(Funcs.HistN)).as("b"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(probe(-1.0) === 0L)       // underflow
    assert(probe(0.0) === 1L)        // inclusive lower edge
    assert(probe(9999.99) === 1L)
    assert(probe(10000.0) === 2L)    // exact boundary goes up
    assert(probe(250000.0) === 26L)
    assert(probe(499999.99) === 50L)
    assert(probe(500000.0) === 51L)  // inclusive-exclusive upper edge → overflow
    assert(probe(600000.0) === 51L)
  }

  test("q_date_funcs: weekday pins Monday=0 and add_months clamps month end") {
    import spark.implicits._
    val d = Seq("2024-01-01", "2024-01-07", "2024-01-31", "2023-11-30")
      .toDF("s").select(col("s"), to_date(col("s")).as("d"))
      .select(col("s"), weekday(col("d")).as("wd"),
        date_format(add_months(col("d"), 1), "yyyy-MM-dd").as("p1m"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(d("2024-01-01")._1 === 0) // a Monday
    assert(d("2024-01-07")._1 === 6) // a Sunday
    assert(d("2024-01-31")._2 === "2024-02-29") // leap-year clamp
    assert(d("2023-11-30")._2 === "2023-12-30") // no clamp needed
  }

  test("q_corr_stats: moments agree with direct two-pass computation") {
    val out = Funcs.qCorrStats(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value").as("v"),
        get_json_object(col("props"), "$.k").cast("double").as("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val byType = ev.groupBy(_._1)
    out.foreach { r =>
      val rows = byType(r.getString(0))
      val n = rows.length.toDouble
      val mv = rows.map(_._2).sum / n
      val mk = rows.map(_._3).sum / n
      val cov = rows.map(t => (t._2 - mv) * (t._3 - mk)).sum / (n - 1)
      val vv = rows.map(t => (t._2 - mv) * (t._2 - mv)).sum / (n - 1)
      assert(r.getLong(1) === rows.length)
      assert(math.abs(r.getDouble(4) - cov) < 1e-3, s"covar ${r.getString(0)}")
      assert(math.abs(r.getDouble(6) - vv) < 1e-3, s"var ${r.getString(0)}")
    }
  }

  test("q_unnest_tokens: positions, counts, and threshold against a planted doc") {
    val out = Funcs.qUnnestTokens(spark, sfDir).collect()
    assert(out.nonEmpty)
    // ordinality invariants on real data: 0 ≤ first ≤ last, and a token
    // repeated n times spans at least n-1 positions
    out.foreach { r =>
      val (n, first, last) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 3L && first >= 0L && first <= last)
      assert(last - first >= n - 1, s"${r.getString(1)}: n=$n span=${last - first}")
    }
    // direct recount of one doc from the raw text
    val docId = out.head.getLong(0)
    val text = Tables.documents(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("doc_id") === docId)
      .head().getAs[String]("text")
    val positions = text.split(" ", -1).zipWithIndex.groupBy(_._1)
    out.filter(_.getLong(0) == docId).foreach { r =>
      val ps = positions(r.getString(1)).map(_._2.toLong)
      assert(r.getLong(2) === ps.length.toLong)
      assert(r.getLong(3) === ps.min && r.getLong(4) === ps.max)
    }
    // threshold: no token below 3 occurrences leaks through
    assert(out.forall(_.getLong(2) >= 3L))
  }
}
