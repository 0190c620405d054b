package graft

import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot / graft_norm match the interpreted higher-order fold bitwise") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f)),
      (2L, Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))
    ).toDF("id", "a", "b")
      .withColumn("va", expr("CAST(a AS ARRAY<DOUBLE>)"))
      .withColumn("vb", expr("CAST(b AS ARRAY<DOUBLE>)"))
    val r = df.select(
      expr("graft_dot(va, vb)").as("dot"),
      expr("aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("ref_dot"),
      expr("graft_norm(va)").as("nrm"),
      sqrt(expr("aggregate(va, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)")).as("ref_nrm")
    ).collect()
    r.foreach { row =>
      assert(row.getDouble(0) === row.getDouble(1))
      assert(row.getDouble(2) === row.getDouble(3))
    }
  }

  test("graft_dot accepts float arrays directly (implicit cast at registration)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("id", "a", "b")
    assert(df.select(expr("graft_dot(a, b)")).head.getDouble(0) === 11.0)
  }

  test("null arrays propagate null") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)), graft_norm(CAST(NULL AS ARRAY<DOUBLE>))")
      .head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
