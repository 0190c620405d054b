package graft

import org.apache.spark.sql.functions._

/** ScaleUp is the only generator of the stress corpora the scale
  * benches run on — a silent key collision there invalidates every
  * sf1/sf3 number, so pin the replication invariants.
  */
class ScaleUpSpec extends SparkSpec {

  test("replicate shifts keys collision-free and preserves FK joins") {
    val s = spark
    import s.implicits._
    val orders = Seq((1L, 10L), (2L, 11L), (3L, 10L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
    val o3 = ScaleUp.replicate(orders, Seq("o_orderkey", "o_custkey"), 3)
    val c3 = ScaleUp.replicate(cust, Seq("c_custkey"), 3)
    assert(o3.count() === 9 && c3.count() === 6)
    // PK uniqueness across copies
    assert(o3.select("o_orderkey").distinct().count() === 9)
    // every replicated FK resolves, and only within its own copy
    val joined = o3.join(c3, col("o_custkey") === col("c_custkey"))
    assert(joined.count() === 9)
    assert(joined.where(
      floor(col("o_orderkey") / ScaleUp.Stride) =!=
        floor(col("c_custkey") / ScaleUp.Stride)).count() === 0)
  }

  test("replicate refuses sources whose keys would collide across copies") {
    val s = spark
    import s.implicits._
    val shifted = Seq((ScaleUp.Stride + 5L, "x")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ScaleUp.replicate(shifted, Seq("k"), 2)
    }
    assert(e.getMessage.contains("would collide"))
    // negative keys alias across copies too (-5 + Stride == Stride-5 + 0)
    val negative = Seq((-5L, "x"), (7L, "y")).toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      ScaleUp.replicate(negative, Seq("k"), 2)
    }
    assert(e2.getMessage.contains("would collide"))
  }
}
