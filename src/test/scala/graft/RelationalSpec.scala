package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q_approx_distinct: HLL++ estimate within 5% of exact") {
    val out = Events.qApproxDistinct(spark, sfDir)
      .withColumn("rel_err",
        abs(col("approx_users") - col("exact_users")) / col("exact_users"))
    val maxErr = out.agg(max("rel_err")).head.getDouble(0)
    assert(maxErr <= 0.05, s"max relative error $maxErr")
  }

  test("q17_small_qty agrees with a direct recomputation") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
    val parts = Tables.part(spark, sfDir)
      .where(col("p_brand") === "Brand#1" && col("p_type") === "ECONOMY")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val byPart = li.groupBy(_.getLong(0))
    val avg = byPart.map { case (k, rs) =>
      k -> rs.map(r => BigDecimal(r.getDouble(1)).setScale(2)).sum.toDouble / rs.size
    }
    val hits = li.filter(r => parts.contains(r.getLong(0)) &&
      r.getDouble(1) < 0.2 * avg(r.getLong(0)))
    val expected = hits.map(r => BigDecimal(r.getDouble(2)).setScale(2)).sum.toDouble / 7.0
    val row = operators.Relational.q17SmallQty(spark, sfDir).head
    assert(row.getLong(1) === hits.length.toLong)
    assert(math.abs(row.getDouble(0) - expected) < 1e-9)
  }

  test("q_cube marginals are consistent with the base aggregation") {
    val cube = operators.Relational.qCube(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val base = cube.filter { case ((s, p), _) => s != "ALL" && p != "ALL" }
    // grand total row equals the sum of all base cells
    val (gt, gn) = cube(("ALL", "ALL"))
    assert(gn === base.values.map(_._2).sum)
    assert(math.abs(gt - base.values.map(_._1).sum) < 1e-6)
    // each status marginal equals the sum of its base cells
    base.keys.map(_._1).toSet.foreach { st: String =>
      val cells = base.filter(_._1._1 == st).values
      val (mt, mn) = cube((st, "ALL"))
      assert(mn === cells.map(_._2).sum)
      assert(math.abs(mt - cells.map(_._1).sum) < 1e-6)
    }
    assert(gn === Tables.orders(spark, sfDir).count())
  }
}
