package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The SQL front door is gated by the operators it mirrors: every
  * surface query must return the operator's exact row set (compared
  * under the driver's column-name-sorted convention, the same shape
  * the DuckDB oracle gate hashes) — so a SQL user and a Scala user
  * get byte-identical answers.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def canon(df: DataFrame): Set[Seq[Any]] =
    rowsOf(df.select(df.columns.sorted.map(col).toIndexedSeq: _*))

  test("every SQL-surface query is output-identical to its operator") {
    SqlSurface.register(spark, sfDir)
    assert(SqlSurface.queries.nonEmpty)
    SqlSurface.queries.foreach { case (name, sql) =>
      val op = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(sql)
      assert(viaSql.columns.sorted.toSeq === op.columns.sorted.toSeq, s"$name: columns")
      assert(canon(viaSql) === canon(op), s"$name: rows differ between spark.sql and operator")
    }
  }

  test("surface names are real gate operators") {
    assert(SqlSurface.queries.keySet.subsetOf(SparkEntry.queries.keySet))
    // r13 widening: the whole relational/event/sampling families, the
    // text+dedup representatives, and the fixed-iteration graph
    // algorithms are reachable from spark.sql
    assert(SqlSurface.queries.size >= 58)
  }

  test("exposed ∪ excluded partitions the gate surface (every op chose a side)") {
    val exposedAndExcluded = SqlSurface.queries.keySet ++ SqlSurface.excluded.keySet
    val overlap = SqlSurface.queries.keySet.intersect(SqlSurface.excluded.keySet)
    assert(overlap.isEmpty, s"ops both exposed and excluded: $overlap")
    assert(exposedAndExcluded === SparkEntry.queries.keySet,
      s"unclassified: ${SparkEntry.queries.keySet -- exposedAndExcluded}; " +
        s"phantom: ${exposedAndExcluded -- SparkEntry.queries.keySet}")
    // every exclusion reason is machine-readable: `category: detail`
    val cats = Set("fixpoint", "streaming", "layout", "kernel", "model", "driver-twin")
    SqlSurface.excluded.foreach { case (name, reason) =>
      val cat = reason.takeWhile(_ != ':')
      assert(cats.contains(cat), s"$name: unknown exclusion category '$cat'")
    }
  }

  test("no SQL-surface plan degenerates to a cartesian product") {
    // The non-equi ANN joins (vec_id != qid) must plan as broadcast
    // nested loops over the 16-row query side, never a cartesian; the
    // graph CTE chains must stay hash/broadcast joins. Same guarantee
    // PlanInvariantsSpec pins for the operators, extended to the SQL
    // front door.
    SqlSurface.register(spark, sfDir)
    SqlSurface.queries.foreach { case (name, sql) =>
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  test("warehouse tables and named graphs are queryable as views") {
    SqlSurface.register(spark, sfDir)
    (Tables.names ++ Seq("graph_supply", "graph_supply_und", "graph_nation", "graph_hash"))
      .foreach { v =>
        assert(spark.sql(s"SELECT * FROM $v LIMIT 1").count() === 1L, v)
      }
  }

  test("custom catalyst expressions are callable from SQL") {
    SqlSurface.register(spark, sfDir)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_norm(array(3.0d, 4.0d)) AS n").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }
}
