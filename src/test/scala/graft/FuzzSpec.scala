package graft

/** Pins the randomized differential harness itself: draws are seeded
  * and reproducible (same seed ⇒ same names, same rows), every family
  * is reachable, and two families are cross-checked here against
  * independent Spark formulations. The full Spark-vs-DuckDB compare
  * runs via `runMain graft.Fuzz` + `tools/fuzz.py` (100 draws green at
  * seed 1, sf0.001 — r14); this spec keeps the harness honest inside
  * `sbt test`, where DuckDB isn't available.
  */
class FuzzSpec extends SparkSpec {

  test("draws are seeded-reproducible and cover every family") {
    val a = Fuzz.draws(spark, sfDir, seed = 7, n = 10)
    val b = Fuzz.draws(spark, sfDir, seed = 7, n = 10)
    assert(a.map(_.name) === b.map(_.name))
    assert(a.head.frame.columns.nonEmpty)
    // reproducible rows, not just names (spot-check the first draw)
    assert(rowsOf(a.head.frame) === rowsOf(b.head.frame))
    // 10 draws at this seed reach several distinct families
    val fams = a.map(_.name.split("_")(1)).toSet
    assert(fams.size >= 3, s"families drawn: $fams")
    // a different seed draws different parameters
    val c = Fuzz.draws(spark, sfDir, seed = 8, n = 10)
    assert(c.map(_.name) !== a.map(_.name))
  }

  test("every family (incl. the r17 gini addition) is reachable") {
    // seed 1 × 80 draws covers all NumFamilies selector values (the
    // java.util.Random stream is algorithm-specified, so this is a
    // fixed fact, not flake); if a family is ever added without a
    // selector arm — or an arm dies at construction — this fails
    val fams = Fuzz.draws(spark, sfDir, seed = 1, n = 80)
      .map(_.name.split("_")(1)).toSet
    assert(fams === Set("agg", "window", "topk", "jaccard", "bfs",
      "basket", "contain", "ktruss", "ewma", "temp", "readability",
      "substr", "coreness", "anngraph", "gini"))
  }

  test("agg draw equals an independent spark.sql formulation") {
    val draw = Fuzz.draws(spark, sfDir, seed = 3, n = 25)
      .find(_.name.contains("_agg_")).get
    // name encodes the parameters: fzNNN_agg_t<threshold>_<column>
    val parts = draw.name.split("_", 4)
    val (t, c) = (parts(2).drop(1).toInt, parts(3))
    SqlSurface.register(spark, sfDir)
    val twin = spark.sql(s"""
      SELECT $c, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem WHERE l_quantity <= $t GROUP BY $c ORDER BY $c""")
    assert(rowsOf(draw.frame) === rowsOf(twin))
  }

  test("bfs draw levels are valid BFS levels from the encoded source") {
    val draw = Fuzz.draws(spark, sfDir, seed = 5, n = 30)
      .find(_.name.contains("_bfs_")).get
    val rows = draw.frame.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.values.min === 0L, "source itself must be at level 0")
    assert(rows.values.count(_ == 0L) === 1, "exactly one source")
    // every non-source vertex at level L has a neighbor at L-1
    val e = graph.DerivedGraphs.supplyEdgesUndirected(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.filter(_._2 > 0L).foreach { case (v, l) =>
      assert(adj.getOrElse(v, Set.empty).exists(u => rows.get(u).contains(l - 1)),
        s"vertex $v at level $l has no level-${l - 1} neighbor")
    }
  }
}
