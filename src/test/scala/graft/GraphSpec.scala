package graft

import graft.graph.{DerivedGraphs, GraphOps, GraphStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the graph ops the driver gate checks rows-only:
  * reference-format parsing, DFS preorder, CC invariants.
  */
class GraphSpec extends SparkSpec {

  private def edgeDf(edges: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  test("fromAdjacencyText parses the reference G*.txt format 1-based") {
    // Reference format (utilities.h + G1..G6.txt): first line n, then
    // n rows of n 0/1 cells; vertex ids are 1-based (client.c).
    val f = Files.createTempFile("graft-g1", ".txt")
    Files.writeString(f,
      """4
        |0 1 0 0
        |0 0 1 0
        |0 0 0 1
        |1 0 1 0
        |""".stripMargin)
    val edges = GraphStore.fromAdjacencyText(spark, f.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 3L)))
  }

  test("dfsPreorder is the lexicographic preorder") {
    // 1 -> {2,5}, 2 -> {3}, 5 -> {6}, plus a back edge 3 -> 1.
    val e = edgeDf((1L, 5L), (1L, 2L), (2L, 3L), (5L, 6L), (3L, 1L))
    val order = GraphOps.dfsPreorder(e, source = 1L)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    assert(order === Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("bfs levels are min-hop distances") {
    // 1 -> 2 -> 3 -> 4 and a shortcut 1 -> 3.
    val e = edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    val s = spark
    import s.implicits._
    val src = Seq(1L).toDF("vertex")
    val levels = GraphOps.bfsFrom(e, src)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(levels === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("connectedComponents labels by component minimum") {
    val e = edgeDf((1L, 2L), (2L, 3L), (10L, 11L))
    val cc = GraphOps.connectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: edge endpoints share a component (hash graph)") {
    val e = DerivedGraphs.hashEdges(spark, sfDir, 512).localCheckpoint()
    val cc = GraphOps.connectedComponents(e)
    val viol = e
      .join(cc.withColumnRenamed("vertex", "src").withColumnRenamed("component", "ca"), "src")
      .join(cc.withColumnRenamed("vertex", "dst").withColumnRenamed("component", "cb"), "dst")
      .where(col("ca") =!= col("cb")).count()
    assert(viol === 0L)
    // every vertex labeled, label ≤ vertex id
    val bad = cc.where(col("component") > col("vertex")).count()
    assert(bad === 0L)
  }

  test("kCore strips low-degree periphery, keeps the clique with core degrees") {
    // 4-clique {1,2,3,4} plus a tail 4-5-6: 3-core is exactly the clique.
    val e = edgeDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val core = GraphOps.kCore(e, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max degree empties the graph
    assert(GraphOps.kCore(e, k = 5).count() === 0L)
  }

  test("bfs local fast path and distributed loop agree (both directions)") {
    val e = DerivedGraphs.hashEdges(spark, sfDir, 512).localCheckpoint()
    val s = spark
    import s.implicits._
    val src = Seq(1L).toDF("vertex")
    val local = GraphOps.bfs(e, src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val dist = GraphOps.bfs(e, src, maxLocalEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(local === dist)
    assert(local.nonEmpty)
  }

  test("connectedComponents local union-find and star loop agree") {
    val e = DerivedGraphs.hashEdges(spark, sfDir, 512).localCheckpoint()
    val local = GraphOps.connectedComponents(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = GraphOps.connectedComponents(e, maxLocalEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local === dist)
  }

  test("pagerank, triangleCounts, kCore: local and distributed paths agree") {
    val e = DerivedGraphs.hashEdges(spark, sfDir, 512).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val prL = graft.graph.GraphOps.pagerank(e, iters = 3)
      .select(col("vertex"), round(col("rank"), 6).as("rank"))
    val prD = graft.graph.GraphOps.pagerank(e, iters = 3, maxLocalEdges = 0L)
      .select(col("vertex"), round(col("rank"), 6).as("rank"))
    assert(rows(prL) === rows(prD))
    assert(rows(GraphOps.triangleCounts(e)) === rows(GraphOps.triangleCounts(e, maxLocalEdges = 0L)))
    assert(rows(GraphOps.kCore(e, k = 2)) === rows(GraphOps.kCore(e, k = 2, maxLocalEdges = 0L)))
  }

  test("labelPropagation separates two planted cliques, paths agree") {
    // two 4-cliques joined by a single bridge edge
    val c1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val e = edgeDf((c1 ++ c2 :+ ((4L, 11L))): _*)
    val lpa = GraphOps.labelPropagation(e, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(lpa).toSet.size === 1)   // one community per clique
    assert((11L to 14L).map(lpa).toSet.size === 1)
    assert(lpa(1L) !== lpa(12L))                    // cliques stay separate
    val dist = GraphOps.labelPropagation(e, iters = 4, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === lpa)
  }

  test("scc separates cycles joined one-way, local and distributed agree") {
    // cycle {1,2,3} -> bridge -> cycle {10,11}; 20 hangs off one-way
    val e = edgeDf((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 10L), (10L, 11L), (11L, 10L), (11L, 20L))
    val local = GraphOps.scc(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    val dist = GraphOps.scc(e, maxLocalEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === local)
  }
}
