package graft.tools
import graft._

/** Distributed-coreness scale probe (the DensestScale pattern): run the
  * bucket-peel on a scale rung's supply graph — far above
  * LocalEdgeThreshold, so the DISTRIBUTED path executes — and report
  * wall time, peel rounds, max coreness, and the level histogram tail.
  * Rounds should track the graph's degeneracy (each round either jumps
  * k to the current min degree or peels a within-level wave), and each
  * round is one degree aggregation + two semi-joins + the isolation
  * anti-join — edge-linear work.
  */
object CorenessScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10"
    val spark = GraftSession.local(32, "coreness-scale")
    val e = graph.DerivedGraphs.supplyEdges(spark, dir)
    val t0 = System.nanoTime()
    val out = graph.GraphOps.coreness(e).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    val byLevel = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val maxK = if (byLevel.isEmpty) -1L else byLevel.keys.max
    val tail = byLevel.toSeq.sortBy(-_._1).take(5)
      .map { case (lvl, c) => s"k=$lvl:$c" }.mkString(", ")
    System.err.println(
      f"CORENESS sf-dir=$dir: ${out.length} vertices, max coreness $maxK, " +
        f"rounds ${graph.GraphOps.lastCorenessRounds}, $dt%.1f s; top levels: $tail")
    spark.stop()
  }
}
