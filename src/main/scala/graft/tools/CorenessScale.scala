package graft.tools
import graft._

/** Distributed-coreness scale probe (the DensestScale pattern): run the
  * h-index fixpoint on a scale rung's supply graph — far above
  * LocalEdgeThreshold, so the DISTRIBUTED path executes — and report
  * wall time, fixpoint rounds, max coreness, and the level histogram
  * tail. Rounds should track influence-chain depth (far below the
  * bucket-peel's degeneracy-bound count); each round is one recompute
  * semi-join + one gather join + one partitioned h-index window + one
  * merge, all sized by the dirty frontier.
  *
  * With `--check-peel` the retained degeneracy-serialized bucket-peel
  * ([[graph.GraphOps.corenessPeel]]) also runs on the same graph and
  * the two outputs are diffed — the independent-algorithm oracle for
  * a rung no DuckDB query can reach.
  */
object CorenessScale {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_.startsWith("--")).headOption.getOrElse("target/sf10")
    val checkPeel = args.contains("--check-peel")
    val spark = GraftSession.local(32, "coreness-scale")
    val e = graph.DerivedGraphs.supplyEdges(spark, dir)
    val t0 = System.nanoTime()
    val out = graph.GraphOps.coreness(e).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    val rounds = graph.GraphOps.lastCorenessRounds
    val byLevel = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val maxK = if (byLevel.isEmpty) -1L else byLevel.keys.max
    val tail = byLevel.toSeq.sortBy(-_._1).take(5)
      .map { case (lvl, c) => s"k=$lvl:$c" }.mkString(", ")
    System.err.println(
      f"CORENESS sf-dir=$dir: ${out.length} vertices, max coreness $maxK, " +
        f"rounds $rounds, $dt%.1f s; top levels: $tail")
    if (checkPeel) {
      val t1 = System.nanoTime()
      val peel = graph.GraphOps.corenessPeel(e).collect()
      val dtp = (System.nanoTime() - t1) / 1e9
      val a = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = peel.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val diff = (a.keySet ++ b.keySet).count(k => a.get(k) != b.get(k))
      System.err.println(
        f"CORENESS peel cross-check: ${peel.length} vertices, " +
          f"rounds ${graph.GraphOps.lastCorenessRounds}, $dtp%.1f s, " +
          f"DIFF $diff (must be 0)")
      require(diff == 0, s"h-index fixpoint vs bucket-peel: $diff vertices differ")
    }
    spark.stop()
  }
}
