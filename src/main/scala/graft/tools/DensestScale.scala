package graft.tools
import graft._
object DensestScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10"
    val spark = GraftSession.local(32, "densest-scale")
    val e = graph.DerivedGraphs.supplyEdges(spark, dir)
    val t0 = System.nanoTime()
    val out = graph.GraphOps.densestSubgraph(e).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    System.err.println(f"DENSEST sf-dir=$dir: ${out.length} vertices, density ${if (out.nonEmpty) out.head.getDouble(1) else -1.0}%.4f in $dt%.1f s")
    spark.stop()
  }
}
