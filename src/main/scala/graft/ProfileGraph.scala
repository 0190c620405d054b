package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the distributed graph paths at the
  * ScaleUp corpus (not part of the driver contract): separates the
  * warehouse→graph derivation cost from the iterative loop cost.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    t("warm")(spark.range(1000000).selectExpr("id % 7 k").groupBy("k").count().collect())
    val se = t("supplyEdges-derive") {
      val e = graph.DerivedGraphs.supplyEdges(spark, dir).localCheckpoint()
      println(s"  edges=${e.count()} verts=" +
        e.select(col("src").as("v")).union(e.select(col("dst"))).distinct().count())
      e
    }
    val un = t("undirect")(graph.DerivedGraphs.undirect(se).localCheckpoint())
    t("cc-loop")(println("  cc rows=" + graph.GraphOps.connectedComponents(se).count()))
    t("bfs-loop")(println("  bfs rows=" + {
      val src = un.agg(min(col("src")).as("vertex"))
      graph.GraphOps.bfsFrom(un, src, maxDepth = 6).count()
    }))
    t("dfs-leaves-loop")(println("  leaves rows=" + {
      val src = se.agg(min(col("src")).as("vertex"))
      graph.GraphOps.dfsLeaves(se, src).count()
    }))
    spark.stop()
  }
}
