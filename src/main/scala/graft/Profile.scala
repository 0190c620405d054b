package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    // warm JVM + parquet scans
    t("warm-orders")(Tables.orders(spark, dir).count())
    t("warm-lineitem")(Tables.lineitem(spark, dir).count())
    val docs = Tables.documents(spark, dir)
    t("docs-count")(docs.count())
    t("shingles-count")(dedup.Dedup.docShingleArrays(docs).count())
    t("ngram-full")(graft.dedup.Dedup.ngramJaccardPairs(docs).count())
    t("ngram-warm")(graft.dedup.Dedup.ngramJaccardPairs(docs).count())
    t("minhash-warm")(graft.dedup.Dedup.minhashLshPairs(docs).count())
    t("pipeline-warm")(graft.dedup.Dedup.pipelineStatus(docs).count())
    val pairs = t("cluster-pairs")(graft.dedup.Dedup.ngramJaccardPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val cc = t("cluster-cc")(graph.GraphOps.connectedComponents(pairs))
    t("cluster-join")(docs.select(col("doc_id").cast("long"))
      .join(cc.withColumnRenamed("vertex", "doc_id"), Seq("doc_id"), "left").count())
    t("cluster-full")(graft.dedup.Dedup.clusterAssignments(docs).count())

    val e = t("supply-derive")(graph.DerivedGraphs.undirect(
      graph.DerivedGraphs.supplyEdges(spark, dir)).localCheckpoint())
    println(s"edges=${e.count()}")
    val src = e.agg(min(col("src")).as("vertex"))
    t("bfs-6-levels")(graph.GraphOps.bfsFrom(e, src, maxDepth = 6).count())

    val he = t("hash-derive")(graph.DerivedGraphs.hashEdges(spark, dir, 2048).localCheckpoint())
    val hsrc = he.agg(min(col("src")).as("vertex"))
    t("bfs-deep-30")(graph.GraphOps.bfsFrom(he, hsrc, maxDepth = 30).count())
    t("cc-nation")(graph.GraphOps.connectedComponents(
      graph.DerivedGraphs.nationEdges(spark, dir)).count())
    t("cc-supply")(graph.GraphOps.connectedComponents(
      graph.DerivedGraphs.supplyEdges(spark, dir)).count())
    spark.stop()
  }
}
