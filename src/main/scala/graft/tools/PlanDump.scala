package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Writes `explain("formatted")` for declared queries to
  * `<outDir>/<name>_<tag>.txt` — the committed plan evidence for
  * optimization rounds (plans/r20/...). Queries whose entry point runs
  * eagerly (streaming drains, driver-resolved percentiles) dump the
  * plan of the frame they return; the interesting distributed plans of
  * those ops are audited by PlanInvariantsSpec instead.
  *
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [name...]` —
  * no names = every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[4]"), shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.foreach { n =>
      val txt =
        try frameOf(spark, sfDir, n, qs)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        catch { case t: Throwable => s"PLAN DUMP FAILED: ${t.getMessage}" }
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"), txt.getBytes("UTF-8"))
      System.err.println(s"plan: $n")
    }
    spark.stop()
  }

  /** Resolves a plan-dump name: a declared query, or a pseudo-query
    * for a subplan that a declared query materializes eagerly (so its
    * own explain only shows checkpoint scans). `dedup_semantic.serve`
    * is the hierarchical k-means serve assignment — the frame
    * dedup_semantic localCheckpoints into `withC` — rebuilt
    * un-checkpointed here so the argmin projection is visible.
    */
  private def frameOf(spark: SparkSession, sfDir: String, name: String,
      qs: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]) = {
    import org.apache.spark.sql.functions._
    import graft.similarity.{Ann, Cluster}
    name match {
      case "dedup_semantic.serve" =>
        val vecs = Ann.withNorm(graft.Tables.embeddings(spark, sfDir)
            .select(col("vec_id").cast("long").as("vec_id"), col("embedding")))
          .select("vec_id", "v", "nrm").localCheckpoint()
        val k = Cluster.kFor(vecs.count())
        require(k > Cluster.HierK,
          s"dedup_semantic.serve needs a k > ${Cluster.HierK} corpus (got k=$k); " +
            "point sfDir at the x100 rung")
        val coarse = Cluster.sampledCentroids(vecs, Cluster.coarseKFor(k))
        Cluster.hierAssign(coarse, Cluster.hierSubCentroids(vecs, coarse))(vecs)
      case "mm_phash.sigs" =>
        // the signature pass mm_phash localCheckpoints away — dumped
        // un-checkpointed so the graft_phash projection (vs the old
        // DeserializeToObject→FlatMap→SerializeFromObject block) is
        // visible plan evidence
        graft.multimodal.Multimodal.phashSigsForPlan(
          graft.Tables.documents(spark, sfDir))
      case _ => qs(name)(spark, sfDir)
    }
  }
}
