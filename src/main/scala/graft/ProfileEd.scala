package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the dedup hot paths (not part of the
  * driver contract).
  */
object ProfileEd {
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

    val docs = Tables.documents(spark, dir)
    t("warm")(docs.count())
    val docArr = t("shingle-arrays")(dedup.Dedup.docShingleArrays(docs).localCheckpoint())
    t("shingle-count")(docArr.count())
    // phase timings of the jaccard pipeline (mirrors ngramJaccardPairs)
    val prefix = t("prefix-rows")(
      graft.dedup.DedupProbe.prefixRowsPublic(docArr, dedup.Dedup.JaccardTau).localCheckpoint())
    t("prefix-count")(println(prefix.count()))
    val cand = prefix.select(col("doc_id").as("doc_a"), col("s"), col("n_sh").as("na"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("s"), col("n_sh").as("nb")), Seq("s"))
      .where(col("doc_a") < col("doc_b") &&
        lit(dedup.Dedup.JaccardTau) * greatest(col("na"), col("nb")) <=
          least(col("na"), col("nb")) + lit(1e-9))
      .select("doc_a", "doc_b")
    t("cand-raw")(println(cand.count()))
    val candD = cand.distinct().localCheckpoint()
    t("cand-distinct")(println(candD.count()))
    val vdf = graft.dedup.DedupProbe.verifyJaccardPublic(candD, docArr, dedup.Dedup.JaccardTau)
    t("verify")(println(vdf.count()))
    vdf.explain("formatted")
    t("ngram-full-warm")(println(dedup.Dedup.ngramJaccardPairs(docs).count()))
    t("ngram-full-warm2")(println(dedup.Dedup.ngramJaccardPairs(docs).count()))
    spark.stop()
  }
}
