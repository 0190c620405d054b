package graft

import org.apache.spark.sql.SparkSession

/** Scratch phase profiler for dedup_edit_distance (not part of the
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
    t("banded-cold")(println(dedup.Dedup.editDistancePairs(docs).count()))
    t("banded-warm")(println(dedup.Dedup.editDistancePairs(docs).count()))
    t("prefix-broadcast")(println(
      dedup.Dedup.editDistancePairs(docs, maxBandedPairsPerDoc = 0).count()))
    t("prefix-window")(println(dedup.Dedup.editDistancePairs(docs,
      maxBandedPairsPerDoc = 0, maxBroadcastVocab = 0).count()))
    spark.stop()
  }
}
