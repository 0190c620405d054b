package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: batched-vs-sequential BPE training wall time at a
  * given vocabulary size (the PLANS.md rounds-vs-wall-time probe).
  * Usage: Test/runMain graft.tools.ProfileBpe <sfDir> <rounds> <batch>
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val Array(dir, roundsS, batchS) = args
    val (rounds, batch) = (roundsS.toInt, batchS.toInt)
    val spark = graft.GraftSession.tuned(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val b = time(s"batched rounds=$rounds batch=$batch")(
      graft.text.TextAnalysis.bpeTrainBatched(docs, rounds, batch))
    println("batched merges learned: " + b.merges.count())
    val s = time(s"sequential rounds=$rounds")(
      graft.text.TextAnalysis.bpeTrain(docs, rounds))
    println("sequential merges learned: " + s.merges.count())
    spark.stop()
  }
}
