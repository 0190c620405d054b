package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: dumps `explain("formatted")` for headline
  * queries so pushdown/broadcast/codegen claims are checkable.
  * `runMain graft.Explain [sfDir] [name...]` — no names = a default
  * representative set.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q3_join_topk", "q5_multijoin", "q_events_sessionize",
        "dedup_ngram_jaccard", "text_langid", "ann_lsh", "dedup_embedding")
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[4]"), shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n===== $n =====")
      qs(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
