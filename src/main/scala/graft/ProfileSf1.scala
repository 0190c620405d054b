package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver for sf1 stragglers (not part of the driver
  * contract): runs named gate queries with full stack traces and
  * timings, unlike Bench which swallows them.
  */
object ProfileSf1 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      } catch {
        case t: Throwable =>
          println(s"PROFILE $name FAILED: $t")
          t.printStackTrace()
      }
    }
    spark.stop()
  }
}
