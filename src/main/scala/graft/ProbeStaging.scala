package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 probe (verdict r19 #5): sweep the sorted-staging target part
  * size (2/8/32 MB) over the slowest stateful streaming ops at a
  * scaled rung. Each (size, op) cell runs the op REPEATS times under
  * the Bench fingerprint action and prints one line; the sweep's
  * winner is recorded in PROBES_r20.json and, if not the default,
  * adopted. Not part of the driver contract.
  */
object ProbeStaging {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "2").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ops = if (args.nonEmpty) args.toSeq
      else Seq("stream_sessionize", "stream_ewma", "stream_topk")
    for (mb <- Seq(2, 8, 32)) {
      spark.conf.set("spark.graft.stagingPartMB", mb.toString)
      for (op <- ops; r <- 1 to repeats) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(op)(spark, dir)
            .agg(expr("bit_xor(xxhash64(struct(*)))")).collect()
          println(f"STAGEPROBE mb=$mb op=$op run=$r wall=${(System.nanoTime() - t0) / 1e9}%.2f")
        } catch {
          case t: Throwable =>
            println(s"STAGEPROBE mb=$mb op=$op run=$r FAILED: $t")
        }
      }
    }
    spark.stop()
  }
}
