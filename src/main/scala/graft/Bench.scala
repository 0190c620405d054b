package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Data-free JVM warmup: exercises scheduler, codegen, and shuffle
    // machinery once so the first measured query isn't charged for
    // one-time session initialization. No testdata is touched — cold
    // parquet scan cost stays inside the measured queries.
    val warm = spark.range(1000000).selectExpr("id % 100 AS k", "id AS v")
    warm.groupBy("k").agg(sum("v")).join(warm.limit(50), "k").collect()
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // SPARK_GRAFT_ONLY (comma-separated prefixes): fast local iteration;
    // the driver leaves it unset (same contract as Verify).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Fingerprint action, not count(): hashing every column forces the
      // full projection to be computed (count() lets Catalyst prune
      // window/derived columns away, under-measuring real work).
      // bit_xor, not sum: summing uniform 64-bit hashes overflows Long,
      // which under ANSI mode (Spark 4 default) aborts the job.
      try {
        val df = fn(spark, sfDir)
        df.agg(expr("bit_xor(xxhash64(struct(*)))")).collect()
      } catch {
        case t: Throwable =>
          failed += name
          System.err.println(s"BENCH FAILURE in $name: ${t.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Timings rounded to 2 dp with trailing zeros stripped: ±10 ms
    // precision is below run-to-run noise, and the compact line
    // (~20 bytes/query) keeps the whole JSON inside the harness's
    // bounded 2000-char stdout-tail capture — full nanosecond doubles
    // pushed the line past it, truncating the leading fields
    // ("metric"/"value") out of the capture window. "failed" is only
    // emitted when non-empty for the same reason.
    def f2(v: Double): String = {
      val s = "%.2f".format(v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val fs =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val full = s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs$fs,"sf":"$sfDir"}"""
    println(full)
    // The harness captures only a bounded stdout tail (~2000 chars); at
    // 101+ queries the full line overflows it and the LEADING keys
    // ("metric"/"value") fall outside the capture window (BENCH_r06/r07
    // had parsed:null for exactly this reason). Two defenses:
    //  1. Persist the full JSON to a file next to the build so per-query
    //     timings are always recoverable regardless of stdout capture.
    //  2. Print a tiny self-contained headline line LAST — the tail keeps
    //     the END of stdout, so this line always survives and parses even
    //     when the big line is truncated mid-JSON.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // bench must not fail on an unwritable cwd
    println(s"""{"metric":"total","value":${f2(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"sf":"$sfDir","queries_file":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
