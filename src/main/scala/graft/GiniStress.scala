package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heavy-nation stress generator for q_gini's bucketed-rank path: the
  * shipped scale factors top out far below [[operators.Relational
  * .GiniExactWindowRows]] (2M rows/nation), so the bucketed plan is
  * spec-proven but never executes under real data pressure. This
  * plants a corpus whose nation 0 holds `heavyN` customers (default
  * 2.2M — past the threshold, so the gate entry routes to the
  * bucketed rank on its own) while nations 1..24 stay small, keeping
  * the per-nation histogram spread realistic. Every other table is a
  * byte copy of the source corpus, so the full Verify + DuckDB oracle
  * harness runs against the output dir unchanged:
  *
  *   runMain graft.GiniStress [srcDir] [outDir] [heavyN]
  *   SPARK_GRAFT_ONLY=q_gini runMain graft.Verify <outDir> <verifyOut>
  *   python3 tools/check.py <outDir> <verifyOut>
  *
  * Deterministic (xxhash64-derived spends, no rand()): regenerating
  * reproduces the same corpus bit-for-bit.
  */
object GiniStress {

  /** Write `df` as ONE plain parquet file at `dest` (the testdata
    * layout: a file, not a Spark part directory) so tools/check.py's
    * DuckDB views read it like the shipped tables.
    */
  private def writeSingleFile(df: DataFrame, dest: java.nio.file.Path): Unit = {
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmpdir")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = java.nio.file.Files.list(tmp)
      try {
        val it = s.iterator()
        var found: java.nio.file.Path = null
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet")) found = p
        }
        require(found != null, s"no part file under $tmp")
        found
      } finally s.close()
    }
    java.nio.file.Files.move(part, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val s = java.nio.file.Files.walk(tmp)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "target/gini_stress"
    val heavyN = if (args.length > 2) args(2).toLong else 2200000L
    val smallN = 10000L
    val spark = GraftSession.local(
      cores = Runtime.getRuntime.availableProcessors(), appName = "graft-gini-stress")
    val outP = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outP)
    for (t <- Tables.names if t != "customer" && t != "orders") {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"), outP.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      System.err.println(s"copied $t")
    }
    val heavy = spark.range(1L, heavyN + 1)
      .select(col("id").as("c_custkey"), lit(0).cast("int").as("c_nationkey"))
    val rest = spark.range(heavyN + 1, heavyN + 1 + 24 * smallN)
      .select(col("id").as("c_custkey"),
        (((col("id") - heavyN - 1) % 24) + 1).cast("int").as("c_nationkey"))
    val customer = heavy.unionAll(rest)
    writeSingleFile(customer, outP.resolve("customer.parquet"))
    System.err.println(s"customer: ${heavyN + 24 * smallN} rows (nation 0: $heavyN)")
    // two orders per customer; spend = hash-derived cents/100 doubles —
    // ties occur (hash mod 1e6 over 2.2M customers), exercising the
    // within-bucket tie ranking at pressure
    val orders = customer.select(col("c_custkey").as("ck"))
      .crossJoin(broadcast(spark.range(2).select(col("id").as("j"))))
      .select(
        (col("ck") * 2 + col("j")).as("o_orderkey"),
        col("ck").as("o_custkey"),
        ((pmod(xxhash64(col("ck") * 2 + col("j")), lit(999990L)) + lit(100L))
          .cast("double") / lit(100.0)).as("o_totalprice"))
    writeSingleFile(orders, outP.resolve("orders.parquet"))
    System.err.println(s"orders: ${(heavyN + 24 * smallN) * 2} rows -> $out")
    spark.stop()
  }
}
