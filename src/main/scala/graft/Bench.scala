package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Benchmark entrypoint. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_REPEATS times (default 5), and
  * reports the per-query MEDIAN (plus min) so contended runs cannot
  * breach the regression gate: round-8's 250 s total included
  * 4-12x swings on queries whose code had not changed in rounds —
  * pure container noise at SFs where per-query cost is dominated by
  * fixed scheduler/codegen overhead (BASELINE.md). Repeats default 5
  * as of r13 (the committed-statistic decision, BASELINE.md): every
  * session's run 1 lands in a 1.5-2x contended band, so a median of 3
  * still carries half a contended run; median-of-5 pins the headline
  * inside the steady-state band, and the headline also carries
  * `value_min` (sum of per-query minima — the contention-free floor)
  * so drift questions read one artifact instead of re-running.
  *
  * Output contract:
  *  - stdout: ONE small self-contained headline JSON line (the
  *    harness captures only a bounded stdout tail; the full per-query
  *    map overflows it and truncates the leading keys — BENCH_r06/r07
  *    had parsed:null for exactly that).
  *  - BENCH_FULL.json: the full detail ("metric":"total_detail" so a
  *    scanner that reads every JSON line never double-counts it as a
  *    second "total"), with queries (=median), queries_min,
  *    queries_cold_catalog (per-op first-touch times for the
  *    catalog-backed graph/dedup families, catalog evicted before
  *    each op), and the per-run totals.
  */
object Bench {
  private def f2(v: Double): String = {
    val s = "%.2f".format(v)
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n == 0) 0.0 else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "5").toInt.max(1)
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
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // SPARK_GRAFT_ONLY (comma-separated prefixes): fast local iteration;
    // the driver leaves it unset (same contract as Verify).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }

    def runOps(ops: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
        beforeEach: () => Unit = () => (),
        sink: scala.collection.mutable.Set[String] = failed): Seq[(String, Double)] = ops.map { case (name, fn) =>
      beforeEach()
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
          sink += name
          System.err.println(s"BENCH FAILURE in $name: ${t.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    def runSuite(): Seq[(String, Double)] = runOps(queries)

    // Scaled-rung protocol (r19, verdict #3): SPARK_GRAFT_DROP_FIRST=1
    // runs one EXTRA suite first and excludes it from every statistic
    // (it still appears in run_totals, first, for the record). At the
    // x30/x100 rungs the first run is reliably cache-cold and
    // contention-prone (r17 sf1/sf3 and r18 sf10 both committed
    // medians-of-3 where one contended first run moved the headline);
    // dropping it keeps median-of-N inside the steady-state band
    // without paying 5 full repeats at 600 s per run.
    val dropFirst = sys.env.get("SPARK_GRAFT_DROP_FIRST").exists(_ == "1")
    val totalRuns = repeats + (if (dropFirst) 1 else 0)
    val allRuns: Seq[Seq[(String, Double)]] = (1 to totalRuns).map { i =>
      val r = runSuite()
      val tag = if (dropFirst && i == 1) " (warmup, dropped)" else ""
      System.err.println(s"BENCH run $i/$totalRuns: total ${f2(r.map(_._2).sum)} s$tag")
      r
    }
    val runs = if (dropFirst) allRuns.tail else allRuns
    val byName: Map[String, Seq[Double]] =
      runs.flatten.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val med = queries.map { case (name, _) => name -> median(byName(name)) }
    val mins = queries.map { case (name, _) => name -> byName(name).min }
    val total = med.map(_._2).sum

    // Cold-catalog pass: the session catalogs (derived graphs, dedup
    // collapse) make steady-state queries sub-second — which also
    // means the medians above partly measure warm-catalog behavior.
    // One extra pass over the catalog-backed families with the
    // catalog evicted before EVERY op records each op's first-touch
    // cost explicitly, so derivation can't hide behind a warm
    // catalog. One pass, not repeats: these numbers gate plan shape
    // (is the derivation itself scale-sane), not the regression total.
    // Cold failures are tracked separately from the median runs' —
    // folding them into `failed` would inflate the headline n_failed
    // (the regression gate) for a suite whose gated runs were all
    // green. System.gc() after each evict nudges the ContextCleaner:
    // the evicted frames' localCheckpoint blocks are only reclaimed
    // after their RDDs are GC'd, and ~30 superseded corpus-sized
    // checkpoint sets accumulating mid-pass would distort exactly the
    // first-touch timings this pass exists to measure.
    // Two cold variants since the catalog gained its disk layer (r14):
    //  - cold_catalog: memory catalog evicted, DISK CACHE INTACT — a
    //    new session's actual first touch (parquet read-back). This is
    //    the number a second session pays.
    //  - cold_derive: memory evicted, DISK LAYER DISABLED — the true
    //    derivation cost (the r13-and-earlier cold semantics), kept
    //    because it is the number that gates whether the derivation
    //    itself is scale-sane (read-back speed can't hide a quadratic
    //    build). Disabled, not evicted: with the layer merely evicted
    //    every op re-derived AND re-spilled its entries to parquet, so
    //    the timing carried cache-write I/O that is not derivation.
    // ann_ added r15: the knn-graph index and the IVF/k-means centroid
    // entries are catalog-backed, so their build cost belongs in the
    // first-touch passes like the derived graphs' (ops in the family
    // with no catalog entry just measure their normal cost twice).
    val catalogOps = queries.filter { case (n, _) =>
      n.startsWith("graph_") || n.startsWith("dedup_") ||
        n.startsWith("text_bpe") || n.startsWith("ann_") }
    val coldFailed = scala.collection.mutable.LinkedHashSet.empty[String]
    val cold = runOps(catalogOps,
      beforeEach = () => { Materialized.evict(spark); System.gc() },
      sink = coldFailed)
    val coldTotal = cold.map(_._2).sum
    System.err.println(s"BENCH cold-catalog (disk-warm) pass: total ${f2(coldTotal)} s" +
      (if (coldFailed.isEmpty) "" else s", FAILED: ${coldFailed.mkString(",")}"))
    val deriveFailed = scala.collection.mutable.LinkedHashSet.empty[String]
    Materialized.setDiskLayer(false)
    // per-ARTIFACT derive budget (verdict r18 #7): the catalog logs
    // each entry's build seconds during this pass, so a training-cost
    // regression is attributable to its key (e.g. "ann:opq-model") in
    // the committed artifact, not hidden inside cold_derive_total
    Materialized.resetDeriveLog()
    val coldDerive =
      try runOps(catalogOps,
        beforeEach = () => { Materialized.evict(spark); System.gc() },
        sink = deriveFailed)
      finally Materialized.setDiskLayer(true)
    val deriveByKey = Materialized.deriveSeconds.toSeq.sortBy { case (_, s) => -s }
    val coldDeriveTotal = coldDerive.map(_._2).sum
    System.err.println(s"BENCH cold-derive pass: total ${f2(coldDeriveTotal)} s" +
      (if (deriveFailed.isEmpty) "" else s", FAILED: ${deriveFailed.mkString(",")}"))

    def qmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    val runTotals = allRuns.map(r => f2(r.map(_._2).sum)).mkString("[", ",", "]")
    val fs =
      (if (failed.isEmpty) ""
       else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")) +
      (if (coldFailed.isEmpty) ""
       else coldFailed.map("\"" + _ + "\"").mkString(""","failed_cold":[""", ",", "]")) +
      (if (deriveFailed.isEmpty) ""
       else deriveFailed.map("\"" + _ + "\"").mkString(""","failed_cold_derive":[""", ",", "]"))
    val full =
      s"""{"metric":"total_detail","value":${f2(total)},"unit":"sec","agg":"median","repeats":$repeats,"warmup_dropped":$dropFirst,"runs_recorded":$totalRuns,"run_totals":$runTotals,"queries":${qmap(med)},"queries_min":${qmap(mins)},"queries_cold_catalog":${qmap(cold)},"queries_cold_derive":${qmap(coldDerive)},"derive_by_key":${qmap(deriveByKey)}$fs,"sf":"$sfDir"}"""
    // Full detail goes ONLY to the file: printing it to stdout risks a
    // truncated half-JSON line in the bounded tail capture.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch {
      case NonFatal(e) => // bench must not fail on an unwritable cwd
        System.err.println(s"BENCH: could not write BENCH_FULL.json: $e")
    }
    val totalMin = mins.map(_._2).sum
    println(s"""{"metric":"total","value":${f2(total)},"value_min":${f2(totalMin)},"unit":"sec","agg":"median","repeats":$repeats,"n_queries":${queries.size},"n_failed":${failed.size},"cold_catalog_total":${f2(coldTotal)},"cold_derive_total":${f2(coldDeriveTotal)},"n_cold":${catalogOps.size},"n_failed_cold":${coldFailed.size},"sf":"$sfDir","queries_file":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
