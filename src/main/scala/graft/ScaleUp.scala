package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for local stress runs: replicates a source
  * scale-factor directory `factor`× with collision-free key offsets so
  * every foreign-key join still resolves (copy c shifts all BIGINT
  * entity keys by c·[[ScaleUp.Stride]]; `nation`/`region` stay single —
  * they are bounded dimensions at every real scale, and the INTEGER
  * nation FKs keep pointing at them).
  *
  * Purpose: TESTDATA.md ships sf0.001/0.01/0.1 only, but the engine
  * targets 100 TB; replicating sf0.1 ×10 yields an sf1-equivalent
  * (6M-row lineitem) corpus that exercises real shuffle volume, AQE
  * skew handling, and the adaptive distributed paths (LSH kNN join,
  * HyperBall) at data sizes the gate SFs cannot. Replicated documents
  * are exact duplicates by design — a 90% duplicate corpus is the
  * realistic stress shape for the dedup family.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <outDir> [factor]`.
  * Output is bench-compatible: point SPARK_GRAFT_SF_DIR at outDir.
  */
object ScaleUp {

  /** Key offset per copy — far above any per-table key range. */
  val Stride = 1000000000L

  /** BIGINT key columns to shift per table (FK pairs share the shift). */
  val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Seq.empty,
    "region" -> Seq.empty)

  def replicate(df: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    if (keys.isEmpty) return df
    // collision guard: the per-copy shift is only collision-free while
    // every source key sits in [0, Stride) — chaining ScaleUp on its
    // own output (keys already shifted up to (factor-1)·Stride) or a
    // source with negative keys (-5 + Stride aliases Stride-5 + 0)
    // would silently alias keys across copies, breaking PK uniqueness
    // and FK resolution. min and max come from ONE aggregate — a
    // single source scan.
    val aggCols = keys.flatMap(k =>
      Seq(min(col(k)).cast("long"), max(col(k)).cast("long")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).first()
    val minKey = keys.indices
      .map(i => if (bounds.isNullAt(2 * i)) 0L else bounds.getLong(2 * i)).min
    val maxKey = keys.indices
      .map(i => if (bounds.isNullAt(2 * i + 1)) 0L else bounds.getLong(2 * i + 1)).max
    require(minKey >= 0L && maxKey < Stride,
      s"ScaleUp: key range [$minKey, $maxKey] outside [0, $Stride) — copies " +
        s"would collide (keys: ${keys.mkString(",")}); rescale from an unshifted source")
    val copies = df.sparkSession.range(factor).select(col("id").as("_copy"))
    val crossed = df.crossJoin(broadcast(copies))
    keys.foldLeft(crossed) { (d, k) =>
      d.withColumn(k, col(k) + col("_copy") * Stride)
    }.drop("_copy")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local(
      cores = Runtime.getRuntime.availableProcessors(), appName = "graft-scaleup")
    for (t <- Tables.names) {
      val df = Tables.load(spark, src, t)
      val scaled = replicate(df, keyCols(t), factor)
      // one parquet dir per table, same layout the loaders expect;
      // keep files split so downstream scans start parallel
      val parts = math.max(1, math.min(32, (factor * 4)))
      scaled.repartition(parts).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$t.parquet")
      System.err.println(s"scaled $t x$factor -> $out/$t.parquet")
    }
    spark.stop()
  }
}
