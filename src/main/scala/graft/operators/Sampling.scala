package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Dataset splitting and sampling — the operators a training-data
  * pipeline runs after cleaning: carve train/val/test splits and draw
  * stratified samples, deterministically and reproducibly.
  *
  * Determinism contract (same on both engines, any cluster size, any
  * partitioning): the randomness source is `md5(salt || doc_id)` — a
  * pure function of the row key, so membership of a given doc in a
  * split/sample never depends on execution order, partition count, or
  * engine. Spark and DuckDB produce identical lowercase-hex md5
  * strings, so hex-string comparison needs no hex→int conversion.
  *
  * Scale shape: the split is a stateless per-row classification — one
  * narrow scan, no shuffle before the summary agg; at 100 TB it is the
  * same single pass. The equal-allocation stratified sample is a
  * per-stratum top-k (window on the hash order) — one shuffle on the
  * stratum key; for rate-based Bernoulli sampling at extreme scale the
  * same hash compares against a precomputed per-stratum hex threshold
  * instead (no window at all).
  */
object Sampling {

  /** Hex thresholds over the first two md5 nibbles: 0x00-0xcb train
    * (204/256 ≈ 79.7%), 0xcc-0xe5 val (26/256 ≈ 10.2%), rest test.
    */
  val TrainUpper = "cc"
  val ValUpper = "e6"

  /** Per-doc split assignment (the reusable primitive). */
  def withSplit(docs: DataFrame): DataFrame = {
    val h = md5(concat(lit("split:"), col("doc_id").cast(StringType)).cast(BinaryType))
    docs.withColumn("split",
      when(substring(h, 1, 2) < TrainUpper, "train")
        .when(substring(h, 1, 2) < ValUpper, "val")
        .otherwise("test"))
  }

  /** Train/val/test split summary: per (split, lang) doc counts and
    * char totals — the reproducible manifest a training run records.
    */
  def qTrainSplit(spark: SparkSession, dir: String): DataFrame =
    withSplit(Tables.documents(spark, dir))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy("split", "lang")

  val qTrainSplitSql: String = s"""
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
        CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '$TrainUpper' THEN 'train'
             WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '$ValUpper' THEN 'val'
             ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      MIN(doc_id) AS min_doc_id
    FROM assigned GROUP BY split, lang ORDER BY split, lang"""

  /** Equal-allocation stratified sample: rank each language's docs by
    * the salted hash (doc_id tie-break) and keep the top k, where k is
    * the smallest stratum's size — a balanced per-language corpus from
    * an imbalanced one. The hash order is a deterministic shuffle, so
    * "first k by hash" is a uniform random sample of the stratum.
    */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val k = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head().getLong(0)
    val h = md5(concat(lit("sample:"), col("doc_id").cast(StringType)).cast(BinaryType))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs.withColumn("h", h)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("lang"), col("rn"), col("n_chars"))
      .orderBy("doc_id")
  }

  val qSampleStratifiedSql: String = """
    WITH k AS (SELECT MIN(n) AS k FROM
                 (SELECT COUNT(*) AS n FROM documents GROUP BY lang)),
    ranked AS (
      SELECT doc_id, lang, n_chars,
        ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn, n_chars
    FROM ranked WHERE rn <= (SELECT k FROM k) ORDER BY doc_id"""

  /** Sample size for the weighted sample below. */
  val WeightedK = 100

  /** Weighted sample without replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): each doc
    * draws u ∈ (0, 1] from its salted md5 and is ranked by
    * key = ln(u)/w with weight w = n_chars + 1, so the top-k by key
    * is a without-replacement sample where longer documents are
    * proportionally likelier — the "sample by quality score" primitive
    * of a training-data pipeline (swap w for any positive score).
    *
    * Cross-engine determinism: u's numerator is the first 13 hex
    * digits (52 bits) of the md5, an integer both engines represent
    * EXACTLY in a double, +1 so u is never 0 (Spark's ln(0) is null
    * while DuckDB's errors); from identical u and integer w, ln and
    * the division agree to the last ulp, and key gaps at gate scale
    * are ~1e-4 — libm drift (~1e-16) cannot reorder the selection
    * boundary. (Float keys are new here: the split/stratified ops
    * above stay on pure hex-string order, but E-S needs the log.)
    *
    * Scale shape: orderBy + limit plans as TakeOrderedAndProject —
    * per-partition bounded heaps and one k-sized merge, no global
    * sort, same 100 TB story as the text_vocab top-k.
    */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("wsample:"), col("doc_id").cast(StringType)).cast(BinaryType))
    val v = conv(substring(h, 1, 13), 16, 10).cast(DoubleType)
    val u = (v + lit(1.0)) / lit(4503599627370496.0) // 2^52
    val key = log(u) / (coalesce(col("n_chars"), lit(0L)).cast(DoubleType) + lit(1.0))
    Tables.documents(spark, dir)
      .withColumn("k", key)
      .orderBy(col("k").desc, col("doc_id"))
      .limit(WeightedK)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val qSampleWeightedSql: String = s"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
        ln((('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1.0)
           / 4503599627370496.0)
          / (COALESCE(n_chars, 0) + 1.0) AS k
      FROM documents)
    SELECT doc_id, lang, n_chars FROM
      (SELECT doc_id, lang, n_chars FROM keyed ORDER BY k DESC, doc_id LIMIT $WeightedK)
    ORDER BY doc_id"""

  /** Per-source document quota for the balanced sample. */
  val SourceCap = 20L

  /** Quota (cap) sampling per source — the domain-rebalancing move of
    * a web-corpus pipeline: no source may contribute more than
    * [[SourceCap]] documents, under-cap sources are kept whole, and
    * which documents survive an over-cap source is decided by the
    * salted-hash order (a deterministic uniform draw). Differs from
    * the stratified sample above: that one equalizes strata to the
    * MINIMUM size; this one only trims the heavy tail, the common
    * production setting.
    *
    * Scale shape: one shuffle on the stratum key for the per-source
    * rank window; the rank is abandoned after the ≤cap filter, so at
    * 100 TB the same plan holds with the window's sort bounded per
    * source (or swaps to a per-stratum threshold precomputed from a
    * count, dropping the window entirely — see the class note).
    */
  def qSampleBalanced(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("balance:"), col("doc_id").cast(StringType)).cast(BinaryType))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h", h)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= SourceCap)
      .select(col("doc_id"), col("source"), col("lang"), col("rn"), col("n_chars"))
      .orderBy("doc_id")
  }

  val qSampleBalancedSql: String = s"""
    WITH ranked AS (
      SELECT doc_id, source, lang, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY md5('balance:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, lang, CAST(rn AS BIGINT) AS rn, n_chars
    FROM ranked WHERE rn <= $SourceCap ORDER BY doc_id"""

  /** Shard count for the global-shuffle op. */
  val Shards = 16

  /** Deterministic global shuffle + sharding — the LAST operator of
    * every training-data pipeline: assign each document a shard (hash
    * bucket) and a position within it (rank in salted-hash order), so
    * the corpus can be written as [[Shards]] files whose concatenation
    * is a uniform permutation of the data, reproducible from the keys
    * alone on any cluster and any partitioning.
    *
    * Scale shape: this IS Spark's sharded-write geometry —
    * `repartition(shard)` + `sortWithinPartitions(h)`; the rank
    * window partitions by shard, so there is no global sort anywhere,
    * and each reducer streams exactly one output shard. At 100 TB the
    * shard count scales with the cluster, nothing else changes.
    */
  def qShuffleShard(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("shuf:"), col("doc_id").cast(StringType)).cast(BinaryType))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h", h)
      .withColumn("shard",
        (conv(substring(col("h"), 1, 4), 16, 10).cast(LongType) % Shards).cast(IntegerType))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_chars"))
      .orderBy("shard", "pos")
  }

  val qShuffleShardSql: String = s"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
        md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    sharded AS (
      SELECT doc_id, n_chars, h,
        CAST(('0x' || substr(h, 1, 4))::BIGINT % $Shards AS INTEGER) AS shard
      FROM keyed)
    SELECT doc_id, shard,
      CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos,
      n_chars
    FROM sharded ORDER BY shard, pos"""

  /** Target total for the temperature-mixed sample. */
  val TempK = 200L

  /** Temperature-scaled source mixing (the multilingual-corpus
    * rebalancing move, e.g. XLM-R's exponentiated sampling): each
    * source's quota is proportional to n_s^(1/T) at T = 2 (√n), so
    * heavy sources are down-weighted sub-linearly — between balanced
    * (equal quotas) and proportional (raw sizes) — and every source
    * keeps ≥ 1 document. Which documents fill a quota is the salted
    * md5 hash order (deterministic uniform draw, like the other
    * sampling ops).
    *
    * Cross-engine determinism of the quota arithmetic: √n is IEEE
    * correctly-rounded (identical in both engines, unlike a generic
    * pow), each weight rounds to 9 dp and sums as an EXACT decimal —
    * commutative, so Σw is aggregation-order-free — and the final
    * `floor(K·w/Σw)` runs on identical doubles.
    *
    * Scale shape: one count aggregation, a broadcast quota dim, one
    * shuffle on source for the rank window (or a precomputed hex
    * threshold per source at extreme scale, dropping the window —
    * same note as the balanced sample).
    */
  def qSampleTemperature(spark: SparkSession, dir: String): DataFrame =
    qSampleTemperatureAt(spark, dir, sqrtDepth = 1, k = TempK)

  /** Parameterized twin (the fuzz family draws the temperature and the
    * quota scale). Temperature is expressed as a SQRT CHAIN —
    * n^(1/2^depth), depth 0/1/2 = T 1.0/0.5/0.25 — because IEEE sqrt
    * is correctly rounded on both engines while pow() is not: the
    * weight doubles are identical bits at any depth without trusting
    * libm.
    */
  private[graft] def qSampleTemperatureAt(spark: SparkSession, dir: String,
      sqrtDepth: Int, k: Long): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wRaw = (1 to sqrtDepth).foldLeft(col("n").cast(DoubleType))((c, _) => sqrt(c))
    val wts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("wt", round(wRaw, 9).cast("decimal(28,9)"))
    val tot = wts.agg(sum(col("wt")).as("sw"))
    val quotas = wts.crossJoin(broadcast(tot))
      .withColumn("quota", greatest(lit(1L),
        floor(lit(k.toDouble) * col("wt").cast(DoubleType)
          / col("sw").cast(DoubleType))))
      .select(col("source"), col("quota"))
    val h = md5(concat(lit("temp:"), col("doc_id").cast(StringType)).cast(BinaryType))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    docs.withColumn("h", h)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .join(broadcast(quotas), "source")
      .where(col("rn") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rn"), col("n_chars"))
      .orderBy("doc_id")
  }

  def qSampleTemperatureSqlAt(sqrtDepth: Int, k: Long): String = {
    val wExpr = (1 to sqrtDepth).foldLeft("CAST(n AS DOUBLE)")((e, _) => s"sqrt($e)")
    s"""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    wts AS (SELECT source, n,
              CAST(ROUND($wExpr, 9) AS DECIMAL(28,9)) AS wt
            FROM counts),
    tot AS (SELECT SUM(wt) AS sw FROM wts),
    quotas AS (SELECT source,
                 GREATEST(1, CAST(FLOOR(CAST($k AS DOUBLE) * CAST(wt AS DOUBLE)
                   / CAST(sw AS DOUBLE)) AS BIGINT)) AS quota
               FROM wts, tot),
    ranked AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY md5('temp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS rn, r.n_chars
    FROM ranked r JOIN quotas q ON q.source = r.source
    WHERE r.rn <= q.quota ORDER BY doc_id"""
  }

  val qSampleTemperatureSql: String = qSampleTemperatureSqlAt(1, TempK)

  def ops: Seq[Op] = Seq(
    Op("q_sample_temperature", qSampleTemperature, Some(qSampleTemperatureSql)),
    Op("q_train_split", qTrainSplit, Some(qTrainSplitSql)),
    Op("q_sample_stratified", qSampleStratified, Some(qSampleStratifiedSql)),
    Op("q_sample_weighted", qSampleWeighted, Some(qSampleWeightedSql)),
    Op("q_sample_balanced", qSampleBalanced, Some(qSampleBalancedSql)),
    Op("q_shuffle_shard", qShuffleShard, Some(qShuffleShardSql)),
  )
}
