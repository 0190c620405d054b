package graft.similarity

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import java.math.RoundingMode

/** Approximate-nearest-neighbor search over the `embeddings` table:
  * exact brute force (the baseline), IVF cell probing, and
  * random-hyperplane LSH — cosine similarity throughout.
  *
  * Scale design: query vectors are broadcast (a query set is small by
  * definition); scoring runs as a tight JIT'd loop in `mapPartitions`
  * with a bounded per-(partition, query) top-k heap, so the shuffle
  * after scoring carries only `partitions × queries × k` rows — never
  * the n × q scored matrix. IVF/LSH prune the scored set itself.
  *
  * Determinism: ranking uses the 6-dp-rounded cosine with vec_id as
  * tie-break. Dot products fold in index order on every path (Scala
  * loop, codegen'd `aggregate(zip_with(...))`, DuckDB list_sum), so
  * rounded scores are engine-identical.
  */
object Ann {

  /** Top-k size. */
  val K = 10

  /** The query set: vectors with vec_id < 16. */
  val NumQueries = 16L

  /** IVF: [[IvfCells]] coarse cells whose centroids are TRAINED by
    * the [[Cluster]] Lloyd trainer (init = first cells vectors, the
    * former "k-means-lite" seeding, then [[Cluster.Iters]] full
    * assign+update rounds — the FAISS coarse-quantizer shape);
    * `IvfNprobe` nearest cells are probed per query.
    */
  val IvfCells = 16
  val IvfNprobe = 4

  /** Closure (boundary) assignment margin — SPANN's (Chen et al.,
    * NeurIPS 2021, §3.2) answer to fixed-nprobe recall: a vector is
    * indexed in EVERY cell whose rounded routing cosine is within
    * this ε of its best cell, not just the argmax, so near-boundary
    * vectors are visible from both sides of the cut. Costs index
    * size (measured 1.7–2.4× replication on the gate corpora — the
    * price of high recall on weakly-clustered data; tighter corpora
    * replicate less because boundary mass shrinks) and buys back the
    * recall a trained quantizer loses at a hard cut: measured
    * recall@10 at nprobe=4 is 0.94/0.90/0.99 at sf0.001/0.01/0.1 vs
    * 0.89/0.86/0.98 with hard assignment.
    */
  val IvfClosureEps = 0.1

  /** LSH: `LshTables` hash tables × `LshBits` hyperplane bits. */
  val LshTables = 32
  val LshBits = 6

  private[graft] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue() + 0.0

  /** Deterministic Gaussian hyperplanes (java.util.Random is
    * algorithm-specified, so identical on every JVM/executor).
    */
  private[graft] def planes(dim: Int, n: Int, seed: Long): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(r.nextGaussian()))
  }

  private def dot(a: Array[Double], v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += a(i) * v(i); i += 1 }
    s
  }

  /** (vec_id, v double[], nrm): codegen'd projection + native L2 norm
    * ([[graft.functions.L2Norm]] — the float array implicit-casts to
    * double inside the generated loop's input).
    */
  def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").cast(LongType).as("vec_id"),
      expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("nrm", expr("graft_norm(v)"))

  /** 64-bit random-hyperplane signature per vector (used by
    * [[graft.dedup.Dedup.embeddingDupSummary]] block-join).
    */
  def signatures(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        var pl: Array[Array[Double]] = null
        it.map { case (id, v) =>
          if (pl == null) pl = planes(v.length, 64, seed = 7L)
          var sig = 0L
          var p = 0
          while (p < 64) {
            if (dot(pl(p), v) > 0) sig |= (1L << p)
            p += 1
          }
          (id, sig)
        }
      }.toDF("vec_id", "sig")
  }

  /** Collected query set: (qid, vector, norm) — broadcast to scorers. */
  private def collectQueries(emb: DataFrame): Array[(Long, Array[Float], Double)] =
    emb.where(col("vec_id") < NumQueries).select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(s))
      }.sortBy(_._1)

  /** Scored candidates → global top-k per query: rank by (rounded
    * score desc, vec_id). Input (qid, vec_id, score).
    */
  private def globalTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select("qid", "rank", "vec_id", "score")
      .orderBy("qid", "rank")
  }

  /** Exact brute-force top-k: per-partition bounded heaps (worst
    * element popped first), one small shuffle of partial winners.
    * `cellOf`/`probed` restrict scoring for IVF (None ⇒ score all).
    */
  private def heapTopK(
      emb: DataFrame,
      queries: Array[(Long, Array[Float], Double)],
      k: Int,
      probedCells: Option[(Array[Array[Double]], Map[Long, Set[Int]])] = None,
      mips: Boolean = false): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries)
    val bp = spark.sparkContext.broadcast(probedCells)
    // the scan-side heap pass is shuffle-free: spread a small corpus
    // (one parquet split) across the cluster or the
    // |queries|·|corpus| dot products run on one core; a no-op at
    // scale where the scan is already ≥ this wide
    val src = emb.select(col("vec_id").cast(LongType), col("embedding"))
    val parts = spark.sessionState.conf.numShufflePartitions
    val spread = if (src.rdd.getNumPartitions < parts) src.repartition(parts) else src
    val partials = spread
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        val probe = bp.value
        // worst-first ordering: lowest score, then highest vec_id
        val ord = Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }
        val heaps = qs.map(q => q._1 -> scala.collection.mutable.PriorityQueue.empty(ord)).toMap
        val qMask = probe.map { case (_, byQ) =>
          byQ.map { case (q, cs) => q -> cs.foldLeft(0L)((m, c) => m | (1L << c)) }
        }
        it.foreach { case (id, v) =>
          var nrm = 0.0
          var i = 0
          while (i < v.length) { nrm += v(i).toDouble * v(i); i += 1 }
          nrm = math.sqrt(nrm)
          val cellMask = probe.map { case (cents, _) => closureCellMask(cents, v, nrm) }
          qs.foreach { case (qid, qv, qn) =>
            val visible = cellMask match {
              case Some(m) => (m & qMask.get(qid)) != 0L
              case None    => true
            }
            if (visible && id != qid) {
              var s = 0.0; var i = 0
              while (i < v.length) { s += qv(i).toDouble * v(i); i += 1 }
              val score = if (mips) round6(s) else round6(s / (qn * nrm))
              val h = heaps(qid)
              h.enqueue((score, id))
              if (h.size > k) h.dequeue()
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) => h.iterator.map { case (s, id) => (qid, id, s) } }
      }.toDF("qid", "vec_id", "score")
    globalTopK(partials, k)
  }

  /** Closure assignment as a cell bitmask: every cell whose rounded
    * routing cosine is within [[IvfClosureEps]] of the vector's best
    * cell (includes the argmax itself; ≤ 64 cells by the mask width,
    * enforced at index build). Visibility to a query is then one AND
    * against the query's probed-cell mask — branch-free in the scan's
    * hot loop.
    */
  private def closureCellMask(cents: Array[Array[Double]], v: Array[Float], nrm: Double): Long =
    closureMaskAndPrim(cents, v, nrm)._1

  /** Closure mask plus the PRIMARY cell (the argmax itself; rounded
    * ties break to the lower cell id — the residual-encode anchor).
    */
  private def closureMaskAndPrim(cents: Array[Array[Double]], v: Array[Float],
      nrm: Double): (Long, Int) = {
    val scores = new Array[Double](cents.length)
    var best = Double.NegativeInfinity
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val s = round6(dot(cents(c), v) / nrm) // centroids pre-normalized
      scores(c) = s
      if (s > best) { best = s; bestC = c }
      c += 1
    }
    var mask = 0L
    c = 0
    while (c < cents.length) {
      if (scores(c) >= best - IvfClosureEps) mask |= (1L << c)
      c += 1
    }
    (mask, bestC)
  }

  def bruteForceTopK(emb: DataFrame, k: Int = K): DataFrame =
    heapTopK(emb, collectQueries(emb), k)

  def annTopkBruteforce(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(spark, dir))

  /** Maximum-inner-product top-k (unnormalized dot product): the
    * retrieval scoring used when vector magnitude carries signal
    * (e.g. popularity-weighted two-tower embeddings) — cosine's
    * normalization would erase it. Same per-partition bounded-heap
    * scan as brute-force cosine; at 100 TB the same IVF/LSH candidate
    * paths apply after the standard MIPS→cosine reduction (augment
    * each vector with sqrt(M²−‖v‖²)).
    */
  def mipsTopK(emb: DataFrame, k: Int = K): DataFrame =
    heapTopK(emb, collectQueries(emb), k, mips = true)

  def annMips(spark: SparkSession, dir: String): DataFrame =
    mipsTopK(Tables.embeddings(spark, dir))

  /** Metadata filter for hybrid search: the allowed label set. */
  val HybridLabels: Seq[Int] = Seq(1, 4, 7)

  /** Hybrid (filtered) vector search — the vector-DB staple: top-k by
    * cosine among only the vectors passing a metadata predicate
    * (label ∈ [[HybridLabels]]), queries unrestricted. This is
    * PRE-filtering: the predicate lands in the parquet scan
    * (PushedFilters — spec-pinned), the heap scan scores only
    * surviving rows, and top-k over the filtered set is exact — unlike
    * post-filtering an unfiltered ANN result, which silently returns
    * < k when the filter is selective. At 100 TB the same IVF/LSH
    * candidate paths compose (filter first, index the survivors or
    * carry the predicate into the bucket join).
    */
  def hybridTopK(emb: DataFrame, k: Int = K): DataFrame =
    heapTopK(emb.where(col("label").isin(HybridLabels: _*)),
      collectQueries(emb), k)

  def annHybrid(spark: SparkSession, dir: String): DataFrame =
    hybridTopK(Tables.embeddings(spark, dir))

  val annHybridSql: String = s"""
    WITH v AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    s AS (SELECT q.qid, n.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, len(qv)),
              i -> qv[i] * n.v[i])) / (qn * n.nrm), 6) + 0.0 AS score
          FROM q JOIN n ON n.vec_id != q.qid
          WHERE n.label IN (${HybridLabels.mkString(", ")})),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""

  val annMipsSql: String = s"""
    WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < $NumQueries),
    s AS (SELECT q.qid, v.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, len(qv)),
              i -> qv[i] * v.v[i])), 6) + 0.0 AS score
          FROM q JOIN v ON v.vec_id != q.qid),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""

  val annTopkBruteforceSql: String = s"""
    WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    s AS (SELECT q.qid, n.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, len(qv)),
              i -> qv[i] * n.v[i])) / (qn * n.nrm), 6) + 0.0 AS score
          FROM q JOIN n ON n.vec_id != q.qid),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""

  /** MMR rerank: final list size and cosine candidate pool per query. */
  val MmrK = 8
  val MmrCandidates = 32

  /** Maximal Marginal Relevance diversified rerank (Carbonell &
    * Goldstein, SIGIR 1998): greedily pick [[MmrK]] of the top
    * [[MmrCandidates]] cosine candidates, each pick maximizing
    * λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) at λ = 1/2 (first pick =
    * pure relevance; later picks trade relevance against similarity
    * to what's already selected) — the dedup-at-retrieval staple for
    * RAG context assembly. Determinism: rel and pairwise sims are the
    * 6-dp-rounded cosines, the MMR score re-rounds to 6 dp, ties break
    * to the lower vec_id.
    *
    * Scale shape: candidate generation is the bounded-heap brute-force
    * scan (on a 100 TB corpus, any of the IVF/LSH candidate paths);
    * the greedy stage only ever touches queries × [[MmrCandidates]]
    * rows — candidate ids broadcast into the vector fetch, and the
    * O(k²·dim) greedy loop runs per-query inside `flatMapGroups`, so
    * the rerank never sees the corpus.
    */
  def mmrRerank(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cands = bruteForceTopK(emb, MmrCandidates).select("qid", "vec_id", "score")
    val withVec = withNorm(emb)
      .join(broadcast(cands), "vec_id")
      .select(col("qid"), col("vec_id"), col("score"), col("v"), col("nrm"))
      .as[(Long, Long, Double, Array[Double], Double)]
    withVec.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Double], Double)]) =>
        val cs = it.toArray.sortBy(_._2)
        val n = cs.length
        def sim(i: Int, j: Int): Double = {
          val vi = cs(i)._4; val vj = cs(j)._4
          var s = 0.0; var k = 0
          while (k < vi.length) { s += vi(k) * vj(k); k += 1 }
          round6(s / (cs(i)._5 * cs(j)._5))
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double)]
        while (selected.length < math.min(MmrK, n)) {
          var bestIdx = -1; var bestM = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!selected.contains(i)) {
              // true max over the selected set (can be negative); the
              // empty-set penalty is 0 so pick 1 is pure relevance
              val ms =
                if (selected.isEmpty) 0.0
                else selected.iterator.map(sim(i, _)).max
              val m = round6(0.5 * cs(i)._3 - 0.5 * ms)
              if (m > bestM) { bestM = m; bestIdx = i } // ties keep the lower vec_id
            }
            i += 1
          }
          selected += bestIdx
          out += ((qid, selected.length.toLong, cs(bestIdx)._2, cs(bestIdx)._3, bestM))
        }
        out.iterator
      }
      .toDF("qid", "pos", "vec_id", "rel", "mmr")
      .orderBy("qid", "pos")
  }

  def annMmr(spark: SparkSession, dir: String): DataFrame =
    mmrRerank(Tables.embeddings(spark, dir))

  /** MMR oracle: candidate + pairwise-sim CTEs, then the greedy
    * selection unrolled one CTE pair per pick (sel_r = sel_{r-1} ∪
    * the argmax of the re-rounded MMR score among unselected
    * candidates).
    */
  // lazy: interpolates [[OracleDim]], declared further down the object —
  // a strict val here would bake in the pre-init 0 and empty the oracle
  lazy val annMmrSql: String = {
    // MATERIALIZED throughout: each round references the previous
    // selection three times (penalty join, already-selected filter,
    // union), so inlined CTEs would re-evaluate the whole chain
    // 3^(k-1) times
    def mmrRound(r: Int): String =
      s"""m$r AS MATERIALIZED (SELECT qid, vec_id, rel, mmr, $r AS pos FROM (
         |    SELECT qid, vec_id, rel, mmr,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rk
         |    FROM (
         |      SELECT c.qid, c.vec_id, c.rel,
         |        ROUND(0.5 * c.rel - 0.5 * MAX(p.sim), 6) + 0.0 AS mmr
         |      FROM cand c
         |      JOIN sel${r - 1} s ON s.qid = c.qid
         |      JOIN p ON p.qid = c.qid AND p.i = c.vec_id AND p.j = s.vec_id
         |      WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} x
         |                        WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
         |      GROUP BY c.qid, c.vec_id, c.rel))
         |  WHERE rk = 1),
         |sel$r AS MATERIALIZED (
         |          SELECT qid, vec_id, rel, mmr, pos FROM sel${r - 1} UNION ALL
         |          SELECT qid, vec_id, rel, mmr, pos FROM m$r)""".stripMargin
    s"""
    WITH $oracleVCte,
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    rel0 AS (SELECT q.qid, n.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> qv[i] * n.v[i])) / (qn * n.nrm), 6) + 0.0 AS rel
          FROM q JOIN n ON n.vec_id != q.qid),
    cand AS MATERIALIZED (SELECT qid, vec_id, rel FROM (
               SELECT qid, vec_id, rel,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rk
               FROM rel0) WHERE rk <= $MmrCandidates),
    p AS MATERIALIZED (SELECT a.qid, a.vec_id AS i, b.vec_id AS j,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              k -> na.v[k] * nb.v[k])) / (na.nrm * nb.nrm), 6) + 0.0 AS sim
          FROM cand a JOIN cand b ON b.qid = a.qid AND b.vec_id != a.vec_id
          JOIN n na ON na.vec_id = a.vec_id
          JOIN n nb ON nb.vec_id = b.vec_id),
    m1 AS MATERIALIZED (
        SELECT qid, vec_id, rel, ROUND(0.5 * rel, 6) + 0.0 AS mmr, 1 AS pos FROM (
        SELECT qid, vec_id, rel,
          ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY ROUND(0.5 * rel, 6) DESC, vec_id) AS rk
        FROM cand) WHERE rk = 1),
    sel1 AS MATERIALIZED (SELECT qid, vec_id, rel, mmr, pos FROM m1),
    ${(2 to MmrK).map(mmrRound).mkString(",\n    ")}
    SELECT qid, CAST(pos AS BIGINT) AS pos, vec_id, rel, mmr
    FROM sel$MmrK ORDER BY qid, pos"""
  }

  /** Trained coarse quantizer, as unit directions for cosine routing:
    * [[Cluster.lloydCentroids]] (init = lowest-vec_id vectors,
    * [[Cluster.Iters]] assign+update rounds, 6-dp-snapped means — the
    * cross-engine-deterministic trainer ann_kmeans gates) at
    * k = [[IvfCells]], each mean normalized to its unit direction.
    * Normalization folds |c|² in index order so the oracle's
    * `list_sum(list_transform(...))` reproduces the same doubles.
    */
  private[graft] def unitCentroids(cents: Seq[(Int, Array[Double])]): Array[Array[Double]] =
    cents.sortBy(_._1).map { case (_, cv) =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      val nrm = math.sqrt(s)
      cv.map(_ / nrm)
    }.toArray

  /** Training input for the coarse quantizer: every vector replaced
    * by its unit direction (nrm exactly 1.0), so Lloyd's L2 argmin IS
    * the cosine argmin — spherical k-means, the k-means variant whose
    * training metric matches the quantizer's cosine routing (L2 on a
    * raw-magnitude corpus optimizes a metric the router never uses
    * and measurably costs recall). Zero vectors keep their zero array
    * (no 0/0 — same guard discipline as the dedup family's NaN
    * cosine contract).
    */
  private def unitVecs(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      when(col("nrm") === lit(0.0), col("v"))
        .otherwise(transform(col("v"), x => x / col("nrm"))).as("v"),
      lit(1.0).as("nrm"))

  /** Inline trainer for generic-DataFrame callers; the gate ops serve
    * the same training from the [[graft.Materialized]] catalog
    * ([[ivfCoarse]]) so IVF and IVF-PQ share ONE run per (session,
    * dir, corpus-version).
    */
  private def trainedCoarse(emb: DataFrame): Array[Array[Double]] = {
    val vecs = unitVecs(withNorm(emb)).localCheckpoint()
    unitCentroids(Cluster.lloydCentroids(vecs, IvfCells, Cluster.Iters))
  }

  private def ivfCoarse(spark: SparkSession, dir: String): Array[Array[Double]] =
    graft.Materialized.ofBlob(spark, dir, "ann:ivf-cents") {
      unitCentroids(Cluster.lloydCentroids(
        unitVecs(Cluster.embNormed(spark, dir)).localCheckpoint(),
        IvfCells, Cluster.Iters))
    }

  /** IVF top-k: every vector is assigned to its nearest trained
    * centroid cell; each query scores only vectors in its `nprobe`
    * nearest cells. With nprobe = IvfCells this is exactly brute
    * force (the spec asserts that identity).
    */
  def ivfTopK(emb: DataFrame, nprobe: Int = IvfNprobe, k: Int = K,
      coarse: Option[Array[Array[Double]]] = None): DataFrame = {
    val queries = collectQueries(emb)
    val cents = coarse.getOrElse(trainedCoarse(emb))
    require(cents.length <= 64, "closure bitmask supports at most 64 coarse cells")
    heapTopK(emb, queries, k, Some((cents, ivfProbes(queries, cents, nprobe))))
  }

  /** Per-query probed cell set: the `nprobe` centroids nearest by
    * (rounded cosine desc, cell asc) — the routing half of IVF, shared
    * by [[ivfTopK]] (exact scoring) and [[ivfPqTopK]] (ADC scoring).
    */
  private def ivfProbes(queries: Array[(Long, Array[Float], Double)],
      cents: Array[Array[Double]], nprobe: Int): Map[Long, Set[Int]] =
    queries.map { case (qid, qv, qn) =>
      val ranked = cents.zipWithIndex
        .map { case (c, i) => (round6(dot(c, qv) / qn), i) }
        .sortBy { case (s, i) => (-s, i) }
      qid -> ranked.take(nprobe).map(_._2).toSet
    }.toMap

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.embeddings(spark, dir),
      coarse = Some(ivfCoarse(spark, dir)))

  /** IVF oracle: the same train/assign/probe/rank pipeline in SQL —
    * the coarse quantizer is [[Cluster.lloydCtes]]'s Lloyd chain at
    * k = [[IvfCells]] (identical to the engine's trainer, 6-dp-snapped
    * means), normalized to unit directions. Assignment and probing
    * rank by the 6-dp-rounded cosine with cell id as tie-break —
    * deterministic on both engines.
    */
  val annIvfSql: String = s"""
    WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    un AS (SELECT vec_id,
             CASE WHEN nrm = 0 THEN v
                  ELSE list_transform(v, x -> x / nrm) END AS v,
             1.0 AS nrm
           FROM n),
    ${Cluster.lloydCtes(IvfCells.toString, Cluster.Iters, vTable = "un", nTable = "un")},
    cents AS (SELECT c AS cell,
                list_transform(cv, x -> x /
                  sqrt(list_sum(list_transform(cv, y -> y * y)))) AS cv
              FROM c${Cluster.Iters}),
    asg0 AS (SELECT n.vec_id, cents.cell,
               ROUND(list_sum(list_transform(generate_series(1, len(n.v)),
                 i -> cents.cv[i] * n.v[i])) / n.nrm, 6) AS sc
             FROM n CROSS JOIN cents),
    assigned AS (SELECT a.vec_id, a.cell
                 FROM asg0 a
                 JOIN (SELECT vec_id, MAX(sc) AS mx FROM asg0 GROUP BY vec_id) m
                   ON m.vec_id = a.vec_id
                 WHERE a.sc >= m.mx - $IvfClosureEps),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    probes AS (SELECT qid, cell FROM (
                 SELECT q.qid, cents.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                     ROUND(list_sum(list_transform(generate_series(1, len(qv)),
                       i -> cents.cv[i] * qv[i])) / qn, 6) DESC, cents.cell) AS rn
                 FROM q CROSS JOIN cents)
               WHERE rn <= $IvfNprobe),
    cand0 AS (SELECT DISTINCT p.qid, a.vec_id
              FROM probes p JOIN assigned a ON a.cell = p.cell),
    s AS (SELECT q.qid, n.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, len(qv)),
              i -> qv[i] * n.v[i])) / (qn * n.nrm), 6) + 0.0 AS score
          FROM q
          JOIN cand0 c0 ON c0.qid = q.qid
          JOIN n ON n.vec_id = c0.vec_id AND n.vec_id != q.qid),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""

  /** LSH top-k: `LshTables` independent `LshBits`-bit hyperplane keys
    * per vector; candidates share ≥1 table key with the query, then
    * exact rerank. Candidate generation is a bucket equi-join — no
    * all-pairs work.
    */
  /** (vec_id, tbl, key) hyperplane bucket keys — the candidate
    * generator shared by [[lshTopK]] (few broadcast queries) and
    * [[knnJoinLsh]] (full self-join, more bits per key).
    */
  private def lshKeyed(emb: DataFrame, tables: Int, bits: Int, seed: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nPlanes = tables * bits
    emb.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        var pl: Array[Array[Double]] = null
        it.flatMap { case (id, v) =>
          if (pl == null) pl = planes(v.length, nPlanes, seed)
          (0 until tables).iterator.map { t =>
            var key = 0L
            var b = 0
            while (b < bits) {
              if (dot(pl(t * bits + b), v) > 0) key |= (1L << b)
              b += 1
            }
            (id, t, key)
          }
        }
      }.toDF("vec_id", "tbl", "key")
  }

  def lshTopK(emb: DataFrame, k: Int = K): DataFrame = {
    val keyed = lshKeyed(emb, LshTables, LshBits, seed = 13L)
    val qKeys = keyed.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("tbl"), col("key"))
    val cand = keyed.join(broadcast(qKeys), Seq("tbl", "key"))
      .where(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val vecs = withNorm(emb)
    val scored = cand
      .join(vecs.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs, "vec_id")
      .withColumn("score",
        round(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6) + 0.0)
      .select("qid", "vec_id", "score")
    globalTopK(scored, k)
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables.embeddings(spark, dir))

  /** Testdata embedding dimensionality — baked into the generated
    * oracle SQL only (the operators stay dim-agnostic; the oracle runs
    * exclusively against the shipped gate tables, which are 64-d).
    */
  private val OracleDim = 64

  /** Shared `v` CTE body for the dim-baking oracles: projects the
    * embedding to DOUBLE[] and hard-fails (DuckDB `error()`, reached
    * only through the lazily-evaluated CASE else-branch) on any row
    * whose dimensionality differs from [[OracleDim]] — a dim drift
    * would otherwise silently truncate the baked `generate_series(1,
    * $OracleDim)` dot products (dim > 64) or NULL them via
    * out-of-range list indexing (dim < 64) and surface as an opaque
    * hash mismatch.
    */
  private def oracleVCte: String =
    s"""v AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings
       |      WHERE CASE WHEN len(embedding) = $OracleDim THEN TRUE
       |        ELSE len(error('oracle expects dim $OracleDim, got '
       |                       || CAST(len(embedding) AS VARCHAR))) >= 0
       |        END)""".stripMargin

  /** LSH oracle: the Gaussian hyperplane constants are rendered into
    * the SQL verbatim from the same [[planes]] call the operator uses
    * (java.util.Random is algorithm-specified and `Double.toString`
    * round-trips), so DuckDB reproduces bucket keys, the candidate
    * equi-join, and the exact rerank bit-for-bit. Sign tests are safe
    * across engines: summation-order noise is ~1e-16 while |dot|
    * effectively never lands that close to zero.
    */
  val annLshSql: String = {
    val pls = planes(OracleDim, LshTables * LshBits, seed = 13L)
    val vals = pls.zipWithIndex
      .map { case (row, p) => s"($p,[${row.mkString(",")}]::DOUBLE[])" }
      .mkString(",\n")
    s"""
    WITH $oracleVCte,
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    planes(p, coefs) AS (VALUES
    $vals),
    d AS (SELECT n.vec_id, pl.p // $LshBits AS tbl, pl.p % $LshBits AS b,
            list_sum(list_transform(generate_series(1, $OracleDim),
              i -> pl.coefs[i] * n.v[i])) AS dp
          FROM n CROSS JOIN planes pl),
    keys AS (SELECT vec_id, tbl, SUM(CASE WHEN dp > 0 THEN 1 << b ELSE 0 END) AS key
             FROM d GROUP BY vec_id, tbl),
    qk AS (SELECT vec_id AS qid, tbl, key FROM keys WHERE vec_id < $NumQueries),
    cand AS (SELECT DISTINCT qk.qid, k.vec_id
             FROM keys k JOIN qk ON k.tbl = qk.tbl AND k.key = qk.key
             WHERE k.vec_id != qk.qid),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    s AS (SELECT c.qid, c.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
          FROM cand c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vec_id),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""
  }

  /** k for the all-vectors k-NN join (kept small: output is n·k). */
  val KnnJoinK = 3

  /** Above this corpus row count [[knnJoin]] routes to the LSH
    * candidate join instead of the exact broadcast path. The binding
    * constraint is COMPUTE, not broadcast memory: the exact path is
    * O(n²·d) dot products (measured 77 s at n=50k/d=64 on 32 cores —
    * quadrupling with every corpus doubling), while the LSH path's
    * bucket-join work stays ~linear because bits scale with log n.
    * 10k² ≈ 6 GFLOP keeps the exact path comfortably sub-second-per-
    * core while covering every exact-gate corpus; the old 500k
    * driver-memory bound is irrelevant long before it binds.
    */
  val KnnBroadcastMaxRows = 10000L

  /** LSH tables for the kNN-join candidate generator; bits per key are
    * sized from the corpus (see [[knnJoinLsh]]).
    */
  val KnnLshTables = 16

  /** k-NN self-join: every vector's top-k cosine neighbors — the
    * primitive under near-dup clustering and diversity sampling.
    * Adaptive (same pattern as [[graft.graph.GraphOps.LocalEdgeThreshold]]):
    * up to [[KnnBroadcastMaxRows]] the full vector set broadcasts into
    * the same bounded per-partition heaps as [[bruteForceTopK]] —
    * exact, and the gate corpus takes this path, so the DuckDB oracle
    * stays hash-green; above it, [[knnJoinLsh]] generates candidates
    * with a bucket self-join and reranks exactly (approximate recall,
    * the only shape that survives 100 TB). AnnSpec pins the LSH path's
    * recall against the exact path on the shipped corpus.
    */
  def knnJoin(emb: DataFrame, k: Int = KnnJoinK,
      maxBroadcastRows: Long = KnnBroadcastMaxRows): DataFrame = {
    val src = emb.select(col("vec_id").cast(LongType), col("embedding"))
      .localCheckpoint() // counted, then re-read by whichever path wins
    val n = src.count()
    if (n > maxBroadcastRows) return knnJoinLsh(src, k)
    val all = src.collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(s))
      }.sortBy(_._1)
    heapTopK(src, all, k)
  }

  /** Distributed kNN self-join: bucket self-join on hyperplane keys →
    * exact cosine rerank → top-k. Bits per key scale with the DISTINCT
    * vector count after the exact-duplicate collapse below
    * (`bits ≈ log2(nReps / 32)`, clamped to [4, 20]) so expected bucket
    * population — and with it the candidate-join work, tables × Σ
    * bucket² — stays ~constant per row as n grows; the few-query
    * [[lshTopK]] keeps fewer bits because only query buckets are
    * probed there. No driver state: keys, candidates, and rerank are
    * all shuffle joins.
    */
  def knnJoinLsh(emb: DataFrame, k: Int = KnnJoinK,
      tables: Int = KnnLshTables): DataFrame = {
    // Exact-duplicate collapse first (the dedup family's design):
    // identical vectors share every hyperplane key, so the bucket
    // self-join pays (copy count)² candidate pairs per distinct
    // vector for zero information — 7.5× time for 3× data on the
    // 30-copy ScaleUp corpus. Reps generate and rerank candidates;
    // the expansion back to individuals only ever joins each group's
    // k+1 lowest-id members, because equal-score ties rank by vec_id
    // — a member beyond its group's first k+1 ids can never enter
    // any top-k list.
    val wg = Window.partitionBy(col("embedding"))
    val m = emb.select(col("vec_id").cast(LongType).as("vec_id"), col("embedding"))
      .withColumn("rep_id", min("vec_id").over(wg))
      .withColumn("grk", row_number().over(wg.orderBy(col("vec_id"))))
      .localCheckpoint()
    val reps = m.where(col("vec_id") === col("rep_id")).select("vec_id", "embedding")
    val nReps = reps.count()
    val bits = math.min(20, math.max(4,
      (math.log(math.max(nReps, 2L).toDouble / 32.0) / math.log(2.0)).ceil.toInt))
    val keyed = lshKeyed(reps, tables, bits, seed = 13L)
    val cand = keyed
      .join(keyed.select(col("vec_id").as("qid"), col("tbl"), col("key")), Seq("tbl", "key"))
      .where(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val vecs = withNorm(reps)
    val repScored = cand
      .join(vecs.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs, "vec_id")
      .withColumn("score",
        round(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6) + 0.0)
      .select(col("qid").as("qrep"), col("vec_id").as("nrep"), col("score"))
    // each group's self-score through the exact rerank formula (1.0
    // for any nonzero vector; NaN for a zero vector, faithfully to
    // the uncollapsed pairwise path)
    val selfScore = vecs.select(col("vec_id").as("rep_id"),
      (round(expr("graft_dot(v, v)") / (col("nrm") * col("nrm")), 6) + 0.0).as("sscore"))
    // Prune to the top-k rep neighbors per query rep BEFORE expanding
    // to individuals (otherwise the expansion is |rep pairs| × copies
    // — the blowup the collapse was supposed to remove). Exact: rep
    // pairs rank by (score desc, rep_id asc), and since rep_id is its
    // group's MINIMUM member id, the k smallest member ids across any
    // set of equal-score groups lie inside the groups with the k
    // smallest rep ids — every pruned group already has k individuals
    // ranked strictly ahead of all of its members.
    val wq = Window.partitionBy(col("qrep")).orderBy(col("score").desc, col("nrep"))
    val repTop = repScored.withColumn("rr", row_number().over(wq))
      .where(col("rr") <= k).drop("rr")
    val top = m.where(col("grk") <= k + 1).select(col("rep_id"), col("vec_id"))
    val qMembers = m.select(col("rep_id").as("qrep"), col("vec_id").as("qid"))
    // cross-group: every individual of the query group × the k+1
    // lowest ids of the neighbor group, at the rep pair's exact score
    val cross = repTop
      .join(top.select(col("rep_id").as("nrep"), col("vec_id").as("nid")), "nrep")
      .join(qMembers, "qrep")
      .select(col("qid"), col("nid").as("vec_id"), col("score"))
    // within-group: each individual × its group's k+1 lowest ids
    // minus itself, at the group's self-score
    val within = m.select(col("rep_id"), col("vec_id").as("qid"))
      .join(top.select(col("rep_id"), col("vec_id").as("nid")), "rep_id")
      .where(col("qid") =!= col("nid"))
      .join(selfScore, "rep_id")
      .select(col("qid"), col("nid").as("vec_id"), col("sscore").as("score"))
    globalTopK(cross.unionAll(within), k)
  }

  def annKnnJoin(spark: SparkSession, dir: String): DataFrame =
    knnJoin(Tables.embeddings(spark, dir))

  val annKnnJoinSql: String = s"""
    WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    s AS (SELECT q.vec_id AS qid, n.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, len(q.v)),
              i -> q.v[i] * n.v[i])) / (q.nrm * n.nrm), 6) + 0.0 AS score
          FROM n q JOIN n ON n.vec_id != q.vec_id),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $KnnJoinK ORDER BY qid, rank"""

  /** Range-search threshold (the corpus' non-dup cosine ceiling is
    * ≈0.51, so 0.3 returns a real-but-bounded neighbor set).
    */
  val RangeTau = 0.3

  /** Range search: every vector within cosine ≥ τ of each query — the
    * threshold twin of top-k. The query set broadcasts into a nested-
    * loop join whose filter runs inside codegen before any shuffle, so
    * the only shuffled rows are actual matches (match-density-bound,
    * like the dedup candidate joins — never n × q).
    */
  def rangeSearch(emb: DataFrame, tau: Double = RangeTau): DataFrame = {
    val vecs = withNorm(emb)
    val qs = vecs
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .where(col("qid") < NumQueries)
    vecs.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("score",
        round(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6) + 0.0)
      .where(col("score") >= tau)
      .select("qid", "vec_id", "score")
      .orderBy("qid", "vec_id")
  }

  def annRange(spark: SparkSession, dir: String): DataFrame =
    rangeSearch(Tables.embeddings(spark, dir))

  val annRangeSql: String = s"""
    WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries)
    SELECT q.qid, n.vec_id,
      ROUND(list_sum(list_transform(generate_series(1, len(qv)),
        i -> qv[i] * n.v[i])) / (qn * n.nrm), 6) + 0.0 AS score
    FROM q JOIN n ON n.vec_id != q.qid
    WHERE ROUND(list_sum(list_transform(generate_series(1, len(qv)),
        i -> qv[i] * n.v[i])) / (qn * n.nrm), 6) + 0.0 >= $RangeTau
    ORDER BY qid, vec_id"""

  /** PQ layout: M subspaces × C centroids; ADC keeps `PqRerank`
    * candidates per query for the exact rerank.
    */
  val PqSubspaces = 8
  val PqCentroids = 16
  val PqRerank = 64

  /** IVF-PQ rerank budget — larger than plain PQ's because closure
    * assignment multiplies the routed candidate pool (1.7-2.4× on the
    * gate corpora) and a fixed 64-candidate ADC cut was measured to
    * push true neighbors below the rerank line (recall@10 0.81 at 64
    * vs 0.89 at 128, sf0.01). Exact-rerank cost stays trivially
    * bounded: 128 true dot products per query.
    */
  val IvfPqRerank = 128

  /** Product quantization (Jégou et al., TPAMI 2011) top-k: vectors
    * compress to M = [[PqSubspaces]] one-byte codes (nearest centroid
    * per subspace; codebooks seeded from the first [[PqCentroids]]
    * vectors' subvectors — same deterministic seeding as IVF). Queries
    * score candidates by Asymmetric Distance Computation: a per-query
    * M × C lookup table of subspace dot products makes each approximate
    * score M table adds instead of D multiplies — the memory-bound
    * trick that lets 100 TB of vectors scan as ~M bytes each. The top
    * [[PqRerank]] ADC candidates per query are then reranked exactly,
    * so returned scores are true cosines (spec-pinned against brute
    * force, and oracle-checked end-to-end by [[annPqSql]]).
    */
  def pqTopK(emb: DataFrame, k: Int = K,
      probedCells: Option[(Array[Array[Double]], Map[Long, Set[Int]])] = None,
      rerank: Int = PqRerank,
      rerankOn: Option[DataFrame] = None,
      byResidual: Boolean = false,
      codebookOverride: Option[OpqTrain.Codebook] = None): DataFrame = {
    require(!byResidual || probedCells.isDefined,
      "byResidual needs coarse cells to take residuals against")
    require(codebookOverride.isEmpty || (!byResidual && probedCells.isEmpty),
      "a trained codebook composes with the plain PQ chain only")
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = collectQueries(emb)
    require(queries.nonEmpty, "query set is empty")
    val dim = queries.head._2.length
    require(dim % PqSubspaces == 0, s"dim $dim not divisible by $PqSubspaces")
    val sub = dim / PqSubspaces
    val cents = probedCells.map(_._1).orNull
    // Encode source: raw vector, or (byResidual — the FAISS IVF-PQ
    // production form) the residual v − c_primary against the vector's
    // PRIMARY coarse centroid. Residuals are small exactly when cells
    // are tight, so the same 16 codes per subspace resolve much finer
    // structure; the ADC adds dot(q, c_primary) back (one per-query ×
    // per-cell constant) so the approximate score still estimates the
    // full inner product.
    def encodeSource(v: Array[Float], prim: Int): Array[Double] = {
      val src = new Array[Double](v.length)
      var i = 0
      if (byResidual) {
        val cp = cents(prim)
        while (i < v.length) { src(i) = v(i).toDouble - cp(i); i += 1 }
      } else {
        while (i < v.length) { src(i) = v(i).toDouble; i += 1 }
      }
      src
    }
    // codebooks[m][c] = trained subspace centroids (ascending cluster
    // id — ties resolve to the lower id because the scan is in-order)
    // when overridden, else subvector m of seed vector c (raw, or the
    // seed's residual against ITS primary cell when byResidual)
    val codebooks: Array[Array[Array[Double]]] = codebookOverride match {
      case Some(cb) => cb.map(_.map(_._2))
      case None =>
        val seeds = queries.filter(_._1 < PqCentroids).sortBy(_._1)
        // Fail loudly on a sparse/1-based vec_id corpus: the ADC tables
        // below index codebooks(m)(c) for c < PqCentroids, so fewer seeds
        // than centroids would be a silent ArrayIndexOutOfBounds later.
        require(seeds.length == PqCentroids,
          s"PQ seeding needs vec_ids 0..${PqCentroids - 1} present; found ${seeds.length}")
        val seedSrc: Array[Array[Double]] = seeds.map { case (_, v, n) =>
          encodeSource(v, if (byResidual) closureMaskAndPrim(cents, v, n)._2 else 0)
        }
        Array.tabulate(PqSubspaces) { m =>
          seedSrc.map(v => Array.tabulate(sub)(i => v(m * sub + i)))
        }
    }
    // per-query ADC tables: adc[q](m)(c) = dot(q_m, codebook[m][c]) —
    // the query stays RAW in both modes (residual ADC estimates
    // dot(q, c_p) + dot(q, v − c_p))
    val adcTables: Map[Long, Array[Array[Double]]] = queries.map { case (qid, qv, _) =>
      qid -> Array.tabulate(PqSubspaces) { m =>
        Array.tabulate(codebooks(m).length) { c =>
          var s = 0.0; var i = 0
          while (i < sub) { s += qv(m * sub + i).toDouble * codebooks(m)(c)(i); i += 1 }
          s
        }
      }
    }.toMap
    // per-(query, cell) constant dot(q, c_cell) — the residual ADC's
    // added-back term (queries × cells, trivially broadcastable)
    val qCell: Map[Long, Array[Double]] =
      if (byResidual) queries.map { case (qid, qv, _) =>
        qid -> Array.tabulate(cents.length) { c =>
          var s = 0.0; var i = 0
          while (i < qv.length) { s += cents(c)(i) * qv(i); i += 1 }
          s
        }
      }.toMap
      else Map.empty
    val bq = spark.sparkContext.broadcast(queries.map(q => (q._1, q._3)))
    val bcb = spark.sparkContext.broadcast(codebooks)
    val badc = spark.sparkContext.broadcast(adcTables)
    val bp = spark.sparkContext.broadcast(probedCells)
    val bqc = spark.sparkContext.broadcast(qCell)
    val resid = byResidual
    // encode + ADC-score in one pass; bounded per-partition heaps
    val partials = emb.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        val cbs = bcb.value
        val adc = badc.value
        val probe = bp.value
        val qc = bqc.value
        val ord = Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }
        val heaps = qs.map(q => q._1 -> scala.collection.mutable.PriorityQueue.empty(ord)).toMap
        val qMask = probe.map { case (_, byQ) =>
          byQ.map { case (q, cs) => q -> cs.foldLeft(0L)((m, c) => m | (1L << c)) }
        }
        it.foreach { case (id, v) =>
          var nrm = 0.0
          var i = 0
          while (i < v.length) { nrm += v(i).toDouble * v(i); i += 1 }
          nrm = math.sqrt(nrm)
          val maskPrim = probe.map { case (cs, _) => closureMaskAndPrim(cs, v, nrm) }
          val cellMask = maskPrim.map(_._1)
          val prim = maskPrim.map(_._2).getOrElse(0)
          val src = encodeSource(v, prim)
          // encode: nearest centroid per subspace (L2², ties → lower c)
          val codes = new Array[Int](PqSubspaces)
          var m = 0
          while (m < PqSubspaces) {
            val cb = cbs(m)
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < cb.length) {
              var d = 0.0; var j = 0
              while (j < cb(c).length) {
                val diff = src(m * cb(c).length + j) - cb(c)(j)
                d += diff * diff; j += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            codes(m) = best
            m += 1
          }
          qs.foreach { case (qid, qn) =>
            val visible = cellMask match {
              case Some(m) => (m & qMask.get(qid)) != 0L
              case None    => true
            }
            if (visible && id != qid) {
              val t = adc(qid)
              var s = 0.0
              var mm = 0
              while (mm < PqSubspaces) { s += t(mm)(codes(mm)); mm += 1 }
              val total = if (resid) qc(qid)(prim) + s else s
              val approx = round6(total / (qn * nrm))
              val h = heaps(qid)
              h.enqueue((approx, id))
              if (h.size > rerank) h.dequeue()
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (s, id) => (qid, id, s) }
        }
      }.toDF("qid", "vec_id", "approx")
    // global top-R by ADC, then exact rerank of the survivors — against
    // `rerankOn` when given (OPQ passes the ORIGINAL vectors here so the
    // returned scores are true original-space cosines even when `emb`
    // was rotated, not merely permuted)
    val wApprox = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("vec_id"))
    val cand = partials.withColumn("arn", row_number().over(wApprox))
      .where(col("arn") <= rerank).select("qid", "vec_id")
    val vecs = withNorm(rerankOn.getOrElse(emb))
    val scored = cand
      .join(vecs.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs, "vec_id")
      .withColumn("score",
        round(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6) + 0.0)
      .select("qid", "vec_id", "score")
    globalTopK(scored, k)
  }

  def annPq(spark: SparkSession, dir: String): DataFrame =
    pqTopK(Tables.embeddings(spark, dir))

  /** OPQ (Ge et al., CVPR 2013): learn an ORTHOGONAL transform that
    * minimizes PQ quantization damage. r19: TRAINING lives in
    * [[OpqTrain]] — a deterministic bounded sample (the md5-salted
    * q_train_split draw, one distributed TakeOrdered pass) collected
    * once, then every angle / Lloyd-codebook / tournament step runs on
    * the driver in oracle-exact decimal arithmetic over that
    * model-sized matrix (the FAISS production shape: OPQ/PQ train on
    * 10⁵-10⁶ sampled vectors, never the corpus). Only the SERVE path
    * below is corpus-sized and stays fully distributed: the rotation
    * layers replay as codegen'd array rebuilds, the permutation as one
    * projection, and the encode/ADC scan is [[pqTopK]] with the
    * trained subspace codebook broadcast. Selection is by measured
    * recall@[[K]] of the end-to-end chain on the [[NumQueries]] query
    * rows against exact brute-force truth over the sample — argmax of
    * INTEGER hit count, tie → lower candidate index (the
    * FAISS-autotune objective, trivially engine-exact); plain
    * seed-codebook PQ is candidate 0, so OPQ can never lose to
    * [[pqTopK]] on its own training metric whenever the sample covers
    * the corpus (always true at gate scale).
    */
  case class OpqTransform(layers: Seq[(Int, Array[Double])], perm: Array[Int]) {
    def isIdentity: Boolean =
      layers.isEmpty && perm.indices.forall(i => perm(i) == i)
  }

  private[graft] def opqStridesConc(dim: Int): Seq[Int] =
    Seq(dim / 2, dim / 4, dim / 8)
  private[graft] def opqStridesBal(dim: Int): Seq[Int] =
    Seq(dim / 8, dim / 4, dim / 2)

  private def embeddingDim(emb: DataFrame): Int =
    emb.select(col("embedding")).head().getSeq[Float](0).length

  /** Apply one butterfly layer as a codegen'd array rebuild: output
    * lo' = round9(c·v[lo] + s·v[hi]), hi' = round9(c·v[hi] − s·v[lo]),
    * snapped to FLOAT — both engines quantize each layer identically,
    * so the replay is float-exact layer by layer. No shuffle, no UDF.
    */
  private def rotateArrayCol(dim: Int, stride: Int, cs: Array[Double],
      arr: Column): Column = {
    val loIdx = (0 until dim).filter(lo => (lo / stride) % 2 == 0)
      .zipWithIndex.toMap
    val out = (0 until dim).map { d =>
      val isLo = (d / stride) % 2 == 0
      val lo = if (isLo) d else d - stride
      val p = loIdx(lo)
      val c = lit(cs(2 * p)); val s = lit(cs(2 * p + 1))
      val vlo = arr(lo).cast(DoubleType)
      val vhi = arr(lo + stride).cast(DoubleType)
      val e = if (isLo) c * vlo + s * vhi else c * vhi - s * vlo
      round(e, 9).cast(FloatType)
    }
    array(out: _*)
  }

  private def opqRotateLayer(emb: DataFrame, stride: Int,
      cs: Array[Double]): DataFrame =
    emb.withColumn("embedding",
      rotateArrayCol(embeddingDim(emb), stride, cs, col("embedding")))

  private[graft] def applyOpq(emb: DataFrame, t: OpqTransform): DataFrame = {
    var cur = emb
    t.layers.foreach { case (stride, cs) =>
      cur = opqRotateLayer(cur, stride, cs)
    }
    if (t.perm.indices.forall(i => t.perm(i) == i)) cur
    else cur.withColumn("embedding",
      array(t.perm.toSeq.map(i => col("embedding")(i)): _*))
  }

  /** Blob codec for the Materialized catalog: one
    * Seq[(Int, Array[Double])] row stream (the catalog's exact-class
    * allowlist) — the permutation row (marker Int.MinValue), the
    * rotation layers in application order (marker = stride ≥ 1), and
    * the trained subspace codebook's centroids (marker
    * −2 − (m·[[PqCentroids]] + clusterId); absent for the
    * seed-codebook candidate 0, which [[pqTopK]] re-derives from the
    * corpus itself).
    */
  private[graft] def opqToBlob(model: OpqTrain.OpqModel): Seq[(Int, Array[Double])] = {
    val head = (Int.MinValue, model.transform.perm.map(_.toDouble)) +:
      model.transform.layers.toList
    val cbRows = model.codebook.toSeq.flatMap { cb =>
      cb.zipWithIndex.flatMap { case (cents, m) =>
        cents.toSeq.map { case (id, cv) => (-2 - (m * PqCentroids + id), cv) }
      }
    }
    head ++ cbRows
  }

  private[graft] def opqFromBlob(b: Seq[(Int, Array[Double])]): OpqTrain.OpqModel = {
    val perm = b.find(_._1 == Int.MinValue).get._2.map(_.toInt)
    val layers = b.filter(_._1 >= 1)
    val cbRows = b.collect {
      case (marker, cv) if marker <= -2 && marker != Int.MinValue =>
        (-2 - marker, cv)
    }
    val cb =
      if (cbRows.isEmpty) None
      else Some(Array.tabulate(PqSubspaces) { m =>
        cbRows.collect {
          case (idx, cv) if idx / PqCentroids == m => (idx % PqCentroids, cv)
        }.sortBy(_._1).toArray
      })
    OpqTrain.OpqModel(OpqTransform(layers, perm), cb)
  }

  /** OPQ top-k: apply the trained transform (rotation layers as
    * codegen'd array rebuilds + one permutation projection — no
    * shuffle, no UDF), then the PQ encode/ADC chain in the transformed
    * space against the model's trained codebook, reranking the ADC
    * survivors against the ORIGINAL vectors — returned scores are true
    * original-space cosines whatever the transform did.
    */
  def opqTopK(emb: DataFrame, model: OpqTrain.OpqModel, k: Int = K): DataFrame =
    pqTopK(applyOpq(emb, model.transform), k, rerankOn = Some(emb),
      codebookOverride = model.codebook)

  /** Gate op: OPQ over the corpus embeddings — the transform AND its
    * subspace codebook trained once per (session, dir, corpus-version)
    * on the bounded sample ([[OpqTrain.train]]) and served from the
    * Materialized catalog like the IVF centroids (a production index
    * trains once and serves every query against it).
    */
  def annOpq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val blob = graft.Materialized.ofBlob(spark, dir, "ann:opq-model") {
      opqToBlob(OpqTrain.train(emb))
    }
    opqTopK(emb, opqFromBlob(blob))
  }
  /** IVF-PQ (Jégou et al., TPAMI 2011 §V — the FAISS production
    * shape): IVF coarse routing bounds WHICH vectors a query scores
    * (its `nprobe` nearest cells), PQ/ADC bounds the per-candidate
    * cost (M table adds per vector instead of D multiplies), and the
    * exact rerank of the ADC survivors restores true cosines. One
    * scan does assignment, encoding, and ADC scoring simultaneously —
    * at 100 TB that is the difference between "scan M bytes per
    * vector for 1/nprobe of the corpus" and either component alone.
    *
    * `byResidual` (default, the FAISS production form) encodes the
    * RESIDUAL v − c_primary against each vector's primary coarse
    * centroid instead of raw v: residual magnitudes shrink exactly
    * when cells are tight, so the same 16 codes per subspace resolve
    * far finer structure, and the ADC adds the per-(query, cell)
    * constant dot(q, c_primary) back so approximate scores still
    * estimate the full inner product. With byResidual=false and
    * nprobe = [[IvfCells]] the routing is a no-op and the result is
    * exactly [[pqTopK]] (spec-pinned identity); the residual spec pins
    * recall ≥ the raw encoding at the default nprobe.
    */
  def ivfPqTopK(emb: DataFrame, nprobe: Int = IvfNprobe, k: Int = K,
      coarse: Option[Array[Array[Double]]] = None,
      byResidual: Boolean = true): DataFrame = {
    val queries = collectQueries(emb)
    val cents = coarse.getOrElse(trainedCoarse(emb))
    require(cents.length <= 64, "closure bitmask supports at most 64 coarse cells")
    pqTopK(emb, k, Some((cents, ivfProbes(queries, cents, nprobe))),
      rerank = IvfPqRerank, byResidual = byResidual)
  }

  def annIvfPq(spark: SparkSession, dir: String): DataFrame =
    ivfPqTopK(Tables.embeddings(spark, dir),
      coarse = Some(ivfCoarse(spark, dir)))

  /** IVF-PQ oracle: [[annIvfSql]]'s assignment/probe CTEs composed
    * with [[annPqSql]]'s encode/ADC/rerank chain in RESIDUAL form —
    * each vector encodes v − c_primary against its primary cell's
    * centroid (rounded routing ties → lower cell), codebooks are the
    * seed vectors' residuals, the ADC adds the per-(query, cell)
    * dot(q, c_primary) constant back, and the candidate join is gated
    * by closure-cell membership (vector's assigned cell ∈ the query's
    * probed cells). Same 6-dp/tie-break discipline as both parents.
    */
  val annIvfPqSql: String = {
    val sub = OracleDim / PqSubspaces
    s"""
    WITH $oracleVCte,
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    un AS (SELECT vec_id,
             CASE WHEN nrm = 0 THEN v
                  ELSE list_transform(v, x -> x / nrm) END AS v,
             1.0 AS nrm
           FROM n),
    ${Cluster.lloydCtes(IvfCells.toString, Cluster.Iters, vTable = "un", nTable = "un")},
    cents AS (SELECT c AS cell,
                list_transform(cv, x -> x /
                  sqrt(list_sum(list_transform(cv, y -> y * y)))) AS cv
              FROM c${Cluster.Iters}),
    casg0 AS (SELECT n.vec_id, cents.cell,
                ROUND(list_sum(list_transform(generate_series(1, len(n.v)),
                  i -> cents.cv[i] * n.v[i])) / n.nrm, 6) AS sc
              FROM n CROSS JOIN cents),
    assigned AS (SELECT a.vec_id, a.cell
                 FROM casg0 a
                 JOIN (SELECT vec_id, MAX(sc) AS mx FROM casg0 GROUP BY vec_id) m
                   ON m.vec_id = a.vec_id
                 WHERE a.sc >= m.mx - $IvfClosureEps),
    prim AS (SELECT vec_id, cell FROM (
               SELECT vec_id, cell,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cell) AS rn
               FROM casg0)
             WHERE rn = 1),
    rsd AS (SELECT n.vec_id,
              list_transform(generate_series(1, $OracleDim),
                i -> n.v[i] - ct.cv[i]) AS rv
            FROM n JOIN prim p ON p.vec_id = n.vec_id
                   JOIN cents ct ON ct.cell = p.cell),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    probes AS (SELECT qid, cell FROM (
                 SELECT q.qid, cents.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                     ROUND(list_sum(list_transform(generate_series(1, len(qv)),
                       i -> cents.cv[i] * qv[i])) / qn, 6) DESC, cents.cell) AS rn
                 FROM q CROSS JOIN cents)
               WHERE rn <= $IvfNprobe),
    ms AS (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS m),
    cb AS (SELECT r.vec_id AS c, ms.m,
             list_slice(r.rv, ms.m * $sub + 1, ms.m * $sub + $sub) AS cv
           FROM rsd r CROSS JOIN ms WHERE r.vec_id < $PqCentroids),
    enc0 AS (SELECT r.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, $sub),
                 i -> (r.rv[cb.m * $sub + i] - cb.cv[i]) * (r.rv[cb.m * $sub + i] - cb.cv[i]))) AS d2
             FROM rsd r CROSS JOIN cb),
    enc AS (SELECT vec_id, m, c AS code FROM (
              SELECT vec_id, m, c,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
              FROM enc0)
            WHERE rn = 1),
    adc AS (SELECT q.qid, cb.m, cb.c,
              list_sum(list_transform(generate_series(1, $sub),
                i -> q.qv[cb.m * $sub + i] * cb.cv[i])) AS t
            FROM q CROSS JOIN cb),
    qcell AS (SELECT q.qid, ct.cell,
                list_sum(list_transform(generate_series(1, $OracleDim),
                  i -> ct.cv[i] * q.qv[i])) AS t0
              FROM q CROSS JOIN cents ct),
    cand0 AS (SELECT DISTINCT p.qid, a.vec_id
              FROM probes p JOIN assigned a ON a.cell = p.cell),
    approx AS (SELECT q.qid, e.vec_id,
                 ROUND((ANY_VALUE(qc.t0) + list_sum(list(adc.t ORDER BY adc.m)))
                   / (ANY_VALUE(q.qn) * ANY_VALUE(n.nrm)), 6) + 0.0 AS approx
               FROM q
               JOIN cand0 c0 ON c0.qid = q.qid
               JOIN enc e ON e.vec_id = c0.vec_id AND e.vec_id != q.qid
               JOIN adc ON adc.qid = q.qid AND adc.m = e.m AND adc.c = e.code
               JOIN n ON n.vec_id = e.vec_id
               JOIN prim pr ON pr.vec_id = e.vec_id
               JOIN qcell qc ON qc.qid = q.qid AND qc.cell = pr.cell
               GROUP BY q.qid, e.vec_id),
    cand AS (SELECT qid, vec_id FROM (
               SELECT qid, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS arn
               FROM approx) WHERE arn <= $IvfPqRerank),
    s AS (SELECT c.qid, c.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
          FROM cand c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vec_id),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""
  }

  /** PQ oracle: fully data-derived — codebooks are the first
    * [[PqCentroids]] vectors' subvectors, so the whole encode → ADC →
    * rerank pipeline is plain SQL (no engine-side constants at all).
    * Assignment ties break to the lower centroid id on both engines;
    * ADC scores are rounded to 6 dp before the candidate cut, matching
    * [[pqTopK]].
    */
  val annPqSql: String = {
    val sub = OracleDim / PqSubspaces
    s"""
    WITH $oracleVCte,
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    ms AS (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS m),
    cb AS (SELECT n.vec_id AS c, ms.m,
             list_slice(n.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS cv
           FROM n CROSS JOIN ms WHERE n.vec_id < $PqCentroids),
    enc0 AS (SELECT n.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, $sub),
                 i -> (n.v[cb.m * $sub + i] - cb.cv[i]) * (n.v[cb.m * $sub + i] - cb.cv[i]))) AS d2
             FROM n CROSS JOIN cb),
    enc AS (SELECT vec_id, m, c AS code FROM (
              SELECT vec_id, m, c,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
              FROM enc0)
            WHERE rn = 1),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    adc AS (SELECT q.qid, cb.m, cb.c,
              list_sum(list_transform(generate_series(1, $sub),
                i -> q.qv[cb.m * $sub + i] * cb.cv[i])) AS t
            FROM q CROSS JOIN cb),
    approx AS (SELECT q.qid, e.vec_id,
                 -- list(ORDER BY m) fixes the FP summation order to match
                 -- pqTopK's sequential subspace loop: SUM() order within a
                 -- group is unspecified and FP addition non-associative, so
                 -- a half-boundary ROUND could otherwise flake the cut
                 ROUND(list_sum(list(adc.t ORDER BY adc.m))
                   / (ANY_VALUE(q.qn) * ANY_VALUE(n.nrm)), 6) + 0.0 AS approx
               FROM q
               JOIN enc e ON e.vec_id != q.qid
               JOIN adc ON adc.qid = q.qid AND adc.m = e.m AND adc.c = e.code
               JOIN n ON n.vec_id = e.vec_id
               GROUP BY q.qid, e.vec_id),
    cand AS (SELECT qid, vec_id FROM (
               SELECT qid, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS arn
               FROM approx) WHERE arn <= $PqRerank),
    s AS (SELECT c.qid, c.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
          FROM cand c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vec_id),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""
  }

  /** Oracle for [[annOpq]]: recompute the TRAINING in SQL (the
    * data-derived-state pattern of [[annPqSql]]'s codebooks), r19
    * shape — first the deterministic bounded SAMPLE (vec_id <
    * [[NumQueries]] plus the [[OpqTrain.TrainSample]]-lowest rows in
    * `(md5('opq:'||vec_id), vec_id)` order, the engine's TakeOrdered
    * draw), then every training step over that sample: the variance
    * key from round9 + DECIMAL(28,9) sums (exact, order-free), both
    * butterfly branches layer by layer (pair moments → closed-form
    * Schur angles through the DuckDB-exact decimal→double bridge →
    * FLOAT-snapped rep), per-subspace LLOYD codebooks
    * ([[OpqTrain.LloydIters]] exact-decimal rounds seeded from the
    * vec_id<16 subvectors), the two Ge-alternation sweeps per branch
    * (Lloyd-codebook decode → inverse-perm + inverse-layer pull-back →
    * closed-form per-pair Givens relearn), the eight candidate frames,
    * each candidate's encode/ADC/rerank/top-k chain over the sample,
    * exact brute-force truth over the sample, and the INTEGER recall
    * tournament (argmax hits, tie → lower candidate index). The WINNER
    * then serves the FULL corpus: its angle/perm tables re-apply to
    * every vector and its sample-trained codebook drives the final
    * encode/ADC/exact-rerank top-k — exactly the engine's
    * train-on-sample / serve-corpus split.
    */
  val annOpqSql: String = {
    val sub = OracleDim / PqSubspaces
    val li = OpqTrain.LloydIters
    // ---- training-side builders (all over sample-derived sources) ----
    // butterfly layer: exact-decimal pair moments over `src`, Schur
    // angles (balance mode advances 45°), rotated FLOAT-snapped rep
    def layer(tag: String, src: String, stride: Int, balance: Boolean): String = {
      val cSel = if (balance) "(c0 - s0)/sqrt(2.0)" else "c0"
      val sSel = if (balance) "(c0 + s0)/sqrt(2.0)" else "s0"
      s"""
    pr_$tag AS (SELECT lo, lo + $stride AS hi
                FROM (SELECT unnest(generate_series(0, ${OracleDim - 1})) AS lo)
                WHERE (lo // $stride) % 2 = 0),
    mo_$tag AS (SELECT p.lo, p.hi, COUNT(*) AS n,
          SUM(CAST(ROUND(w.v[p.lo+1], 9) AS DECIMAL(28,9))) AS s1l,
          SUM(CAST(ROUND(w.v[p.lo+1]*w.v[p.lo+1], 9) AS DECIMAL(28,9))) AS s2l,
          SUM(CAST(ROUND(w.v[p.hi+1], 9) AS DECIMAL(28,9))) AS s1h,
          SUM(CAST(ROUND(w.v[p.hi+1]*w.v[p.hi+1], 9) AS DECIMAL(28,9))) AS s2h,
          SUM(CAST(ROUND(w.v[p.lo+1]*w.v[p.hi+1], 9) AS DECIMAL(28,9))) AS s11
        FROM $src w CROSS JOIN pr_$tag p GROUP BY p.lo, p.hi),
    an_$tag AS (SELECT lo, hi, ROUND($cSel, 9) AS c, ROUND($sSel, 9) AS s FROM (
          SELECT lo, hi,
            CASE WHEN b = 0 THEN 1.0 ELSE 1/sqrt(1 + t*t) END AS c0,
            CASE WHEN b = 0 THEN 0.0 ELSE t/sqrt(1 + t*t) END AS s0
          FROM (
            SELECT lo, hi, b,
              CASE WHEN b = 0 THEN 0.0 WHEN tau = 0 THEN 1.0
                   ELSE (CASE WHEN tau > 0 THEN 1.0 ELSE -1.0 END)
                        / (abs(tau) + sqrt(1 + tau*tau)) END AS t
            FROM (
              SELECT lo, hi, b,
                CASE WHEN b = 0 THEN 0.0 ELSE (cc - a)/(2*b) END AS tau
              FROM (
                SELECT lo, hi,
                  CAST(n*s2l - s1l*s1l AS DOUBLE) AS a,
                  CAST(n*s11 - s1l*s1h AS DOUBLE) AS b,
                  CAST(n*s2h - s1h*s1h AS DOUBLE) AS cc
                FROM mo_$tag))))),
    dr_$tag AS (SELECT lo AS d, lo, hi, c, s, TRUE AS is_lo FROM an_$tag
                UNION ALL
                SELECT hi, lo, hi, c, s, FALSE FROM an_$tag),
    w_$tag AS MATERIALIZED (SELECT w.vec_id,
          list(CAST(CAST(ROUND(CASE WHEN dr.is_lo
                 THEN dr.c*w.v[dr.lo+1] + dr.s*w.v[dr.hi+1]
                 ELSE dr.c*w.v[dr.hi+1] - dr.s*w.v[dr.lo+1] END, 9)
               AS FLOAT) AS DOUBLE) ORDER BY dr.d) AS v
        FROM $src w CROSS JOIN dr_$tag dr GROUP BY w.vec_id),"""
    }
    // exact-decimal variance rank of a rep (dims 1-based)
    def rank(tag: String, src: String): String = s"""
    sv_$tag AS (SELECT d, s2 * n - s1 * s1 AS vr FROM (
           SELECT dims.i AS d, COUNT(*) AS n,
             SUM(CAST(ROUND(w.v[dims.i], 9) AS DECIMAL(28,9))) AS s1,
             SUM(CAST(ROUND(w.v[dims.i] * w.v[dims.i], 9) AS DECIMAL(28,9))) AS s2
           FROM $src w CROSS JOIN dims GROUP BY dims.i)),
    rk_$tag AS (SELECT d, ROW_NUMBER() OVER (ORDER BY vr DESC, d) - 1 AS r FROM sv_$tag),"""
    // apply a permutation table (d → position p) to a source frame
    def permApply(outTag: String, src: String, pmTag: String): String = s"""
    $outTag AS MATERIALIZED (SELECT w.vec_id, list(w.v[pm.d] ORDER BY pm.p) AS v
                FROM $src w CROSS JOIN $pmTag pm GROUP BY w.vec_id),"""
    // re-apply trained angles forward to any source (training rep
    // updates AND the full-corpus serve): round9 → FLOAT per value
    def fwdLayer(outTag: String, src: String, angleTag: String): String = s"""
    drf_$outTag AS (SELECT lo AS d, lo, hi, c, s, TRUE AS is_lo FROM an_$angleTag
                UNION ALL SELECT hi, lo, hi, c, s, FALSE FROM an_$angleTag),
    $outTag AS MATERIALIZED (SELECT w.vec_id,
          list(CAST(CAST(ROUND(CASE WHEN dr.is_lo
                 THEN dr.c*w.v[dr.lo+1] + dr.s*w.v[dr.hi+1]
                 ELSE dr.c*w.v[dr.hi+1] - dr.s*w.v[dr.lo+1] END, 9)
               AS FLOAT) AS DOUBLE) ORDER BY dr.d) AS v
        FROM $src w CROSS JOIN drf_$outTag dr GROUP BY w.vec_id),"""
    // inverse butterfly layer (target pull-back): x = c·a − s·b,
    // y = s·a + c·b, same round9→FLOAT snap as the forward replay
    def invLayer(outTag: String, src: String, angleTag: String): String = s"""
    dri_$outTag AS (SELECT lo AS d, lo, hi, c, s, TRUE AS is_lo FROM an_$angleTag
                UNION ALL SELECT hi, lo, hi, c, s, FALSE FROM an_$angleTag),
    $outTag AS MATERIALIZED (SELECT w.vec_id,
          list(CAST(CAST(ROUND(CASE WHEN dr.is_lo
                 THEN dr.c*w.v[dr.lo+1] - dr.s*w.v[dr.hi+1]
                 ELSE dr.s*w.v[dr.lo+1] + dr.c*w.v[dr.hi+1] END, 9)
               AS FLOAT) AS DOUBLE) ORDER BY dr.d) AS v
        FROM $src w CROSS JOIN dri_$outTag dr GROUP BY w.vec_id),"""
    // fixed-codes Givens relearn: (c, s) ∝ (α, β) from round9 +
    // DECIMAL(28,18) cross-moment sums crossing the decimal→double
    // bridge — the closed form of the per-pair rotation update
    def altAngles(tag: String, xsrc: String, tsrc: String, stride: Int): String = s"""
    pr_$tag AS (SELECT lo, lo + $stride AS hi
                FROM (SELECT unnest(generate_series(0, ${OracleDim - 1})) AS lo)
                WHERE (lo // $stride) % 2 = 0),
    mo_$tag AS (SELECT p.lo, p.hi,
          SUM(CAST(ROUND(t.v[p.lo+1]*x.v[p.lo+1] + t.v[p.hi+1]*x.v[p.hi+1], 9)
              AS DECIMAL(28,18))) AS al,
          SUM(CAST(ROUND(t.v[p.lo+1]*x.v[p.hi+1] - t.v[p.hi+1]*x.v[p.lo+1], 9)
              AS DECIMAL(28,18))) AS be
        FROM $xsrc x JOIN $tsrc t ON t.vec_id = x.vec_id CROSS JOIN pr_$tag p
        GROUP BY p.lo, p.hi),
    an_$tag AS MATERIALIZED (SELECT lo, hi,
          ROUND(CASE WHEN h = 0 THEN 1.0 ELSE a/h END, 9) AS c,
          ROUND(CASE WHEN h = 0 THEN 0.0 ELSE b/h END, 9) AS s
        FROM (SELECT lo, hi, a, b, sqrt(a*a + b*b) AS h
              FROM (SELECT lo, hi, CAST(al AS DOUBLE) AS a,
                           CAST(be AS DOUBLE) AS b FROM mo_$tag))),"""
    // per-subspace Lloyd codebook over `src`: init = vec_id<C
    // subvectors (cluster id = vec_id), then `li` exact-decimal
    // assign/update rounds (d² tie → lower id; DECIMAL(27,10) sums →
    // double bridge → /count → round 6); empty clusters vanish
    def lloyd(tag: String, src: String): String = {
      val init = s"""
    lc0_$tag AS (SELECT ms.m, CAST(w.vec_id AS INTEGER) AS c,
          list_slice(w.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS cv
        FROM $src w CROSS JOIN ms WHERE w.vec_id < $PqCentroids),"""
      val rounds = (1 to li).map { t => s"""
    la${t}_$tag AS (SELECT vec_id, m, c FROM (
          SELECT w.vec_id, cb.m, cb.c,
            ROW_NUMBER() OVER (PARTITION BY w.vec_id, cb.m ORDER BY
              list_sum(list_transform(generate_series(1, $sub),
                i -> (w.v[cb.m * $sub + i] - cb.cv[i])
                   * (w.v[cb.m * $sub + i] - cb.cv[i]))), cb.c) AS rn
          FROM $src w CROSS JOIN lc${t - 1}_$tag cb) WHERE rn = 1),
    lc${t}_$tag AS (SELECT m, c, list(mv ORDER BY j) AS cv FROM (
          SELECT a.m, a.c, sj.j,
            ROUND(CAST(SUM(CAST(w.v[a.m * $sub + sj.j] AS DECIMAL(27,10))) AS DOUBLE)
                  / COUNT(*), 6) AS mv
          FROM la${t}_$tag a JOIN $src w USING (vec_id) CROSS JOIN sj
          GROUP BY a.m, a.c, sj.j) GROUP BY m, c),"""
      }.mkString
      init + rounds
    }
    // decode the current rep's PQ reconstruction against its LLOYD
    // codebook — the fixed-codebook half of the sweep; `usePerm` maps
    // it back to the pre-perm rotated space (the identity-perm balance
    // branch skips the mapping)
    def decode(q: String, repSrc: String, usePerm: Boolean): String =
      lloyd(q, repSrc) + s"""
    en_${q}0 AS (SELECT w.vec_id, cb.m, cb.c,
          list_sum(list_transform(generate_series(1, $sub),
            i -> (w.v[cb.m * $sub + i] - cb.cv[i])
               * (w.v[cb.m * $sub + i] - cb.cv[i]))) AS d2
        FROM $repSrc w CROSS JOIN lc${li}_$q cb),
    en_$q AS MATERIALIZED (SELECT vec_id, m, c FROM (
          SELECT vec_id, m, c,
            ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
          FROM en_${q}0) WHERE rn = 1),
    yrep_$q AS MATERIALIZED (SELECT e.vec_id, flatten(list(cb.cv ORDER BY e.m)) AS v
          FROM en_$q e JOIN lc${li}_$q cb ON cb.m = e.m AND cb.c = e.c
          GROUP BY e.vec_id),""" +
        (if (usePerm) s"""
    yrot_$q AS MATERIALIZED (SELECT y.vec_id, list(y.v[pm.p] ORDER BY pm.d) AS v
          FROM yrep_$q y CROSS JOIN pm3 pm GROUP BY y.vec_id),"""
        else s"""
    yrot_$q AS (SELECT vec_id, v FROM yrep_$q),""")
    // one sweep: Lloyd-decode targets off `repSrc`, pull back through
    // the later OLD layers (`olds` = current angle tags of layers 2,
    // 3), relearn the three layers forward; new angle/rep CTEs carry
    // the `lp` layer-tag prefix
    def sweep(lp: String, q: String, repSrc: String, olds: (String, String),
        strides: Seq[Int], usePerm: Boolean): String = {
      val Seq(s1, s2, s3) = strides
      decode(q, repSrc, usePerm) +
        invLayer(s"yb_${lp}2", s"yrot_$q", olds._2) +
        invLayer(s"yb_${lp}1", s"yb_${lp}2", olds._1) +
        altAngles(s"${lp}1", "vs", s"yb_${lp}1", s1) +
        fwdLayer(s"w_${lp}1", "vs", s"${lp}1") +
        altAngles(s"${lp}2", s"w_${lp}1", s"yb_${lp}2", s2) +
        fwdLayer(s"w_${lp}2", s"w_${lp}1", s"${lp}2") +
        altAngles(s"${lp}3", s"w_${lp}2", s"yrot_$q", s3) +
        fwdLayer(s"w_${lp}3", s"w_${lp}2", s"${lp}3")
    }
    val concStr = opqStridesConc(OracleDim)
    val balStr = opqStridesBal(OracleDim)
    val layersA = concStr.zipWithIndex.map { case (st, i) =>
      layer(s"a${i + 1}", if (i == 0) "vs" else s"w_a$i", st, balance = false)
    }.mkString
    val layersB = balStr.zipWithIndex.map { case (st, i) =>
      layer(s"b${i + 1}", if (i == 0) "vs" else s"w_b$i", st, balance = true)
    }.mkString
    val altCtes =
      sweep("t1", "qa1", "vps3", ("a2", "a3"), concStr, usePerm = true) +
        permApply("vq1", "w_t13", "pm3") +
        sweep("t2", "qa2", "vq1", ("t12", "t13"), concStr, usePerm = true) +
        permApply("vq2", "w_t23", "pm3") +
        sweep("u1", "qb1", s"w_b${balStr.length}", ("b2", "b3"), balStr,
          usePerm = false) +
        sweep("u2", "qb2", "w_u13", ("u12", "u13"), balStr, usePerm = false)
    // grouped per-candidate Lloyd over the 8 sample reps (cidx 0 keeps
    // its seed init — candidate 0 IS plain seed-codebook PQ)
    val groupedLloyd = {
      val init = s"""
    gc0 AS (SELECT w.cidx, ms.m, CAST(w.vec_id AS INTEGER) AS c,
          list_slice(w.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS cv
        FROM vpall_s w CROSS JOIN ms WHERE w.vec_id < $PqCentroids),"""
      val rounds = (1 to li).map { t => s"""
    ga$t AS (SELECT cidx, vec_id, m, c FROM (
          SELECT w.cidx, w.vec_id, cb.m, cb.c,
            ROW_NUMBER() OVER (PARTITION BY w.cidx, w.vec_id, cb.m ORDER BY
              list_sum(list_transform(generate_series(1, $sub),
                i -> (w.v[cb.m * $sub + i] - cb.cv[i])
                   * (w.v[cb.m * $sub + i] - cb.cv[i]))), cb.c) AS rn
          FROM vpall_s w JOIN gc${t - 1} cb ON cb.cidx = w.cidx AND cb.cidx >= 1)
          WHERE rn = 1),
    gc$t AS (SELECT cidx, m, c, list(mv ORDER BY j) AS cv FROM (
          SELECT a.cidx, a.m, a.c, sj.j,
            ROUND(CAST(SUM(CAST(w.v[a.m * $sub + sj.j] AS DECIMAL(27,10))) AS DOUBLE)
                  / COUNT(*), 6) AS mv
          FROM ga$t a JOIN vpall_s w ON w.cidx = a.cidx AND w.vec_id = a.vec_id
          CROSS JOIN sj
          GROUP BY a.cidx, a.m, a.c, sj.j) GROUP BY cidx, m, c),"""
      }.mkString
      init + rounds
    }
    s"""
    WITH $oracleVCte,
    dims AS (SELECT unnest(generate_series(1, $OracleDim)) AS i),
    ms AS (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS m),
    sj AS (SELECT unnest(generate_series(1, $sub)) AS j),
    vs AS MATERIALIZED (
      SELECT vec_id, v FROM v WHERE vec_id < $NumQueries
      UNION ALL
      SELECT vec_id, v FROM (
        SELECT vec_id, v,
          ROW_NUMBER() OVER (ORDER BY md5('opq:' || CAST(vec_id AS VARCHAR)),
                             vec_id) AS rn
        FROM v WHERE vec_id >= $NumQueries) WHERE rn <= ${OpqTrain.TrainSample}),
    ${rank("o", "vs")}
    $layersA
    ${rank("a", s"w_a${concStr.length}")}
    pm1 AS (SELECT d, (r % $PqSubspaces) * $sub + r // $PqSubspaces + 1 AS p FROM rk_o),
    pm2 AS (SELECT d, r + 1 AS p FROM rk_o),
    pm3 AS (SELECT d, (r % $PqSubspaces) * $sub + r // $PqSubspaces + 1 AS p FROM rk_a),
    ${permApply("vps3", s"w_a${concStr.length}", "pm3")}
    $layersB
    $altCtes
    ${permApply("vps1", "vs", "pm1")}
    ${permApply("vps2", "vs", "pm2")}
    vpall_s AS MATERIALIZED (
      SELECT 0 AS cidx, vec_id, v FROM vs
      UNION ALL SELECT 1, vec_id, v FROM vs
      UNION ALL SELECT 2, vec_id, v FROM vps1
      UNION ALL SELECT 3, vec_id, v FROM vps2
      UNION ALL SELECT 4, vec_id, v FROM vps3
      UNION ALL SELECT 5, vec_id, v FROM w_b${balStr.length}
      UNION ALL SELECT 6, vec_id, v FROM vq2
      UNION ALL SELECT 7, vec_id, v FROM w_u23),
    $groupedLloyd
    cb_s AS MATERIALIZED (
      SELECT cidx, m, c, cv FROM gc0 WHERE cidx = 0
      UNION ALL SELECT cidx, m, c, cv FROM gc$li WHERE cidx >= 1),
    nall_s AS (SELECT cidx, vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
             FROM vpall_s),
    enc0_s AS (SELECT w.cidx, w.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, $sub),
                 i -> (w.v[cb.m * $sub + i] - cb.cv[i]) * (w.v[cb.m * $sub + i] - cb.cv[i]))) AS d2
             FROM nall_s w JOIN cb_s cb ON cb.cidx = w.cidx),
    enc_s AS (SELECT cidx, vec_id, m, c AS code FROM (
              SELECT cidx, vec_id, m, c,
                ROW_NUMBER() OVER (PARTITION BY cidx, vec_id, m ORDER BY d2, c) AS rn
              FROM enc0_s)
            WHERE rn = 1),
    qall_s AS (SELECT cidx, vec_id AS qid, v AS qv, nrm AS qn FROM nall_s
             WHERE vec_id < $NumQueries),
    adc_s AS (SELECT q.cidx, q.qid, cb.m, cb.c,
              list_sum(list_transform(generate_series(1, $sub),
                i -> q.qv[cb.m * $sub + i] * cb.cv[i])) AS t
            FROM qall_s q JOIN cb_s cb ON cb.cidx = q.cidx),
    apx_s AS (SELECT q.cidx, q.qid, e.vec_id,
                 ROUND(list_sum(list(adc.t ORDER BY adc.m))
                   / (ANY_VALUE(q.qn) * ANY_VALUE(n.nrm)), 6) + 0.0 AS approx
               FROM qall_s q
               JOIN enc_s e ON e.cidx = q.cidx AND e.vec_id != q.qid
               JOIN adc_s adc ON adc.cidx = q.cidx AND adc.qid = q.qid
                 AND adc.m = e.m AND adc.c = e.code
               JOIN nall_s n ON n.cidx = q.cidx AND n.vec_id = e.vec_id
               GROUP BY q.cidx, q.qid, e.vec_id),
    cand_s AS (SELECT cidx, qid, vec_id FROM (
               SELECT cidx, qid, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY cidx, qid
                   ORDER BY approx DESC, vec_id) AS arn
               FROM apx_s) WHERE arn <= $PqRerank),
    n0s AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
           FROM vs),
    q0s AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n0s
           WHERE vec_id < $NumQueries),
    sall_s AS (SELECT c.cidx, c.qid, c.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
          FROM cand_s c JOIN q0s q ON q.qid = c.qid JOIN n0s n ON n.vec_id = c.vec_id),
    topall_s AS MATERIALIZED (SELECT cidx, qid, vec_id FROM (
              SELECT cidx, qid, vec_id,
                ROW_NUMBER() OVER (PARTITION BY cidx, qid
                  ORDER BY score DESC, vec_id) AS rank
              FROM sall_s) WHERE rank <= $K),
    truth_s AS (SELECT qid, vec_id FROM (
            SELECT q.qid, n.vec_id,
              ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
                  i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 DESC,
                n.vec_id) AS rank
            FROM q0s q JOIN n0s n ON n.vec_id != q.qid)
          WHERE rank <= $K),
    hits AS (SELECT c.cidx, COUNT(tr.qid) AS h
           FROM (SELECT unnest(generate_series(0, 7)) AS cidx) c
           LEFT JOIN topall_s t ON t.cidx = c.cidx
           LEFT JOIN truth_s tr ON tr.qid = t.qid AND tr.vec_id = t.vec_id
           GROUP BY c.cidx),
    bestc AS (SELECT cidx FROM hits a WHERE NOT EXISTS (
                SELECT 1 FROM hits b
                WHERE b.h > a.h OR (b.h = a.h AND b.cidx < a.cidx))),
    ${fwdLayer("wf_a1", "v", "a1")}
    ${fwdLayer("wf_a2", "wf_a1", "a2")}
    ${fwdLayer("wf_a3", "wf_a2", "a3")}
    ${permApply("vpf4", "wf_a3", "pm3")}
    ${fwdLayer("wf_b1", "v", "b1")}
    ${fwdLayer("wf_b2", "wf_b1", "b2")}
    ${fwdLayer("wf_b3", "wf_b2", "b3")}
    ${fwdLayer("wf_t1", "v", "t21")}
    ${fwdLayer("wf_t2", "wf_t1", "t22")}
    ${fwdLayer("wf_t3", "wf_t2", "t23")}
    ${permApply("vpf6", "wf_t3", "pm3")}
    ${fwdLayer("wf_u1", "v", "u21")}
    ${fwdLayer("wf_u2", "wf_u1", "u22")}
    ${fwdLayer("wf_u3", "wf_u2", "u23")}
    ${permApply("vpf2", "v", "pm1")}
    ${permApply("vpf3", "v", "pm2")}
    vpall_f AS (
      SELECT 0 AS cidx, vec_id, v FROM v
      UNION ALL SELECT 1, vec_id, v FROM v
      UNION ALL SELECT 2, vec_id, v FROM vpf2
      UNION ALL SELECT 3, vec_id, v FROM vpf3
      UNION ALL SELECT 4, vec_id, v FROM vpf4
      UNION ALL SELECT 5, vec_id, v FROM wf_b3
      UNION ALL SELECT 6, vec_id, v FROM vpf6
      UNION ALL SELECT 7, vec_id, v FROM wf_u3),
    vwin AS MATERIALIZED (SELECT vec_id, v FROM vpall_f
      WHERE cidx = (SELECT cidx FROM bestc)),
    cbwin AS MATERIALIZED (SELECT m, c, cv FROM cb_s
      WHERE cidx = (SELECT cidx FROM bestc)),
    nwin AS (SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
             FROM vwin),
    encf0 AS (SELECT w.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, $sub),
                 i -> (w.v[cb.m * $sub + i] - cb.cv[i]) * (w.v[cb.m * $sub + i] - cb.cv[i]))) AS d2
             FROM nwin w CROSS JOIN cbwin cb),
    encf AS (SELECT vec_id, m, c AS code FROM (
              SELECT vec_id, m, c,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
              FROM encf0) WHERE rn = 1),
    qf AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM nwin
           WHERE vec_id < $NumQueries),
    adcf AS (SELECT q.qid, cb.m, cb.c,
              list_sum(list_transform(generate_series(1, $sub),
                i -> q.qv[cb.m * $sub + i] * cb.cv[i])) AS t
            FROM qf q CROSS JOIN cbwin cb),
    apxf AS (SELECT q.qid, e.vec_id,
                 ROUND(list_sum(list(adc.t ORDER BY adc.m))
                   / (ANY_VALUE(q.qn) * ANY_VALUE(n.nrm)), 6) + 0.0 AS approx
               FROM qf q
               JOIN encf e ON e.vec_id != q.qid
               JOIN adcf adc ON adc.qid = q.qid AND adc.m = e.m AND adc.c = e.code
               JOIN nwin n ON n.vec_id = e.vec_id
               GROUP BY q.qid, e.vec_id),
    candf AS (SELECT qid, vec_id FROM (
               SELECT qid, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS arn
               FROM apxf) WHERE arn <= $PqRerank),
    n0 AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
           FROM v),
    q0 AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n0
           WHERE vec_id < $NumQueries),
    sfin AS (SELECT c.qid, c.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
          FROM candf c JOIN q0 q ON q.qid = c.qid JOIN n0 n ON n.vec_id = c.vec_id),
    rfin AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM sfin)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM rfin WHERE rank <= $K ORDER BY qid, rank"""
  }
  /** SQ: 8-bit codes per dimension; exact rerank budget per query. */
  val SqLevels = 255
  val SqRerank = 64

  /** Scalar quantization top-k (the FAISS SQ8 shape): every corpus
    * vector compresses to one byte per dimension against GLOBAL
    * per-dim [lo, hi] ranges — a 4× memory cut over float32 with
    * near-exact ranking (255 levels ≫ the corpora's per-dim spread),
    * the usual first rung below full precision and above PQ. Queries
    * stay full-precision; approximate scores dot the query against the
    * DEQUANTIZED corpus vector, the top [[SqRerank]] candidates rerank
    * exactly. The [lo, hi] ranges are a dims-sized model aggregate
    * (posexplode + min/max — map-side combined, collected like the
    * other trained state); encode + score run in the same bounded-heap
    * partition scan as PQ. FP discipline: the dequantized dot accumulates
    * in ascending dimension order on both engines, and both sides round
    * the approximate score to 6 dp before the (approx DESC, vec_id) cut.
    */
  def sqTopK(emb: DataFrame, k: Int = K, rerank: Int = SqRerank): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = collectQueries(emb)
    require(queries.nonEmpty, "query set is empty")
    val dim = queries.head._2.length
    val ranges = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(
        min(col("x").cast(DoubleType)).as("lo"),
        max(col("x").cast(DoubleType)).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    require(ranges.size == dim, s"per-dim ranges ${ranges.size} != dim $dim")
    val los = Array.tabulate(dim)(i => ranges(i)._1)
    val his = Array.tabulate(dim)(i => ranges(i)._2)
    val bq = spark.sparkContext.broadcast(queries)
    val blo = spark.sparkContext.broadcast(los)
    val bhi = spark.sparkContext.broadcast(his)
    val partials = emb.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value; val lo = blo.value; val hi = bhi.value
        val ord = Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }
        val heaps = qs.map(q => q._1 -> scala.collection.mutable.PriorityQueue.empty(ord)).toMap
        it.foreach { case (id, v) =>
          var nrm = 0.0
          var i = 0
          while (i < v.length) { nrm += v(i).toDouble * v(i); i += 1 }
          nrm = math.sqrt(nrm)
          // SQ encode + dequantize (degenerate dims carry code 0 = lo)
          val deq = new Array[Double](v.length)
          i = 0
          while (i < v.length) {
            val code =
              if (hi(i) > lo(i))
                math.round((v(i).toDouble - lo(i)) * SqLevels.toDouble / (hi(i) - lo(i))).toDouble
              else 0.0
            deq(i) = lo(i) + code * (hi(i) - lo(i)) / SqLevels.toDouble
            i += 1
          }
          qs.foreach { case (qid, qv, qn) =>
            if (id != qid) {
              var s = 0.0
              var j = 0
              while (j < deq.length) { s += qv(j).toDouble * deq(j); j += 1 }
              val approx = round6(s / (qn * nrm))
              val h = heaps(qid)
              h.enqueue((approx, id))
              if (h.size > rerank) h.dequeue()
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (s, id) => (qid, id, s) }
        }
      }.toDF("qid", "vec_id", "approx")
    val wApprox = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("vec_id"))
    val cand = partials.withColumn("arn", row_number().over(wApprox))
      .where(col("arn") <= rerank).select("qid", "vec_id")
    val vecs = withNorm(emb)
    val scored = cand
      .join(vecs.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs, "vec_id")
      .withColumn("score",
        round(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6) + 0.0)
      .select("qid", "vec_id", "score")
    globalTopK(scored, k)
  }

  def annSq(spark: SparkSession, dir: String): DataFrame =
    sqTopK(Tables.embeddings(spark, dir))

  val annSqSql: String = s"""
    WITH $oracleVCte,
    n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM v),
    d AS (SELECT t.i AS i, n.v[t.i] AS x
          FROM n, UNNEST(generate_series(1, $OracleDim)) AS t(i)),
    mm0 AS (SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM d GROUP BY i),
    mm AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM mm0),
    enc AS (SELECT n.vec_id, n.nrm,
              list_transform(generate_series(1, $OracleDim),
                i -> CASE WHEN mm.his[i] > mm.los[i]
                     THEN ROUND((n.v[i] - mm.los[i]) * ${SqLevels}.0 / (mm.his[i] - mm.los[i]))
                     ELSE 0.0 END) AS code
            FROM n, mm),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
    approx AS (SELECT q.qid, e.vec_id,
                 ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
                   i -> q.qv[i] * (mm.los[i] + e.code[i] * (mm.his[i] - mm.los[i]) / ${SqLevels}.0)))
                   / (q.qn * e.nrm), 6) + 0.0 AS approx
               FROM q JOIN enc e ON e.vec_id != q.qid, mm),
    cand AS (SELECT qid, vec_id FROM (
               SELECT qid, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS arn
               FROM approx) WHERE arn <= $SqRerank),
    s AS (SELECT c.qid, c.vec_id,
            ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
              i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
          FROM cand c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vec_id),
    r AS (SELECT qid, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
          FROM s)
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
    FROM r WHERE rank <= $K ORDER BY qid, rank"""

  /** k-NN-graph beam search parameters: graph degree (each vector's
    * [[AnnGraphDegree]] nearest neighbors, then UNDIRECTED — in-links
    * double the effective fan-out, the NSW trick that random
    * high-dimensional data needs), seeded entry points (the smallest
    * non-query ids), expansion rounds, and a search beam wider than
    * the answer (HNSW's efSearch > k). The three search knobs are the
    * FLOORS of the adaptive geometry (see [[annGraphGeometry]]) —
    * small corpora keep this proven fixed point, larger ones grow
    * with log2 of the distinct count. Measured recall@10 vs brute
    * force: 0.975 at both gate corpora (spec-pinned ≥ 0.9).
    */
  val AnnGraphDegree = 12
  val AnnGraphEntries = 8
  val AnnGraphRounds = 4
  val AnnGraphBeam = 24

  /** Oracle unroll depth for the ADAPTIVE rounds: covers corpora to
    * 2^23 distinct vectors (rounds ≤ 8); a larger adaptive count
    * trips the oracle's loud -99 sentinel row instead of silently
    * comparing different search depths.
    */
  private val AnnGraphMaxUnroll = 8

  /** Adaptive index geometry (r17): entries / rounds / beam scale
    * with log2 of the DISTINCT corpus size — the navigable-small-world
    * diameter grows logarithmically, so a fixed geometry that is right
    * at 500 vectors starves at 200k (more hops to cross the graph,
    * more beam to survive local minima). `ilog` is the integer
    * floor(log2(dn)) via bit length — never an FP log, so both engines
    * compute the identical geometry — and each knob floors at the
    * fixed r16 point so small corpora keep their proven settings:
    * entries = max(8, ilog+1), rounds = max(4, ceil((ilog+1)/3)),
    * beam = max(24, 4·(ilog+1)). At dn=500 → (9, 4, 36); 12k →
    * (14, 5, 56); 200k → (18, 6, 72).
    */
  private[graft] def annGraphGeometry(dn: Long): (Int, Int, Int) = {
    require(dn > 0, "annGraphGeometry: empty corpus")
    val ilog = 63 - java.lang.Long.numberOfLeadingZeros(dn)
    (math.max(AnnGraphEntries, ilog + 1),
      math.max(AnnGraphRounds, (ilog + 3) / 3),
      math.max(AnnGraphBeam, 4 * (ilog + 1)))
  }

  /** Graph-based ANN (the NSW/HNSW-family shape — Malkov & Yashunin
    * 2016 — next to the IVF/PQ/LSH index families): collapse exact-
    * duplicate embeddings to their min-id representative (the dedup
    * family's standard collapse — a vector DB stores each distinct
    * point once), build the k-NN neighbor graph OVER THE DISTINCT
    * POINTS with the existing adaptive [[knnJoin]] machinery (exact
    * broadcast heaps under [[KnnBroadcastMaxRows]], LSH-bucketed
    * above), make it undirected, run a deterministic fixed-round beam
    * search per query — candidates = beam ∪ neighbors(beam), keep the
    * top-[[AnnGraphBeam]] by (6-dp cosine desc, vec_id) — then EXPAND
    * the final candidates back to duplicate members (identical vector
    * ⇒ identical score), drop the query itself, and return the top-k.
    *
    * The collapse is what keeps the index navigable on replicated
    * corpora: without it a 90%-duplicate corpus spends ~all of every
    * vertex's degree-k slots on its own copies (measured: recall 0.0
    * at the ×10 rung on BOTH the exact- and LSH-built graphs, at any
    * affordable beam geometry), while the collapsed graph carries only
    * real neighbors and restores the distinct-corpus recall at the
    * same fixed geometry.
    *
    * Scale shape: the collapse is one hash aggregation on the vector
    * key; the graph build is the knnJoin story (bucketed, never
    * all-pairs, distinct-n·k output). Each search round streams the
    * checkpointed edge and vector frames against BROADCAST beam /
    * candidate sets (queries × beam × degree rows — KBs), so the
    * per-round cost is a scan, not a shuffle, and the rounds are a
    * fixed driver loop like pagerank's. Determinism: rounded scores
    * with vec_id tie-breaks everywhere, so the oracle replays the
    * identical rounds as unrolled CTEs.
    */
  def graphBeamTopK(emb: DataFrame, k: Int = K,
      edgesOpt: Option[DataFrame] = None,
      degree: Int = AnnGraphDegree, entriesN: Int = -1,
      rounds: Int = -1, beamW: Int = -1): DataFrame = {
    val (members, reps) = collapseByEmbedding(emb)
    // non-positive search knobs resolve ADAPTIVELY from the distinct
    // count (the gate path); explicit values (fuzz, specs) win
    val (aE, aR, aB) = annGraphGeometry(reps.count())
    val eN = if (entriesN > 0) entriesN else aE
    val nRounds = if (rounds > 0) rounds else aR
    val bW = if (beamW > 0) beamW else aB
    val edges = edgesOpt.getOrElse(buildKnnGraph(reps, degree))
    val vecs = withNorm(reps).localCheckpoint()
    val q = withNorm(emb).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .localCheckpoint()
    val entries = vecs.where(col("vec_id") >= NumQueries)
      .select("vec_id").orderBy("vec_id").limit(eN)
    var beam = q.select("qid").crossJoin(broadcast(entries))
      .select(col("qid"), col("vec_id"))
    var scored: DataFrame = null
    for (_ <- 1 to nRounds) {
      // the query's own representative stays IN the candidate set (its
      // duplicate members are legitimate answers and its edges are the
      // best possible expansion frontier); the query row itself is
      // dropped after the member expansion below
      val cand = beam
        .unionAll(edges
          .join(broadcast(beam.select(col("vec_id").as("src"), col("qid"))), "src")
          .select(col("qid"), col("dst").as("vec_id")))
        .distinct()
      scored = vecs.join(broadcast(cand), "vec_id")
        .join(broadcast(q), "qid")
        .withColumn("score",
          round(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6) + 0.0)
        .select("qid", "vec_id", "score")
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
      beam = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= bW)
        .select("qid", "vec_id").localCheckpoint()
    }
    val expanded = scored
      .join(members.select(col("rep_id").as("vec_id"), col("vec_id").as("mid")), "vec_id")
      .select(col("qid"), col("mid").as("vec_id"), col("score"))
      .where(col("vec_id") =!= col("qid"))
    globalTopK(expanded, k)
  }

  /** Exact-duplicate collapse on the embedding key: (members, reps)
    * where members maps every vec_id to the min vec_id of its
    * identical-vector group and reps is one row per distinct vector.
    */
  private def collapseByEmbedding(emb: DataFrame): (DataFrame, DataFrame) = {
    val base = emb.select(col("vec_id").cast(LongType).as("vec_id"), col("embedding"))
    val members = base
      .join(base.groupBy("embedding").agg(min(col("vec_id")).as("rep_id")), "embedding")
      .select(col("vec_id"), col("rep_id")).localCheckpoint()
    val reps = base.join(
      members.where(col("vec_id") === col("rep_id")).select("vec_id"), "vec_id")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    (members, reps)
  }

  /** The undirected k-NN graph as a raw frame (the index build). */
  private def buildKnnGraph(emb: DataFrame,
      degree: Int = AnnGraphDegree): DataFrame = {
    val nn = knnJoin(emb, k = degree)
      .select(col("qid").as("src"), col("vec_id").as("dst"))
    nn.unionAll(nn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
  }

  /** Catalog-served undirected k-NN graph: the graph IS the ANN index
    * (a vector DB builds it once and serves queries against it — the
    * same load-once-query-many shape as the IVF centroids and the
    * derived graphs), so it lives in the Materialized catalog with the
    * memory + disk layers; Bench's cold passes record the build cost
    * explicitly (the ann_ prefix is in the cold op list).
    */
  private def knnGraphUndirected(spark: SparkSession, dir: String): DataFrame =
    graft.Materialized.ofDF(spark, dir, s"ann:knn-und-$AnnGraphDegree") {
      buildKnnGraph(collapseByEmbedding(Tables.embeddings(spark, dir))._2)
    }

  def annGraph(spark: SparkSession, dir: String): DataFrame =
    graphBeamTopK(Tables.embeddings(spark, dir),
      edgesOpt = Some(knnGraphUndirected(spark, dir)))

  /** Oracle: the exact knn graph from the all-pairs score CTE (the
    * gate corpora take [[knnJoin]]'s exact path), undirected, then the
    * beam rounds unrolled as MATERIALIZED CTE pairs — candidate
    * scores join back to the all-pairs CTE, so the engine's
    * graft_dot/round6 arithmetic is mirrored by the same list_sum
    * fold every other ann oracle uses.
    */
  /** Parameterized [[annGraph]] oracle (the fuzz family draws the
    * index geometry): the exact-duplicate collapse (GROUP BY the
    * double list, rep = min vec_id), the degree-`degree` knn graph
    * over the reps, `entriesN` entry points, `rounds` unrolled beam
    * rounds at width `beamW` (the query's own rep stays in the
    * candidate set, mirroring the engine), then the member expansion
    * minus the query itself and the final top-[[K]] cut.
    */
  def annGraphSqlAt(degree: Int, entriesN: Int, rounds: Int, beamW: Int): String = {
    def beamRound(i: Int): String =
      s"""c$i AS MATERIALIZED (SELECT DISTINCT qid, vec_id FROM (
         |    SELECT qid, vec_id FROM b${i - 1}
         |    UNION ALL
         |    SELECT b.qid, e.dst AS vec_id FROM b${i - 1} b JOIN e ON e.src = b.vec_id
         |  )),
         |s$i AS MATERIALIZED (SELECT c.qid, c.vec_id, sq.score
         |  FROM c$i c JOIN sq ON sq.qid = c.qid AND sq.dst = c.vec_id),
         |b$i AS MATERIALIZED (SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |    FROM s$i) WHERE rn <= $beamW)""".stripMargin
    val roundsSql = (1 to rounds).map(beamRound).mkString(",\n")
    s"""
    WITH $oracleVCte,
    rep AS MATERIALIZED (SELECT v, MIN(vec_id) AS rep_id FROM v GROUP BY v),
    mem AS MATERIALIZED (SELECT a.vec_id, r.rep_id FROM v a JOIN rep r ON r.v = a.v),
    n AS MATERIALIZED (SELECT r.rep_id AS vec_id, r.v,
            sqrt(list_sum(list_transform(r.v, x -> x * x))) AS nrm
          FROM rep r),
    sall AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst,
        ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
          i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) + 0.0 AS score
      FROM n a JOIN n b ON b.vec_id != a.vec_id),
    knn AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst,
          ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rn
        FROM sall) WHERE rn <= $degree),
    e AS MATERIALIZED (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
    qv AS MATERIALIZED (SELECT a.vec_id AS qid, a.v AS qv,
            sqrt(list_sum(list_transform(a.v, x -> x * x))) AS qn
          FROM v a WHERE a.vec_id < $NumQueries),
    sq AS MATERIALIZED (SELECT q.qid, n.vec_id AS dst,
        ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
          i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
      FROM qv q CROSS JOIN n),
    q AS (SELECT qid FROM qv),
    en AS (SELECT vec_id FROM n WHERE vec_id >= $NumQueries
           ORDER BY vec_id LIMIT $entriesN),
    b0 AS (SELECT q.qid, en.vec_id FROM q CROSS JOIN en),
    $roundsSql,
    exp AS (SELECT s.qid, m.vec_id, s.score
            FROM s$rounds s JOIN mem m ON m.rep_id = s.vec_id
            WHERE m.vec_id != s.qid)
    SELECT qid, CAST(rn AS BIGINT) AS rank, vec_id, score FROM (
      SELECT qid, vec_id, score,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
      FROM exp) WHERE rn <= $K
    ORDER BY qid, rank"""
  }

  /** ADAPTIVE-geometry oracle (the gate path): the search geometry is
    * computed IN SQL from the distinct count — ilog via bit length
    * (integer-exact, never an FP log), the same max/ceil formulas as
    * [[annGraphGeometry]] — the beam rounds are unrolled to
    * [[AnnGraphMaxUnroll]] with pass-through gating (round i > the
    * adaptive count copies the previous beam and the final scored set
    * selects exactly round `rounds`), and a -99 sentinel row fires
    * loudly if the adaptive count ever exceeds the unroll.
    */
  val annGraphSql: String = {
    def beamRound(i: Int): String =
      s"""c$i AS MATERIALIZED (SELECT DISTINCT qid, vec_id FROM (
         |    SELECT qid, vec_id FROM b${i - 1}
         |    UNION ALL
         |    SELECT b.qid, e.dst AS vec_id FROM b${i - 1} b JOIN e ON e.src = b.vec_id
         |  )),
         |s$i AS MATERIALIZED (SELECT c.qid, c.vec_id, sq.score
         |  FROM c$i c JOIN sq ON sq.qid = c.qid AND sq.dst = c.vec_id),
         |b$i AS MATERIALIZED (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |    FROM s$i)
         |  WHERE rn <= (SELECT beam FROM geo) AND $i <= (SELECT rounds FROM geo)
         |  UNION ALL
         |  SELECT qid, vec_id FROM b${i - 1} WHERE $i > (SELECT rounds FROM geo))""".stripMargin
    val roundsSql = (1 to AnnGraphMaxUnroll).map(beamRound).mkString(",\n")
    val finSql = (1 to AnnGraphMaxUnroll).map(i =>
      s"SELECT qid, vec_id, score FROM s$i WHERE (SELECT rounds FROM geo) = $i")
      .mkString("\n      UNION ALL ")
    s"""
    WITH $oracleVCte,
    rep AS MATERIALIZED (SELECT v, MIN(vec_id) AS rep_id FROM v GROUP BY v),
    mem AS MATERIALIZED (SELECT a.vec_id, r.rep_id FROM v a JOIN rep r ON r.v = a.v),
    n AS MATERIALIZED (SELECT r.rep_id AS vec_id, r.v,
            sqrt(list_sum(list_transform(r.v, x -> x * x))) AS nrm
          FROM rep r),
    geo AS (SELECT dn,
              GREATEST($AnnGraphEntries, ilog + 1) AS entries,
              GREATEST($AnnGraphRounds, (ilog + 3) // 3) AS rounds,
              GREATEST($AnnGraphBeam, 4 * (ilog + 1)) AS beam
            FROM (SELECT dn, length(bin(dn)) - 1 AS ilog
                  FROM (SELECT COUNT(*) AS dn FROM n))),
    sall AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst,
        ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
          i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) + 0.0 AS score
      FROM n a JOIN n b ON b.vec_id != a.vec_id),
    knn AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst,
          ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rn
        FROM sall) WHERE rn <= $AnnGraphDegree),
    e AS MATERIALIZED (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
    qv AS MATERIALIZED (SELECT a.vec_id AS qid, a.v AS qv,
            sqrt(list_sum(list_transform(a.v, x -> x * x))) AS qn
          FROM v a WHERE a.vec_id < $NumQueries),
    sq AS MATERIALIZED (SELECT q.qid, n.vec_id AS dst,
        ROUND(list_sum(list_transform(generate_series(1, $OracleDim),
          i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm), 6) + 0.0 AS score
      FROM qv q CROSS JOIN n),
    q AS (SELECT qid FROM qv),
    en AS (SELECT vec_id FROM (
             SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
             FROM n WHERE vec_id >= $NumQueries)
           WHERE rn <= (SELECT entries FROM geo)),
    b0 AS (SELECT q.qid, en.vec_id FROM q CROSS JOIN en),
    $roundsSql,
    fin AS MATERIALIZED (
      $finSql),
    exp AS (SELECT s.qid, m.vec_id, s.score
            FROM fin s JOIN mem m ON m.rep_id = s.vec_id
            WHERE m.vec_id != s.qid)
    SELECT qid, CAST(rn AS BIGINT) AS rank, vec_id, score FROM (
      SELECT qid, vec_id, score,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
      FROM exp) WHERE rn <= $K
    UNION ALL
    SELECT -99, -99, -99, -99.0 FROM geo WHERE rounds > $AnnGraphMaxUnroll
    ORDER BY qid, rank"""
  }

  def ops: Seq[Op] = Seq(
    Op("ann_graph", annGraph, Some(annGraphSql)),
    Op("ann_sq", annSq, Some(annSqSql)),
    Op("ann_topk_bruteforce", annTopkBruteforce, Some(annTopkBruteforceSql)),
    Op("ann_ivf", annIvf, Some(annIvfSql)),
    Op("ann_lsh", annLsh, Some(annLshSql)),
    Op("ann_pq", annPq, Some(annPqSql)),
    Op("ann_opq", annOpq, Some(annOpqSql)),
    Op("ann_ivfpq", annIvfPq, Some(annIvfPqSql)),
    Op("ann_range", annRange, Some(annRangeSql)),
    Op("ann_knn_join", annKnnJoin, Some(annKnnJoinSql)),
    Op("ann_mips", annMips, Some(annMipsSql)),
    Op("ann_hybrid", annHybrid, Some(annHybridSql)),
    Op("ann_mmr", annMmr, Some(annMmrSql)),
  )
}
