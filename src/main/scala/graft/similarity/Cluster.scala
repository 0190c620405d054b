package graft.similarity

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Distributed k-means over the `embeddings` table (Lloyd's
  * algorithm) and SemDeDup-style semantic deduplication (cluster
  * first, then near-dup detection within clusters only — Abbas et
  * al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540).
  *
  * k-means is the trainer the ANN family's IVF index assumes — the
  * IVF/IVF-PQ coarse quantizer routes through [[lloydCentroids]] at
  * k = [[graft.similarity.Ann.IvfCells]] (trained means, normalized
  * to unit directions for cosine routing) — and
  * cluster-then-dedup is the second of the two production semantic
  * dedup shapes next to [[graft.dedup.Dedup.embeddingDupSummary]]'s
  * LSH blocks: clustering bounds the candidate set by partition
  * rather than by hash collision.
  *
  * Scale design: each Lloyd iteration is one narrow scan — the
  * assignment is a per-row codegen'd argmin that dispatches on k
  * ([[MatrixPathK]]): at gate k, k literal structs + `array_min`; at
  * corpus-tracking k (k = n/2048 ⇒ ~500k at 1B vectors, where k
  * literal expressions would blow the JVM codegen limits), ONE packed
  * centroid-matrix literal consumed by the constant-size
  * [[graft.functions.CentroidArgMin]] primitive loop — the matrix
  * ships once per stage in the torrent-broadcast task binary and
  * unpacks once per executor JVM. The centroid update is a
  * `posexplode` + `groupBy(cluster, dim)` whose partial aggregation
  * reduces every partition to k×d rows before the shuffle, collected
  * as k packed rows. Driver state is exactly the k×d centroid
  * matrix — the same contract as any production distributed k-means.
  * k grows with the corpus (`kFor`) so per-cluster candidate work in
  * the dedup stays bounded at any scale; both assignment paths are
  * spec-pinned output-identical (ClusterSpec), and the Lloyd training
  * for the gate ops is served from the [[graft.Materialized]] catalog
  * (train once per (session, dir, corpus-version)).
  *
  * Cross-engine determinism (the oracle hash gate): centroid means
  * are decimal-exact sums (order-independent) cast to double, then
  * 6-dp-rounded, so both engines iterate over bit-identical
  * centroids; distances fold in index order on both sides
  * (`graft_dot` / DuckDB `list_sum`) and are 6-dp-rounded before
  * the (dist, cluster-id) argmin tie-break.
  */
object Cluster {

  /** Gate cluster count (floor) and the per-cluster size target that
    * scales k with the corpus.
    */
  val K = 8
  val TargetClusterSize = 2048L

  /** Lloyd iterations for the gate ops: 2 full assign+update rounds,
    * then a final assignment under the iteration-2 centroids.
    */
  val Iters = 2

  /** Literal-path cap for the assignment. At or below this k the
    * assignment is k literal struct expressions (`array_min` argmin —
    * fastest at gate k, fully inside whole-stage codegen); above it,
    * the generated projection would grow O(k·d) and fall out of the
    * JVM's 64KB method / codegen limits (fatal once k tracks the
    * corpus: k = n/2048 ⇒ k ≈ 500k at 1B vectors), so assignment
    * switches to the single `graft_argmin` expression consuming ONE
    * packed centroid-matrix literal — constant-size codegen, per-JVM
    * primitive unpack, same output bit-for-bit (ClusterSpec pins the
    * equivalence; a k ≥ 10⁴ smoke run pins survival).
    */
  val MatrixPathK = 1024

  /** k for an n-vector corpus: n/2048 clusters, floor [[K]] — keeps
    * the within-cluster pairwise dedup stage ~O(n × 2048) no matter
    * how large the corpus grows.
    */
  def kFor(n: Long): Int = math.max(K, math.ceil(n / TargetClusterSize.toDouble).toInt)

  /** Squared-L2 distance to one centroid as |v|² − 2·v·c + |c|²:
    * `graft_dot` keeps the per-row work inside whole-stage codegen
    * (a higher-order `aggregate(zip_with(...))` would drop the whole
    * projection to interpreted eval), and |c|² folds once on the
    * driver. The oracle mirrors the exact float op order
    * ((nrm·nrm − 2·dot) + c2, each sum folding in index order).
    */
  private def dist2To(cv: Array[Double]): Column = {
    val carr = array(cv.toIndexedSeq.map(lit(_)): _*)
    var c2 = 0.0
    var i = 0
    while (i < cv.length) { c2 += cv(i) * cv(i); i += 1 }
    col("nrm") * col("nrm") - lit(2.0) * call_function("graft_dot", col("v"), carr) + lit(c2)
  }

  /** Assignment pass: cluster = argmin over centroids of the
    * 6-dp-rounded squared distance, ties to the lower cluster id.
    * Input needs (v, nrm); adds (cluster, d2). Dispatches on k — see
    * [[MatrixPathK]]; both paths are output-identical by contract.
    */
  private[graft] def assigned(vecs: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame =
    if (cents.size <= MatrixPathK) assignedLiteral(vecs, cents)
    else assignedMatrix(vecs, cents)

  /** Gate-k path: k literal structs, `array_min` compares (d, c)
    * lexicographically.
    */
  private[graft] def assignedLiteral(vecs: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame = {
    val structs = cents.map { case (cid, cv) =>
      struct(round(dist2To(cv), 6).as("d"), lit(cid).as("c"))
    }
    vecs.withColumn("asg", array_min(array(structs: _*)))
      .withColumn("cluster", col("asg.c"))
      .withColumn("d2", col("asg.d"))
      .drop("asg")
  }

  /** Scale-k path: the whole centroid matrix as ONE packed literal
    * (shipped once per stage in the torrent-broadcast task binary —
    * a broadcast variable in effect, not k expression nodes) consumed
    * by the constant-size [[graft.functions.CentroidArgMin]] loop.
    */
  private[graft] def assignedMatrix(vecs: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame = {
    val sorted = cents.sortBy(_._1)
    val mat: Column = typedlit(sorted.map(_._2.toSeq))
    val ids: Column = typedlit(sorted.map(_._1))
    vecs.withColumn("asg", call_function("graft_argmin", mat, ids, col("v"), col("nrm")))
      .withColumn("cluster", col("asg.c"))
      .withColumn("d2", col("asg.d"))
      .drop("asg")
  }

  /** Centroid update: per-(cluster, dim) mean, decimal-exact then
    * 6-dp-rounded so the result is independent of partial-aggregation
    * order and engine. The driver receives exactly the k×d centroid
    * matrix — the irreducible state of single-level Lloyd — packed as
    * k rows of dim-sorted arrays (a second tiny k×d→k shuffle) rather
    * than k×d individual Rows, so the per-row object overhead doesn't
    * multiply the matrix's footprint at corpus-tracking k. Clusters
    * that lost every member simply vanish (k shrinks), matching the
    * SQL formulation's GROUP BY.
    */
  private def updated(assignedVecs: DataFrame): Seq[(Int, Array[Double])] = {
    val rows = assignedVecs
      .select(col("cluster"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cluster"), col("i"))
      .agg(round(sum(col("x").cast(DecimalType(27, 10))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType), 6).as("m"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ms"))
      .collect()
    rows.map { r =>
      (r.getInt(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toArray)
    }.sortBy(_._1)
  }

  /** Lloyd loop: init = the k lowest-vec_id vectors (cluster id =
    * rank), `iters` assign+update rounds; returns the final centroid
    * matrix (driver state: k×d doubles).
    */
  private[graft] def lloydCentroids(vecs: DataFrame, k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    var cents: Seq[(Int, Array[Double])] =
      vecs.orderBy("vec_id").limit(k).collect().toSeq.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](r.fieldIndex("v")).toArray)
      }
    var it = 0
    while (it < iters) {
      cents = updated(assigned(vecs, cents))
      it += 1
    }
    cents
  }

  /** (vec_id, v, nrm) with the iteration input pinned in block
    * storage: the Lloyd loop scans it 2×iters+1 times.
    */
  private def normed(emb: DataFrame): DataFrame =
    Ann.withNorm(emb).select("vec_id", "v", "nrm").localCheckpoint()

  /** Session-scoped catalog entries ([[graft.Materialized]], same
    * (dir, version) keying as the dedup collapse and derived graphs):
    * the normed iteration input and the TRAINED centroids. Lloyd
    * training is the dominant repeated cost of the cluster family's
    * cold path (2×iters scans + k×d driver matrices per touch) and
    * its output is a pure function of the corpus — train once per
    * (session, dir, corpus-version), serve every later touch.
    * Generic-DataFrame callers ([[semanticDupSummary]] on arbitrary
    * frames) still train per call, unaffected.
    */
  private[similarity] def embNormed(spark: SparkSession, dir: String): DataFrame =
    graft.Materialized.ofDF(spark, dir, "cluster:normed") {
      normed(Tables.embeddings(spark, dir)
        .select(col("vec_id").cast(LongType).as("vec_id"), col("embedding")))
    }

  private def kmeansCentroids(spark: SparkSession, dir: String): Seq[(Int, Array[Double])] =
    graft.Materialized.ofBlob(spark, dir, "cluster:kmeans-cents") {
      lloydCentroids(embNormed(spark, dir), K, Iters)
    }

  private def semanticCentroids(spark: SparkSession, dir: String): Seq[(Int, Array[Double])] =
    graft.Materialized.ofBlob(spark, dir, "cluster:semantic-cents") {
      val vecs = embNormed(spark, dir)
      lloydCentroids(vecs, kFor(vecs.count()), Iters)
    }

  /** Gate op: 2-iteration k-means (k=8) over the embeddings; output
    * is the final per-vector assignment with its rounded squared
    * distance — the artifact an IVF build consumes as cell ids.
    */
  def annKmeans(spark: SparkSession, dir: String): DataFrame =
    assigned(embNormed(spark, dir), kmeansCentroids(spark, dir))
      .select(col("vec_id"), col("cluster"), col("d2").as("dist2"))
      .orderBy("vec_id")

  /** Embedding dimensionality baked into the oracle SQL only (the
    * operators are dim-agnostic: centroid arrays inherit the data's
    * length). Guarded like the ANN oracles: a dim drift hard-fails
    * via DuckDB `error()` instead of silently truncating the baked
    * `generate_series` dot products.
    */
  private val OracleDim = 64

  private def oracleNCte: String =
    s"""v AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings
       |      WHERE CASE WHEN len(embedding) = $OracleDim THEN TRUE
       |        ELSE len(error('oracle expects dim $OracleDim, got '
       |                       || CAST(len(embedding) AS VARCHAR))) >= 0
       |        END),
       |n AS (SELECT vec_id, v,
       |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |      FROM v)""".stripMargin

  /** The Lloyd CTE chain: c0 (init by vec_id rank) and, per round t,
    * s_t (rounded distances) / a_t (argmin assignment) / c_t
    * (decimal-exact rounded means), ending in the final assignment
    * `af` against c_iters. `kLimit` is a SQL expression (literal or
    * scalar subquery) bounding the init rank.
    */
  private[similarity] def lloydCtes(kLimit: String, iters: Int,
      vTable: String = "v", nTable: String = "n"): String = {
    def sCte(name: String, cents: String): String =
      s"""$name AS (SELECT a.vec_id, c.c,
         |        ROUND(a.nrm * a.nrm
         |              - 2.0 * list_sum(list_transform(generate_series(1, $OracleDim),
         |                  i -> a.v[i] * c.cv[i]))
         |              + list_sum(list_transform(c.cv, x -> x * x)), 6) AS d
         |      FROM $nTable a CROSS JOIN $cents c)""".stripMargin
    def aCte(name: String, s: String): String =
      s"""$name AS (SELECT vec_id, c AS cluster, d FROM (
         |        SELECT vec_id, c, d,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |        FROM $s) WHERE rn = 1)""".stripMargin
    def cCte(name: String, a: String): String =
      s"""$name AS (SELECT cluster AS c, list(m ORDER BY i) AS cv FROM (
         |        SELECT x.cluster, gs.i,
         |          ROUND(CAST(SUM(CAST(a.v[gs.i] AS DECIMAL(27, 10))) AS DOUBLE)
         |                / COUNT(*), 6) AS m
         |        FROM $a x JOIN $vTable a USING (vec_id)
         |        CROSS JOIN generate_series(1, $OracleDim) AS gs(i)
         |        GROUP BY x.cluster, gs.i) GROUP BY cluster)""".stripMargin
    val init =
      s"""c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
         |        v AS cv
         |      FROM $vTable QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= $kLimit)""".stripMargin
    val rounds = (1 to iters).map { t =>
      Seq(sCte(s"s$t", s"c${t - 1}"), aCte(s"a$t", s"s$t"), cCte(s"c$t", s"a$t"))
        .mkString(",\n")
    }
    (Seq(init) ++ rounds ++ Seq(sCte("sf", s"c$iters"), aCte("af", "sf"))).mkString(",\n")
  }

  val annKmeansSql: String = s"""
    WITH $oracleNCte,
    ${lloydCtes(K.toString, Iters)}
    SELECT vec_id, cluster, d AS dist2 FROM af ORDER BY vec_id"""

  /** SemDeDup: cluster the corpus (k = [[kFor]](n), so per-cluster
    * size targets ~2048 at any scale), then count, per vector, the
    * lower-vec_id vectors IN ITS CLUSTER with cosine ≥ τ — kept ⇔
    * that count is 0. Identical to
    * [[graft.dedup.Dedup.embeddingDupSummary]]'s contract except the
    * candidate scope: the cluster partition replaces LSH blocks, so
    * recall within a cluster is exact and cross-cluster near-dups are
    * out of contract (the SemDeDup trade).
    *
    * Scale shape: exact-duplicate collapse first (the family idiom —
    * identical vectors share every distance, so only distinct
    * vectors run Lloyd's final assignment and the within-cluster
    * pairwise stage); identical-copy priors come from rank
    * arithmetic over the collapse window, gated by the exact
    * self-pair predicate so a zero vector's NaN cosine keeps its
    * engine-consistent "NaN ≥ τ" verdict. The pairwise stage
    * shuffles reps by cluster id; with k = n/2048 the per-cluster
    * work is ~2048²/2 pairs regardless of corpus size.
    */
  def semanticDupSummary(emb0: DataFrame, tau: Double = graft.dedup.Dedup.CosTau): DataFrame = {
    val emb = emb0.select(col("vec_id").cast(LongType).as("vec_id"), col("embedding"))
    val vecs = normed(emb)
    val k = kFor(vecs.count())
    semanticSummaryWith(emb, vecs, lloydCentroids(vecs, k, Iters), tau)
  }

  /** The post-training half of [[semanticDupSummary]]: collapse,
    * rep-level assignment under the given centroids, within-cluster
    * pairing, expansion. Split out so the gate op can serve cataloged
    * centroids while generic callers train inline.
    */
  private def semanticSummaryWith(emb: DataFrame, vecs: DataFrame,
      cents: Seq[(Int, Array[Double])], tau: Double): DataFrame = {
    val wg = Window.partitionBy(col("embedding"))
    val m = emb
      .withColumn("rep_id", min("vec_id").over(wg))
      .withColumn("n_ident_prior",
        (row_number().over(wg.orderBy(col("vec_id"))) - 1).cast(LongType))
      .select("vec_id", "rep_id", "n_ident_prior")
      .localCheckpoint()
    val repVecs = vecs.join(
      m.where(col("vec_id") === col("rep_id")).select("vec_id"), "vec_id")
    // reps carry their members' cluster: assignment is a pure
    // function of the vector, so one rep-level pass covers the group
    val withC = assigned(repVecs, cents)
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
      .localCheckpoint()
    val selfPair = withC.select(col("vec_id").as("rep_id"),
      (cosOrNaN(call_function("graft_dot", col("v"), col("v")),
        col("nrm") * col("nrm")) >= tau).as("self_dup"))
    val repPairs = withC
      .select(col("cluster"), col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
      .join(withC.select(col("cluster"), col("vec_id").as("ib"),
        col("v").as("vb"), col("nrm").as("nb")), "cluster")
      .where(col("ia") < col("ib"))
      .where(cosOrNaN(call_function("graft_dot", col("va"), col("vb")),
        col("na") * col("nb")) >= tau)
      .select("ia", "ib")
      .localCheckpoint() // consumed twice by the union below
    val sim = repPairs.select(col("ia").as("g"), col("ib").as("h"))
      .unionAll(repPairs.select(col("ib").as("g"), col("ia").as("h")))
    val crossCnt = sim
      .join(m.select(col("rep_id").as("g"), col("vec_id").as("vv")), "g")
      .join(m.select(col("rep_id").as("h"), col("vec_id").as("u")), "h")
      .where(col("u") < col("vv"))
      .groupBy(col("vv").as("vec_id")).agg(count(lit(1)).as("cc"))
    m.join(selfPair, "rep_id")
      .join(withC.select(col("vec_id").as("rep_id"), col("cluster")), "rep_id")
      .join(crossCnt, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        (when(col("self_dup"), col("n_ident_prior")).otherwise(lit(0L)) +
          coalesce(col("cc"), lit(0L))).as("n_prior_dups"))
      .withColumn("kept", col("n_prior_dups") === 0L)
      .orderBy("vec_id")
  }

  /** 0/0 cosine as an explicit NaN: ANSI mode makes even DOUBLE
    * division by zero throw, but the zero-vector contract (NaN, which
    * both engines compare as greater than any threshold) is the
    * faithful one — see [[graft.dedup.Dedup.embeddingDupSummary]].
    */
  private def cosOrNaN(dot: Column, denom: Column): Column =
    when(denom === lit(0.0), lit(Double.NaN)).otherwise(dot / denom)

  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast(LongType).as("vec_id"), col("embedding"))
    semanticSummaryWith(emb, embNormed(spark, dir), semanticCentroids(spark, dir),
      graft.dedup.Dedup.CosTau)
  }

  /** Oracle: the uncollapsed formulation — Lloyd over every vector,
    * then all pairs within a cluster. The Spark side's collapse is
    * exactly faithful (assignment and cosine are pure functions of
    * the vector), so the hash gate compares collapsed vs uncollapsed
    * for free.
    */
  val dedupSemanticSql: String = s"""
    WITH $oracleNCte,
    kk AS (SELECT GREATEST($K, CAST(CEIL(COUNT(*) / $TargetClusterSize.0) AS INTEGER)) AS k
           FROM v),
    ${lloydCtes("(SELECT k FROM kk)", Iters)},
    p AS (SELECT fa.vec_id AS ia, fb.vec_id AS ib
          FROM af fa JOIN af fb
            ON fa.cluster = fb.cluster AND fa.vec_id < fb.vec_id
          JOIN n a ON a.vec_id = fa.vec_id
          JOIN n b ON b.vec_id = fb.vec_id
          WHERE (CASE WHEN a.nrm * b.nrm = 0 THEN 'NaN'::DOUBLE
                 ELSE list_sum(list_transform(generate_series(1, $OracleDim),
                        i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) END)
                >= ${graft.dedup.Dedup.CosTau}),
    d AS (SELECT ib, COUNT(*) AS c FROM p GROUP BY 1)
    SELECT e.vec_id, af.cluster,
      CAST(COALESCE(d.c, 0) AS BIGINT) AS n_prior_dups,
      COALESCE(d.c, 0) = 0 AS kept
    FROM v e
    JOIN af ON af.vec_id = e.vec_id
    LEFT JOIN d ON d.ib = e.vec_id
    ORDER BY e.vec_id"""

  def ops: Seq[Op] = Seq(
    Op("ann_kmeans", annKmeans, Some(annKmeansSql)),
    Op("dedup_semantic", dedupSemantic, Some(dedupSemanticSql)),
  )
}
