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
  * == Training scale shape (r20) ==
  *
  * The r19 trainer ran full-corpus Lloyd at corpus-tracking
  * k = n/2048 — an O(n·k·d) = O(n²·d/2048) assignment per iteration,
  * the one train path left with super-linear asymptotics (VERDICT r19
  * #1). r20 applies the same treatment ann_opq got in r19 (production
  * k-means — FAISS trains on ≤ max_points_per_centroid·k sampled
  * vectors, never the corpus):
  *
  *  - '''flat path''' (k ≤ [[HierK]]): ONE distributed TakeOrdered
  *    draws the [[SampleFactor]]·k lowest rows in
  *    `(md5('sem:'||vec_id), vec_id)` order — the q_train_split
  *    salted-hash draw both engines compute identically — and Lloyd
  *    runs DRIVER-side over the collected ≤ 64·64-row sample in
  *    oracle-exact decimals ([[lloydDriverCentroids]]). The corpus is
  *    touched once more by the final serve assignment. The DuckDB
  *    oracle replays the sample draw and the driver rounds verbatim
  *    (sampling ACTIVE whenever n > 64·k).
  *  - '''hierarchical path''' (k > [[HierK]] — the corpus-tracking
  *    regime, k = n/2048 ⇒ ~500k at 1B vectors): two-level k-means.
  *    √k coarse cells are trained from a bounded sample exactly as
  *    above; ONE distributed O(n·√k·d) pass assigns the corpus to
  *    cells and sizes each cell's sub-k (k2 = ⌈cell/2048⌉, so the
  *    per-cluster dedup bound is preserved adaptively); per-cell
  *    Lloyd then runs DISTRIBUTED over per-cell bounded samples only
  *    (Σ 64·k2 ≈ 64·k rows total — never the corpus, never a driver
  *    collect), with the same order-free decimal means
  *    ([[hierSubCentroids]]). Serving is coarse argmin (√k
  *    codegen'd literals) + a per-cell sub-argmin over a BROADCAST
  *    join keyed by cell — per-row state is k2·d ≈ √k·d, and the
  *    k×d sub-centroid relation rides in a broadcast hash relation,
  *    not a plan literal. End-to-end: training O(√k·d) driver work +
  *    one O(n·√k·d) corpus pass; assignment O(n·√k·d) — linear in
  *    the corpus at fixed cluster-size target, vs r19's quadratic.
  *
  * Scale design of the underlying Lloyd machinery (shared by
  * ann_kmeans, which keeps full-corpus training at FIXED gate k = 8 —
  * O(n·8·d), already linear): each iteration is one narrow scan — the
  * assignment is a per-row codegen'd argmin that dispatches on k
  * ([[MatrixPathK]]): at gate k, k literal structs + `array_min`; at
  * large k, ONE packed centroid-matrix literal consumed by the
  * constant-size [[graft.functions.CentroidArgMin]] primitive loop.
  * The centroid update is a `posexplode` + `groupBy(cluster, dim)`
  * whose partial aggregation reduces every partition to k×d rows
  * before the shuffle.
  *
  * Cross-engine determinism (the oracle hash gate): centroid means
  * are decimal-exact sums (order-independent) cast to double, then
  * 6-dp-rounded, so both engines iterate over bit-identical
  * centroids; distances fold in index order on both sides
  * (`graft_dot` / DuckDB `list_sum`) and are 6-dp-rounded before
  * the (dist, cluster-id) argmin tie-break. The driver-side trainer
  * reproduces both bit-for-bit ([[lloydDriverCentroids]] — spec-pinned
  * equal to the distributed Lloyd when the sample covers the corpus).
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

  /** Training-sample rows per centroid (FAISS's
    * max_points_per_centroid is 256; 64 is far above k-means
    * statistical need at these dims and keeps the flat-path collect
    * ≤ 64·[[HierK]] rows by construction).
    */
  val SampleFactor = 64

  /** Above this k the trainer switches to the two-level hierarchical
    * path: a flat sample of 64·k rows stops being a bounded driver
    * collect once k tracks the corpus. All gate/ladder corpora up to
    * sf3 sit at k ≤ 30; sf10 (k = 98) exercises the hierarchy.
    */
  val HierK = 64

  /** Literal-path cap for the assignment. At or below this k the
    * assignment is k literal struct expressions (`array_min` argmin —
    * fastest at gate k, fully inside whole-stage codegen); above it,
    * the generated projection would grow O(k·d) and fall out of the
    * JVM's 64KB method / codegen limits, so assignment switches to the
    * single `graft_argmin` expression consuming ONE packed
    * centroid-matrix literal — constant-size codegen, per-JVM
    * primitive unpack, same output bit-for-bit (ClusterSpec pins the
    * equivalence; a k ≥ 10⁴ smoke run pins survival).
    */
  val MatrixPathK = 1024

  /** k for an n-vector corpus: n/2048 clusters, floor [[K]] — keeps
    * the within-cluster pairwise dedup stage ~O(n × 2048) no matter
    * how large the corpus grows.
    */
  def kFor(n: Long): Int = math.max(K, math.ceil(n / TargetClusterSize.toDouble).toInt)

  /** Coarse cell count of the hierarchical path: √k cells × ~√k
    * sub-centroids per cell ⇒ O(n·√k·d) assignment at every level.
    */
  private[graft] def coarseKFor(k: Int): Int =
    math.ceil(math.sqrt(k.toDouble)).toInt

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
    * multiply the matrix's footprint at large k. Clusters that lost
    * every member simply vanish (k shrinks), matching the SQL
    * formulation's GROUP BY.
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
    * matrix (driver state: k×d doubles). Full-corpus training — the
    * right shape only at FIXED k (ann_kmeans' k = 8: O(n·8·d)); the
    * corpus-tracking-k semantic trainer routes through
    * [[sampledCentroids]] / [[hierSubCentroids]] instead.
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

  // ------------------------------------------------------------------
  // Sample-bounded training (r20)
  // ------------------------------------------------------------------

  /** Spark's `round(x, 6)` on DOUBLE, exactly (NaN/Inf pass through). */
  private def round6d(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's `CAST(x AS DECIMAL(27,10))` (HALF_UP to 10 dp). */
  private def dec10(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x).setScale(10, java.math.RoundingMode.HALF_UP))

  /** The engines' decimal→double bridge at these magnitudes: the sums
    * are exactly representable (unscaled < 2⁵³ for ≤ 64·64 sample rows
    * of |x| ≲ 10 at scale 10), so double(unscaled)/10¹⁰ equals both
    * Spark's Decimal.toDouble and DuckDB's CAST(DECIMAL AS DOUBLE)
    * bit-for-bit (the [[OpqTrain]] bridge, verified there at s=18).
    */
  private def decToDouble(x: BigDecimal): Double =
    x.underlying.setScale(10).unscaledValue.doubleValue / 1e10

  /** Spark SQL double ordering `a < b`: NaN greatest, NaN = NaN, ±0
    * equal.
    */
  private def dLess(a: Double, b: Double): Boolean =
    if (a < b) true
    else if (a > b || a == b) false
    else !java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)

  /** Deterministic bounded sample: the `s` lowest rows of the corpus
    * in `(md5(salt || vec_id), vec_id)` order — one distributed
    * TakeOrdered at any corpus size, the q_train_split salted-hash
    * draw both engines compute identically (the [[OpqTrain]] r19
    * recipe; the oracle replays it as a ROW_NUMBER window).
    */
  private[graft] def semSample(vecs: DataFrame, s: Int, salt: String): DataFrame =
    vecs.withColumn("h",
        md5(concat(lit(salt), col("vec_id").cast(StringType)).cast(BinaryType)))
      .orderBy(col("h"), col("vec_id"))
      .limit(s)
      .drop("h")

  /** Driver-side Lloyd over a collected sample, in the oracle's exact
    * arithmetic: init = the k lowest-vec_id sample rows (id = rank);
    * per round, assignment = argmin over 6-dp-rounded
    * ((nrm² − 2·dot) + c2) with dot/c2 folding in index order, ties to
    * the lower id; update = per-(cluster, dim) mean of DECIMAL(27,10)
    * sums through the decimal→double bridge, 6-dp-rounded. Empty
    * clusters vanish. Bit-identical to [[lloydCentroids]] +
    * [[updated]] on the same rows (spec-pinned) and to the oracle's
    * [[lloydCtes]] replay.
    */
  private[graft] def lloydDriverCentroids(rows: Array[(Long, Array[Double], Double)],
      k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    val sorted = rows.sortBy(_._1)
    var cents: Seq[(Int, Array[Double])] =
      sorted.take(k).zipWithIndex.map { case ((_, v, _), i) => (i, v.clone()) }.toSeq
    var it = 0
    while (it < iters) {
      val dim = sorted(0)._2.length
      val c2s = cents.map { case (_, cv) =>
        var s = 0.0; var i = 0
        while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
        s
      }
      val sums = scala.collection.mutable.LinkedHashMap[Int, Array[BigDecimal]]()
      val counts = scala.collection.mutable.LinkedHashMap[Int, Long]()
      sorted.foreach { case (_, v, nrm) =>
        var bestC = -1
        var bestD = 0.0
        var j = 0
        while (j < cents.length) {
          val cv = cents(j)._2
          var dot = 0.0; var i = 0
          val n = math.min(v.length, cv.length)
          while (i < n) { dot += v(i) * cv(i); i += 1 }
          val d = round6d((nrm * nrm - 2.0 * dot) + c2s(j))
          if (bestC < 0 || dLess(d, bestD)) { bestD = d; bestC = cents(j)._1 }
          j += 1
        }
        val acc = sums.getOrElseUpdate(bestC, Array.fill(dim)(BigDecimal(0)))
        var i = 0
        while (i < dim) { acc(i) += dec10(v(i)); i += 1 }
        counts(bestC) = counts.getOrElse(bestC, 0L) + 1L
      }
      cents = cents.collect { case (cid, _) if counts.contains(cid) =>
        val acc = sums(cid); val cnt = counts(cid).toDouble
        (cid, Array.tabulate(dim)(i => round6d(decToDouble(acc(i)) / cnt)))
      }
      it += 1
    }
    cents
  }

  /** Flat sample-trained centroids: one TakeOrdered draw of
    * `sampleFactor`·k rows, then [[lloydDriverCentroids]]. The collect
    * is ≤ 64·[[HierK]] rows by construction on the gate path (k ≤
    * [[HierK]] here); when the sample covers the corpus (n ≤ 64·k,
    * true at the sf0.01 gate) the result is bit-identical to the
    * full-corpus distributed Lloyd.
    */
  private[graft] def sampledCentroids(vecs: DataFrame, k: Int,
      sampleFactor: Int = SampleFactor): Seq[(Int, Array[Double])] = {
    val rows = semSample(vecs, sampleFactor * k, "sem:")
      .select("vec_id", "v", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    lloydDriverCentroids(rows, k, Iters)
  }

  /** Hierarchical level 2: per-coarse-cell sub-centroids, trained
    * DISTRIBUTED over per-cell bounded samples.
    *
    * One O(n·k1·d) corpus pass assigns cells; per-cell k2 =
    * ⌈cell_count / target⌉ keeps the dedup stage's per-cluster bound
    * adaptive to real cell sizes (Σ k2 ≈ k). The per-cell sample is a
    * row_number window over `(md5('sem2:'||vec_id), vec_id)` within
    * the cell (≤ sampleFactor·k2 rows each, Σ ≈ 64·k total — the only
    * rows Lloyd ever touches; nothing is collected to the driver but
    * the k1-row count table). Sub-assignment joins the ≤k-row centroid
    * frame broadcast by cell; means are the same order-free
    * DECIMAL(27,10)→round-6 recipe as [[updated]]. Returns
    * (cell, cluster, cv) with dense global cluster ids
    * (offset(cell) + sub-rank).
    */
  private[graft] def hierSubCentroids(vecs: DataFrame, coarse: Seq[(Int, Array[Double])],
      target: Long = TargetClusterSize, sampleFactor: Int = SampleFactor,
      iters: Int = Iters): DataFrame = {
    val spark = vecs.sparkSession
    val withCell = assigned(vecs, coarse)
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster").as("cell"))
    val k2Rows = withCell.groupBy("cell")
      .agg((((count(lit(1)) + lit(target - 1)) / lit(target)).cast(IntegerType)).as("k2"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    // dense global ids: offset(cell) = Σ_{c<cell} k2_c (model-sized
    // driver state: one int per coarse cell)
    var cum = 0
    val offRows = k2Rows.map { case (c, k2) => val o = cum; cum += k2; (c, k2, o) }
    val k2Df = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toIndexedSeq, 1))
      .toDF("cell", "k2", "off"))
    val ws = Window.partitionBy(col("cell")).orderBy(
      md5(concat(lit("sem2:"), col("vec_id").cast(StringType)).cast(BinaryType)),
      col("vec_id"))
    val sampled = withCell.join(k2Df, "cell")
      .withColumn("rn", row_number().over(ws))
      .where(col("rn") <= col("k2") * sampleFactor)
      .select("cell", "vec_id", "v", "nrm", "k2")
      .localCheckpoint()
    val wi = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
    var cents = sampled.withColumn("r", row_number().over(wi))
      .where(col("r") <= col("k2"))
      .select(col("cell"), (col("r") - 1).cast(IntegerType).as("sub"), col("v").as("cv"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val asg = sampled.join(
          broadcast(cents.withColumn("c2", call_function("graft_dot", col("cv"), col("cv")))),
          "cell")
        .withColumn("d", round(col("nrm") * col("nrm")
          - lit(2.0) * call_function("graft_dot", col("v"), col("cv")) + col("c2"), 6))
        .groupBy(col("cell"), col("vec_id"))
        .agg(min(struct(col("d"), col("sub"))).as("a"), first(col("v")).as("v"))
      cents = asg
        .select(col("cell"), col("a.sub").as("sub"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cell"), col("sub"), col("i"))
        .agg(round(sum(col("x").cast(DecimalType(27, 10))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("m"))
        .groupBy(col("cell"), col("sub"))
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ms"))
        .select(col("cell"), col("sub"),
          transform(col("ms"), s => s("m")).as("cv"))
        .localCheckpoint()
      it += 1
    }
    cents.join(k2Df, "cell")
      .select(col("cell"), (col("off") + col("sub")).cast(IntegerType).as("cluster"),
        col("cv"))
      .localCheckpoint()
  }

  /** Hierarchical serve: coarse argmin (≤√k codegen'd literals), then
    * the row's cell's sub-centroids via a BROADCAST hash join on the
    * cell id and a [[graft.functions.CellArgMin]] argmin over that
    * cell's ≈√k candidates — round-6 (d, cluster) lexicographic, the
    * literal path's exact contract. Per-row work and state are
    * O(√k·d); the k×d relation ships once per executor as a broadcast
    * relation, never as a plan literal.
    *
    * r20 perf: the first cut argmin'd with
    * `array_min(transform(cs, ...))` — a higher-order function whose
    * lambda Catalyst evaluates INTERPRETED per candidate (boxing a
    * struct each), dropping the projection out of whole-stage codegen;
    * it cost warm dedup_semantic 4.43 → 7.74 s at sf10.
    * `graft_argmin_cell` runs the identical round-then-argmin contract
    * as a primitive loop inside codegen (ClusterSpec pins the two
    * formulations bit-identical, NaN rows included).
    */
  private[graft] def hierAssign(coarse: Seq[(Int, Array[Double])], subs: DataFrame)(
      vecs: DataFrame): DataFrame = {
    val cellArr = subs
      .withColumn("c2", call_function("graft_dot", col("cv"), col("cv")))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("cluster"), col("cv"), col("c2")))).as("cs"))
    assigned(vecs, coarse)
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster").as("cell"))
      .join(broadcast(cellArr), "cell")
      .withColumn("asg", call_function("graft_argmin_cell", col("cs"), col("v"), col("nrm")))
      .select(col("vec_id"), col("v"), col("nrm"), col("asg.c").as("cluster"))
  }

  /** The r19-shape interpreted argmin, kept ONLY as the spec's
    * equivalence baseline for [[hierAssign]] (ClusterSpec pins the
    * codegen'd `graft_argmin_cell` serve bit-identical to this).
    */
  private[graft] def hierAssignInterpreted(coarse: Seq[(Int, Array[Double])], subs: DataFrame)(
      vecs: DataFrame): DataFrame = {
    val cellArr = subs
      .withColumn("c2", call_function("graft_dot", col("cv"), col("cv")))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("cluster"), col("cv"), col("c2")))).as("cs"))
    assigned(vecs, coarse)
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster").as("cell"))
      .join(broadcast(cellArr), "cell")
      .withColumn("asg", array_min(transform(col("cs"), c =>
        struct(round(col("nrm") * col("nrm")
            - lit(2.0) * call_function("graft_dot", col("v"), c("cv")) + c("c2"), 6).as("d"),
          c("cluster").as("c")))))
      .select(col("vec_id"), col("v"), col("nrm"), col("asg.c").as("cluster"))
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
    * cold path and its output is a pure function of the corpus —
    * train once per (session, dir, corpus-version), serve every later
    * touch. Generic-DataFrame callers ([[semanticDupSummary]] on
    * arbitrary frames) still train per call, unaffected.
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

  /** Flat path (k ≤ [[HierK]]): the sample-trained centroid blob;
    * hierarchical path: the COARSE centroid blob (level 2 lives in
    * [[semanticSubs]]). Same catalog key either way, so derive_by_key
    * keeps one train-cost line per corpus.
    */
  private def semanticCentroids(spark: SparkSession, dir: String, k: Int): Seq[(Int, Array[Double])] =
    graft.Materialized.ofBlob(spark, dir, "cluster:semantic-cents") {
      val vecs = embNormed(spark, dir)
      if (k <= HierK) sampledCentroids(vecs, k)
      else sampledCentroids(vecs, coarseKFor(k))
    }

  private def semanticSubs(spark: SparkSession, dir: String, k: Int): DataFrame =
    graft.Materialized.ofDF(spark, dir, "cluster:semantic-subs") {
      hierSubCentroids(embNormed(spark, dir), semanticCentroids(spark, dir, k))
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

  /** The Lloyd CTE chain: c0 (init by vec_id rank over `vTable`) and,
    * per round t, s_t (rounded distances over `nTable`) / a_t (argmin
    * assignment) / c_t (decimal-exact rounded means), ending in the
    * final assignment `af` of `finalNTable` (default: the training
    * rows themselves) against c_iters. `kLimit` is a SQL expression
    * (literal or scalar subquery) bounding the init rank. Pointing
    * vTable/nTable at a sample CTE and finalNTable at the corpus
    * replays the train-on-sample / serve-the-corpus split.
    */
  private[similarity] def lloydCtes(kLimit: String, iters: Int,
      vTable: String = "v", nTable: String = "n",
      finalNTable: String = null): String = {
    val finalN = Option(finalNTable).getOrElse(nTable)
    def sCte(name: String, cents: String, over: String): String =
      s"""$name AS (SELECT a.vec_id, c.c,
         |        ROUND(a.nrm * a.nrm
         |              - 2.0 * list_sum(list_transform(generate_series(1, $OracleDim),
         |                  i -> a.v[i] * c.cv[i]))
         |              + list_sum(list_transform(c.cv, x -> x * x)), 6) AS d
         |      FROM $over a CROSS JOIN $cents c)""".stripMargin
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
      Seq(sCte(s"s$t", s"c${t - 1}", nTable), aCte(s"a$t", s"s$t"), cCte(s"c$t", s"a$t"))
        .mkString(",\n")
    }
    (Seq(init) ++ rounds ++ Seq(sCte("sf", s"c$iters", finalN), aCte("af", "sf"))).mkString(",\n")
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
    * vectors run the final assignment and the within-cluster
    * pairwise stage); identical-copy priors come from rank
    * arithmetic over the collapse window, gated by the exact
    * self-pair predicate so a zero vector's NaN cosine keeps its
    * engine-consistent "NaN ≥ τ" verdict. The pairwise stage
    * shuffles reps by cluster id; with k = n/2048 the per-cluster
    * work is ~2048²/2 pairs regardless of corpus size. Training is
    * sample-bounded (see the object Scaladoc).
    */
  def semanticDupSummary(emb0: DataFrame, tau: Double = graft.dedup.Dedup.CosTau): DataFrame = {
    val emb = emb0.select(col("vec_id").cast(LongType).as("vec_id"), col("embedding"))
    val vecs = normed(emb)
    val k = kFor(vecs.count())
    val assign: DataFrame => DataFrame =
      if (k <= HierK) {
        val cents = sampledCentroids(vecs, k)
        df => assigned(df, cents).select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
      } else {
        val coarse = sampledCentroids(vecs, coarseKFor(k))
        val subs = hierSubCentroids(vecs, coarse)
        hierAssign(coarse, subs)
      }
    semanticSummaryWith(emb, vecs, assign, tau)
  }

  /** The post-training half of [[semanticDupSummary]]: collapse,
    * rep-level assignment under the given assignment function
    * ((vec_id, v, nrm) → +cluster), within-cluster pairing,
    * expansion. Split out so the gate op can serve cataloged
    * centroids while generic callers train inline.
    */
  private[graft] def semanticSummaryWith(emb: DataFrame, vecs: DataFrame,
      assign: DataFrame => DataFrame, tau: Double): DataFrame = {
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
    val withC = assign(repVecs)
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
    val vecs = embNormed(spark, dir)
    val k = kFor(vecs.count())
    val assign: DataFrame => DataFrame =
      if (k <= HierK) {
        val cents = semanticCentroids(spark, dir, k)
        df => assigned(df, cents).select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
      } else
        hierAssign(semanticCentroids(spark, dir, k), semanticSubs(spark, dir, k))
    semanticSummaryWith(emb, vecs, assign, graft.dedup.Dedup.CosTau)
  }

  /** Oracle: the uncollapsed formulation of the SAMPLED flat path —
    * the md5-salted ROW_NUMBER draw, Lloyd over the sample, final
    * assignment over every vector, then all pairs within a cluster.
    * The Spark side's collapse is exactly faithful (assignment and
    * cosine are pure functions of the vector), so the hash gate
    * compares collapsed vs uncollapsed — and driver-trained vs
    * SQL-trained — for free. Guarded: a gate corpus large enough to
    * cross [[HierK]] hard-fails via `error()` instead of silently
    * diverging from the hierarchical path (gate corpora sit at k ≤ 30;
    * the hierarchy is spec-pinned Scala-side).
    */
  val dedupSemanticSql: String = s"""
    WITH $oracleNCte,
    kk AS (SELECT GREATEST($K, CAST(CEIL(COUNT(*) / $TargetClusterSize.0) AS INTEGER)) AS k
           FROM v),
    kg AS (SELECT CASE WHEN k <= $HierK THEN k
             ELSE CAST(len(error('oracle covers the flat sampled path (k <= $HierK), got k='
                                 || CAST(k AS VARCHAR))) AS INTEGER) END AS k
           FROM kk),
    smp AS (SELECT vec_id, v FROM (
          SELECT vec_id, v,
            ROW_NUMBER() OVER (ORDER BY md5('sem:' || CAST(vec_id AS VARCHAR)),
                               vec_id) AS rn
          FROM v) WHERE rn <= (SELECT $SampleFactor * k FROM kg)),
    smpn AS (SELECT n.vec_id, n.v, n.nrm FROM n JOIN smp USING (vec_id)),
    ${lloydCtes("(SELECT k FROM kg)", Iters, vTable = "smp", nTable = "smpn", finalNTable = "n")},
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
