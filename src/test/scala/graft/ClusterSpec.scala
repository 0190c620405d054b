package graft

import graft.similarity.{Ann, Cluster}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-means + SemDeDup semantic dedup: assignment optimality against a
  * driver brute force, collapse faithfulness against an uncollapsed
  * O(n²) reference, determinism, and the NaN-cosine zero-vector edge.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue() + 0.0

  private def dist2(v: collection.Seq[Double], c: Array[Double]): Double = {
    var nrm2 = 0.0; var dot = 0.0; var c2 = 0.0; var i = 0
    val nrm = { var s = 0.0; var j = 0; while (j < v.length) { s += v(j) * v(j); j += 1 }; math.sqrt(s) }
    while (i < v.length) { dot += v(i) * c(i); c2 += c(i) * c(i); i += 1 }
    nrm2 = nrm * nrm
    nrm2 - 2.0 * dot + c2
  }

  test("kFor floors at K and scales with the corpus") {
    assert(Cluster.kFor(500L) === Cluster.K)
    assert(Cluster.kFor(16384L) === Cluster.K)
    assert(Cluster.kFor(1000000L) === 489)
  }

  test("ann_kmeans assigns every vector to its nearest final centroid") {
    val out = Cluster.annKmeans(spark, sfDir).collect()
    assert(out.length > 0)
    assert(out.map(_.getInt(1)).distinct.length <= Cluster.K)
    assert(out.forall(_.getDouble(2) > -1e-6))
    // reproduce the final centroids and brute-force the argmin
    val vecs = Ann.withNorm(Tables.embeddings(spark, sfDir)).select("vec_id", "v", "nrm")
    val cents = Cluster.lloydCentroids(vecs, Cluster.K, Cluster.Iters)
    val byId = vecs.select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out.foreach { r =>
      val (id, cl, d) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val best = cents.map { case (c, cv) => (round6(dist2(byId(id), cv)), c) }.min
      assert((best._2, best._1) === ((cl, d)), s"vec $id")
    }
  }

  test("ann_kmeans is deterministic across runs") {
    val a = Cluster.annKmeans(spark, sfDir).collect().toSeq
    val b = Cluster.annKmeans(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  /** 8 well-separated distinct base vectors × 5 copies each: the
    * collapse path must match an uncollapsed O(n²) within-cluster
    * reference exactly.
    */
  test("dedup_semantic collapse matches the uncollapsed reference on a copy-heavy corpus") {
    val bases = (0 until 8).map { b =>
      Array.tabulate(4)(i => if (i == b % 4) 10.0f * (1 + b / 4) else 1.0f * b)
    }
    val rows = for (copy <- 0 until 5; b <- 0 until 8)
      yield ((copy * 8 + b).toLong, bases(b).toSeq)
    val emb = rows.toDF("vec_id", "embedding")
    val out = Cluster.semanticDupSummary(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length === 40)

    // uncollapsed reference using the op's own cluster output
    val cluOf = out.map(t => t._1 -> t._2).toMap
    val vOf = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    out.foreach { case (id, clu, n, kept) =>
      val expected = rows.map(_._1).count { u =>
        u < id && cluOf(u) == clu && cos(vOf(u), vOf(id)) >= 0.95
      }
      assert(n === expected.toLong, s"vec $id")
      assert(kept === (n == 0L))
    }
    // every non-first copy of a base is a dup of its earlier copies
    out.filter(_._1 >= 8).foreach { case (id, _, n, kept) =>
      assert(n >= 1L && !kept, s"copy $id must see its identical priors")
    }
  }

  test("dedup_semantic keeps the NaN-cosine verdict for zero vectors engine-consistent") {
    // two zero vectors + two distinct normal ones: NaN >= tau is TRUE
    // under Spark's (and DuckDB's) NaN-is-greatest comparison, so the
    // later zero vector counts the earlier one as a prior dup
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 5.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val out = Cluster.semanticDupSummary(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(0L)._2 === true)
    assert(out(2L) === ((1L, false)), "second zero vector is a dup of the first")
    assert(out(1L)._2 === true)
  }

  test("matrix-path assignment is bit-identical to the literal path on the shipped corpus") {
    val vecs = Ann.withNorm(Tables.embeddings(spark, sfDir)).select("vec_id", "v", "nrm")
    // gate k and a wider matrix (init from the data, as the trainer does)
    for (k <- Seq(Cluster.K, 96)) {
      val cents = Cluster.lloydCentroids(vecs, k, Cluster.Iters)
      def rows(df: DataFrame) = df.select("vec_id", "cluster", "d2")
        .collect().sortBy(_.getLong(0)).map(_.toSeq).toSeq
      assert(rows(Cluster.assignedMatrix(vecs, cents)) ===
        rows(Cluster.assignedLiteral(vecs, cents)), s"k=$k")
    }
  }

  test("matrix path matches literal path on NaN distances and exact centroid ties") {
    // vec 1 carries NaN (all distances NaN: NaN = NaN ties -> lowest id);
    // centroids 0 and 1 are identical (exact tie -> lower id); vec 3 is
    // the zero vector (well-defined distances)
    val df = Seq(
      (1L, Seq(Double.NaN, 0.0)),
      (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 0.0)),
    ).toDF("vec_id", "v").withColumn("nrm", call_function("graft_norm", col("v")))
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(1.0, 0.0)), (2, Array(0.0, 1.0)))
    // NaN-aware equality: compare the distance by its raw bits
    def rows(d: DataFrame) = d.select("vec_id", "cluster", "d2")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    val lit0 = rows(Cluster.assignedLiteral(df, cents))
    assert(rows(Cluster.assignedMatrix(df, cents)) === lit0)
    // and the tie/NaN verdicts themselves are the contract ones
    assert(lit0.map(r => (r._1, r._2)) === Seq((1L, 0), (2L, 0), (3L, 0)))
  }

  /** The corpus-tracking regime the k = n/2048 growth rule implies:
    * k ≥ 10⁴ must complete (the literal path's O(k·d) codegen dies
    * here; the matrix path's generated code is constant-size) and
    * stay argmin-optimal.
    */
  test("matrix path survives a k >= 10000 Lloyd round (smoke + optimality spot-check)") {
    val base = Ann.withNorm(Tables.embeddings(spark, sfDir)).select("vec_id", "v")
    // 500 shipped vectors x 40 deterministic shifts = 20k distinct vectors
    val big = base.withColumn("r", explode(sequence(lit(0), lit(39))))
      .select((col("vec_id") * 40 + col("r")).as("vec_id"),
        transform(col("v"), x => x + col("r").cast("double") * lit(0.001)).as("v"))
      .withColumn("nrm", call_function("graft_norm", col("v")))
      .localCheckpoint()
    val k = 10000
    val cents = Cluster.lloydCentroids(big, k, 1)
    assert(cents.size > Cluster.MatrixPathK && cents.size <= k)
    assert(cents.map(_._1).distinct.length === cents.size)
    val out = Cluster.assigned(big, cents)
    val got = out.select("vec_id", "cluster", "d2").collect()
    assert(got.length === 20000)
    // brute-force the argmin on a sample of rows
    val byId = big.select("vec_id", "v").where(col("vec_id") % 4099 === 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sample = got.filter(r => byId.contains(r.getLong(0)))
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val best = cents.map { case (c, cv) => (round6(dist2(byId(r.getLong(0)), cv)), c) }.min
      assert((best._2, best._1) === ((r.getInt(1), r.getDouble(2))), s"vec ${r.getLong(0)}")
    }
  }

  /** r20 sampled trainer, pin 1: when the sample covers the corpus
    * (n = 500 ≤ 64·k at gate k), the driver-side decimal Lloyd must be
    * BIT-IDENTICAL to the distributed decimal Lloyd — this is the
    * oracle-exactness claim ([[Cluster.lloydDriverCentroids]]
    * reproduces `updated`'s DECIMAL(27,10)→double→round-6 arithmetic
    * and the literal path's fold order) proven against the engine
    * itself.
    */
  test("sampled trainer equals the distributed full-corpus Lloyd when the sample covers the corpus") {
    val vecs = Ann.withNorm(Tables.embeddings(spark, sfDir)).select("vec_id", "v", "nrm")
    assert(vecs.count() <= Cluster.SampleFactor.toLong * Cluster.K)
    val sampled = Cluster.sampledCentroids(vecs, Cluster.K)
    val full = Cluster.lloydCentroids(vecs, Cluster.K, Cluster.Iters)
    assert(sampled.map(_._1) === full.map(_._1))
    sampled.zip(full).foreach { case ((_, a), (_, b)) => assert(a.toSeq === b.toSeq) }
  }

  /** r20 sampled trainer, pin 2: above the bound (600 > 64·8 = 512)
    * sampling is ACTIVE — the TakeOrdered draw must equal an
    * independently computed md5-window draw, training must only see
    * those rows, and the result is deterministic.
    */
  test("sampling is active, bounded, and deterministic above 64*k rows") {
    val rows = (0 until 600).map { i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 13).toDouble / 3.0))
    }
    val vecs = rows.toDF("vec_id", "v")
      .withColumn("nrm", call_function("graft_norm", col("v")))
      .localCheckpoint()
    val k = Cluster.kFor(600L)
    assert(k === Cluster.K)
    val s = Cluster.SampleFactor * k
    val drawn = Cluster.semSample(vecs, s, "sem:").select("vec_id").collect().map(_.getLong(0))
    assert(drawn.length === s && drawn.toSet.size === s)
    // independent draw: full md5 sort on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.clone().asInstanceOf[java.security.MessageDigest]
      .digest(s"sem:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expect = (0L until 600L).sortBy(id => (h(id), id)).take(s)
    assert(drawn.sorted.toSeq === expect.sorted.toSeq)
    // trainer == driver Lloyd over exactly that sample, twice (determinism)
    val byId = vecs.collect().map(r =>
      r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    val sampleRows = expect.map(id => (id, byId(id)._1, byId(id)._2)).toArray
    val want = Cluster.lloydDriverCentroids(sampleRows, k, Cluster.Iters)
    for (_ <- 1 to 2) {
      val got = Cluster.sampledCentroids(vecs, k)
      assert(got.map(_._1) === want.map(_._1))
      got.zip(want).foreach { case ((_, a), (_, b)) => assert(a.toSeq === b.toSeq) }
    }
  }

  /** r20 hierarchical path (k > HierK at production sizes; driven here
    * with small targets): coarse cells sized by real counts, per-cell
    * sub-Lloyd over bounded samples only, serve = coarse argmin +
    * broadcast per-cell argmin. Pins: k2 sizing, argmin optimality of
    * the served assignment against a driver brute force, determinism,
    * and end-to-end dup flags through the collapse machinery.
    */
  test("hierarchical two-level path: k2 sizing, argmin optimality, determinism, dup flags") {
    val rows = for (b <- 0 until 8; i <- 0 until 30) yield {
      val v = Array.tabulate(4)(j => if (j == b % 4) 10.0 * (1 + b / 4) else 0.5 * b)
      v((b + 1) % 4) += 0.01 * (i % 3)
      ((b * 30 + i).toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val vecs = Ann.withNorm(emb).select("vec_id", "v", "nrm").localCheckpoint()
    val coarse = Cluster.sampledCentroids(vecs, 3, sampleFactor = 16)
    val target = 16L
    def subsOnce() =
      Cluster.hierSubCentroids(vecs, coarse, target = target, sampleFactor = 4)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .sortBy(t => (t._1, t._2)).toSeq
    val subs = subsOnce()
    assert(subs === subsOnce(), "sub-centroid training must be deterministic")
    // k2 sizing: sub ids per cell stay within ceil(cell_count/target)
    val byId = rows.map { case (id, v) => id -> v.toArray }.toMap
    def cellOf(v: Array[Double]): Int =
      coarse.map { case (c, cv) => (round6(dist2(v.toSeq, cv)), c) }.min._2
    val cellCounts = rows.groupBy { case (id, _) => cellOf(byId(id)) }.view.mapValues(_.size)
    subs.groupBy(_._1).foreach { case (cell, ss) =>
      val k2 = (cellCounts(cell) + target - 1) / target
      assert(ss.size <= k2, s"cell $cell: ${ss.size} subs > k2 $k2")
    }
    // served assignment is the per-cell argmin (driver brute force)
    val subsDf = Cluster.hierSubCentroids(vecs, coarse, target = target, sampleFactor = 4)
    val served = Cluster.hierAssign(coarse, subsDf)(vecs)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(served.size === rows.size)
    rows.foreach { case (id, _) =>
      val v = byId(id)
      val cell = cellOf(v)
      val best = subs.filter(_._1 == cell)
        .map { case (_, cl, cv) => (round6(dist2(v.toSeq, cv.toArray)), cl) }.min._2
      assert(served(id) === best, s"vec $id")
    }
    // end-to-end through the collapse machinery: flags consistent and
    // near-identical blob members see their priors
    val out = Cluster.semanticSummaryWith(
      emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding")),
      vecs, Cluster.hierAssign(coarse, subsDf), 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.length === rows.size)
    out.foreach { case (_, n, kept) => assert(kept === (n == 0L)) }
    // identical copies (i % 3 == 0 beyond the first) share a vector with
    // vec b*30: later identical copies must be flagged
    for (b <- 0 until 8; i <- Seq(3, 6, 9)) {
      val id = (b * 30 + i).toLong
      val got = out.find(_._1 == id).get
      assert(got._2 >= 1L && !got._3, s"identical copy $id must see its priors")
    }
  }

  /** r20 optimization pin: the codegen'd `graft_argmin_cell` serve
    * ([[Cluster.hierAssign]]) must be BIT-IDENTICAL to the interpreted
    * `array_min(transform(...))` formulation it replaced — including a
    * NaN vector (all distances NaN: NaN = NaN ties → lowest cluster
    * id), the zero vector, and exact sub-centroid ties (duplicate
    * centroids inside one cell → lower id wins).
    */
  test("hierAssign codegen argmin is bit-identical to the interpreted formulation") {
    val rows = Seq(
      (1L, Seq(Double.NaN, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),
    ) ++ (for (b <- 0 until 6; i <- 0 until 20) yield {
      val v = Array.tabulate(4)(j => if (j == b % 4) 5.0 * (1 + b / 2) else 0.25 * b)
      v((b + 2) % 4) += 0.02 * (i % 5)
      ((100 + b * 20 + i).toLong, v.toSeq)
    })
    val vecs = Ann.withNorm(rows.toDF("vec_id", "embedding"))
      .select("vec_id", "v", "nrm").localCheckpoint()
    val coarse = Cluster.sampledCentroids(vecs, 3, sampleFactor = 8)
    val subs0 = Cluster.hierSubCentroids(vecs, coarse, target = 8L, sampleFactor = 4)
    // inject an exact duplicate sub-centroid with a HIGHER cluster id
    // into every cell: the round-tie must resolve to the lower id in
    // both formulations
    val dup = subs0.groupBy("cell")
      .agg(min(struct(col("cluster"), col("cv"))).as("m"))
      .select(col("cell"), (col("m.cluster") + lit(10000)).as("cluster"), col("m.cv").as("cv"))
    val subs = subs0.unionAll(dup).localCheckpoint()
    def rowsOf(df: DataFrame) = df.select("vec_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val got = rowsOf(Cluster.hierAssign(coarse, subs)(vecs))
    val want = rowsOf(Cluster.hierAssignInterpreted(coarse, subs)(vecs))
    assert(got === want)
    // and no injected duplicate ever won a tie
    assert(got.forall(_._2 < 10000))
  }

  test("dedup_semantic gate output on shipped data: clusters bounded, flags consistent") {
    val out = Cluster.dedupSemantic(spark, sfDir).collect()
    assert(out.length > 0)
    assert(out.map(_.getInt(1)).distinct.length <= Cluster.K)
    out.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) == 0L)))
  }
}
