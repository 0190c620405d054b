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

  test("dedup_semantic gate output on shipped data: clusters bounded, flags consistent") {
    val out = Cluster.dedupSemantic(spark, sfDir).collect()
    assert(out.length > 0)
    assert(out.map(_.getInt(1)).distinct.length <= Cluster.K)
    out.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) == 0L)))
  }
}
