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

  test("dedup_semantic gate output on shipped data: clusters bounded, flags consistent") {
    val out = Cluster.dedupSemantic(spark, sfDir).collect()
    assert(out.length > 0)
    assert(out.map(_.getInt(1)).distinct.length <= Cluster.K)
    out.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) == 0L)))
  }
}
