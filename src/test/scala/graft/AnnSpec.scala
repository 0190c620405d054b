package graft

import graft.similarity.{Ann, OpqTrain}
import org.apache.spark.sql.functions.col

/** ANN guarantees: IVF with full probing degenerates to exact brute
  * force; LSH recall against brute force is bounded below; ranking is
  * deterministic.
  */
class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("ivfTopK with nprobe = all cells is exactly brute force") {
    val bf = Ann.bruteForceTopK(emb)
    val ivfAll = Ann.ivfTopK(emb, nprobe = Ann.IvfCells)
    assert(rowsOf(ivfAll) === rowsOf(bf))
  }

  test("ivfTopK at nprobe=4 keeps recall ≥ 0.85 (trained quantizer + closure assignment)") {
    // floor raised from the hard-assignment era's 0.6: the Lloyd-trained
    // spherical quantizer with IvfClosureEps boundary replication
    // measures 0.90-0.94 on the gate corpora; 0.85 guards regressions
    // while tolerating corpus-regeneration variance
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val ivf = neighborSets(Ann.ivfTopK(emb))
    val recalls = bf.map { case (q, s) =>
      ivf.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    assert(recalls.sum / recalls.size >= 0.85,
      s"mean IVF recall ${recalls.sum / recalls.size}")
  }

  test("lshTopK recall vs brute force ≥ 0.5 and scores are correct") {
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val lshDf = Ann.lshTopK(emb)
    val lsh = neighborSets(lshDf)
    val recalls = bf.map { case (q, s) =>
      lsh.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean LSH recall ${recalls.sum / recalls.size}")
    // every LSH hit carries the same rounded score brute force computes
    val bfScores = Ann.bruteForceTopK(emb, k = emb.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lshDf.collect().foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  test("sqTopK recall vs brute force ≥ 0.9 and exact reranked scores") {
    // 255 levels per dim ≫ the corpus per-dim spread: SQ ranking is
    // near-exact, so the rerank cut should rarely lose a true neighbor
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val sqDf = Ann.sqTopK(emb)
    val sq = neighborSets(sqDf)
    val recalls = bf.map { case (q, s) =>
      sq.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"mean SQ recall ${recalls.sum / recalls.size}")
    val bfScores = Ann.bruteForceTopK(emb, k = emb.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    sqDf.collect().foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  test("pqTopK recall vs brute force and exact reranked scores") {
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val pqDf = Ann.pqTopK(emb)
    val pq = neighborSets(pqDf)
    val recalls = bf.map { case (q, s) =>
      pq.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean PQ recall ${recalls.sum / recalls.size}")
    // the rerank is exact: every returned score is the true cosine
    val bfScores = Ann.bruteForceTopK(emb, k = emb.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pqDf.collect().foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  test("ivfPqTopK: full probing degenerates to PQ; residual >= raw recall; scores exact") {
    // with raw encoding, routing with every cell probed is a no-op —
    // IVF-PQ ≡ PQ at the same rerank budget (IVF-PQ's own budget is
    // wider to compensate for closure-multiplied candidate pools)
    assert(rowsOf(Ann.ivfPqTopK(emb, nprobe = Ann.IvfCells, byResidual = false))
      === rowsOf(Ann.pqTopK(emb, rerank = Ann.IvfPqRerank)))
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val ivfpqDf = Ann.ivfPqTopK(emb) // residual encoding — the gate path
    val ivfpq = neighborSets(ivfpqDf)
    val recalls = bf.map { case (q, s) =>
      ivfpq.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    val rResid = recalls.sum / recalls.size
    assert(rResid >= 0.5, s"mean IVF-PQ recall $rResid")
    // residual encoding resolves finer structure than raw at the same
    // code budget: recall must not regress vs the raw path
    val raw = neighborSets(Ann.ivfPqTopK(emb, byResidual = false))
    val rRaw = bf.map { case (q, s) =>
      raw.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }.sum / bf.size
    info(f"IVF-PQ recall residual $rResid%.3f vs raw $rRaw%.3f")
    assert(rResid >= rRaw,
      s"residual IVF-PQ recall $rResid must be >= raw's $rRaw")
    // the rerank is exact: every returned score is the true cosine
    val bfScores = Ann.bruteForceTopK(emb, k = emb.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivfpqDf.collect().foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  private def annRecall(bfs: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
    val rs = bfs.map { case (q, s) =>
      got.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size }
    rs.sum / rs.size
  }

  private def splitmixF(i: Long, d: Int): Float = {
    var z = (i * 32 + d) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (((z >>> 11).toDouble / (1L << 53).toDouble) * 2 - 1).toFloat
  }

  test("opqTopK: recall-tournament transform, recall >= plain PQ, scores exact") {
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val model = OpqTrain.train(emb)
    val t = model.transform
    // whatever won, the permutation part must be a true permutation
    assert(t.perm.sorted.toSeq === t.perm.indices.toSeq)
    val opqDf = Ann.opqTopK(emb, model)
    val rOpq = annRecall(bf, neighborSets(opqDf))
    val rPq = annRecall(bf, neighborSets(Ann.pqTopK(emb)))
    info(f"gate corpus: OPQ recall $rOpq%.3f vs PQ $rPq%.3f (transform: ${if (t.isIdentity) "identity" else s"layers ${t.layers.map(_._1).mkString("/")}"}, codebook: ${if (model.codebook.isDefined) "lloyd" else "seed"})")
    // plain seed-codebook PQ is candidate 0 of the recall tournament,
    // and at gate scale the training sample covers the corpus, so OPQ
    // can never lose to plain PQ on its own training metric
    assert(rOpq >= rPq,
      s"OPQ recall $rOpq must be >= plain PQ's $rPq (plain PQ is candidate 0)")
    // every OPQ hit carries the true rounded cosine of the ORIGINAL
    // vectors: the rerank joins the original frame whatever the
    // transform did (rotation included — not just permutations)
    val bfScores = Ann.bruteForceTopK(emb, k = emb.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    opqDf.collect().foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
    // deterministic: two runs identical (catalog-served or not)
    assert(rowsOf(Ann.opqTopK(emb, model)) === rowsOf(opqDf))
    // the Materialized blob codec round-trips transform AND codebook
    val rt = Ann.opqFromBlob(Ann.opqToBlob(model))
    assert(rt.transform.perm.toSeq === t.perm.toSeq)
    assert(rt.transform.layers.map(_._1) === t.layers.map(_._1))
    assert(rt.transform.layers.zip(t.layers).forall { case ((_, a), (_, b)) => a.toSeq == b.toSeq })
    assert(rt.codebook.isDefined === model.codebook.isDefined)
    (rt.codebook, model.codebook) match {
      case (Some(a), Some(b)) =>
        assert(a.length === b.length)
        a.zip(b).foreach { case (am, bm) =>
          assert(am.map(_._1).toSeq === bm.map(_._1).toSeq)
          am.zip(bm).foreach { case ((_, av), (_, bv)) => assert(av.toSeq === bv.toSeq) }
        }
      case _ =>
    }

    // planted variance-skewed corpus: dims 0-1 carry ~all the energy
    // (and the neighbor signal), the rest is low-amplitude noise.
    // Contiguous slicing buries both hot dims in ONE 16-code subspace;
    // the tournament must select a trained candidate (layout, rotation
    // or Lloyd codebook — anything but the plain-PQ floor) and not
    // lose to plain PQ's recall with it
    val s = spark
    import s.implicits._
    val planted = (0 until 400).map { i =>
      val ang = (i % 40) * 0.157
      val v = Array.tabulate(16) { d =>
        if (d == 0) (5.0 * math.cos(ang)).toFloat + 0.3f * splitmixF(i.toLong, d)
        else if (d == 1) (5.0 * math.sin(ang)).toFloat + 0.3f * splitmixF(i.toLong, d)
        else 0.2f * splitmixF(i.toLong, d)
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding").localCheckpoint()
    val mP = OpqTrain.train(planted)
    assert(!mP.transform.isIdentity || mP.codebook.isDefined,
      "variance-skewed corpus must select a trained candidate, not the plain-PQ floor")
    val bfP = neighborSets(Ann.bruteForceTopK(planted))
    val rOpqP = annRecall(bfP, neighborSets(Ann.opqTopK(planted, mP)))
    val rPqP = annRecall(bfP, neighborSets(Ann.pqTopK(planted)))
    info(f"planted skew: OPQ recall $rOpqP%.3f vs PQ $rPqP%.3f")
    assert(rOpqP >= rPqP,
      s"planted skew: OPQ recall $rOpqP must be >= PQ's $rPqP")
  }

  test("OpqTrain: bounded sample is exactly the md5-lowest draw, training is sample-pure") {
    // corpus bigger than the sample bound → sampling is ACTIVE. Pin
    // the engine's TakeOrdered draw against an independent md5
    // implementation, and pin that training is a pure function of the
    // sample: training on the explicitly-reconstructed sample corpus
    // yields the identical model.
    val s = spark
    import s.implicits._
    val n = 64
    val big = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(d => splitmixF(i.toLong, d)).toSeq)
    }.toDF("vec_id", "embedding").localCheckpoint()
    val (ids, _) = OpqTrain.collectSample(big, n)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(s"opq:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expect = (0L until 16L) ++
      (16L until 300L).sortBy(id => (hex(id), id)).take(n)
    assert(ids.toSeq === expect.sorted)
    // sample-purity: training on the reconstructed sample corpus (all
    // rows in the sample, nothing else) gives the identical model
    val sampleDf = big.where(col("vec_id").isin(expect: _*)).localCheckpoint()
    val m1 = OpqTrain.train(big, n)
    val m2 = OpqTrain.train(sampleDf, n)
    assert(m1.transform.perm.toSeq === m2.transform.perm.toSeq)
    assert(m1.transform.layers.map(_._1) === m2.transform.layers.map(_._1))
    assert(m1.transform.layers.zip(m2.transform.layers)
      .forall { case ((_, a), (_, b)) => a.toSeq == b.toSeq })
    assert(m1.codebook.isDefined === m2.codebook.isDefined)
  }

  test("opqTopK: Ge alternation lowers JOINT distortion below its butterfly init") {
    // Σ‖rep − decode(rep)‖² under each candidate's OWN Lloyd codebook —
    // the joint rotation+codebook objective Ge's alternation descends.
    // Candidates 6/7 alternate Lloyd-codebook decode ↔ closed-form
    // per-pair Givens relearn on top of candidates 4/5; each must end
    // at-or-below its init's joint distortion. The 1e-6 slack absorbs
    // the round9/float snaps and the sequential-Givens restriction,
    // which break STRICT monotonicity (the descent argument holds for
    // the exact alternation, not its snapped butterfly projection).
    val (ids, vecs) = OpqTrain.collectSample(emb, OpqTrain.TrainSample)
    val cs = OpqTrain.candidates(ids, vecs)
    assert(cs.length === 8)
    val d = cs.map { case (t, lloyd) =>
      OpqTrain.jointDistortion(ids, OpqTrain.applyTransform(vecs, t),
        if (lloyd) OpqTrain.LloydIters else 0)
    }
    info(f"joint distortion (pq, id, rr, ct, conc, bal, altA, altB): ${d.map(x => f"$x%.2f").mkString(", ")}")
    assert(d(6) <= d(4) * (1 + 1e-6),
      f"alternation on conc must not raise joint distortion: ${d(6)}%.2f vs ${d(4)}%.2f")
    assert(d(7) <= d(5) * (1 + 1e-6),
      f"alternation on bal must not raise joint distortion: ${d(7)}%.2f vs ${d(5)}%.2f")
    // the Lloyd codebook itself descends the same objective from the
    // seed init (candidate 1 vs candidate 0: identical rep, trained
    // vs seed codebook)
    assert(d(1) <= d(0) * (1 + 1e-6),
      f"Lloyd codebook must not raise distortion over seeds: ${d(1)}%.2f vs ${d(0)}%.2f")
    // and the alternation layers stay genuine rotations: each learned
    // (c, s) is a unit pair at the 9-dp snap
    cs(6)._1.layers.foreach { case (_, csv) =>
      csv.grouped(2).foreach { p =>
        assert(math.abs(p(0) * p(0) + p(1) * p(1) - 1.0) < 1e-6) }
    }
  }

  test("opqTopK: learned balance rotation beats EVERY permutation on a dominant-dim corpus") {
    // one dim carries 100x the variance of the rest. A permutation can
    // MOVE that dim but its subspace's 16 codes still quantize it
    // alongside its pair dims; only a ROTATION can SPLIT it, letting
    // several subspaces' independent codebooks each quantize a share
    // so ADC errors average down — the regime where no permutation can
    // win but the rotation does. 1600 rows > the 1040-row sample
    // bound, so this corpus also exercises the SAMPLED training path.
    val s = spark
    import s.implicits._
    val dom = (0 until 1600).map { i =>
      val v = Array.tabulate(16)(d =>
        (if (d == 0) 20.0f else 2.0f) * splitmixF(i.toLong, d))
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding").localCheckpoint()
    val (ids, vecs) = OpqTrain.collectSample(dom, OpqTrain.TrainSample)
    assert(ids.length === 16 + OpqTrain.TrainSample,
      "the dominant-dim corpus must exercise bounded sampling")
    val cs = OpqTrain.candidates(ids, vecs)
    val hits = OpqTrain.tournamentHits(ids, vecs, cs)
    info(s"dominant-dim tournament hits (pq, id, rr, ct, conc, bal, altA, altB): ${hits.mkString(", ")}")
    // candidates 0-3 are the codebook/permutation layouts, 5 the
    // balance rotation: the rotation must beat ALL of them outright
    assert(hits(5) > hits.take(4).max,
      s"balance rotation ${hits(5)} must beat every permutation ${hits.take(4).mkString(",")}")
    val mD = OpqTrain.train(dom)
    assert(mD.transform.layers.nonEmpty, "selection must pick a rotation here")
    // and end to end the op must strictly beat plain PQ's recall
    val bfD = neighborSets(Ann.bruteForceTopK(dom))
    val rOpqD = annRecall(bfD, neighborSets(Ann.opqTopK(dom, mD)))
    val rPqD = annRecall(bfD, neighborSets(Ann.pqTopK(dom)))
    info(f"dominant-dim: OPQ recall $rOpqD%.3f vs PQ $rPqD%.3f")
    assert(rOpqD > rPqD,
      s"dominant-dim: OPQ recall $rOpqD must strictly beat PQ's $rPqD")
  }

  test("bruteForceTopK pins known neighbors on a synthetic set") {
    val s = spark
    import s.implicits._
    // qid 0 along e0; vec 20 = same direction, vec 21 = opposite,
    // vec 22 orthogonal-ish.
    def v(xs: Double*) = xs.map(_.toFloat)
    val data = Seq(
      (0L, v(1, 0, 0, 0)),
      (20L, v(2, 0, 0, 0)),
      (21L, v(-1, 0, 0, 0)),
      (22L, v(0, 1, 0, 0)),
      (23L, v(1, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(data, k = 4).where($"qid" === 0L)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(top.map(_._1).toSeq === Seq(20L, 23L, 22L, 21L))
    assert(top.head._2 === 1.0)
    assert(top.last._2 === -1.0)
  }

  test("hybrid search: pre-filter is exact, disallowed labels never rank, filter reaches the scan") {
    val s = spark
    import s.implicits._
    def v(xs: Double*) = xs.map(_.toFloat)
    // vec 20 is the best cosine for qid 0 but carries a disallowed
    // label — pre-filtering must rank 23/22/21 instead (post-filtering
    // an unfiltered top-2 would have returned only one row).
    val data = Seq(
      (0L, v(1, 0, 0, 0), 1),
      (20L, v(2, 0, 0, 0), 2),
      (23L, v(1, 1, 0, 0), 1),
      (22L, v(0, 1, 0, 0), 4),
      (21L, v(-1, 0, 0, 0), 7)
    ).toDF("vec_id", "embedding", "label")
    val top = Ann.hybridTopK(data, k = 3).where($"qid" === 0L)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(top === Seq(23L, 22L, 21L))
    // corpus op: only allowed labels appear, and the predicate is
    // pushed into the parquet scan (pre-filter, not post-filter)
    val out = Ann.annHybrid(spark, sfDir).localCheckpoint()
    val lbl = Tables.embeddings(spark, sfDir).select("vec_id", "label")
    assert(out.join(lbl, "vec_id")
      .where(!col("label").isin(Ann.HybridLabels: _*)).count() === 0)
    val plan = Ann.annHybrid(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label filter not pushed:\n$plan")
  }

  test("mmrRerank: pick 1 is pure relevance, pick 2 trades relevance for diversity") {
    val s = spark
    import s.implicits._
    def v(xs: Double*) = xs.map(_.toFloat)
    // qid 0 along e0. vec 20 is the top cosine; vec 21 is a slightly
    // less relevant NEAR-DUPLICATE of 20 (high penalty once 20 is in);
    // vec 22 is less relevant but diverse — MMR must pick 20, then 22,
    // and only then the near-duplicate 21. A pure-relevance rerank
    // would order 20, 21, 22.
    val data = Seq(
      (0L, v(1, 0, 0, 0)),
      (20L, v(1, 0.01, 0, 0)),
      (21L, v(0.999, 0.04, 0, 0)),
      (22L, v(0.7, 0, 0.7, 0))
    ).toDF("vec_id", "embedding")
    val out = Ann.mmrRerank(data).where($"qid" === 0L)
      .orderBy("pos").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 20L), (2L, 22L), (3L, 21L)))
  }

  test("mmrRerank corpus invariants: first pick = brute-force top-1, picks distinct, from the pool") {
    val out = Ann.mmrRerank(emb).localCheckpoint()
    val byQ = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    assert(byQ.nonEmpty)
    val bf1 = Ann.bruteForceTopK(emb, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pool = neighborSets(Ann.bruteForceTopK(emb, k = Ann.MmrCandidates))
    byQ.foreach { case (q, rows) =>
      assert(rows.length === Ann.MmrK)
      assert(rows.sortBy(_._2).map(_._2).toSeq === (1L to Ann.MmrK))
      val picks = rows.map(_._3)
      assert(picks.distinct.length === picks.length, s"qid $q repeated a pick")
      assert(rows.minBy(_._2)._3 === bf1(q), s"qid $q pick 1 is not the top cosine")
      assert(picks.toSet.subsetOf(pool(q)), s"qid $q picked outside the candidate pool")
    }
  }

  test("knnJoin LSH scale path: high recall vs exact, scores exact (rerank)") {
    val exact = Ann.knnJoin(emb)
    // maxBroadcastRows = 0 forces the distributed LSH candidate path —
    // the same pinning pattern as GraphSpec's maxLocalEdges = 0.
    val lshDf = Ann.knnJoin(emb, maxBroadcastRows = 0L)
    val ex = neighborSets(exact)
    val ap = neighborSets(lshDf)
    val recalls = ex.map { case (q, s) =>
      ap.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"mean kNN-join LSH recall ${recalls.sum / recalls.size}")
    // the rerank is exact: every returned (qid, vec_id) carries the
    // true rounded cosine the exact path computes
    val n = emb.count().toInt
    val bfScores = Ann.knnJoin(emb, k = n).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lshDf.collect().foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  // The LSH path's collapse/expansion on a duplicate-heavy corpus
  // (the ScaleUp shape): with interleaved copy ids, groups both
  // larger and smaller than k+1, and a near-identical distinct pair,
  // the collapsed path must equal the exact path EXACTLY — group-mate
  // neighbors come from the rank-arithmetic within-expansion, cross
  // neighbors from rep pruning by (score desc, rep_id asc), and ties
  // rank by vec_id in both paths. Deterministic: planes and LSH keys
  // are seeded.
  test("knnJoin LSH path equals exact path on a duplicate-heavy corpus") {
    val s = spark
    import s.implicits._
    def unit(seed: Int) = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(16)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val base = unit(1)
    // cos ≈ 0.999 vs base: near-identical (LSH collision ~certain with
    // the seeded planes) but safely below 1.0 after round6, so the
    // cross scores can't tie with the within-group 1.0s
    val near = base.clone(); near(0) = near(0) + 0.05f
    // far groups carry ≥ k+1 copies so their top-k is within-group by
    // construction — cross-group recall is only load-bearing for the
    // near pair, where it is deterministic
    val groups: Seq[(Array[Float], Int)] =
      Seq((base, 6), (near, 2)) ++ (2 until 8).map(g => (unit(g * 11), 4))
    val emb = groups.zipWithIndex.flatMap { case ((v, copies), g) =>
      (0 until copies).map(c => (c * 1000L + g, v.toSeq))
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = rows(Ann.knnJoin(emb)) // 26 rows ≤ broadcast bound
    val lsh = rows(Ann.knnJoin(emb, maxBroadcastRows = 0L))
    assert(lsh === exact)
  }

  test("rangeSearch returns exactly the brute-force pairs at/above tau") {
    val emb = Tables.embeddings(spark, sfDir)
    val tau = Ann.RangeTau
    val all = Ann.bruteForceTopK(emb, k = emb.count().toInt).collect()
    val expected = all.filter(_.getDouble(3) >= tau)
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val got = Ann.rangeSearch(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("mipsTopK ranks by raw dot product — magnitude beats direction") {
    val s = spark
    import s.implicits._
    def v(xs: Double*) = xs.map(_.toFloat)
    val data = Seq(
      (0L, v(1, 0, 0, 0)),
      (20L, v(0.9, 0, 0, 0)),  // perfectly aligned, small magnitude
      (21L, v(5, 5, 0, 0)),    // 45 degrees off but huge: dot 5 > 0.9
      (22L, v(0, 0, 1, 0))     // orthogonal: dot 0
    ).toDF("vec_id", "embedding")
    val top = Ann.mipsTopK(data, k = 3).where($"qid" === 0L)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(top.map(_._1).toSeq === Seq(21L, 20L, 22L)) // cosine would pick 20 first
    assert(top.head._2 === 5.0 && top(1)._2 === 0.9 && top.last._2 === 0.0)
  }

  test("graphBeamTopK: recall vs brute force >= 0.9, deterministic, exact scores") {
    // measured 0.975 at both gate corpora with deg=12, 8 entries,
    // 4 rounds, beam 24; 0.9 guards regressions without pinning noise
    val bf = neighborSets(Ann.bruteForceTopK(emb))
    val out = Ann.graphBeamTopK(emb)
    val got = neighborSets(out)
    val recalls = bf.map { case (q, s) =>
      got.get(q).map(g => (g & s).size.toDouble / s.size).getOrElse(0.0) }
    assert(recalls.sum / recalls.size >= 0.9,
      s"mean graph-beam recall ${recalls.sum / recalls.size}")
    // beam search reports the true rounded cosine for what it returns
    val bfScores = Ann.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.collect().foreach { r =>
      bfScores.get((r.getLong(0), r.getLong(2)))
        .foreach(exp => assert(r.getDouble(3) === exp))
    }
    // fixed seeds + rounded tie-broken ranking: two runs are identical
    assert(rowsOf(Ann.graphBeamTopK(emb)) === rowsOf(out))
    // adaptive geometry pins (integer bit-length log2, floored at the
    // fixed r16 point): 500 distinct → (9, 4, 36); the 12k planted
    // corpus → (14, 5, 56); an sf10-sized 200k corpus → (18, 6, 72)
    assert(Ann.annGraphGeometry(500L) === ((9, 4, 36)))
    assert(Ann.annGraphGeometry(12000L) === ((14, 5, 56)))
    assert(Ann.annGraphGeometry(200000L) === ((18, 6, 72)))
    assert(Ann.annGraphGeometry(1L) === ((Ann.AnnGraphEntries, Ann.AnnGraphRounds, Ann.AnnGraphBeam)))
  }

  test("graphBeamTopK on an LSH-built graph (>10k vectors): recall vs brute force >= 0.9") {
    // Above KnnBroadcastMaxRows (10k) buildKnnGraph's knnJoin routes to
    // the LSH-bucketed candidate path — the graph the beam searches at
    // production scale is approximate. The gate corpora (≤2k vectors)
    // only ever exercise the exact-built graph, so this planted 12k
    // corpus is the one place the LSH-built graph's navigability is
    // measured. Deterministic (hash-derived, no rand()): moderate
    // cluster pull over dominant noise, so the knn graph is CONNECTED
    // with small diameter (fully-separated clusters would strand the
    // beam regardless of how the graph was built — that shape defeats
    // any knn-graph method, it measures nothing about the LSH build).
    val s = spark
    import s.implicits._
    // 8 clusters with i%8 assignment: the adaptive geometry at 12k
    // distinct gives 14 entry points (vec_id 16..29), covering every
    // cluster, so each query has an entry in its own region — beam
    // recall then measures how well the graph lets the search climb
    // from a same-region entry to the true neighbors, the navigation
    // the production index actually does (quasi-orthogonal clusters
    // with NO entry coverage strand any knn-graph beam and measure
    // nothing about the build).
    val n = 12000
    val dim = 16
    val nClusters = 8
    // splitmix64 avalanche: a weak multiplicative hash here leaves
    // id-arithmetic structure in the noise (pairs of ids with
    // near-identical noise vectors become 0.9999-cosine "twins" that
    // no graph navigation could find — the recall floor would measure
    // the hash, not the index)
    def noise(i: Long, d: Int): Float = {
      var z = (i * 16 + d) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble * 2 - 1).toFloat
    }
    val data = (0 until n).map { i =>
      val c = i % nClusters
      val v = Array.tabulate(dim)(d =>
        0.6f * math.sin(c * 37.0 + d * 11.0).toFloat + 0.8f * noise(i.toLong, d))
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding").localCheckpoint()
    assert(n > Ann.KnnBroadcastMaxRows, "corpus must force the LSH knn-graph build")
    val bf = neighborSets(Ann.bruteForceTopK(data))
    def meanRecall(got: Map[Long, Set[Long]]): Double = {
      val rs = bf.map { case (q, t) =>
        got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0) }
      rs.sum / rs.size
    }
    // exact-built graph on the same corpus: the navigability ceiling —
    // how much of any recall loss is the LSH build vs the beam itself
    val exactNn = Ann.knnJoin(data, k = Ann.AnnGraphDegree,
      maxBroadcastRows = Long.MaxValue)
      .select(col("qid").as("src"), col("vec_id").as("dst"))
    val exactGraph = exactNn.unionAll(
      exactNn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val ceil = meanRecall(neighborSets(
      Ann.graphBeamTopK(data, edgesOpt = Some(exactGraph))))
    val mean = meanRecall(neighborSets(Ann.graphBeamTopK(data)))
    info(f"knn-graph beam recall@${Ann.K} over $n vectors: LSH-built $mean%.3f, exact-built $ceil%.3f")
    // adaptive geometry (14 entries / 5 rounds / beam 56 at 12k
    // distinct) must hold the verdict floor at this rung too
    assert(mean >= 0.9, s"mean beam recall on the LSH-built graph: $mean (exact-built: $ceil)")
  }
}
