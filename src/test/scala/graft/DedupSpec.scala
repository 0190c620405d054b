package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Plants synthetic duplicates to prove each dedup path *detects*
  * (the driver gate runs on the real corpus, where near-dup density
  * is whatever the generator planted), and cross-checks the
  * probabilistic paths against their exact counterparts.
  */
class DedupSpec extends SparkSpec {

  // Long enough that a one-word edit stays in the high-similarity
  // regime (Jaccard ≈ 0.76) where 32×4 MinHash banding has
  // P(miss) < 1e-5 — banding recall is only guaranteed well above τ.
  private lazy val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
  private lazy val planted = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, base),
      (1L, base),                                      // exact dup of 0
      (2L, base.replace("delta", "DELTA")),            // near dup of 0
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
  }

  test("exactGroups keeps min doc_id with group size") {
    val g = Dedup.exactGroups(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(0L) === 2L) // docs 0 and 1 collapse
    assert(!g.contains(1L))
    assert(g(2L) === 1L && g(3L) === 1L && g(4L) === 1L)
  }

  test("ngramJaccardPairs finds planted near-dups and nothing else") {
    val pairs = Dedup.ngramJaccardPairs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) >= 0.5 && pairs((0L, 2L)) < 1.0)
    assert(pairs.contains((1L, 2L)))
    assert(pairs.size === 3) // no cross-pairs with docs 3/4
  }

  test("minhashLshPairs equals ngramJaccardPairs on planted and real data") {
    assert(rowsOf(Dedup.minhashLshPairs(planted)) === rowsOf(Dedup.ngramJaccardPairs(planted)))
    val docs = Tables.documents(spark, sfDir)
    assert(rowsOf(Dedup.minhashLshPairs(docs)) === rowsOf(Dedup.ngramJaccardPairs(docs)))
  }

  test("simhashPairs detects identical and near-identical docs") {
    val pairs = Dedup.simhashPairs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) === 0L) // identical text → identical simhash
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || b == 4L || a == 3L })
  }

  /** r20 optimization pin: the exactly-once pigeonhole join (pairs
    * emitted only at their lowest matching block — no post-join
    * `.distinct()`) must equal a brute-force Hamming ≤ 3 self-join,
    * as a MULTISET (one row per pair, so the old distinct's dedup
    * role is covered), on a corpus dense in identical signatures
    * (every block matches — the 4×-duplication worst case) plus
    * 1/2/3/4-bit neighbors straddling block boundaries.
    */
  test("hammingBlockPairs emits each Hamming<=3 pair exactly once, equal to brute force") {
    val s = spark
    import s.implicits._
    val sigBase = 0x0123456789ABCDEFL
    val sigs = (
      (0 until 6).map(i => (i.toLong, sigBase)) ++                   // identical: all 4 blocks match
      Seq(
        (10L, sigBase ^ 1L),                                         // 1 bit, block 0
        (11L, sigBase ^ (1L << 17)),                                 // 1 bit, block 1
        (12L, sigBase ^ 3L),                                         // 2 bits, block 0
        (13L, sigBase ^ (1L << 15) ^ (1L << 16)),                    // 2 bits across blocks 0/1
        (14L, sigBase ^ 7L),                                         // 3 bits, block 0
        (15L, sigBase ^ (1L << 15) ^ (1L << 31) ^ (1L << 47)),       // 3 bits, blocks 0/1/2
        (16L, sigBase ^ (1L << 0) ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)), // 4 bits: out of radius
        (17L, -1L),                                                  // unrelated
      )).toDF("doc_id", "ph")
    val got = Dedup.hammingBlockPairs(sigs, "ph", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rows = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, sa) <- rows; (b, sb) <- rows if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).sortBy(t => (t._1, t._2)).toSeq
    assert(got.sortBy(t => (t._1, t._2)) === want)
    assert(got.size === got.distinct.size, "a pair must be emitted exactly once")
    // the 4-bit neighbor is out of radius vs the base (no block match
    // either); it still pairs with the base's 1-bit neighbors at
    // Hamming 3 — covered by the brute-force equality above
    assert(!got.exists(t => (t._1, t._2) == (0L, 16L)))
  }

  test("simhash near-dup pairs are a subset of jaccard near-dups on real data") {
    val docs = Tables.documents(spark, sfDir)
    val sim = Dedup.simhashPairs(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = Dedup.ngramJaccardPairs(docs, tau = 0.3).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(jac))
  }

  test("embeddingDupSummary flags planted near-identical vectors") {
    val s = spark
    import s.implicits._
    val v0 = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val v0eps = v0.clone(); v0eps(0) = v0eps(0) + 1e-4f
    val other = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val emb = Seq(
      (0L, v0.toSeq), (1L, v0eps.toSeq), (2L, other.toSeq)
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingDupSummary(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) === ((0L, true)))
    assert(out(1L)._1 >= 1L && !out(1L)._2) // near-identical to vec 0 → dropped
    assert(out(2L) === ((0L, true)))
  }

  test("embeddingDupSummary keeps everything on the real corpus (no planted dups)") {
    val out = Dedup.embeddingDupSummary(Tables.embeddings(spark, sfDir))
    assert(out.where(!col("kept")).count() === 0L)
    assert(out.count() === Tables.embeddings(spark, sfDir).count())
  }

  // The collapse-first formulation's own arithmetic, on a corpus
  // shaped like ScaleUp (identical copies with interleaved ids plus
  // one near-identical distinct pair): identical-twin priors come
  // from the rank over the collapse window, cross-group priors from
  // the expanded distinct-pair verdicts — closed-form checkable.
  test("embeddingDupSummary on a duplicate-heavy corpus: exact prior counts") {
    val s = spark
    import s.implicits._
    val u = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val uEps = u.clone(); uEps(0) = uEps(0) + 1e-4f // cos ≈ 1 > τ vs u
    val far = Array.tabulate(16)(i => math.cos(5 * i + 2).toFloat)
    // group A = copies of u at ids {0, 100}; group B = copies of uEps
    // at ids {1, 101} (interleaved with A); group C far, ids {2, 102}
    val emb = Seq(
      (0L, u.toSeq), (100L, u.toSeq),
      (1L, uEps.toSeq), (101L, uEps.toSeq),
      (2L, far.toSeq), (102L, far.toSeq)
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingDupSummary(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A: id 0 first everywhere → 0; id 100: twin {0} + B-below {1} = 2
    // B: id 1: A-below {0} = 1;  id 101: twin {1} + A-below {0,100} = 3
    // C: far from both → twins only
    assert(out === Map(0L -> 0L, 100L -> 2L, 1L -> 1L, 101L -> 3L,
      2L -> 0L, 102L -> 1L))
  }

  test("pipelineStatus labels each doc with the first rejecting stage") {
    val s = spark
    import s.implicits._
    val good = (1 to 60).map(i => s"w$i the a of and to in is").mkString(" ")
    val docs = Seq(
      (0L, good),                       // kept
      (1L, good),                       // exact_dup of 0
      (2L, good.replace("w7 ", "w7x ")), // near_dup of 0
      (3L, "z")                          // unique but low quality
    ).toDF("doc_id", "text")
    val st = Dedup.pipelineStatus(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st === Map(0L -> "kept", 1L -> "exact_dup", 2L -> "near_dup", 3L -> "low_quality"))
  }

  test("pipelineStatus on the real corpus: statuses partition the table") {
    val docs = Tables.documents(spark, sfDir)
    val st = Dedup.pipelineStatus(docs)
    assert(st.count() === docs.count())
    // exact-dup count must match exactGroups' collapsed rows
    val nExactDup = docs.count() - Dedup.exactGroups(docs).count()
    assert(st.where(col("status") === "exact_dup").count() === nExactDup)
    // every near-dup label corresponds to a real jaccard pair partner
    val nearIds = st.where(col("status") === "near_dup")
      .collect().map(_.getLong(0)).toSet
    val pairB = Dedup.ngramJaccardPairs(docs).collect().map(_.getLong(1)).toSet
    assert(nearIds.subsetOf(pairB))
  }

  test("containmentPairs flags a doc pasted into a larger one (jaccard misses it)") {
    val s = spark
    import s.implicits._
    val small = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (0L, small),
      (1L, small + " " + filler), // 0 fully contained in 1
      (2L, filler.replace("f30", "x30"))
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.contains((0L, 1L)) && cont((0L, 1L)) >= 0.9)
    assert(!cont.contains((1L, 0L))) // big doc is not contained in the small one
    // symmetric jaccard stays below the near-dup threshold for this pair
    val jac = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 1L)))
  }

  test("clusterAssignments groups exact+near dups transitively, singletons stay alone") {
    val cl = Dedup.clusterAssignments(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(0L) === 0L && cl(1L) === 0L && cl(2L) === 0L) // 0≈1 exact, 0≈2 near
    assert(cl(3L) === 3L && cl(4L) === 4L)
  }

  test("simhashPairs: gram-less short docs never pair (no all-zero signatures)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "hello"), (1L, "bye now"), (2L, "one word"),   // < 3 words: no grams
      (3L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs).collect()
    assert(pairs.isEmpty)
  }

  // prefixLen = q·k+1 = 73 grams ⇒ docs under 75 chars are "short"
  // (vacuous pigeonhole); the planted set covers long↔long,
  // short↔short, and short↔long pairs plus a cross-lang exact copy
  // that must NOT pair.
  private lazy val edPlanted = {
    val s = spark
    import s.implicits._
    val d0 = "abcdefghij" * 20                  // 200 chars, long
    val d1 = d0.substring(0, 50) + "XYZ" + d0.substring(55) // ed 5 (3 sub + 2 del)
    val d2 = "mnopqr" * 10                      // 60 chars, short
    val d3 = d2.substring(0, 30) + "QQ" + d2.substring(32)  // ed 2
    val d4 = "stuvwx" * 13 + "yz"               // 80 chars, long
    val d5 = d4.substring(0, 70)                // short; ed(d4,d5) = 10
    val d6 = "qrstuvwxyz" * 20                  // unrelated long
    Seq(
      (0L, "en", d0), (1L, "en", d1), (2L, "en", d2), (3L, "en", d3),
      (4L, "en", d4), (5L, "en", d5), (6L, "en", d6),
      (7L, "de", d0)                            // exact copy, other lang
    ).toDF("doc_id", "lang", "text")
  }

  test("editDistancePairs finds long↔long, short↔short, and short↔long planted pairs") {
    val pairs = Dedup.editDistancePairs(edPlanted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.keySet === Set((0L, 1L), (2L, 3L), (4L, 5L)))
    assert(pairs((0L, 1L)) <= 5 && pairs((2L, 3L)) === 2 && pairs((4L, 5L)) === 10)
  }

  test("editDistancePairs: banded, prefix-broadcast, and prefix-window paths agree") {
    val banded = rowsOf(Dedup.editDistancePairs(edPlanted))
    assert(banded === rowsOf(
      Dedup.editDistancePairs(edPlanted, maxBandedPairsPerDoc = 0)))
    assert(banded === rowsOf(Dedup.editDistancePairs(edPlanted,
      maxBandedPairsPerDoc = 0, maxBroadcastVocab = 0)))
    // and on the real corpus
    val docs = Tables.documents(spark, sfDir)
    assert(rowsOf(Dedup.dedupEditDistance(spark, sfDir)) === rowsOf(
      Dedup.editDistancePairs(docs, maxBandedPairsPerDoc = 0)))
  }

  // The ScaleUp stress corpus is ~90% exact copies; without the
  // exact-duplicate collapse the candidate join multiplies by the
  // squared copy count (20 copies → 400× the rep-level join work)
  // for zero information. 31 distinct texts × 20 copies: every
  // within-group pair is ed=0 by construction, the one planted
  // near-dup text expands to copy×copy cross pairs, and the forced
  // prefix path must agree — candidate volume is bounded by distinct
  // texts either way.
  test("editDistancePairs on a 95%-duplicate corpus: collapse keeps both paths exact") {
    val s = spark
    import s.implicits._
    // pairwise-far distinct texts: 4 substituted chars per token ×
    // 12 tokens keeps every unplanted pair well past k=24
    def text(g: Int) = (0 until 12).map(j => s"g$g$g${g}t$j$g").mkString(" ")
    val alls = (0 until 30).map(text) :+ ("h" + text(0).drop(1)) // ed 1 vs group 0
    val docs = alls.zipWithIndex.flatMap { case (t, g) =>
      (0 until 20).map(c => (g * 100L + c, "en", t))
    }.toDF("doc_id", "lang", "text")
    val rows = Dedup.editDistancePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val (within, cross) = rows.partition { case (a, b, _) => a / 100 == b / 100 }
    assert(within.length === 31 * 190 && within.forall(_._3 == 0))
    assert(cross.length === 400 && cross.forall { case (a, b, ed) =>
      a / 100 == 0 && b / 100 == 30 && ed == 1
    })
    assert(rows.toSet === Dedup.editDistancePairs(docs, maxBandedPairsPerDoc = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
  }

  test("substringExactSpans: planted copied passage yields exact span boundaries") {
    val s = spark
    import s.implicits._
    val P = (1 to 12).map(i => s"p$i").mkString(" ")  // 12-token passage
    val Q = (1 to 8).map(i => s"q$i").mkString(" ")   // 8-token intra-doc repeat
    val docs = Seq(
      // passage at tokens 11..22
      (0L, ((1 to 10).map(i => s"u$i").mkString(" ")) + " " + P + " " +
        ((1 to 10).map(i => s"v$i").mkString(" "))),
      // same passage at tokens 6..17
      (1L, ((1 to 5).map(i => s"x$i").mkString(" ")) + " " + P + " " +
        ((1 to 8).map(i => s"y$i").mkString(" "))),
      // intra-doc repeat: Q at 1..8 and again at 10..17
      (2L, Q + " z1 " + Q),
      // exact-duplicate pair: the collapse must count copies toward
      // window frequency (every window occurs twice across the pair)
      // and expand the rep's whole-doc span to both members
      (3L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (4L, (1 to 30).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.substringExactSpans(docs, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(
      (0L, 11L, 22L, 12L),
      (1L, 6L, 17L, 12L),
      (2L, 1L, 8L, 8L),
      (2L, 10L, 17L, 8L),
      (3L, 1L, 30L, 30L),
      (4L, 1L, 30L, 30L)))
    // real corpus: spans exist, every span is >= k tokens and in-bounds
    val real = Dedup.substringExactSpans(Tables.documents(spark, sfDir)).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(3) >= 8L)
      assert(r.getLong(2) - r.getLong(1) + 1 === r.getLong(3))
      assert(r.getLong(1) >= 1L)
    }
  }
}
