package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def fakeDocs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shard manifest: per-source byte stream is gapless, offsets in range") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.mmShardManifest(spark, sfDir).localCheckpoint()
    val b = Multimodal.ShardBytes
    // offsets always inside a shard; shard naming embeds source + id
    assert(out.where(col("offset") < 0 || col("offset") >= b).count() === 0)
    assert(out.where(col("shard") =!=
      concat(col("source"), lit("-"), lpad(col("shard_id").cast("string"), 5, "0")))
      .count() === 0)
    // reconstructing start bytes: within a source, each sample starts
    // exactly where the previous one ended (no gaps, no overlaps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val chained = out
      .withColumn("start", col("shard_id") * b + col("offset"))
      .withColumn("prev_end",
        lag(col("shard_id") * b + col("offset") + col("n_bytes"), 1).over(w))
    assert(chained.where(col("prev_end").isNotNull &&
      col("start") =!= col("prev_end")).count() === 0)
    assert(chained.where(col("prev_end").isNull && col("start") =!= 0).count() === 0)
    // gate corpus actually spans multiple shards per source
    val shardsPerSource = out.groupBy("source")
      .agg(countDistinct("shard_id").as("ns"))
    assert(shardsPerSource.where(col("ns") < 2).count() === 0)
  }

  test("decodeMeta: byte length, magic bytes, stub dimensions") {
    val docs = fakeDocs((1L, "abcdefgh"))
    val r = Multimodal.decodeMeta(docs).head()
    assert(r.getLong(1) === 8L)
    assert(r.getString(2) === "61626364") // 'abcd'
    assert(r.getLong(3) === 64L + 8L % 512L)
    assert(r.getLong(4) === 64L + (8L * 7L) % 512L)
  }

  test("frameSample: every 4th full 64-byte frame, md5 of the slice") {
    val payload = ("x" * 64) + ("y" * 64 * 3) + ("z" * 64) + "tail"
    val docs = fakeDocs((1L, payload))
    val frames = Multimodal.frameSample(docs).collect()
    // 5 full chunks (0..4): sampled b = 0 and 4 → frames 0 and 1
    assert(frames.length === 2)
    assert(frames(0).getLong(1) === 0L && frames(0).getLong(2) === 0L)
    assert(frames(1).getLong(1) === 1L && frames(1).getLong(2) === 256L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected0 = md.digest(("x" * 64).getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(frames(0).getString(3) === expected0)
    md.reset()
    val expected1 = md.digest(("z" * 64).getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(frames(1).getString(3) === expected1)
  }

  test("frameSample skips payloads shorter than one frame") {
    assert(Multimodal.frameSample(fakeDocs((1L, "short"))).count() === 0L)
  }

  test("resize: stride sampling bounded by target, hash deterministic") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abcdefgh" * 100), (1L, "xy")).toDF("doc_id", "text")
    val out = Multimodal.resize(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val (len0, stride0, outLen0, _) = out(0L)
    assert(len0 === 800L && stride0 === 3L) // 800/256 = 3
    assert(outLen0 <= 256L && (outLen0 - 1) * stride0 < len0)
    val (len1, stride1, outLen1, _) = out(1L)
    assert(len1 === 2L && stride1 === 1L && outLen1 === 2L) // short doc: identity
    // determinism
    assert(Multimodal.resize(docs).collect().toSeq === Multimodal.resize(docs).collect().toSeq)
  }

  test("binaryDedup groups planted byte-identical payloads, skips unique ones") {
    // docs 1,3,9 share bytes; 2 differs by one char; 5 unique
    val docs = fakeDocs((1L, "same bytes here"), (3L, "same bytes here"),
      (9L, "same bytes here"), (2L, "same bytes herE"), (5L, "other"))
    val out = Multimodal.binaryDedup(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L)    // keeper = min doc_id
    assert(r.getLong(1) === 3L)    // three copies
    assert(r.getLong(2) === 15L)
    // the corpus at this SF has no raw-byte duplicates: empty manifest
    assert(Multimodal.mmDedup(spark, sfDir).count() === 0L)
  }

  test("features: byte stats are exact on a known payload") {
    val s = spark
    import s.implicits._
    val docs = Seq((7L, "aab")).toDF("doc_id", "text") // bytes 97,97,98
    val r = Multimodal.features(docs).head
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 97.3333)
    assert(r.getLong(3) === 2L)
    assert(r.getLong(4) === 98L)
  }

  test("phashPairs: identical payloads at Hamming 0, one-block tweak at 1, unrelated unpaired") {
    // 128-byte payloads → 2 bytes per block; strong block contrast so
    // the global-mean comparison has no marginal bits
    val a = "a" * 64 + "z" * 64
    val tweaked = "a" * 64 + "z" * 62 + "aa" // block 63 flips, others far from the mean
    val other = "az" * 64                     // every block mean == global mean → all-zero hash
    val pairs = Multimodal.phashPairs(
      fakeDocs(0L -> a, 1L -> a, 2L -> tweaked, 3L -> other))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) === 0L)
    assert(pairs((0L, 2L)) === 1L && pairs((1L, 2L)) === 1L)
    assert(pairs.size === 3) // doc 3 pairs with nothing (Hamming 32)
  }

  /** r20 optimization pin: the codegen'd `graft_phash` expression must
    * be bit-identical to the typed-Dataset closure it replaced —
    * reimplemented here verbatim as the driver-side baseline — on
    * boundary (63/64/65-byte), constant, high-contrast, and re-encoded
    * payloads; and under-64-byte payloads must still yield no row.
    */
  test("graft_phash equals the closure aHash bit-for-bit; <64-byte payloads drop") {
    def closureHash(bytes: Array[Byte]): Long = {
      val n = bytes.length
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var tot = 0L
      var i = 0
      while (i < n) {
        val b = ((i.toLong * 64L) / n).toInt
        val v = bytes(i) & 0xff
        sums(b) += v; cnts(b) += 1; tot += v
        i += 1
      }
      var h = 0L
      var j = 0
      while (j < 64) { if (sums(j) * n > tot * cnts(j)) h |= (1L << j); j += 1 }
      h
    }
    val payloads = Seq(
      10L -> "x" * 63,                    // below the floor: no signature
      11L -> "x" * 64,                    // exactly at the floor
      12L -> "x" * 65,                    // one spare byte
      13L -> ("a" * 64 + "z" * 64),       // strong block contrast
      14L -> ("az" * 64),                 // every block mean == global mean
      15L -> ("a" * 64 + "z" * 62 + "aa"),// one-block tweak
      16L -> (0 until 1000).map(i => ('a' + i % 26).toChar).mkString)
    val got = Multimodal.phashSummary(fakeDocs(payloads: _*))
    val sigs = got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!sigs.contains(10L), "sub-64-byte payload must produce no signature")
    payloads.filter(_._2.length >= 64).foreach { case (id, s) =>
      val want = closureHash(s.getBytes("UTF-8"))
      assert(sigs(id) === f"$want%X", s"doc $id")
    }
  }

  test("aspectBucket: thresholds honored, batches are contiguous doc-order slices of ≤ 16") {
    val out = Multimodal.mmAspectBucket(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, bucket, shard, _) =>
      val ap = 100 * w / h
      val want =
        if (ap < 50) "tall" else if (ap < 90) "portrait"
        else if (ap <= 111) "square" else if (ap <= 200) "landscape" else "wide"
      assert(bucket === want, s"doc $id ap $ap")
      assert(shard === id % Multimodal.AspectShards)
    }
    out.groupBy(r => (r._4, r._5)).foreach { case (_, rows) =>
      val byDoc = rows.sortBy(_._1)
      // batch ids cut the doc-ordered stream every AspectBatch rows
      byDoc.zipWithIndex.foreach { case (r, i) =>
        assert(r._6 === i.toLong / Multimodal.AspectBatch)
      }
    }
  }
}
