package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def fakeDocs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
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
}
