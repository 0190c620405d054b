package graft

import graft.streaming.Streaming

/** Pins the streaming state-shard auto-sizing policy — the
  * requested-vs-granted split the sf10 probe surfaced (BASELINE.md:
  * sessionize "wants 107 shards, gets 32 cores"). Streaming state is
  * sharded at query START and never AQE-coalesced, so this policy is
  * the one knob that decides state parallelism for the life of a
  * query; the spec keeps its three regimes (floor, data-sized, capped)
  * and the cap-beats-floor edge from drifting.
  */
class StreamingShardSpec extends SparkSpec {

  private val MB = 1L << 20

  test("tiny corpora take the floor of 4 shards") {
    val s = Streaming.shardPolicy(bytes = 100_000L, cores = 32)
    assert(s.requested === 4)
    assert(s.granted === 4)
  }

  test("mid-size corpora are data-sized at ~2 MB of input per shard") {
    val s = Streaming.shardPolicy(bytes = 64 * MB, cores = 64)
    assert(s.requested === 32) // 64 MB / 2 MB — the hand-tuned sf3 ratio
    assert(s.granted === 32)
  }

  test("requests above the session's cores are capped, and the gap is visible") {
    // the sf10 shape: ~214 MB of staged events wants 107 shards
    val s = Streaming.shardPolicy(bytes = 214 * MB, cores = 32)
    assert(s.requested === 107)
    assert(s.granted === 32)
    // the same corpus on a 128-core cluster gets its full request —
    // the cap self-resolves with executor count, nothing re-tunes
    assert(Streaming.shardPolicy(bytes = 214 * MB, cores = 128).granted === 107)
  }

  test("on sub-floor sessions the core cap beats the floor") {
    val s = Streaming.shardPolicy(bytes = 100_000L, cores = 2)
    assert(s.requested === 4)
    assert(s.granted === 2) // more state tasks than cores only adds scheduling
  }

  test("granted never exceeds cores or requested, and never drops below 1") {
    for (bytes <- Seq(0L, 1L, MB, 50 * MB, 3000 * MB); cores <- Seq(1, 4, 32, 1000)) {
      val s = Streaming.shardPolicy(bytes, cores)
      assert(s.granted >= 1 && s.granted <= cores && s.granted <= s.requested,
        s"bytes=$bytes cores=$cores -> $s")
    }
  }

  test("shardSizing reads the staged events bytes for the session's parallelism") {
    val s = Streaming.shardSizing(spark, sfDir)
    assert(s.cores === spark.sparkContext.defaultParallelism)
    assert(s.bytes > 0L, "sf0.001 events.parquet should be non-empty")
    assert(s === Streaming.shardPolicy(s.bytes, s.cores))
  }
}
