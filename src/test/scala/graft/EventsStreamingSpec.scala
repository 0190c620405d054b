package graft

import graft.operators.Events
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Sessionization invariants + batch/stream agreement. */
class EventsStreamingSpec extends SparkSpec {

  test("ts_sec is timezone-independent: a non-UTC session yields the same epochs") {
    // The NTZ branch of Events.tsSecOf must read the wall-clock fields
    // directly — a cast to TIMESTAMP would re-interpret the wall time
    // in the session zone, silently shifting every epoch (and so every
    // session/window boundary) by the zone offset under a session that
    // does not pin UTC the way GraftSession.tuned does.
    val utc = Events.eventsSec(spark, sfDir)
      .select("event_id", "ts_sec").orderBy("event_id").collect().toSeq
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ny = Events.eventsSec(spark, sfDir)
        .select("event_id", "ts_sec").orderBy("event_id").collect().toSeq
      assert(ny === utc)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("batch sessionize: sessions partition the events, gaps respect the threshold") {
    val sess = Events.qEventsSessionize(spark, sfDir).localCheckpoint()
    val nEvents = Events.eventsSec(spark, sfDir).count()
    val sums = sess.agg(sum("n_events")).head().getLong(0)
    assert(sums === nEvents)
    // within a user, consecutive sessions are separated by > GapSec
    // and each session's span only contains gaps ≤ GapSec (span check:
    // start ≤ end always; adjacency check via lead)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val bad = sess
      .withColumn("next_start", lead(col("session_start"), 1).over(w))
      .where(col("next_start").isNotNull &&
        col("next_start") - col("session_end") <= Events.GapSec)
      .count()
    assert(bad === 0L)
    assert(sess.where(col("session_start") > col("session_end")).count() === 0L)
  }

  test("q_events_retention: offset-0 cells recover every user exactly once") {
    val out = Events.qEventsRetention(spark, sfDir).collect()
    val offsets = out.map(_.getLong(1))
    assert(offsets.forall(o => o >= 0 && o <= 8))
    // every user is active in their own first week, so the offset-0
    // diagonal partitions the user base: its n_users sum equals the
    // table's distinct-user count
    val offset0 = out.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(offset0 === users, s"offset-0 sum $offset0 vs $users users")
  }

  test("q_merge_upsert: actions partition the key space and agree with week membership") {
    val out = Events.qMergeUpsert(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ev = Events.eventsSec(spark, sfDir)
      .select(col("user_id"), col("ts_sec"),
        org.apache.spark.sql.functions.expr("((ts_sec div 86400) + 3) div 7").as("wk"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val maxWk = ev.map(_._2).max
    val deltaUsers = ev.filter(_._2 == maxWk).map(_._1).toSet
    val targetUsers = ev.filter(_._2 < maxWk).map(_._1).toSet
    val byAction = out.groupBy(_.getString(4)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // one output row per user, exactly the union of both sides
    assert(out.length === (deltaUsers ++ targetUsers).size)
    assert(byAction.getOrElse("update", Set.empty) === (deltaUsers intersect targetUsers))
    assert(byAction.getOrElse("insert", Set.empty) === (deltaUsers -- targetUsers))
    assert(byAction.getOrElse("keep", Set.empty) === (targetUsers -- deltaUsers))
    // updated/inserted rows carry newest-week timestamps, kept rows older ones
    val wkOf = (s: Long) => ((s / 86400) + 3) / 7
    out.foreach { r =>
      val wk = wkOf(r.getLong(3))
      if (r.getString(4) == "keep") assert(wk < maxWk) else assert(wk === maxWk)
    }
  }

  test("stream_sessionize equals batch sessionize") {
    val batch = Events.qEventsSessionize(spark, sfDir)
    val stream = Streaming.streamSessionize(spark, sfDir)
    assert(rowsOf(stream) === rowsOf(batch))
  }

  test("stream_anomaly flags agree with a batch expanding-window recomputation") {
    import org.apache.spark.sql.expressions.Window
    val out = Streaming.streamAnomaly(spark, sfDir).localCheckpoint()
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = Events.eventsSec(spark, sfDir)
      .withColumn("cents", round(col("value") * 100.0, 0).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cents")).over(w).cast("double"))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w).cast("double"))
      .where(col("n") >= Streaming.AnomMinPrior)
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("variance",
        (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
      .where(col("variance") > 0.0)
      .withColumn("z", (col("cents") - col("mean")) / sqrt(col("variance")))
      .where(abs(col("z")) > 2.0)
    val streamIds = out.select("event_id").collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamIds.nonEmpty)
    assert(streamIds === batchIds)
    // flags are prior-only: every flagged event has ≥ MinPrior earlier
    // events for its user, and a reported |z| at/above the threshold
    // (≥, not >: the reported z is 4-dp rounded, so a true 2.00004
    // legitimately prints as 2.0)
    assert(out.where(col("n_prior") < Streaming.AnomMinPrior).count() === 0)
    assert(out.where(abs(col("z")) < 2.0).count() === 0)
  }

  test("stream_ewma equals a batch per-user expanding fold") {
    val out = Streaming.streamEwma(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out.nonEmpty)
    val ev = Events.eventsSec(spark, sfDir)
      .withColumn("cents", round(col("value") * 100.0, 0).cast("long"))
      .select("user_id", "ts_sec", "event_id", "cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.size === ev.length)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var n = 0L
      var ew = 0.0
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, eid, cents) =>
        val x = cents.toDouble
        ew = if (n == 0L) x else Events.EwmaAlpha * x + Events.EwmaBeta * ew
        n += 1
        val (gn, ge) = out(eid)
        assert(gn === n)
        assert(math.abs(ge - ew / 100.0) < 5e-5, s"event $eid: $ge vs ${ew / 100.0}")
      }
    }
  }

  test("stream_funnel equals the batch funnel") {
    val batch = Events.qEventsFunnel(spark, sfDir)
    val stream = Streaming.streamFunnel(spark, sfDir)
    assert(rowsOf(stream) === rowsOf(batch))
  }

  test("stream_latest_state equals the batch per-key argmax") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    val batch = Events.eventsSec(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("ts_sec").as("last_ts"),
        col("event_id").as("last_event_id"), col("event_type").as("last_type"),
        col("value").as("last_value"))
    val stream = Streaming.streamLatestState(spark, sfDir)
    assert(rowsOf(stream) === rowsOf(batch))
  }

  test("stream_window_agg equals the batch window agg (sans distinct users)") {
    val batch = Events.qEventsWindow(spark, sfDir)
      .select("window_start", "event_type", "n_events", "total_value")
    val stream = Streaming.streamWindowAgg(spark, sfDir)
    assert(rowsOf(stream) === rowsOf(batch))
  }

  test("stream_topk equals the batch per-window top-k") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("window_start")
      .orderBy(col("total_value").desc, col("user_id"))
    val batch = Events.eventsSec(spark, sfDir)
      .groupBy(expr(s"(ts_sec div ${Events.WindowSec}) * ${Events.WindowSec}")
        .as("window_start"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= Streaming.TopKPerWindow)
    assert(rowsOf(Streaming.streamTopk(spark, sfDir)) === rowsOf(batch))
  }

  test("stream_join_recent equals the batch bounded-interval join") {
    val stream = rowsOf(streaming.Streaming.streamJoinRecent(spark, sfDir))
    val ev = operators.Events.eventsSec(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_sec").as("purchase_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts_sec").as("click_ts"))
    val batch = rowsOf(p.join(c, col("cu") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - streaming.Streaming.JoinWindowSec &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("purchase_ts"), col("click_ts")))
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  // Same results under the RocksDB provider — the production store
  // once per-shard key spaces outgrow executor heap. The flag routes
  // through withStateStore; equality (not just rows>0) pins that
  // state semantics are provider-independent for both an arbitrary-
  // state op (sessionize) and a dropDuplicates op.
  test("streaming ops agree under the default and RocksDB state stores") {
    val sessDefault = rowsOf(streaming.Streaming.streamSessionize(spark, sfDir))
    val dedupDefault = rowsOf(streaming.Streaming.streamDedup(spark, sfDir))
    spark.conf.set("spark.graft.stateStore", "rocksdb")
    try {
      assert(rowsOf(streaming.Streaming.streamSessionize(spark, sfDir)) === sessDefault)
      assert(rowsOf(streaming.Streaming.streamDedup(spark, sfDir)) === dedupDefault)
    } finally spark.conf.unset("spark.graft.stateStore")
    assert(sessDefault.nonEmpty && dedupDefault.nonEmpty)
  }

  // r19 multi-batch drains: with spark.graft.streamMaxFiles=1 every
  // sorted staging part is its own microbatch — the maximal split, the
  // watermark advancing (and state flushing) at every boundary. Every
  // stateful shape must still produce its bulk-drain rows: the
  // windowed aggs finalize windows exactly once (time-sorted staging
  // means no late drops), sessionize preserves numbering through the
  // timeout tombstone, funnel keeps its fold across snapshots, latest
  // keeps the last emission, and the per-event folds (ewma) see the
  // oracle's (ts_sec, event_id) order across boundaries.
  test("streaming ops are microbatch-split invariant (maxFiles=1 vs bulk)") {
    val ops: Seq[(String, () => Set[Seq[Any]])] = Seq(
      "sessionize" -> (() => rowsOf(streaming.Streaming.streamSessionize(spark, sfDir))),
      "funnel" -> (() => rowsOf(streaming.Streaming.streamFunnel(spark, sfDir))),
      "latest" -> (() => rowsOf(streaming.Streaming.streamLatestState(spark, sfDir))),
      "topk" -> (() => rowsOf(streaming.Streaming.streamTopk(spark, sfDir))),
      "ewma" -> (() => rowsOf(streaming.Streaming.streamEwma(spark, sfDir))),
      "window_append" -> (() => rowsOf(streaming.Streaming.streamWindowAppend(spark, sfDir))),
      "join_recent" -> (() => rowsOf(streaming.Streaming.streamJoinRecent(spark, sfDir))),
      "dedup_wm" -> (() => rowsOf(streaming.Streaming.streamDedupWatermark(spark, sfDir))),
      // r20 (ADVICE): the remaining stateful shapes — anomaly is the
      // other per-event (ts_sec, event_id)-ordered fold whose output
      // depends on batch boundaries honoring the sorted staging
      "anomaly" -> (() => rowsOf(streaming.Streaming.streamAnomaly(spark, sfDir))),
      "window_agg" -> (() => rowsOf(streaming.Streaming.streamWindowAgg(spark, sfDir))),
      "dedup" -> (() => rowsOf(streaming.Streaming.streamDedup(spark, sfDir))))
    val bulk = ops.map { case (n, f) => n -> f() }
    spark.conf.set("spark.graft.streamMaxFiles", "1")
    try ops.zip(bulk).foreach { case ((n, f), (_, b)) =>
      val split = f()
      assert(split === b, s"$n: maxFiles=1 drain must equal the bulk drain")
      assert(split.nonEmpty, s"$n: empty result")
    } finally spark.conf.unset("spark.graft.streamMaxFiles")
  }

  // The two rate×interval-state ops default to RocksDB (their state
  // grows with buffered rows, not key count); the explicit conf must
  // still force them back on-heap with identical results, so the
  // on-heap path stays covered after the default flip.
  test("RocksDB-default ops agree when forced back to the on-heap store") {
    val joinRocks = rowsOf(streaming.Streaming.streamJoinRecent(spark, sfDir))
    val dedupWmRocks = rowsOf(streaming.Streaming.streamDedupWatermark(spark, sfDir))
    spark.conf.set("spark.graft.stateStore", "default")
    try {
      assert(rowsOf(streaming.Streaming.streamJoinRecent(spark, sfDir)) === joinRocks)
      assert(rowsOf(streaming.Streaming.streamDedupWatermark(spark, sfDir)) === dedupWmRocks)
    } finally spark.conf.unset("spark.graft.stateStore")
    assert(joinRocks.nonEmpty && dedupWmRocks.nonEmpty)
  }
}
