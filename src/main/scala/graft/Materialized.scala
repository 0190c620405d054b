package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped materialization catalog shared by the derived-graph
  * and dedup families: a value derived from a corpus directory is
  * built once per (session, dir, version) and served to every later
  * consumer in the session — the engine's equivalent of the
  * reference's load-once-query-many model. Bounded: a handful of
  * named entries per scale dir.
  *
  * Contract:
  *  - values are built OUTSIDE the map lock (get/putIfAbsent, not
  *    computeIfAbsent) so builders may legally nest — a derivation
  *    that consumes another catalog entry must not deadlock or trip
  *    ConcurrentHashMap's recursive-update detection;
  *  - a lost build race serves the winner's value; the loser's
  *    checkpoint blocks are reclaimed by the ContextCleaner when its
  *    frame is collected;
  *  - the key folds in a (name, size, mtime) fingerprint of the dir's
  *    files, so a regenerated corpus (ScaleUp rewrites in place) is
  *    re-derived instead of served stale — superseded entries are
  *    bounded (a few per regeneration) and dropped with the session;
  *  - entries are evicted when the owning session's application ends,
  *    so stopped sessions don't pin frames for the JVM's lifetime.
  */
object Materialized {

  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long, String), AnyRef]()
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Fingerprint of the dir's table files: name, size, and mtime of
    * every file in the tree (unbounded walk, so nested layouts like
    * Hive-partitioned `table/key=X/part-*` are covered too — a corpus
    * dir holds at most a few thousand entries, so the stat cost stays
    * microseconds against the frames this catalog holds). A max-mtime
    * probe would serve stale frames when a corpus is regenerated
    * within the filesystem's mtime granularity, or when a part file
    * is rewritten in place without touching its parent dir's mtime;
    * hashing (name, size, mtime) per file catches both.
    *
    * Races with an in-flight regeneration (ScaleUp rewrites in place)
    * must not crash the calling query: a file that vanishes between
    * enumeration and stat is skipped, and if the walk itself dies on a
    * vanished subtree the version falls back to a nanoTime nonce —
    * the lookup re-derives (never stale, never a crash) and the
    * one-off entry is dropped with the session.
    */
  private def dirVersion(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return 0L
    try {
      val s = java.nio.file.Files.walk(p)
      try {
        var h = 1125899906842597L
        val it = s.sorted().iterator()
        while (it.hasNext) {
          val f = it.next()
          try {
            val mtime = java.nio.file.Files.getLastModifiedTime(f).toMillis
            val size =
              if (java.nio.file.Files.isRegularFile(f)) java.nio.file.Files.size(f) else 0L
            h = h * 31 + f.getFileName.toString.hashCode
            h = h * 31 + mtime
            h = h * 31 + size
          } catch {
            case _: java.io.IOException => // vanished mid-walk: skip
          }
        }
        h
      } finally s.close()
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
        System.nanoTime()
    }
  }

  def of[A <: AnyRef](spark: SparkSession, dir: String, name: String)(build: => A): A = {
    val key = (spark, dir, dirVersion(dir), name)
    val hit = catalog.get(key)
    if (hit != null) return hit.asInstanceOf[A]
    if (evictionHooked.add(spark)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          catalog.keySet.removeIf(_._1 eq spark)
          evictionHooked.remove(spark)
        }
      })
    }
    val built = build
    val prior = catalog.putIfAbsent(key, built)
    if (prior != null) prior.asInstanceOf[A] else built
  }

  /** Test/bench hook: drop every materialized entry for `spark`,
    * forcing the next lookup to re-derive (the cold-catalog bench
    * mode's reset).
    */
  def evict(spark: SparkSession): Unit =
    catalog.keySet.removeIf(_._1 eq spark)
}
