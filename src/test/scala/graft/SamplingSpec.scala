package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("q_train_split: disjoint cover with roughly 80/10/10 proportions") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val assigned = Sampling.withSplit(docs)
    // every doc gets exactly one split, nothing dropped
    assert(assigned.count() === n)
    val bySplit = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit.values.sum === n)
    // hash thresholds target 79.7 / 10.2 / 10.1 %; allow generous slack
    // at sf0.001 (500 docs)
    val train = bySplit("train").toDouble / n
    assert(train > 0.70 && train < 0.90, s"train fraction $train")
    assert(bySplit("val") > 0 && bySplit("test") > 0)
  }

  test("q_train_split: assignment is a pure function of doc_id (stable under repartition)") {
    val docs = Tables.documents(spark, sfDir)
    val a = Sampling.withSplit(docs).select("doc_id", "split")
    val b = Sampling.withSplit(docs.repartition(13)).select("doc_id", "split")
    assert(rowsOf(a) === rowsOf(b))
  }

  test("q_sample_stratified: equal allocation, k = smallest stratum") {
    val docs = Tables.documents(spark, sfDir)
    val k = docs.groupBy("lang").count().agg(min("count")).head.getLong(0)
    val out = Sampling.qSampleStratified(spark, sfDir)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = docs.select("lang").distinct().count()
    assert(perLang.size === langs)
    assert(perLang.values.forall(_ === k), s"per-lang counts $perLang, k=$k")
    // the sample is a subset of the corpus
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).forall(ids))
  }

  test("q_sample_weighted: deterministic, length-biased, top-k plan") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sampling.qSampleWeighted(spark, sfDir)
    val rows = rowsOf(out)
    assert(rows.size === Sampling.WeightedK)
    // pure function of the data: identical across invocations
    assert(rowsOf(Sampling.qSampleWeighted(spark, sfDir)) === rows)
    // w = n_chars + 1 biases toward longer docs: the sample's mean
    // length must clearly exceed the corpus mean (E-S inclusion
    // probability is increasing in w)
    val corpusMean = docs.agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = out.agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean * 1.1,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
    // scale shape: the selection is a bounded-heap top-k, not a
    // global sort of the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("q_sample_balanced: caps every source at the quota, keeps small sources whole") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sampling.qSampleBalanced(spark, sfDir)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    corpus.foreach { case (s, n) =>
      assert(perSource(s) === math.min(n, Sampling.SourceCap), s"source $s")
    }
    // stable under repartition: membership is a pure function of keys
    assert(rowsOf(Sampling.qSampleBalanced(spark, sfDir)) === rowsOf(out))
  }

  test("q_shuffle_shard: a permutation into shards with contiguous positions") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sampling.qShuffleShard(spark, sfDir).collect()
    assert(out.length === docs.count())
    // every doc exactly once
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    // shard ids in range; positions contiguous from 1 within each shard
    val byShard = out.groupBy(_.getInt(1))
    assert(byShard.keySet.forall(s => s >= 0 && s < Sampling.Shards))
    byShard.foreach { case (s, rows) =>
      val pos = rows.map(_.getLong(2)).sorted.toSeq
      assert(pos === (1L to rows.length.toLong).toSeq, s"shard $s")
    }
    // deterministic: same permutation on re-run
    assert(Sampling.qShuffleShard(spark, sfDir).collect().toSeq === out.toSeq)
  }

  test("q_sample_temperature: quotas are √n-proportional — between balanced and raw") {
    val out = Sampling.qSampleTemperature(spark, sfDir).localCheckpoint()
    val taken = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Tables.documents(spark, sfDir).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source survives (the ≥1 floor), no quota exceeds the stratum
    assert(taken.keySet === sizes.keySet)
    taken.foreach { case (s, k) => assert(k >= 1L && k <= sizes(s)) }
    // sub-linear damping: for any two sources, the take ratio sits
    // between 1 (balanced) and the raw size ratio (proportional) —
    // within ±1 doc of the floor/ceil rounding
    for {
      (a, na) <- sizes; (b, nb) <- sizes
      if na > nb && taken(a) > 1L && taken(b) >= 1L && taken(a) < sizes(a)
    } {
      assert(taken(a) + 1 >= taken(b), s"$a vs $b: heavier source took fewer")
      assert((taken(a) - 1).toDouble / (taken(b) + 1) <= na.toDouble / nb,
        s"$a vs $b: damping exceeded the raw size ratio")
    }
    // a pure function of the keys: identical on re-run
    assert(rowsOf(Sampling.qSampleTemperature(spark, sfDir)) === rowsOf(out))
  }
}
