package graft.tools

import graft._
import graft.similarity.{Ann, OpqTrain}

/** One-off tournament readout: per-candidate recall hits on a corpus
  * dir (the integer tournament metric over the 16-query sample) and
  * per-candidate joint PQ distortion Σ‖rep − decode(rep)‖² under each
  * candidate's OWN trained codebook — the objective Ge's alternation
  * minimizes, which must DECREASE from its init if the sweeps work.
  * r19: all driver-side over the bounded training sample.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(32, "opq-probe")
    val emb = Tables.embeddings(spark, dir).localCheckpoint()
    val (ids, vecs) = OpqTrain.collectSample(emb, OpqTrain.TrainSample)
    System.err.println(s"OPQ sample: ${ids.length} of ${emb.count()} vectors")
    val cs = OpqTrain.candidates(ids, vecs)
    val hits = OpqTrain.tournamentHits(ids, vecs, cs)
    System.err.println("OPQ tournament hits (pq, id, rr, ct, conc, bal, altA, altB): " +
      hits.mkString(", "))
    val dists = cs.map { case (t, lloyd) =>
      OpqTrain.jointDistortion(ids, OpqTrain.applyTransform(vecs, t),
        if (lloyd) OpqTrain.LloydIters else 0)
    }
    System.err.println("OPQ joint distortion (pq, id, rr, ct, conc, bal, altA, altB): " +
      dists.map(d => f"$d%.2f").mkString(", "))
    spark.stop()
  }
}
