package graft.tools

import graft._
import graft.similarity.OpqTrain

/** r19 probe: phase-by-phase wall of the OPQ training path on a
  * corpus dir — sample collection, butterfly branches, alternation
  * branches, and the 8-candidate recall tournament, all driver-side
  * over the bounded sample since r19.
  */
object OpqTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "opq-timing")
    val emb = Tables.embeddings(spark, dir).localCheckpoint()
    OpqTrain.phaseTimer =
      Some((tag, s) => System.err.println(f"OPQT $tag%-12s $s%.2f s"))
    val t0 = System.nanoTime()
    val model = OpqTrain.train(emb)
    System.err.println(f"OPQT total        ${(System.nanoTime() - t0) / 1e9}%.2f s" +
      s" (layers ${model.transform.layers.map(_._1).mkString("/")}," +
      s" codebook ${if (model.codebook.isDefined) "lloyd" else "seed"})")
    spark.stop()
  }
}
