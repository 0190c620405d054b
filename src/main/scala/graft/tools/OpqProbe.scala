package graft.tools
import graft._
import graft.similarity.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off tournament readout: per-candidate recall hits on a corpus
  * dir (the integer tournament metric over the 16-query sample) and
  * per-candidate PQ quantization distortion Σ‖rep − decode(rep)‖² —
  * the alternation's own objective, which must DECREASE from its init
  * if the sweeps are working.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(32, "opq-probe")
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).localCheckpoint()
    val truth = Ann.bruteForceTopK(emb).select("qid", "vec_id").localCheckpoint()
    val ts = Ann.opqTransforms(emb)
    val hits = ts.map(t => Ann.opqRecallHits(emb, truth, t))
    System.err.println(s"OPQ tournament hits (id, rr, ct, conc, bal, altA, altB): ${hits.mkString(", ")}")
    def distortion(rep: DataFrame): Double = {
      val seeds = rep.where(col("vec_id") < Ann.PqCentroids)
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
      val dim = seeds.head.length
      val sub = dim / Ann.PqSubspaces
      rep.select(col("embedding")).as[Array[Float]].collect().map { v =>
        var tot = 0.0
        var m = 0
        while (m < Ann.PqSubspaces) {
          var best = Double.MaxValue
          var c = 0
          while (c < Ann.PqCentroids) {
            var d2 = 0.0; var i = 0
            while (i < sub) {
              val diff = v(m * sub + i).toDouble - seeds(c)(m * sub + i).toDouble
              d2 += diff * diff; i += 1
            }
            if (d2 < best) best = d2
            c += 1
          }
          tot += best; m += 1
        }
        tot
      }.sum
    }
    val dists = ts.map(t => distortion(Ann.applyOpq(emb, t)))
    System.err.println(s"OPQ distortion (id, rr, ct, conc, bal, altA, altB): ${dists.map(d => f"$d%.2f").mkString(", ")}")
    spark.stop()
  }
}
