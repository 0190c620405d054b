package graft.tools
import graft._
object GiniTiming {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/gini_stress"
    val spark = GraftSession.local(32, "gini-timing")
    def time(label: String, f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"TIMING $label: med ${ts.sorted.apply(2)}%.2f min ${ts.min}%.2f runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("bucketed(CASE)", operators.Relational.qGiniImpl(spark, dir, forceBucketed = true).collect())
    time("bucketed(paramJoin)", operators.Relational.qGiniImpl(spark, dir, forceBucketed = true, forceParamJoin = true).collect())
    time("exactWindow", operators.Relational.qGiniImpl(spark, dir, forceBucketed = false, forceExactWindow = true).collect())
    spark.stop()
  }
}
