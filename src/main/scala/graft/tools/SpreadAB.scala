package graft.tools

import org.apache.spark.sql.SparkSession

/** Intra-session interleaved A/B of Tables.spread widths: full-suite
  * bench runs 15 minutes apart proved incomparable on this host (the
  * untouched-query control set drifted ±18% between runs), so width
  * decisions are made here — same session, same JIT state, widths
  * alternated within each rep round so host drift cancels.
  *
  * Usage: runMain graft.tools.SpreadAB <sfDir> <caps> <query> [...]
  *   caps: comma-separated spread caps, e.g. 1,16,32  (1 = spread off)
  */
object SpreadAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val caps = args(1).split(",").map(_.trim.toInt).toSeq
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.Bench.DefaultCpus)
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").flatMap(_.toIntOption).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.documents(spark, sfDir).count()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      // warm once per cap (codegen for each plan variant, artifacts)
      caps.foreach { c => spark.conf.set("spark.graft.spread.max", c.toString); run(name) }
      val times = scala.collection.mutable.Map.empty[Int, Vector[Double]].withDefaultValue(Vector())
      (1 to reps).foreach { _ =>
        caps.foreach { c =>
          spark.conf.set("spark.graft.spread.max", c.toString)
          times(c) = times(c) :+ run(name)
        }
      }
      def med(xs: Vector[Double]) = xs.sorted.apply(xs.size / 2)
      val line = caps.map(c => f"cap$c=${med(times(c))}%6.3f(min=${times(c).min}%6.3f)").mkString("  ")
      println(f"[spreadab] $name%-34s $line")
    }
    spark.stop()
  }
}
