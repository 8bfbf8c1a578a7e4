package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved intra-session A/B of an arbitrary runtime SQL conf
  * (SpreadAB's harness generalized): variant A = conf unset/default,
  * variant B = conf set to the given value, alternated within each rep
  * round so host drift cancels.
  *
  * Usage: runMain graft.tools.ConfAB <sfDir> <key>=<value> <query> [...]
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val Array(key, value) = args(1).split("=", 2)
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
    val default = spark.conf.getOption(key)
    graft.sources.Tables.documents(spark, sfDir).count()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def set(v: Option[String]): Unit = v match {
      case Some(x) => spark.conf.set(key, x)
      case None => try spark.conf.unset(key) catch { case _: Throwable => () }
    }
    names.foreach { name =>
      set(default); run(name); set(Some(value)); run(name) // warm both variants
      var a = Vector.empty[Double]; var b = Vector.empty[Double]
      (1 to reps).foreach { _ =>
        set(default); a = a :+ run(name)
        set(Some(value)); b = b :+ run(name)
      }
      def med(xs: Vector[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[confab] $name%-34s default=${med(a)}%6.3f(min=${a.min}%6.3f)  $key=$value=${med(b)}%6.3f(min=${b.min}%6.3f)")
    }
    spark.stop()
  }
}
