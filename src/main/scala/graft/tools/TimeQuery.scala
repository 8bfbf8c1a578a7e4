package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual SparkEntry queries (two runs each — cold + warm) so
  * single-operator optimizations can be A/B'd without a full bench run.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query> [<query> ...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.TimeQuery <sfDir> <query> [<query> ...]\n" +
          s"queries: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = args.head
    val names = args.tail.toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}\n" +
          s"valid names: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    // Bench's default, so unqualified TimeQuery runs A/B cleanly against it.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.Bench.DefaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // timings are only comparable at equal parallelism — make every run
    // self-describing (the default changed from 32 to 4 cpus once)
    println(s"[timeq] cpus=$cpus sfDir=$sfDir")
    graft.sources.Tables.documents(spark, sfDir).count() // session warmup
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[timeq] $name%-22s run$run ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
