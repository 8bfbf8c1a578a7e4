package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a query's wall-clock into driver-side plan work vs execution
  * (guide §1: decide whether time goes to planning, scheduling or
  * compute before touching anything). For each query, after one warm
  * run, times separately:
  *   build  — DataFrame construction (includes any eager memoized
  *            artifact/localCheckpoint jobs the operator runs inline)
  *   plan   — analysis + optimization + physical planning + codegen
  *            (forcing `executedPlan`)
  *   exec   — the actual count() job(s) on the planned query
  *
  * Usage: runMain graft.tools.PlanCost <sfDir> <query> [<query> ...]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.Bench.DefaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.documents(spark, sfDir).count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: artifacts built, codegen cached
      var t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan // force full planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[plancost] $name%-34s build=$tBuild%6.2f plan=$tPlan%6.2f exec=$tExec%6.2f total=${tBuild + tPlan + tExec}%6.2f")
    }
    spark.stop()
  }
}
