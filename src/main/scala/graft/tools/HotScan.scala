package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Suite-wide single-task-hotspot audit (guide §2.5 input skew): for
  * every query, after one warm run, sums the task time of jobs that ran
  * with ≤ 2 tasks — work a single-file scan pinned to one core. A large
  * "hot1" relative to wall says the query would gain from spreading its
  * scan-side work (Tables.spread); a small one says a repartition would
  * only add exchange overhead.
  *
  * Usage: runMain graft.tools.HotScan <sfDir> [minWallSec]
  */
object HotScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val minWall = args.lift(1).map(_.toDouble).getOrElse(0.35)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.Bench.DefaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskByStage = mutable.HashMap.empty[Int, (Int, Long)] // stage -> (n, ms)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val (n, ms) = taskByStage.getOrElse(e.stageId, (0, 0L))
        val d = if (e.taskInfo != null) e.taskInfo.duration else 0L
        taskByStage(e.stageId) = (n + 1, ms + d)
      }
    }
    graft.sources.Tables.documents(spark, sfDir).count()
    spark.sparkContext.addSparkListener(listener)
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm
        taskByStage.synchronized(taskByStage.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val stages = taskByStage.synchronized(taskByStage.values.toSeq)
        val hot1 = stages.filter(_._1 <= 2).map(_._2).sum / 1e3
        val par = stages.filter(_._1 > 2).map(_._2).sum / 1e3
        if (wall >= minWall)
          println(f"[hotscan] $name%-36s wall=$wall%6.2f hot1=$hot1%7.2f par=$par%7.2f")
      } catch { case t: Throwable =>
        println(s"[hotscan] $name FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
