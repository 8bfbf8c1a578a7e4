package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-job wall-clock trace for one query (guide §1/§7: find out whether
  * wall time is a few big jobs or many small fixed-cost jobs before
  * optimizing either). Prints, for every Spark job the query runs:
  * wall ms, #stages, #tasks, summed task time, and the job group/
  * description if set.
  *
  * Usage: runMain graft.tools.JobTrace <sfDir> <query> [<query> ...]
  */
object JobTrace {
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

    case class J(start: Long, var stages: Int = 0, var tasks: Int = 0,
        var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val done = mutable.LinkedHashMap.empty[Int, (Long, J)]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val j = J(System.nanoTime())
        j.stages = e.stageIds.size
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        jobs(e.jobId) = j
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        for (jid <- stageToJob.get(e.stageId); j <- jobs.get(jid)) {
          j.tasks += 1
          if (e.taskInfo != null) j.taskMs += e.taskInfo.duration
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.remove(e.jobId).foreach(j => done(e.jobId) = (System.nanoTime() - j.start, j))
      }
    }

    graft.sources.Tables.documents(spark, sfDir).count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      done.clear(); jobs.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"[jobtrace] === $name  wall=$wall%6.2f s  jobs=${done.size} ===")
      val sumWall = done.values.map(_._1).sum / 1e9
      done.foreach { case (id, (ns, j)) =>
        println(f"[jobtrace]   job=$id%-4d wall=${ns / 1e6}%8.1f ms stages=${j.stages}%-3d tasks=${j.tasks}%-4d taskTime=${j.taskMs}%6d ms")
      }
      println(f"[jobtrace]   sum(job wall)=$sumWall%6.2f s  (gaps = driver-side between jobs: ${wall - sumWall}%5.2f s)")
    }
    spark.stop()
  }
}
