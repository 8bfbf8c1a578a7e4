package graft.tools

import java.nio.file.{Files, Paths}

/** Dump before/after formatted plans for the round-15 spread sites into
  * plans/r15/: "before" = Tables.spread disabled via
  * spark.graft.spread.max=1 (the pre-round plan — no repartition),
  * "after" = the shipped default. Same binary, so the only diff is the
  * optimization under audit.
  *
  * Usage: runMain graft.tools.PlanPair <outDir> <sfDir> <query> [...]
  */
object PlanPair {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.builder("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      Seq("1" -> "before", "9999" -> "after").foreach { case (cap, tag) =>
        spark.conf.set("spark.graft.spread.max", cap)
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        println(s"[planpair] wrote ${name}_$tag.txt")
      }
    }
    spark.conf.unset("spark.graft.spread.max")
    spark.stop()
  }
}
