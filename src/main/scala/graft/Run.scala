package graft

/** CLI runner — the user-facing entry point mirroring the reference's
  * command-line drivers (`lua-mapreduce-server.lua -t task-file.lua`):
  * run one named query (or all) against a data directory and show or
  * write the result.
  *
  * Usage: runMain graft.Run <queryName|all> [sfDir] [outDir]
  *  - no outDir: print the first 20 rows per query
  *  - outDir:    write each result as parquet under outDir/<name>
  */
object Run {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Run <queryName|all> [sfDir] [outDir]")
      System.err.println("queries: " + SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val names =
      if (args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else if (SparkEntry.queries.contains(args(0))) Seq(args(0))
      else {
        System.err.println(s"unknown query '${args(0)}'; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
        sys.exit(2)
      }
    val spark = GraftSession.get()
    try names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      outDir match {
        case Some(dir) =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
          println(s"[run] $name -> $dir/$name")
        case None =>
          println(s"==== $name ====")
          df.show(20, truncate = false)
      }
    } finally spark.stop()
  }
}
