package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc q31 stage timing (driver-side; not part of the build). */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    t("warmup") { graft.sources.Tables.documents(spark, sfDir).count() }
    val pairs = t("minhash pairs") {
      val p = Dedup.minhashPairs(spark, sfDir).select(col("doc_a").as("u"), col("doc_b").as("v"))
      p.count(); p
    }
    val (labels, rounds) = t("cc loop") { Dedup.connectedComponents(pairs) }
    println(s"[ccprobe] rounds = $rounds")
    t("labels + join") {
      graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left").count()
    }
    t("full dupClusters") { Dedup.dupClusters(spark, sfDir).count() }
    spark.stop()
  }
}
