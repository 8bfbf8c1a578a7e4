package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Local runs use `local[N]`; on a real cluster the same config block
  * applies unchanged — AQE handles runtime partition coalescing and skew
  * splitting, so `shuffle.partitions` here is an upper bound for local
  * mode, not a cluster tuning knob.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the 128-column minhash aggregate must stay inside whole-stage
      // codegen; the default maxFields=100 silently falls back to
      // interpreted eval (~20x slower)
      .config("spark.sql.codegen.maxFields", "256")
      // split-size ceiling for the scan: 128 MB splits keep a 100 TB
      // scan at ~800k tasks (healthy granularity for 32k cores) and a
      // task's column batches comfortably inside executor memory; the
      // default is the same value — pinned here so a cluster-side
      // override is a deliberate choice, not an inherited default
      .config("spark.sql.files.maxPartitionBytes", s"${128L * 1024 * 1024}")
      // runtime bloom-filter join pruning: a selective dim side (<10 MB
      // post-filter) injects a bloom filter into the fact-side scan, so
      // a 100 TB fact table drops non-joining rows at the scan instead
      // of shuffling them. Spark-default-on — pinned explicitly because
      // the 100 TB plans in PLANS.md depend on it, and PlanSpec
      // demonstrates the injection under forced thresholds.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
