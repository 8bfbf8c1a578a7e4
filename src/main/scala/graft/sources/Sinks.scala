package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output side of the engine — the reference's `finalfn` emit
  * (`example/word-count-taskfile.lua:91-97`) generalized to real sinks.
  *
  * Partitioned parquet is the 100 TB default: `partitionBy` on a
  * low-cardinality column gives partition pruning to every downstream
  * reader, and writers stay embarrassingly parallel (one file per task
  * per partition value). CSV/JSON exist for interchange; they serialize
  * wider and lose types, so they are for exports, not pipelines.
  */
object Sinks {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar interchange format; same pushdown/pruning
    * properties as parquet, for stacks standardized on ORC. */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
