package graft.operators

import graft.core.MapReduce
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship pipeline (`example/word-count-taskfile.lua`):
  * enumerate sources → tokenize with the `(%a+)` alpha-run pattern,
  * lowercased (`word-count-taskfile.lua:118-122`) → emit (word, 1)
  * (`:136-139`) → group by word → count (`reducefn`, `:148-151`) →
  * ordered final output (`finalfn`, `:91-97`).
  *
  * Flagship form is pure DataFrame: scan → `explode(regexp_extract_all)`
  * → `groupBy(word).count()` → sort. Catalyst plans a partial
  * (map-side) HashAggregate before the shuffle and the whole map side is
  * one WholeStageCodegen span, so shuffle volume is O(distinct words) per
  * partition — the design that survives 100 TB, unlike the reference's
  * server-side `map_results[k]` append loop which is bounded by one
  * machine's memory.
  */
object WordCount {

  /** q01_wordcount — word frequencies over the documents corpus. */
  def query(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.alphaTokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** The reference's literal flagship: word-count a DIRECTORY OF .txt
    * FILES (`example/word-count-taskfile.lua:40-63` enumerates `*.txt`,
    * `:100-140` tokenizes each file's content). Same pipeline as
    * [[query]], driven by the file-directory source. */
  def fromTextDir(spark: SparkSession, dir: String): DataFrame =
    Tables.textDir(spark, dir)
      .select(explode(TextFunctions.alphaTokens(col("content"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Same computation through the reference-shaped four-function API —
    * proves `core.MapReduce` reproduces the task-file contract. Used by
    * the parity test; the flagship query stays on the DataFrame form.
    */
  def viaMapReduceApi(spark: SparkSession, sfDir: String): Dataset[(String, Long)] = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("text").as[String]
    MapReduce.runReduced[String, String, Long](
      docs,
      text => "[a-z]+".r.findAllIn(text.toLowerCase).map(w => (w, 1L)),
      _ + _
    )
  }
}
