package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed from
  * Spark's higher-order functions (`zip_with`, `aggregate`) so the hot
  * loops run inside codegen rather than through a UDF boundary.
  *
  * All arithmetic is double-precision (embeddings are cast up once) so
  * results are deterministic and reproducible by the DuckDB oracle, which
  * evaluates the same left-to-right fold.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> for stable math. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
}
