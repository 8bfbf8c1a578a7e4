package graft

import org.apache.spark.sql.graft.{CosineSimilarity, MinHashSignatureAgg, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions module exposing graft's native expressions to
  * SQL: `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), then
  * `SELECT cosine_sim(a, b)`, `SELECT minhash_signature(h, 128)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureAgg].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        MinHashSignatureAgg(exprs.head, k)
      }))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => {
        val w = exprs(1).eval(null).asInstanceOf[Number].intValue()
        RollingHash(exprs.head, w)
      }))
  }
}
