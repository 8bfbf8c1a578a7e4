package graft

import org.apache.spark.sql.graft.{CompressionRatio, CosineSimilarity, CountInSet, DamerauLevenshtein, JaroWinkler, L2Squared, MinHashSignatureAgg, NfcNormalize, NormalizeIdempotence, RollingHash, StripAccents, TopKByScore, TopKStringByScore, WinnowMin}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions module exposing graft's native expressions to
  * SQL: `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), then
  * `SELECT cosine_sim(a, b)`, `SELECT minhash_signature(h, 128)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity gate shared by every SQL builder below: a wrong-arity call
    * (`jaro_winkler('a')`) must fail with a readable analysis-time
    * message, not an IndexOutOfBoundsException from `exprs(1)`. */
  private def checkArity(
      name: String, n: Int, exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n,
      s"Function `$name` requires exactly $n argument(s), got ${exprs.length}")
    exprs
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        checkArity("cosine_sim", 2, exprs)
        CosineSimilarity(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureAgg].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        checkArity("minhash_signature", 2, exprs)
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        MinHashSignatureAgg(exprs.head, k)
      }))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => {
        checkArity("rolling_hash", 2, exprs)
        val w = exprs(1).eval(null).asInstanceOf[Number].intValue()
        RollingHash(exprs.head, w)
      }))
    e.injectFunction((
      new FunctionIdentifier("winnow_min"),
      new ExpressionInfo(classOf[WinnowMin].getName, "winnow_min"),
      (exprs: Seq[Expression]) => {
        checkArity("winnow_min", 2, exprs)
        val w = exprs(1).eval(null).asInstanceOf[Number].intValue()
        WinnowMin(exprs.head, w)
      }))
    e.injectFunction((
      new FunctionIdentifier("count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
      (exprs: Seq[Expression]) => {
        checkArity("count_in_set", 2, exprs)
        val words = exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        CountInSet(exprs.head, words)
      }))
    e.injectFunction((
      new FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName, "compression_ratio"),
      (exprs: Seq[Expression]) => {
        checkArity("compression_ratio", 1, exprs)
        CompressionRatio(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (exprs: Seq[Expression]) => {
        checkArity("top_k_by_score", 3, exprs)
        val k = exprs(2).eval(null).asInstanceOf[Number].intValue()
        TopKByScore(exprs(0), exprs(1), k)
      }))
    e.injectFunction((
      new FunctionIdentifier("top_k_str_by_score"),
      new ExpressionInfo(classOf[TopKStringByScore].getName, "top_k_str_by_score"),
      (exprs: Seq[Expression]) => {
        checkArity("top_k_str_by_score", 3, exprs)
        val k = exprs(2).eval(null).asInstanceOf[Number].intValue()
        TopKStringByScore(exprs(0), exprs(1), k)
      }))
    e.injectFunction((
      new FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
      (exprs: Seq[Expression]) => {
        checkArity("nfc", 1, exprs)
        NfcNormalize(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (exprs: Seq[Expression]) => {
        checkArity("strip_accents", 1, exprs)
        StripAccents(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_sq"),
      (exprs: Seq[Expression]) => {
        checkArity("l2_sq", 2, exprs)
        L2Squared(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        checkArity("jaro_winkler", 2, exprs)
        JaroWinkler(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      (exprs: Seq[Expression]) => {
        checkArity("damerau_levenshtein", 2, exprs)
        DamerauLevenshtein(exprs(0), exprs(1))
      }))
    // the Rule[LogicalPlan] tier: normalize- and case/trim-idempotence
    // folding
    e.injectOptimizerRule(_ => NormalizeIdempotence)
    e.injectOptimizerRule(_ => org.apache.spark.sql.graft.TrimIdempotence)
  }
}
