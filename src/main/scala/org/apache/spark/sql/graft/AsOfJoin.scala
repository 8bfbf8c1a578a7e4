/* Hosted under org.apache.spark.sql for the same reason as
 * GraftExpressions.scala: Dataset.ofRows and the physical-plan APIs this
 * operator needs are private[sql]. Pure extension code. */
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join — the time-series operator Spark SQL lacks natively (the
  * c-tier extension from the build brief: custom LogicalPlan + Strategy
  * + SparkPlan): for every left row, attach the LATEST right row of the
  * same key whose timestamp is ≤ the left timestamp (left-outer
  * semantics). The classic attribution/point-in-time-lookup join.
  *
  * Scale design: the exec declares `ClusteredDistribution` on the keys
  * and per-partition (key, ts) ordering, so EnsureRequirements plans the
  * standard hash exchanges + sorts — exactly a sort-merge join's
  * movement — and the merge itself is a single-pass two-pointer walk per
  * partition, O(|left| + |right|), with O(1) retained state (one
  * candidate row). No window buffering, no per-key materialization.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val nRightCols = right.output.size
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val outputAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outputAttrs, leftAttrs ++ rightAttrs)
      val nullRight = new GenericInternalRow(nRightCols)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var matchRow: InternalRow = null
      var matchKey: Long = 0L
      var haveMatch = false

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val ltAny = if (lk == null) null else lTsB.eval(lRow)
        if (lk == null || ltAny == null) {
          // null key or null timestamp on the left: no defined as-of
          // point — emit the null-extended row (never match epoch 0)
          project(joined(lRow, nullRight))
        } else {
          val k = lk.asInstanceOf[Long]
          val t = ltAny.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hkAny = rKeyB.eval(head)
            if (hkAny == null) { rBuf.next(); advance = true }
            else {
              val hk = hkAny.asInstanceOf[Long]
              if (hk < k) { rBuf.next() } // drop keys before ours
              else if (hk == k) {
                val rtAny = rTsB.eval(head)
                if (rtAny == null) {
                  rBuf.next() // null ts can never be a valid as-of match
                } else if (rtAny.asInstanceOf[Long] <= t) {
                  // candidate: latest-so-far right row for this key
                  matchRow = head.copy(); matchKey = hk; haveMatch = true
                  rBuf.next()
                } else advance = false
              } else advance = false
            }
          }
          if (haveMatch && matchKey == k) project(joined(lRow, matchRow))
          else project(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing entry point. Column names must be disjoint between the
  * two sides (alias beforehand); key columns must be integral and ts
  * columns timestamps (both evaluate to Long internally). */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, leftTs: String,
           rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found in [${p.output.map(_.name).mkString(", ")}]"))
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs)))
  }
}
