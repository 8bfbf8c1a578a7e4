/* Hosted under org.apache.spark.sql because the codegen/aggregate
 * extension APIs this file uses (ExpressionUtils, AbstractDataType) are
 * private[sql] — the standard placement for third-party native
 * expressions. Everything here is pure extension code, no Spark
 * internals are modified. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `array<double>` columns.
  *
  * Single fused pass (dot + both norms in one loop) generated into
  * whole-stage codegen — the (b)-tier extension point from the build
  * brief: faster than a Scala UDF (no serialization boundary) and than
  * the exploded-join formulation (no join/aggregate machinery) once the
  * pair set is materialized. The fold is left-to-right, matching the
  * DuckDB oracle's `list_dot_product`, so results stay cross-engine
  * deterministic at full double precision.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  // Zero-norm input (all-zero or empty vector) has no defined cosine:
  // the result is NULL, not NaN, in both eval and codegen paths.
  // Mismatched lengths truncate to the shorter array (callers supply
  // equal-dimension vectors; truncation keeps the expression total
  // rather than throwing mid-query on one bad row).
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All-in-one MinHash signature aggregate: folds a stream of base shingle
  * hashes into the full k-hash signature in a single Array[Long] buffer.
  *
  * The affine family is identical to graft.functions.HashFunctions.affine
  * (h_i(x) = ((2i+1)·x + 101i+7) mod 2^31-1), so signatures are
  * bit-compatible with the k-column `min` formulation and the DuckDB
  * oracle. TypedImperativeAggregate → ObjectHashAggregateExec: one tight
  * JVM while-loop per input row instead of k separate aggregate buffers;
  * partials ship through the shuffle as an 8k-byte blob.
  */
case class MinHashSignatureAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val P = 2147483647L

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val m = ((2L * i + 1) * h + 101L * i + 7) % P
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignatureAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignatureAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureAgg =
    copy(child = newChild)
}

/** Column-level entry points for the native expressions. */
object native {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhashSignature(h: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignatureAgg(ExpressionUtils.expression(h), numHashes).toAggregateExpression())

  def rollingHash(s: Column, window: Int): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(s), window))
}

/** Native polynomial rolling-hash over a string's UTF-8 bytes: emits the
  * hash of every `window`-byte substring (n-window+1 values) in one O(n)
  * pass — h' = (h - b_out·B^(w-1))·B + b_in (mod 2^31-1), the classic
  * Rabin-Karp recurrence and the standard document-fingerprinting
  * primitive (winnowing selects minima over these).
  *
  * A UDF or higher-order-function formulation of the same thing is
  * O(n·w) with per-element boxing; this is a single JVM array pass
  * invoked from generated code.
  */
case class RollingHash(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      RollingHash.compute(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"org.apache.spark.sql.graft.RollingHash.compute($c.getBytes(), $window))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val P = 2147483647L
  private val B = 131L

  /** O(n) rolling hashes of every `w`-byte window. Public + static-shaped
    * so generated code can call it directly. */
  def compute(bytes: Array[Byte], w: Int): Array[Long] = {
    val n = bytes.length
    if (n < w) return Array.emptyLongArray
    var pw = 1L // B^(w-1) mod P
    var i = 1
    while (i < w) { pw = pw * B % P; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      h = ((h - (bytes(i - w) & 0xff) * pw % P + P) % P * B + (bytes(i) & 0xff)) % P
      out(i - w + 1) = h
      i += 1
    }
    out
  }
}
