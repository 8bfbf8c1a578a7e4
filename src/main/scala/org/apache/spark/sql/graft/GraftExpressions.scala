/* Hosted under org.apache.spark.sql because the codegen/aggregate
 * extension APIs this file uses (ExpressionUtils, AbstractDataType) are
 * private[sql] — the standard placement for third-party native
 * expressions. Everything here is pure extension code, no Spark
 * internals are modified. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
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

/** Native random-hyperplane LSH code computation: one fused scan-local
  * pass turning an `array<double>` vector into its `tables` signed-
  * projection bucket codes (bit i of table t set iff Σ_d x_d·w_{t,i,d}
  * > 0).
  *
  * This replaces the exploded formulation (posexplode to (vec_id, d, x)
  * rows + a tables×bits-column hash aggregate) that shuffled 64·n rows
  * per corpus just to compute codes — the projection is now computed
  * where the vector is scanned, so code assignment costs ZERO exchanges
  * at any corpus scale. The inner accumulation runs in ascending-d
  * order over the same doubles, so every dot product is bit-identical
  * to the aggregate formulation and to the DuckDB oracle's
  * group-ordered SUM.
  *
  * Weights arrive as a flattened literal `[(t·bits+i)·dims + d]` array
  * (derived from md5 on the driver, see graft.operators.Similarity
  * .weight) and are embedded in generated code as a reference object —
  * no per-row element_at indirection.
  */
case class SignedProjection(
    child: Expression, weights: Seq[Double], tables: Int, bits: Int, dims: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(weights.length == tables * bits * dims,
    s"weights must be tables*bits*dims = ${tables * bits * dims} long")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "signed_projection"

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def nullSafeEval(a: Any): Any =
    SignedProjection.compute(a.asInstanceOf[ArrayData], wArr, tables, bits, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("projW", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SignedProjection.compute($c, $w, $tables, $bits, $dims)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignedProjection {
  def compute(v: ArrayData, w: Array[Double], tables: Int, bits: Int, dims: Int): GenericArrayData = {
    val n = math.min(v.numElements(), dims)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var code = 0
      var i = 0
      while (i < bits) {
        var dot = 0.0
        val base = (t * bits + i) * dims
        var d = 0
        while (d < n) {
          // null components contribute nothing — matching SUM's
          // null-skipping over the exploded rows
          if (!v.isNullAt(d)) dot += v.getDouble(d) * w(base + d)
          d += 1
        }
        if (dot > 0.0) code |= (1 << i)
        i += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused SQ8 asymmetric squared-L2 distance: exact query components vs
  * the scalar-quantized reconstruction of a corpus vector, in ONE
  * scan-local pass — encode (floor against the per-dimension affine
  * [lo, hi] grid), 6-decimal dequantize, and the squared-difference
  * accumulation that the exploded formulation ran as a 64×-row
  * broadcast join + shuffled aggregate (the q15/SignedProjection
  * precedent applied to the SQ8 scorer: distance is computed where the
  * code row is scanned, zero exchanges beyond the candidate join).
  *
  * `stats` is the packed quantizer `[lo_0, hi_0, …, lo_{dims-1},
  * hi_{dims-1}] ++ grid` where `grid[d·(levels+1) + code]` is the
  * PRE-ROUNDED reconstruction of `code` in dimension d (dims derived
  * from the array length as `len / (levels+3)`) — a corpus aggregate
  * carried as a broadcast 1-row frame rather than a literal. The
  * encode arithmetic is EXPRESSION-IDENTICAL to the Column/oracle form
  * (NOTES: floor — never round — on the quantizer grid); the decimal
  * rounding of the reconstruction happens ONCE per (d, code) when the
  * grid is built (a per-component `BigDecimal` rounding in this loop
  * was most of the scoring cost — `valueOf` stringifies), and the
  * accumulation runs in ascending-d order so results are
  * deterministic. Null components contribute nothing, matching SUM's
  * null-skip over exploded rows. */
case class Sq8AsymDist(first: Expression, second: Expression, third: Expression, levels: Int)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_adist"

  override def nullSafeEval(q: Any, v: Any, s: Any): Any =
    Sq8AsymDist.compute(q.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], levels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, v, s) =>
      s"org.apache.spark.sql.graft.Sq8AsymDist.compute($q, $v, $s, $levels)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Sq8AsymDist {
  def compute(q: ArrayData, v: ArrayData, s: ArrayData, levels: Int): Double = {
    val dims = s.numElements() / (levels + 3) // 2 lo/hi + (levels+1) grid per dim
    val gridBase = 2 * dims
    val n = math.min(math.min(q.numElements(), v.numElements()), dims)
    var acc = 0.0
    var d = 0
    while (d < n) {
      if (!q.isNullAt(d) && !v.isNullAt(d)) {
        val lo = s.getDouble(2 * d)
        val hi = s.getDouble(2 * d + 1)
        val code =
          if (hi == lo) 0
          else math.min(math.floor((v.getDouble(d) - lo) * levels / (hi - lo)), levels.toDouble).toInt
        val dx = s.getDouble(gridBase + d * (levels + 1) + code)
        val diff = q.getDouble(d) - dx
        acc += diff * diff
      }
      d += 1
    }
    acc
  }
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

/** Count of array elements contained in a literal word set — the
  * stopword-scoring primitive (q18 language-ID profiles, q19 quality).
  *
  * One hash-probe loop per row, generated into whole-stage codegen.
  * The two `functions._` formulations both lose:
  * `size(filter(arr, λ))` evaluates the lambda interpreted per element,
  * and `Σ_w (size(arr) - size(array_remove(arr, w)))` copies the array
  * once per word (measured 2× q33 wall-clock at 8 words). The word set
  * ships as a reference object of pre-encoded UTF8Strings.
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("cnt")
      s"""
         |int $c = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bounded top-k aggregate over (score, id) pairs: keeps the k best
  * under (score DESC, id ASC) — exactly `row_number() OVER (ORDER BY
  * score DESC, id ASC) <= k` — as a k-slot sorted buffer.
  *
  * This is THE scale fix for per-group ranking: a window function must
  * shuffle and sort EVERY candidate row (per-query ANN ranking at
  * k=√n centroids is n×k rows through one exchange — 10^16+ at 100 TB),
  * while this aggregate is partial-aggregable, so map-side combine
  * reduces each partition's contribution to ≤ k rows per group before
  * the shuffle: the exchange carries O(groups·k), independent of the
  * candidate count. Update/merge are O(k) per element (k here is 2–5;
  * a heap would win only for large k).
  *
  * Scores compare via java.lang.Double.compare (NaN largest — Spark's
  * own double ordering); null scores/ids are skipped. Output:
  * array<struct<score,id>> best-first, so rank = array position + 1.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def add(s: Double, id: Long): Unit = {
    if (n == k) {
      if (!better(s, id, scores(k - 1), ids(k - 1))) return
      n -= 1 // evict current worst; the insert below refills the slot
    }
    var pos = n
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    var j = n
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s; ids(pos) = id; n += 1
  }

  /** [[add]] with at most one slot per id: an incoming duplicate id is
    * skipped unless it improves that id's score (then the old slot is
    * replaced). The scan is O(k) — the buffer is the cap. EXACT set-
    * top-k over multiset input whenever the score is a function of the
    * id (the dedup-cap use: a repeated (basket, item) row carries the
    * same deterministic draw), which lets a dedup+cap collapse into ONE
    * keyed exchange instead of distinct-then-rank. */
  def addDistinct(s: Double, id: Long): Unit = {
    var i = 0
    while (i < n) {
      if (ids(i) == id) {
        if (java.lang.Double.compare(s, scores(i)) <= 0) return
        // improved score for a seen id: drop the old slot, re-insert
        var j = i
        while (j < n - 1) { scores(j) = scores(j + 1); ids(j) = ids(j + 1); j += 1 }
        n -= 1
        add(s, id)
        return
      }
      i += 1
    }
    add(s, id)
  }
}

case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"top-k size must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      if (distinctIds) buf.addDistinct(s.asInstanceOf[Double], i.asInstanceOf[Long])
      else buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var i = 0
    if (distinctIds) { while (i < b2.n) { b1.addDistinct(b2.scores(i), b2.ids(i)); i += 1 } }
    else { while (i < b2.n) { b1.add(b2.scores(i), b2.ids(i)); i += 1 } }
    b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(buf.scores(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    // inserts arrive already best-first, so each add is O(1) appends
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}

/** [[TopKBuffer]]'s string-payload sibling: k slots of (double score,
  * UTF8String id), ordered (score desc, id asc) with the tie-break on
  * BINARY UTF8String comparison — identical to Spark's own string sort
  * order (and to DuckDB's default collation on the ASCII tokens the
  * text operators feed it), so an aggregate top-k and a `row_number`
  * window over the same (score desc, id asc) ordering pick the same
  * rows. Same sorted-insert design as the long form: k is small, the
  * worst case is one O(k) shift per accepted element. */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  val scores = new Array[Double](k)
  val ids = new Array[UTF8String](k)
  var n = 0

  @inline private def better(
      s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1.compareTo(i2) < 0)
  }

  def add(s: Double, id: UTF8String): Unit = {
    if (n == k) {
      if (!better(s, id, scores(k - 1), ids(k - 1))) return
      n -= 1
    }
    var pos = n
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    var j = n
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s; ids(pos) = id; n += 1
  }

  /** Acceptance pre-test so update() can defer the defensive clone of a
    * scan-backed UTF8String until the element is known to enter the
    * buffer — once a group's k slots saturate, most inputs fail here
    * and allocate nothing. */
  def wouldAccept(s: Double, id: UTF8String): Boolean =
    n < k || better(s, id, scores(k - 1), ids(k - 1))
}

/** `top_k_str_by_score(score, id, k)` — [[TopKByScore]] for STRING ids
  * (the term/token/source payloads the text operators rank): the same
  * k-slot map-side pre-reduction, so a "top terms per document" never
  * pays a `row_number` window that materializes and sorts every term of
  * a document per task — each partial aggregate carries at most k rows
  * per group into the exchange. Output: array<struct<score,id>>
  * best-first ((score desc, id asc)); rank = position + 1.
  *
  * update() clones accepted UTF8Strings (inputs may alias scan-backed
  * memory that the next row overwrites) but tests acceptance first, so
  * the saturated-buffer fast path allocates nothing. */
case class TopKStringByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] with BinaryLike[Expression] {
  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, s"top-k size must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sd = s.asInstanceOf[Double]
      val u = i.asInstanceOf[UTF8String]
      // clone only ids that will actually be kept (the input may alias
      // scan-backed memory the next row overwrites); rejected inputs —
      // the common case once the buffer saturates — allocate nothing
      if (buf.wouldAccept(sd, u)) buf.add(sd, u.clone())
    }
    buf
  }

  override def merge(b1: TopKStrBuffer, b2: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < b2.n) { b1.add(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(buf.scores(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.n) { bytes += buf.ids(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(4 + 12 * buf.n + bytes)
    bb.putInt(buf.n)
    i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i))
      val b = buf.ids(i).getBytes
      bb.putInt(b.length)
      bb.put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    var i = 0
    // inserts arrive already best-first, so each add is O(1) appends
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", StringType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_str_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStringByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStringByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStringByScore =
    copy(score = newLeft, id = newRight)
}

/** Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003) over
  * a rolling-hash array: the minimum of every `w`-window of hashes,
  * consecutive duplicates suppressed — the guarantee is that any
  * shared substring of length ≥ window+w-1 bytes yields at least one
  * SHARED fingerprint between two documents, at ~2/(w+1) the density
  * of keeping every hash. One O(n) monotonic-deque pass invoked from
  * generated code; arrays shorter than w emit nothing (callers treat
  * sub-window docs as unfingerprintable). */
case class WinnowMin(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w > 0, s"winnow window must be positive, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_min"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(WinnowMin.compute(a.asInstanceOf[ArrayData].toLongArray(), w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"org.apache.spark.sql.graft.WinnowMin.compute($c.toLongArray(), $w))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMin {
  /** Per-window minima of every full w-window, consecutive duplicates
    * dropped. O(n) via a monotonic index deque. */
  def compute(hs: Array[Long], w: Int): Array[Long] = {
    val n = hs.length
    if (n < w) return Array.emptyLongArray
    val out = new Array[Long](n - w + 1)
    val deque = new Array[Int](n) // indices, increasing, hs values increasing
    var head = 0; var tail = 0    // deque is [head, tail)
    var m = 0
    var i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = hs(deque(head))
        if (m == 0 || out(m - 1) != v) { out(m) = v; m += 1 }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }
}

/** Deflate-compression ratio of a string's UTF-8 bytes — the classic
  * "compressibility" quality signal (Gopher/CCNet family): highly
  * repetitive/boilerplate text compresses far below typical prose, so
  * low ratios flag templated junk and high ratios flag random noise.
  * One fused JVM deflate pass per row (raw deflate, fixed level 6 —
  * deterministic for a given JVM's zlib), codegen'd like the other
  * native expressions. Not DuckDB-expressible ⇒ test-tier (accuracy
  * asserted in ExpressionsSpec), not an oracle-graded query. */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(s: Any): Any =
    CompressionRatio.compute(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CompressionRatio.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatio {
  /** deflate(bytes).length / bytes.length; empty input → 1.0. Raw
    * deflate (nowrap) so tiny strings aren't dominated by the zlib
    * header. Public + static-shaped for generated code. */
  def compute(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / bytes.length
  }
}

/** Token count after applying a learned BPE merge list to a word —
  * character-initial segmentation, then each merge applied left-to-
  * right (a token merged in a pass never re-pairs within that pass:
  * canonical BPE application, the same fold TextAnalysis.bpeTrain
  * runs via `aggregate` and the DuckDB oracle via `list_reduce`).
  * Exists because nested interpreted higher-order-function folds cost
  * ~100 µs/word (measured: 4 s over a 40k-word vocab at sf0.1); this
  * is one tight JVM loop per row inside codegen. The merge list is a
  * bounded trained artifact (5 pairs), embedded as a reference object.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(s: Any): Any =
    BpeTokenCount.compute(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "scala.collection.immutable.Seq")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeTokenCount.compute($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Public + static-shaped for generated code. */
  def compute(w: String, merges: Seq[(String, String)]): Int = {
    var toks: Array[String] = Array.tabulate(w.length)(i => w.substring(i, i + 1))
    merges.foreach { case (x, y) =>
      val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
      var i = 0
      while (i < toks.length) {
        if (out.nonEmpty && out(out.length - 1) == x && toks(i) == y)
          out(out.length - 1) = x + y
        else out += toks(i)
        i += 1
      }
      toks = out.toArray
    }
    toks.length
  }
}

/** Unicode NFC normalization (java.text.Normalizer, JVM built-in) —
  * composed vs decomposed encodings of the same text ("é" as U+00E9 vs
  * "e"+U+0301) are byte-different, so un-normalized md5 dedup keys
  * silently miss duplicates that differ only in encoding. Mirrors the
  * DuckDB oracle's `nfc_normalize` (utf8proc NFC — same algorithm,
  * Unicode-standard deterministic). The already-normalized fast path
  * (all ASCII corpora) is a scan without allocation. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer
  /** NFC-normalize; returns the input object unchanged when already
    * normalized (the common all-ASCII case — no copy). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Accent/diacritic folding: NFD-decompose, drop combining marks —
  * ALL mark categories (Mn non-spacing, Mc spacing like Indic vowel
  * signs, Me enclosing), not just Mn — recompose to NFC:
  * "café"→"cafe", "naïve"→"naive", "İstanbul"→"Istanbul",
  * Bengali "কো"→"ক". The standard accent-folding step of a dedup-key
  * normalizer (encoding variants of the same word must hash
  * identically). Matches DuckDB's `strip_accents` (utf8proc STRIPMARK,
  * which removes Mn+Mc+Me — verified empirically) so folded keys stay
  * oracle-gradable. */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(s: Any): Any =
    StripAccents.compute(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.StripAccents.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {
  import java.text.Normalizer
  def compute(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    // ASCII fast path: nothing to decompose, return the input object
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    i = 0
    // Iterate code points, not chars: supplementary-plane combining marks
    // (e.g. U+1D167 MUSICAL SYMBOL COMBINING TREMOLO-1) are surrogate pairs,
    // and Character.getType on either surrogate alone reports SURROGATE, so a
    // per-char loop would keep marks that utf8proc STRIPMARK removes.
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

/** Native codegen'd squared Euclidean distance over two `array<double>`
  * columns — the exact-scoring twin of [[CosineSimilarity]] for the
  * L2-metric index family (SQ8/PQ rank by squared L2, so their exact
  * rerank/ground-truth stages must score in the SAME metric). One fused
  * ascending-d accumulation inside whole-stage codegen; mismatched
  * lengths truncate to the shorter array (the [[CosineSimilarity]]
  * totality rule). Always defined (zero vectors are fine — unlike
  * cosine there is no normalization to divide by). */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd Jaro-Winkler similarity over two string columns —
  * the record-linkage metric that, unlike edit distance, weights
  * agreeing PREFIXES (names/titles mistype their tails far more often
  * than their heads: Winkler 1990's census-linkage observation).
  *
  * Bit-compatible with DuckDB's `jaro_winkler_similarity` (pinned by a
  * 9,000-pair cross-engine fuzz over three alphabets, zero ULP
  * deviation): byte-level comparison; either side empty → 0.0; match
  * window ⌊max(|a|,|b|)/2⌋−1 (floor 0) with greedy left-to-right
  * marking; transpositions = ⌊mismatched-matches/2⌋; the Winkler
  * prefix boost (ℓ ≤ 4, p = 0.1) applies only when Jaro > 0.7. The
  * fold order of the final average matches the reference engines, so
  * doubles agree bitwise, not just to rounding. O(|a|·window) with two
  * small boolean scratch arrays — a single JVM static call inside
  * whole-stage codegen. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def compute(sa: org.apache.spark.unsafe.types.UTF8String,
      sb: org.apache.spark.unsafe.types.UTF8String): Double = {
    val x = sa.getBytes
    val y = sb.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val mx = new Array[Boolean](la)
    val my = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j <= hi) {
        if (!my(j) && y(j) == x(i)) {
          my(j) = true; mx(i) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk both matched subsequences in order; they are permutations of
    // one multiset, so mismatch positions pair up into transpositions
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (mx(i)) {
        while (!my(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    val maxL = math.min(4, math.min(la, lb))
    var l = 0
    while (l < maxL && x(l) == y(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native codegen'd TRUE Damerau-Levenshtein distance (Lowrance &
  * Wagner 1975) over two string columns: insert/delete/substitute plus
  * transposition of adjacent characters with edits allowed BETWEEN the
  * transposed pair — `dl("ca","abc") = 2`, where the restricted (OSA)
  * variant says 3. Transpositions are the single most common human
  * typo class (Damerau 1964: >80% of misspellings are one of these
  * four edits), so an edit-distance dedup keyed on plain Levenshtein
  * systematically over-prices them 2:1.
  *
  * Matches DuckDB's `damerau_levenshtein` exactly (integer metric,
  * byte-level, cross-engine fuzz-verified). Full (|a|+2)×(|b|+2) DP
  * with a 256-slot last-occurrence table — O(|a|·|b|) time, fine for
  * vocabulary-domain linkage where strings are names, never documents.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.DamerauLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def compute(sa: org.apache.spark.unsafe.types.UTF8String,
      sb: org.apache.spark.unsafe.types.UTF8String): Int = {
    val x = sa.getBytes
    val y = sb.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val w = lb + 2
    // d(i)(j) flattened; row 0 / col 0 hold the INF sentinel rank
    val d = new Array[Int]((la + 2) * w)
    java.util.Arrays.fill(d, inf)
    var i = 0
    while (i <= la) { d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      val xi = x(i - 1)
      j = 1
      while (j <= lb) {
        val yj = y(j - 1)
        val i1 = da(yj & 0xFF)
        val j1 = db
        val cost = if (xi == yj) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trn = d(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(xi & 0xFF) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}

/** Greedy Maximal-Marginal-Relevance selection as ONE aggregate over a
  * query's candidate pool: buffers (relevance, id, vector) rows, then at
  * eval replays the Carbonell-Goldstein recurrence — pick argmax
  * `λ·rel − penalty·max_{s∈selected} round6(cos(v, v_s))`, k times —
  * entirely inside the aggregate. Replaces the k-step join/aggregate
  * recurrence (k tiny Spark jobs + two checkpointed frames) with one
  * ObjectHashAggregate pass over the pool frame; the corpus-scale work
  * (building the pool) stays upstream.
  *
  * Determinism contract (must stay bit-identical to the unrolled SQL
  * oracle): relevance arrives ALREADY 6dp-rounded; pairwise cosines
  * accumulate ascending-d (the [[CosineSimilarity]] fold) and are
  * rounded via `BigDecimal.valueOf` HALF_UP = Spark `round(_, 6)`;
  * every argmax breaks score ties on lower id ([[TopKBuffer]]'s rule);
  * zero-norm pairwise cosines are skipped like SQL `max` skips NULLs,
  * and a candidate with NO defined pairwise cosine drops out of later
  * steps exactly as the inner pen-join dropped it. Output is the
  * selection order: `array<struct<neighbor_id, score_raw>>`. */
case class MmrSelectAgg(
    first: Expression,  // 6dp-rounded relevance (cosine to the query)
    second: Expression, // candidate id
    third: Expression,  // candidate vector (array<double>)
    lambda: Double,
    penalty: Double,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrBuffer] with TernaryLike[Expression] {

  override def createAggregationBuffer(): MmrBuffer = new MmrBuffer

  override def update(buf: MmrBuffer, input: InternalRow): MmrBuffer = {
    val r = first.eval(input)
    val i = second.eval(input)
    val v = third.eval(input)
    if (r != null && i != null && v != null) {
      val a = v.asInstanceOf[ArrayData]
      val arr = new Array[Double](a.numElements())
      var d = 0
      while (d < arr.length) {
        arr(d) = if (a.isNullAt(d)) Double.NaN else a.getDouble(d)
        d += 1
      }
      buf.add(r.asInstanceOf[Double], i.asInstanceOf[Long], arr)
    }
    buf
  }

  override def merge(b1: MmrBuffer, b2: MmrBuffer): MmrBuffer = { b1.addAll(b2); b1 }

  override def eval(buf: MmrBuffer): Any = {
    val sel = buf.select(lambda, penalty, k)
    val out = new Array[Any](sel.length)
    var i = 0
    while (i < sel.length) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(sel(i)._1, sel(i)._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MmrBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MmrBuffer = MmrBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score_raw", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mmr_select"

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrSelectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrSelectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MmrSelectAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

final class MmrBuffer {
  var rels: Array[Double] = new Array[Double](8)
  var ids: Array[Long] = new Array[Long](8)
  var vectors: Array[Array[Double]] = new Array[Array[Double]](8)
  var n = 0

  def add(rel: Double, id: Long, v: Array[Double]): Unit = {
    if (n == rels.length) {
      rels = java.util.Arrays.copyOf(rels, n * 2)
      ids = java.util.Arrays.copyOf(ids, n * 2)
      vectors = java.util.Arrays.copyOf(vectors, n * 2)
    }
    rels(n) = rel; ids(n) = id; vectors(n) = v; n += 1
  }

  def addAll(o: MmrBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.rels(i), o.ids(i), o.vectors(i)); i += 1 }
  }

  /** round6(cosine) with the CosineSimilarity fold; NaN marks undefined
    * (zero-norm), the aggregate's stand-in for SQL NULL. */
  private def psim(a: Array[Double], b: Array[Double]): Double = {
    val m = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var d = 0
    while (d < m) {
      val x = a(d); val y = b(d)
      if (!x.isNaN && !y.isNaN) { dot += x * y; na += x * x; nb += y * y }
      d += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def select(lambda: Double, penalty: Double, k: Int): Array[(Long, Double)] = {
    val taken = new Array[Boolean](n)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var step = 1
    while (step <= k) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          var score = Double.NaN
          if (step == 1) {
            // pure relevance step: argmax over the ROUNDED relevance,
            // score recorded as λ·rel
            score = rels(i)
          } else {
            var pen = Double.NaN
            var j = 0
            while (j < n) {
              if (taken(j)) {
                val p = psim(vectors(i), vectors(j))
                if (!p.isNaN && (pen.isNaN || p > pen)) pen = p
              }
              j += 1
            }
            if (!pen.isNaN) score = lambda * rels(i) - penalty * pen
          }
          if (!score.isNaN && (best < 0 || better(score, ids(i), bestScore, ids(best))))
            { best = i; bestScore = score }
        }
        i += 1
      }
      if (best < 0) return out.toArray // pool exhausted (or no defined pen)
      taken(best) = true
      out += ((ids(best), if (step == 1) lambda * rels(best) else bestScore))
      step += 1
    }
    out.toArray
  }

  def toBytes: Array[Byte] = {
    var size = 4
    var i = 0
    while (i < n) { size += 8 + 8 + 4 + 8 * vectors(i).length; i += 1 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(n)
    i = 0
    while (i < n) {
      bb.putDouble(rels(i)); bb.putLong(ids(i)); bb.putInt(vectors(i).length)
      vectors(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object MmrBuffer {
  def fromBytes(bytes: Array[Byte]): MmrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MmrBuffer
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val r = bb.getDouble; val id = bb.getLong
      val len = bb.getInt
      val v = new Array[Double](len)
      var d = 0
      while (d < len) { v(d) = bb.getDouble; d += 1 }
      buf.add(r, id, v)
      i += 1
    }
    buf
  }
}

/** Column-level entry points for the native expressions. */
object native {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhashSignature(h: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignatureAgg(ExpressionUtils.expression(h), numHashes).toAggregateExpression())

  def countInSet(arr: Column, words: Seq[String]): Column =
    ExpressionUtils.column(CountInSet(ExpressionUtils.expression(arr), words))

  def topKByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())

  /** [[topKByScore]] for string ids — (score desc, id asc binary)
    * order, map-side k-slot pre-reduction (see [[TopKStringByScore]]). */
  def topKStrByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKStringByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())

  /** [[topKByScore]] with one buffer slot per id (see
    * [[TopKBuffer.addDistinct]]) — exact set-top-k over multiset input
    * when the score is a function of the id. */
  def topKDistinctByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k,
        distinctIds = true).toAggregateExpression())

  def rollingHash(s: Column, window: Int): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(s), window))

  def winnowMin(hashes: Column, w: Int): Column =
    ExpressionUtils.column(WinnowMin(ExpressionUtils.expression(hashes), w))

  def compressionRatio(s: Column): Column =
    ExpressionUtils.column(CompressionRatio(ExpressionUtils.expression(s)))

  def nfc(s: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(s)))

  def bpeTokenCount(s: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokenCount(ExpressionUtils.expression(s), merges))

  def stripAccents(s: Column): Column =
    ExpressionUtils.column(StripAccents(ExpressionUtils.expression(s)))

  def l2Sq(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L2Squared(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def damerauLevenshtein(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DamerauLevenshtein(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def signedProjection(v: Column, weights: Seq[Double], tables: Int, bits: Int, dims: Int): Column =
    ExpressionUtils.column(
      SignedProjection(ExpressionUtils.expression(v), weights, tables, bits, dims))

  def sq8Adist(q: Column, v: Column, stats: Column, levels: Int): Column =
    ExpressionUtils.column(
      Sq8AsymDist(ExpressionUtils.expression(q), ExpressionUtils.expression(v),
        ExpressionUtils.expression(stats), levels))

  def mmrSelect(rel: Column, id: Column, vec: Column,
      lambda: Double, penalty: Double, k: Int): Column =
    ExpressionUtils.column(
      MmrSelectAgg(ExpressionUtils.expression(rel), ExpressionUtils.expression(id),
        ExpressionUtils.expression(vec), lambda, penalty, k).toAggregateExpression())
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
