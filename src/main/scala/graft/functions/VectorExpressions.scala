package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Static kernels for the similarity family's hot integer-vector math.
  * Spark's higher-order functions (aggregate/zip_with lambdas) evaluate
  * INTERPRETED — fine on a 500-row query side, ruinous on millions of
  * candidate pairs. These kernels are plain JVM tight loops over long
  * arrays, called from both interpreted eval and generated code, so the
  * cosine/bucketing expressions stay inside WholeStageCodegen. All
  * results are bit-identical to the HOF formulations they replace
  * (exact integer sums — order-independent). */
object VectorKernels {

  /** Σ a(i)·b(i) over quantized (milli-unit) vectors — exact in long
    * (|v| ≤ ~8e3, dim 64 ⇒ |dot| ≤ ~4e9 ≪ 2^63). Lengths must match:
    * silently truncating to the shorter vector would return a
    * plausible-but-wrong dot, where the zip_with formulation this is
    * bit-identical to surfaces the mismatch as null. */
  def quantizedDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"quantized_dot: dimension mismatch ($n vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Σ a(i)² — the exact integer squared norm. */
  def sqNorm(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val v = a.getLong(i); s += v * v; i += 1 }
    s
  }

  /** Per-(table, plane) hyperplane sign masks — bit i set ⇔ the sign of
    * dimension i is +1, from splitmix64(((t·bits+p)<<8)+i), the SAME
    * convention the column-level construction used, so bucket ids are
    * stable across the refactor. Memoized: the masks depend only on
    * (tables, bits). */
  private val maskCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
  private def signMasks(tables: Int, bits: Int): Array[Long] =
    maskCache.computeIfAbsent((tables.toLong << 32) | bits.toLong, _ => {
      val masks = new Array[Long](tables * bits)
      var t = 0
      while (t < tables) {
        var p = 0
        while (p < bits) {
          var m = 0L
          var i = 0
          while (i < 64) {
            if ((ShingleKernels.splitmix64(((t.toLong * bits + p) << 8) + i) & 1L) == 1L)
              m |= (1L << i)
            i += 1
          }
          masks(t * bits + p) = m
          p += 1
        }
        t += 1
      }
      masks
    })

  /** `tables` bucket ids (each `bits` wide) for one vector: bit p of
    * table t is set iff the signed sum Σ ±a(i) under mask (t,p) is
    * positive. One kernel call replaces tables×bits interpreted
    * zip_with/aggregate chains per row. */
  def hyperplaneBuckets(a: ArrayData, tables: Int, bits: Int): ArrayData = {
    val masks = signMasks(tables, bits)
    // sign masks carry 64 dims — a longer vector would silently project
    // onto its first 64 dimensions, so refuse rather than truncate
    val n = a.numElements()
    if (n > 64)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: dim $n exceeds the 64-dim mask contract")
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val mask = masks(t * bits + p)
        var s = 0L
        var i = 0
        while (i < n) {
          val v = a.getLong(i)
          s += (if (((mask >>> i) & 1L) == 1L) v else -v)
          i += 1
        }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Byte-level payload features in one pass:
    * [n_bytes, byte_sum, n_distinct_bytes, max_run_length]. The honest
    * no-codec slice of multimodal feature extraction — real math over
    * the raw bytes, not a stub. */
  def byteStats(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    var sum = 0L
    val seen = new Array[Boolean](256)
    var distinct = 0L
    var maxRun = 0L
    var run = 0L
    var prev = -1
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sum += b
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      if (b == prev) run += 1 else { prev = b; run = 1 }
      if (run > maxRun) maxRun = run
      i += 1
    }
    new GenericArrayData(Array(n.toLong, sum, distinct, maxRun))
  }
}

/** `quantized_dot(a, b)` — exact integer dot product of two quantized
  * vectors as one codegen'd kernel call. */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.quantizedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.quantizedDot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "quantized_dot"
}

/** `sq_norm(a)` — exact integer squared norm. */
case class SqNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.sqNorm(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.sqNorm($c)")
  override protected def withNewChildInternal(newChild: Expression): SqNorm =
    copy(child = newChild)
  override def prettyName: String = "sq_norm"
}

/** `byte_stats(payload)` — [n_bytes, byte_sum, n_distinct, max_run]. */
case class ByteStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.byteStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.byteStats($c)")
  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
  override def prettyName: String = "byte_stats"
}

/** `hyperplane_buckets(a, tables, bits)` — per-table LSH bucket ids. */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData], tables, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.hyperplaneBuckets($c, $tables, $bits)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_buckets"
}
