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

  /** Per-subspace product-quantization ENCODE in one pass: for each of
    * the `cb.length` subspaces, the argmin-distance codeword index
    * (first minimum wins) of the row's j-th subvector against that
    * subspace's codewords, scoring dist = ‖cw‖² − 2·⟨v, cw⟩ (the ‖v‖²
    * term is per-vector constant and drops from the argmin). This is
    * the hot corpus-wide pass of s11/s12 — the higher-order-function
    * formulation it replaces evaluated INTERPRETED at
    * subspaces×codewords×subLen element_at calls per row. Bit-identical
    * by construction: the dot accumulates in the same left-fold order
    * as the HOF aggregate, dist is the same two-term double expression,
    * and `dist < best` keeps the FIRST minimum exactly like
    * array_position(dists, array_min(dists)). `isLong` selects the
    * element getter (s11 encodes quantized longs, s12 encodes residual
    * doubles). */
  def pqEncode(vec: ArrayData, isLong: Boolean, cb: Array[Array[Array[Double]]],
      cbn: Array[Array[Double]]): ArrayData = {
    checkVec(vec, isLong, "pq_encode")
    val m = cb.length
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j); val cbnj = cbn(j)
      val k = cbj.length
      val subLen = if (k == 0) 0 else cbj(0).length
      val base = j * subLen
      var bestC = 0
      var best = Double.NaN
      var c = 0
      while (c < k) {
        val w = cbj(c)
        var dot = 0.0
        var i = 0
        while (i < subLen) {
          val v = if (isLong) vec.getLong(base + i).toDouble
                  else vec.getDouble(base + i)
          dot = dot + v * w(i)
          i += 1
        }
        val dist = cbnj(c) - 2.0 * dot
        if (c == 0 || dist < best) { best = dist; bestC = c }
        c += 1
      }
      out(j) = bestC.toLong
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Loud precondition check for the PQ kernels (ADVICE r21): a null
    * element would read as 0/garbage through the unsafe getters and a
    * NaN would poison the argmin/fold where the HOF formulations
    * propagated null / used NaN-max ordering — neither occurs at
    * either call site (quantized longs, KMeans residuals), so refuse
    * loudly instead of silently diverging. O(dim) per row, trivial
    * beside the m·k·subLen kernel work. */
  private def checkVec(vec: ArrayData, isLong: Boolean, who: String): Unit = {
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i))
        throw new IllegalArgumentException(
          s"$who: null element at index $i — the kernel contract requires " +
            "non-null vector elements")
      if (!isLong && java.lang.Double.isNaN(vec.getDouble(i)))
        throw new IllegalArgumentException(
          s"$who: NaN element at index $i — the kernel contract requires " +
            "finite vector elements")
      i += 1
    }
  }

  /** Per-query ADC LOOKUP TABLE in one pass: lut[j][c] = ⟨v_j, cb[j][c]⟩
    * (the j-th subvector of `vec` against codeword c), the exact dots
    * s11/s12's query side precomputes once per query. Bit-identical to
    * the HOF formulation it replaces: the dot accumulates in the same
    * left-fold order (acc + v·w, i ascending from 0.0). `isLong`
    * selects the element getter exactly as [[pqEncode]]. */
  def pqLut(vec: ArrayData, isLong: Boolean,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    checkVec(vec, isLong, "pq_lut")
    val m = cb.length
    val out = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      val k = cbj.length
      val subLen = if (k == 0) 0 else cbj(0).length
      val base = j * subLen
      val row = new Array[Double](k)
      var c = 0
      while (c < k) {
        val w = cbj(c)
        var dot = 0.0
        var i = 0
        while (i < subLen) {
          val v = if (isLong) vec.getLong(base + i).toDouble
                  else vec.getDouble(base + i)
          dot = dot + v * w(i)
          i += 1
        }
        row(c) = dot
        c += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Asymmetric-distance accumulation: Σ_j table[j][codes[j]] — the
    * per-corpus-row ADC score of s11/s12 (with the codeword-norm table
    * it is also the PQ-reconstruction norm). Folds j ascending from
    * 0.0 (acc + x), the exact order of the HOF aggregate it replaces,
    * so the double result is bit-identical. A code outside the table
    * throws loudly where element_at would have nulled the whole sum —
    * unreachable from [[pqEncode]] output, which is the only producer. */
  def pqAdc(table: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (table.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: subspace count mismatch (${table.numElements()} vs $m)")
    var s = 0.0
    var j = 0
    while (j < m) {
      val row = table.getArray(j)
      val c = codes.getLong(j).toInt
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc: code $c out of range for subspace $j (k=${row.numElements()})")
      s = s + row.getDouble(c)
      j += 1
    }
    s
  }

  /** Integer milli-unit quantization of an embedding in one pass:
    * round(x · 1000, 0) HALF_UP per element, as long — the ingest
    * projection of every similarity query, previously an INTERPRETED
    * ArrayTransform+Round chain per corpus row. Bit-identical to
    * `transform(a, x -> cast(round(cast(x as double) * 1000.0, 0) as
    * long))`: float→double widening is exact; Spark's Round on
    * DoubleType is scala BigDecimal(d) (= java BigDecimal.valueOf, the
    * decimal-string constructor) . setScale(0, HALF_UP) . toDouble
    * with NaN/Infinity passed through (verified against the 4.1.2
    * RoundBase bytecode), and the long cast is Double.toLong (NaN→0,
    * clamped) — reproduced verbatim below. Null elements are rejected
    * loudly (the transform propagated them; no fixture produces any —
    * same contract as the PQ kernels). */
  def quantizeMilli(a: ArrayData, isFloat32: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_milli: null element at index $i — the kernel contract " +
            "requires non-null embedding elements")
      val x = if (isFloat32) a.getFloat(i).toDouble else a.getDouble(i)
      val scaled = x * 1000.0
      val rounded =
        if (java.lang.Double.isNaN(scaled) || java.lang.Double.isInfinite(scaled)) scaled
        else java.math.BigDecimal.valueOf(scaled)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      out(i) = rounded.toLong
      i += 1
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

/** `pq_encode(vec)` — per-subspace argmin PQ codeword indices against a
  * plan-constant codebook (first minimum wins). Accepts array<long>
  * (quantized vectors) or array<double> (coarse-quantizer residuals);
  * the codebook rides the expression as a reference object, not a
  * literal tree. */
case class PqEncode(child: Expression, cb: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<bigint> or array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def isLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray
  // the SAME ‖cw‖² summation expression the column-level formulation
  // precomputed (Seq#sum left fold) — bit-identical constants
  @transient private lazy val cbnArr: Array[Array[Double]] =
    cb.map(_.map(w => w.map(x => x * x).sum).toArray).toArray
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqEncode(input.asInstanceOf[ArrayData], isLong, cbArr, cbnArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[][][]")
    val cbnRef = ctx.addReferenceObj("pqcbn", cbnArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.pqEncode($c, $isLong, $cbRef, $cbnRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** `quantize_milli(a)` — embedding → exact integer milli-units
  * (round-half-up), one codegen'd kernel call per row. */
case class QuantizeMilli(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) |
           ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantize_milli expects array<float> or array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def isFloat32: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.quantizeMilli(input.asInstanceOf[ArrayData], isFloat32)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantizeMilli($c, $isFloat32)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeMilli =
    copy(child = newChild)
  override def prettyName: String = "quantize_milli"
}

/** `pq_lut(vec)` — the query side's PqM×PqK ADC lookup table (subspace
  * dots against a plan-constant codebook) as one codegen'd kernel call.
  * Accepts array<long> or array<double> exactly like [[PqEncode]]; the
  * codebook rides as a reference object, not a literal tree. */
case class PqLut(child: Expression, cb: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_lut expects array<bigint> or array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false),
    containsNull = false)
  private def isLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqLut(input.asInstanceOf[ArrayData], isLong, cbArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.pqLut($c, $isLong, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc(table, codes)` — Σ_j table[j][codes[j]], the per-corpus-row
  * ADC accumulation (and, fed the codeword-norm table, the PQ
  * reconstruction norm) as one codegen'd kernel call. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(
    ArrayType(ArrayType(org.apache.spark.sql.types.DoubleType)),
    ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullSafeEval(table: Any, codes: Any): Any =
    VectorKernels.pqAdc(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.VectorKernels.pqAdc($t, $c)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
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
