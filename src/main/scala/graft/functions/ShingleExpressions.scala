package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. Pure
  * JVM tight loops over UTF-8 bytes / long arrays — this is the fast
  * path that replaces interpreted higher-order-function chains for the
  * dedup family's hot expressions. */
object ShingleKernels {

  /** FNV-1a 64-bit over a byte range — deterministic, allocation-free. */
  private def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def rotl(x: Long, k: Int): Long = (x << k) | (x >>> (64 - k))

  @inline private def mix(a: Long, b: Long, c: Long): Long =
    a ^ rotl(b, 21) ^ rotl(c, 42)

  /** splitmix64 — seeded remix for MinHash permutations. */
  @inline def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct 3-token shingle hashes of a space-separated text, in first-
    * occurrence order. Single pass over the UTF-8 bytes: token FNV
    * hashes, then xor-rotl window mixing, then linear-probe dedup. */
  def shingleHashes(text: UTF8String): ArrayData = {
    val n = 3 // shingle width is fixed: the mix below folds exactly 3 token hashes
    val bytes = text.getBytes
    // token hashes
    var tokenCount = 0
    var i = 0
    val tokens = new java.util.ArrayList[Long]()
    var start = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) { tokens.add(fnv64(bytes, start, i)); tokenCount += 1 }
        start = i + 1
      }
      i += 1
    }
    val m = tokenCount - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
    var j = 0
    while (j < m) {
      val h = mix(tokens.get(j), tokens.get(j + 1), tokens.get(j + 2))
      if (seen.add(h)) { out(k) = h; k += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** 64-bit SimHash of a space-separated text, returned as 4×16-bit band
    * values (band equality = the LSH bucket key for hamming≤3 search).
    * One pass: token FNV hashes vote ±1 per bit, majority wins. */
  def simhashBands(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    var i = 0
    var start = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          val h = fnv64(bytes, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](4)
    var band = 0
    while (band < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        if (votes(band * 16 + j) > 0) v |= (1L << j)
        j += 1
      }
      out(band) = v
      band += 1
    }
    new GenericArrayData(out)
  }

  @inline private def mix2(a: Long, b: Long): Long = splitmix64(a ^ rotl(b, 31))

  /** ALL-occurrence 2-token bigram hashes of a space-separated text, in
    * order (NOT deduped — t6 counts occurrences). Fixed n=2 contract,
    * same single-pass tokenization as [[shingleHashes]] (single-space
    * separators; empty tokens skipped). */
  def bigramHashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val tokens = new java.util.ArrayList[Long]()
    var i = 0
    var start = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) tokens.add(fnv64(bytes, start, i))
        start = i + 1
      }
      i += 1
    }
    val m = tokens.size() - 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var j = 0
    while (j < m) { out(j) = mix2(tokens.get(j), tokens.get(j + 1)); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct (hash, "tok1 tok2") bigram entries of a space-separated
    * text — the display-string recovery side of the hashed-bigram path:
    * hashes are identical to [[bigramHashes]]; the string is REBUILT as
    * tok1 + ' ' + tok2 rather than sliced from the original bytes, so a
    * multi-space document ("a  b") recovers the same normalized bigram
    * ("a b") the SQL twin concatenates — slicing would keep both spaces
    * and diverge. Deduped per doc: recovery only needs existence. */
  def bigramEntries(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    val hashes = new java.util.ArrayList[Long]()
    var i = 0
    var start = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) { starts.add(start); ends.add(i); hashes.add(fnv64(bytes, start, i)) }
        start = i + 1
      }
      i += 1
    }
    val m = hashes.size() - 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new java.util.ArrayList[Any](m)
    var j = 0
    while (j < m) {
      val h = mix2(hashes.get(j), hashes.get(j + 1))
      if (seen.add(h)) {
        val l1 = ends.get(j) - starts.get(j)
        val l2 = ends.get(j + 1) - starts.get(j + 1)
        val bb = new Array[Byte](l1 + 1 + l2)
        System.arraycopy(bytes, starts.get(j), bb, 0, l1)
        bb(l1) = ' '
        System.arraycopy(bytes, starts.get(j + 1), bb, l1 + 1, l2)
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](h, UTF8String.fromBytes(bb))))
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ALL-occurrence (leftTokenHash, bigramHash) pairs of a
    * space-separated text, in order — the conditional-probability key
    * pair a bigram LM needs: `hb` identifies the bigram (numerator
    * count), `hl` its left token (denominator count). Hashes are
    * IDENTICAL to [[bigramHashes]]' constituents, so counts joined
    * across the two kernels agree. */
  def bigramPairHashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val tokens = new java.util.ArrayList[Long]()
    var i = 0
    var start = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) tokens.add(fnv64(bytes, start, i))
        start = i + 1
      }
      i += 1
    }
    val m = tokens.size() - 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](tokens.get(j), mix2(tokens.get(j), tokens.get(j + 1))))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Interleave two 16-bit coordinates (a on even bits, b on odd) —
    * the 2-column Z-order curve key. Monotone in both coordinates
    * (a1<=a2 ∧ b1<=b2 ⇒ z1<=z2), which is what makes a z-range file
    * carry bounded per-column ranges. Inputs are masked to 16 bits. */
  def interleave16(a: Long, b: Long): Long = {
    def spread(x0: Long): Long = {
      var x = x0 & 0xffffL
      x = (x | (x << 8)) & 0x00ff00ffL
      x = (x | (x << 4)) & 0x0f0f0f0fL
      x = (x | (x << 2)) & 0x33333333L
      x = (x | (x << 1)) & 0x55555555L
      x
    }
    spread(a) | (spread(b) << 1)
  }

  /** N-column Z-order curve key (r20, liquid-style multi-key
    * clustering): round-robin bit interleave of n coordinates, each
    * pre-normalized by the caller to [0, 2^bits) with
    * bits = min(16, 64/n). Monotone in EVERY coordinate — the property
    * that makes a z-range file carry bounded per-column stats on all
    * n clustering keys. Coordinates are masked to `bits`. */
  def interleaveN(coords: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = coords.numElements()
    if (n == 0) return 0L
    val bits = math.min(16, 64 / n)
    val mask = (1L << bits) - 1L
    var z = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < n) {
        z |= (((coords.getLong(j) & mask) >>> b) & 1L) << (b * n + j)
        j += 1
      }
      b += 1
    }
    z
  }

  /** k-permutation MinHash signature over a shingle-hash array. */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](k)
    var p = 0
    while (p < k) {
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = splitmix64(arr.getLong(i) + 0x632be59bd9b4e019L * (p + 1))
        if (v < best) best = v
        i += 1
      }
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(text)` — distinct 3-token shingle hashes as
  * array<bigint>. Native Catalyst expression with doGenCode: the
  * generated code is one static call into the kernel, so the whole
  * operator stays inside WholeStageCodegen (no interpreted HOF chain).
  * Re-expresses the shingling the reference's dedup stage would do
  * per document. */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.shingleHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** `bigram_hashes(text)` — all-occurrence 2-token bigram hashes as
  * array<bigint>. The hot-path key for t6: the count shuffle carries
  * 8-byte hashes instead of bigram strings (at corpus scale the string
  * shuffle rewrites the corpus ×2; this is the fix). */
case class BigramHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.bigramHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.bigramHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramHashes =
    copy(child = newChild)
  override def prettyName: String = "bigram_hashes"
}

/** `bigram_entries(text)` — distinct (h, bg) bigram hash/string pairs,
  * for joining winning hashes back to display strings. */
case class BigramEntries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("bg", StringType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.bigramEntries(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.bigramEntries($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramEntries =
    copy(child = newChild)
  override def prettyName: String = "bigram_entries"
}

/** `bigram_pair_hashes(text)` — all-occurrence (hl, hb) left-token /
  * bigram hash pairs, the LM conditional-count key pair (t12). */
case class BigramPairHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hl", LongType, nullable = false),
    StructField("hb", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.bigramPairHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.bigramPairHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramPairHashes =
    copy(child = newChild)
  override def prettyName: String = "bigram_pair_hashes"
}

/** `interleave_bits(a, b)` — 2-column Z-order key from two 16-bit-
  * normalized coordinates (x22's clustering key). */
case class InterleaveBits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernels.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleKernels.interleave16($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): InterleaveBits = copy(left = newLeft, right = newRight)
  override def prettyName: String = "interleave_bits"
}

/** `interleave_bits_n(array(a, b, ...))` — N-column Z-order key from
  * bit-normalized coordinates (x56's liquid-style clustering key). */
case class InterleaveBitsN(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.interleaveN(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.interleaveN($c)")
  override protected def withNewChildInternal(newChild: Expression): InterleaveBitsN =
    copy(child = newChild)
  override def prettyName: String = "interleave_bits_n"
}

/** `simhash_bands(text)` — 64-bit SimHash as 4×16-bit band values. */
case class SimHashBands(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.simhashBands(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.simhashBands($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
  override def prettyName: String = "simhash_bands"
}

/** `minhash_signature(sh_arr, k)` — k-long MinHash signature. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.minhashSignature(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.minhashSignature($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}
