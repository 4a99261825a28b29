package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels: a deterministic BPE trainer over a
  * word-frequency dictionary and the greedy encoder that counts tokens
  * under the learned merges. This is the "actual vocab" token counter a
  * training-data pipeline budgets with — t3's regex pre-tokenizer
  * approximates token counts; this REPRODUCES them for the trained
  * vocabulary (the standard sennrich-style BPE: learn the most frequent
  * adjacent symbol pair, merge, repeat).
  *
  * Scale split: pair counting during TRAINING runs on the bounded
  * word-frequency dictionary (top-K distinct words by count — the same
  * corpus bounding every production BPE trainer applies; K is constant,
  * so the driver footprint does not grow with the corpus). ENCODING is
  * a per-row kernel inside whole-stage codegen, merges broadcast with
  * the plan — the 100 TB path is one map-side pass, no shuffle.
  */
object BpeKernels {

  /** The trainer's word-end sentinel symbol (sennrich's `</w>`): lets
    * merges distinguish "low" the word from "low" the prefix of
    * "lower". U+FFFF is a Unicode NONCHARACTER — it cannot appear in
    * well-formed interchanged text, so no corpus word can collide with
    * the sentinel (an ordinary char like the r10 interpunct CAN occur
    * in real text — Catalan, typography — and a word containing it
    * would be conflated with a word boundary, skewing merges and
    * counts). Belt and braces: [[train]] and [[encodeLen]] also STRIP
    * the codepoint from input words, so even malformed text that
    * smuggles U+FFFF in cannot forge a boundary. */
  val EndMark = "\uFFFF"
  private val EndChar = '\uFFFF'

  /** Train `numMerges` merges from a (word, count) dictionary.
    * Deterministic: the winning pair is (max count, then lexicographic
    * smallest) and training stops early when the best pair occurs only
    * once (merging it cannot help a second word). Returns merges in
    * learned order — the rank table the encoder replays. */
  def train(words: Seq[(String, Long)], numMerges: Int): Array[String] = {
    // each distinct word as a mutable symbol list, weighted by count
    val syms = words.map { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      w.foreach(ch => if (ch != EndChar) b += ch.toString)
      b += EndMark
      b
    }
    val counts = words.map(_._2).toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var it = 0
    while (it < numMerges) {
      val pairCounts = new java.util.HashMap[String, java.lang.Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        var i = 0
        while (i < s.length - 1) {
          pairCounts.merge(s(i) + " " + s(i + 1), counts(wi), (a, b) => a + b)
          i += 1
        }
        wi += 1
      }
      var bestPair: String = null
      var bestN = 1L // a pair must occur at least twice to be worth a merge
      pairCounts.forEach { (p, n) =>
        if (n > bestN || (n == bestN && bestPair != null && p.compareTo(bestPair) < 0)) {
          bestPair = p; bestN = n
        }
      }
      if (bestPair == null) return merges.toArray // dictionary exhausted
      merges += bestPair
      val Array(a, b) = bestPair.split(" ", 2)
      val ab = a + b
      syms.foreach { s =>
        var i = 0
        while (i < s.length - 1) {
          if (s(i) == a && s(i + 1) == b) { s(i) = ab; s.remove(i + 1) }
          else i += 1
        }
      }
      it += 1
    }
    merges.toArray
  }

  /** Merge list → rank map ("a b" → learned order). */
  def buildRanks(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), i); i += 1 }
    m
  }

  /** Greedy BPE encode length of ONE word (chars + end mark, then the
    * lowest-rank applicable merge until none applies) — the standard
    * encoder, returning only the token count (the pipeline budget
    * number; materializing token strings would be a different column). */
  def encodeLen(word: String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (word.isEmpty) return 0
    val s = scala.collection.mutable.ArrayBuffer.empty[String]
    word.foreach(ch => if (ch != EndChar) s += ch.toString)
    s += EndMark
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.get(s(i) + " " + s(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else { s(bestAt) = s(bestAt) + s(bestAt + 1); s.remove(bestAt + 1) }
    }
    s.length
  }

  /** Whitespace bytes of the pinned cross-engine contract
    * (TextAnalysis.WsSet): space, \t, \n, \x0B, \f, \r. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Total BPE token count of a document: pinned-contract whitespace
    * split (empty tokens skipped — the same tokens wsTokens counts),
    * each word greedily encoded under `ranks`. One pass, no
    * allocation beyond the per-word symbol buffer. */
  def countTokens(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Long = {
    val bytes = text.getBytes
    var total = 0L
    var i = 0
    var start = 0
    while (i <= bytes.length) {
      if (i == bytes.length || isWs(bytes(i))) {
        if (i > start)
          total += encodeLen(
            UTF8String.fromBytes(bytes, start, i - start).toString, ranks)
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** `bpe_token_count(text)` — document token count under a trained BPE
  * merge table. Native Catalyst expression: the merges ride the plan as
  * a codegen reference object (broadcast with the task binaries), the
  * generated code is one static kernel call, and the whole operator
  * stays inside WholeStageCodegen — the map-side-only 100 TB shape. */
case class BpeTokenCount(child: Expression, merges: Array[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  @transient private lazy val ranks = BpeKernels.buildRanks(merges)
  override def nullSafeEval(input: Any): Any =
    BpeKernels.countTokens(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.countTokens($c, $ranksRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}
