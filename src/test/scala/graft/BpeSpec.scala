package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BPE trainer/encoder contract behind t17_bpe_tokens: merges are
  * learned deterministically (max count, lexicographic tie-break, stop
  * below count 2), the greedy encoder replays them by rank, and the
  * operator is stable across runs — the properties the rows-only gate
  * can't see. Fixture merges below are hand-derived. */
class BpeSpec extends AnyFunSuite {
  import TestSession._
  val K = graft.functions.BpeKernels

  test("train learns hand-derived merges in deterministic order") {
    // dict: "ab"×3, "abc"×2 with end mark E (= EndMark, U+FFFF)
    //   pairs (a b):5 (b E):3 (b c):2 (c E):2      → merge "a b"
    //   pairs (ab E):3 (ab c):2 (c E):2            → merge "ab E"
    //   pairs (ab c):2 (c E):2, tie → lexicographic → merge "ab c"
    //   pairs (abc E):2                            → merge "abc E"
    //   best remaining pair occurs once → stop before numMerges
    val E = K.EndMark
    val merges = K.train(Seq(("ab", 3L), ("abc", 2L)), numMerges = 10)
    assert(merges.toSeq == Seq("a b", s"ab $E", "ab c", s"abc $E"),
      s"merge order drifted: ${merges.toSeq}")
  }

  test("greedy encoder replays merges by rank; unseen words fall back to chars") {
    val E = K.EndMark
    val ranks = K.buildRanks(Array("a b", s"ab $E", "ab c", s"abc $E"))
    assert(K.encodeLen("ab", ranks) == 1)   // [a b E] → [ab E] → [abE]
    assert(K.encodeLen("abc", ranks) == 1)  // ranks 0,2,3 chain to one token
    assert(K.encodeLen("abd", ranks) == 3)  // [ab d E] after rank 0, no more
    assert(K.encodeLen("ca", ranks) == 3)   // no merge applies: c a E
    assert(K.encodeLen("", ranks) == 0)
    // a malformed word smuggling the sentinel codepoint cannot forge a
    // boundary: the char is stripped before symbolization
    assert(K.encodeLen("a" + E + "b", ranks) == 1) // strips to "ab"
  }

  test("countTokens splits on the pinned whitespace contract and sums per-word encodes") {
    val E = K.EndMark
    val ranks = K.buildRanks(Array("a b", s"ab $E", "ab c", s"abc $E"))
    val text = org.apache.spark.unsafe.types.UTF8String
      .fromString("ab abcabd  \t ab\n")
    // ab(1) + abc(1) + abd(3) + ab(1); empties from the double space and
    // trailing newline contribute nothing
    assert(K.countTokens(text, ranks) == 6L)
  }

  test("t17 over the corpus: deterministic across runs, every word costs >= 1 token") {
    val T = graft.operators.TextAnalysis
    val a = T.t17BpeTokens(spark, sf).collect()
    val b = T.t17BpeTokens(spark, sf).collect()
    assert(a.length > 0)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "t17 must be deterministic run-to-run")
    // a BPE token never spans words, so each doc costs at least its
    // whitespace word count
    a.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: bpe=${r.getLong(2)} < words=${r.getLong(1)}")
    }
  }
}
