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
    // dict: "ab"×3, "abc"×2 with end mark ·
    //   pairs (a b):5 (b ·):3 (b c):2 (c ·):2      → merge "a b"
    //   pairs (ab ·):3 (ab c):2 (c ·):2            → merge "ab ·"
    //   pairs (ab c):2 (c ·):2, tie → lexicographic → merge "ab c"
    //   pairs (abc ·):2                            → merge "abc ·"
    //   best remaining pair occurs once → stop before numMerges
    val merges = K.train(Seq(("ab", 3L), ("abc", 2L)), numMerges = 10)
    assert(merges.toSeq == Seq("a b", "ab ·", "ab c", "abc ·"),
      s"merge order drifted: ${merges.toSeq}")
  }

  test("greedy encoder replays merges by rank; unseen words fall back to chars") {
    val ranks = K.buildRanks(Array("a b", "ab ·", "ab c", "abc ·"))
    assert(K.encodeLen("ab", ranks) == 1)   // [a b ·] → [ab ·] → [ab·]
    assert(K.encodeLen("abc", ranks) == 1)  // ranks 0,2,3 chain to one token
    assert(K.encodeLen("abd", ranks) == 3)  // [ab d ·] after rank 0, no more
    assert(K.encodeLen("ca", ranks) == 3)   // no merge applies: c a ·
    assert(K.encodeLen("", ranks) == 0)
  }

  test("countTokens splits on the pinned whitespace contract and sums per-word encodes") {
    val ranks = K.buildRanks(Array("a b", "ab ·", "ab c", "abc ·"))
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
