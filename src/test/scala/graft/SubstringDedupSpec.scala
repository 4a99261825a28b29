package graft

import org.scalatest.funsuite.AnyFunSuite

/** d8's span-grain (substring) dedup verdicts on a planted fixture:
  * known boilerplate shared across docs, a clean doc, and a doc too
  * short to span. */
class SubstringDedupSpec extends AnyFunSuite {
  import TestSession._
  val D = graft.operators.Dedup

  test("d8: planted boilerplate spans are flagged; clean and short docs report zero share") {
    import spark.implicits._
    // W=4: spans are non-overlapping 4-word windows. Docs 1 and 2 share
    // their first span exactly ("subscribe to our newsletter"); every
    // other span is unique; doc 4 is too short to produce any span.
    val docs = Seq(
      (1L, "subscribe to our newsletter alpha beta gamma delta"),
      (2L, "subscribe to our newsletter epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"),
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = D.d8Core(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 2L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("d8: a span repeated WITHIN one document only is not cross-doc boilerplate") {
    import spark.implicits._
    // doc 5 repeats its own span twice; no other doc carries it —
    // within-doc repetition must not count (df is distinct-doc count)
    val docs = Seq(
      (5L, "alpha beta gamma delta alpha beta gamma delta"),
      (6L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val got = D.d8Core(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (5L, 1L, 0L, 0.0), // array_distinct: 2 instances, 1 distinct span
      (6L, 2L, 0L, 0.0)))
  }
}
