package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t14 (intra-document repetition gate) on planted fixtures, and s9
  * (cosine range search) cross-checked against s1's exact top-k. */
class RepetitionRangeSpec extends AnyFunSuite {
  import TestSession._
  val T = graft.operators.TextAnalysis

  test("t14: generation-loop and keyword-stuffed docs are flagged; varied text is not") {
    import spark.implicits._
    val docs = Seq(
      // degenerate generation loop: one bigram owns every slot
      (1L, "buy now buy now buy now buy now buy now buy now"),
      // varied vocabulary, no dominant bigram, no repeats (long enough
      // that the 1/(n-1) share floor of unique-bigram text sits below
      // the flag threshold)
      (2L, "the quick brown fox jumps over one lazy sleeping dog " +
        "while seven green turtles slowly cross an old wooden bridge today"),
      // high duplicate-word ratio without a single dominant bigram
      (3L, "spam ham spam egg spam ham egg spam ham spam")
    ).toDF("doc_id", "text")
    val got = T.t14Core(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    // doc 1: 12 tokens, 2 distinct -> dup 10/12; "buy now" fills 6 of 11
    // bigram slots; "now buy" 5 — top share 6/11
    assert(got(1L)._1 == 12 && got(1L)._4 == 1L, s"loop doc not flagged: ${got(1L)}")
    assert(math.abs(got(1L)._2 - 10.0 / 12) < 1e-12 &&
      math.abs(got(1L)._3 - 6.0 / 11) < 1e-12)
    // doc 2: 21 distinct tokens of 21 -> dup 0, top share 1/20 -> clean
    assert(got(2L)._2 == 0.0 && got(2L)._4 == 0L,
      s"varied doc wrongly flagged: ${got(2L)}")
    // doc 3: 10 tokens, 3 distinct -> dup 0.7 >= 0.6 -> flagged
    assert(got(3L)._2 == 0.7 && got(3L)._4 == 1L, s"stuffed doc not flagged: ${got(3L)}")
  }

  test("c19: life-table accounting closes — churned plus final-day survivors equals the population") {
    val rows = SparkEntry.queries("c19_hazard_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val users = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    // every user either churned on some day or was still at risk on the
    // final (censored) day
    assert(rows.map(_._3).sum + rows.last._2 == users,
      s"life table does not close: churned=${rows.map(_._3).sum} final_at_risk=${rows.last._2} users=$users")
    // at-risk starts at the day-one cohort and never goes negative;
    // hazard is a valid probability
    assert(rows.forall(r => r._2 >= 0 && r._4 >= 0.0 && r._4 <= 1.0))
    assert(rows.last._3 == 0L, "final day must be censored, not churned")
  }

  test("s9: range results agree with s1's exact top-k above the radius") {
    val S = graft.operators.Similarity
    val s9 = SparkEntry.queries("s9_range_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val s1 = SparkEntry.queries("s1_knn_brute")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every top-k neighbor at or above the radius MUST be in the range
    // result with the identical similarity (same integer kernel)
    val above = s1.filter(_._3 >= S.S9Tau)
    assert(above.nonEmpty, "fixture radius excludes every top-k neighbor — spec is vacuous")
    above.foreach { case (q, c, sim) =>
      assert(s9.get((q, c)).contains(sim), s"s1 neighbor ($q,$c,$sim) missing from s9")
    }
    // and nothing below the radius leaks in
    assert(s9.values.forall(_ >= S.S9Tau))
  }
}
