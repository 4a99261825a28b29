package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t15 (sequence packing) on a hand-packable fixture plus stream
  * invariants at sf, t16 (mixture sampling) determinism and rate
  * audit, c20 (journey transition matrix) probability accounting. */
class PackingMixtureSpec extends AnyFunSuite {
  import TestSession._
  val T = graft.operators.TextAnalysis
  val C = graft.operators.Churn

  test("t15: hand-packed fixture — straddling, offsets, shard independence") {
    import spark.implicits._
    // one shard (doc_ids ≡ 0 mod 8): token counts 300, 300, 600
    //   stream: [0,300) [300,600) [600,1200)
    //   budget 512 → doc 0 in pack 0; doc 8 straddles 0→1 (offset 300);
    //   doc 16 starts in pack 1 (offset 600-512=88) and ends in pack 2
    // second shard (≡ 1 mod 8): 100 tokens → its OWN pack 0, offset 0
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, words(300)), (8L, words(300)), (16L, words(600)),
      (1L, words(100))
    ).toDF("doc_id", "text")
    val got = T.t15Core(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(0L) == ((300L, 0L, 0L, 0L)), s"doc 0: ${got(0L)}")
    assert(got(8L) == ((300L, 0L, 1L, 300L)), s"doc 8 must straddle 0->1: ${got(8L)}")
    assert(got(16L) == ((600L, 1L, 2L, 88L)), s"doc 16: ${got(16L)}")
    // the second shard's stream starts at zero — shard independence
    assert(got(1L) == ((100L, 0L, 0L, 0L)), s"doc 1: ${got(1L)}")
  }

  test("t15: stream invariants at sf — offsets bounded, packs contiguous per shard") {
    val rows = SparkEntry.queries("t15_seq_packing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, tokens, pf, pl, off) =>
      assert(off >= 0 && off < T.T15Budget, s"doc $id offset $off out of range")
      assert(pf <= pl, s"doc $id pack_first $pf > pack_last $pl")
      // a doc spans exactly the packs its token run covers
      val spanned = (off + tokens - 1).max(0) / T.T15Budget
      assert(pl - pf == spanned, s"doc $id spans $spanned extra packs, got ${pl - pf}")
    }
    // within a shard, consecutive docs tile the stream: next offset is
    // (prev offset + prev tokens) mod budget, and pack_first advances
    // to prev pack_last (+1 exactly when prev ended flush on a boundary)
    rows.groupBy(_._2).foreach { case (shard, ds) =>
      ds.sortBy(_._1).sliding(2).foreach {
        case Array((_, _, t0, _, pl0, off0), (id1, _, _, pf1, _, off1)) =>
          val expOff = (off0 + t0) % T.T15Budget
          assert(off1 == expOff, s"shard $shard doc $id1: offset $off1 != $expOff")
          val expPf = if (expOff == 0) pl0 + 1 else pl0
          assert(pf1 == expPf, s"shard $shard doc $id1: pack_first $pf1 != $expPf")
        case _ =>
      }
    }
  }

  test("t15: adversarial whitespace — explicit class + empty-token filter (r9 driver-hash postmortem)") {
    import spark.implicits._
    // Java \s includes \x0B, RE2's does not; Java split drops trailing
    // empties, string_split_regex keeps them. The pinned contract
    // (explicit class, empties filtered) must count these identically
    // to the DuckDB oracle — values below are hand-derived.
    val docs = Seq(
      (0L, "plain text the quick fox"),   // 5
      (8L, "trailing tab ends here\t"),   // 4: trailing \t yields no empty token
      (16L, "vertical\u000Btab inside"),  // 3: \x0B IS whitespace under the contract
      (24L, "double  space  here"),       // 3
      (32L, " leading space"),            // 2
      (40L, ""),                          // 0: empty text has no tokens
      (48L, " \t\n\u000B\f\r "),          // 0: whitespace-only
      (56L, "a")                          // 1
    ).toDF("doc_id", "text")
    val got = T.t15Core(docs).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exp = Map(0L -> 5L, 8L -> 4L, 16L -> 3L, 24L -> 3L, 32L -> 2L,
      40L -> 0L, 48L -> 0L, 56L -> 1L)
    exp.foreach { case (id, n) =>
      assert(got(id) == n, s"doc $id: got ${got(id)} tokens, want $n") }
  }

  test("t15: duplicate doc_ids get deterministic peer-group sums (RANGE frame)") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // two rows share doc_id 0 (same shard): under the explicit RANGE
    // frame both are peers — cum_after is the PAIR total for both rows,
    // on both engines, regardless of tie order. A ROWS frame here would
    // be tie-order nondeterministic and no two engines need agree.
    val docs = Seq((0L, words(100)), (0L, words(200)), (8L, words(50))).toDF("doc_id", "text")
    val got = T.t15Core(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val dup = got.filter(_._1 == 0L).sortBy(_._2)
    // peers: cum_after = 300 for both; cum_before = 300 - own tokens
    assert(dup.map(_._2).toSeq == Seq(100L, 200L))
    assert(dup(0)._5 == 200L, s"100-token row offset: ${dup(0)._5}")  // 300-100
    assert(dup(1)._5 == 100L, s"200-token row offset: ${dup(1)._5}")  // 300-200
    // doc 8 follows the pair: cum_before = 300
    val after = got.find(_._1 == 8L).get
    assert(after._4 == 300L / T.T15Budget && after._5 == 300L % T.T15Budget)
  }

  test("t15: negative doc_id shards by pmod; budget straddle at exactly 512") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((-3L, words(10)), (6L, words(512)), (14L, words(1))).toDF("doc_id", "text")
    val got = T.t15Core(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // pmod puts -3 in shard 5 (SQL's plain % would say -3) — alone there
    assert(got(-3L) == ((5L, 0L, 0L, 0L)), s"negative id: ${got(-3L)}")
    // 512-token doc fills shard 6's pack 0 exactly: [0,512) → first=last=0
    assert(got(6L) == ((6L, 0L, 0L, 0L)), s"512-token doc: ${got(6L)}")
    // next doc in that shard starts flush in pack 1, offset 0
    assert(got(14L) == ((6L, 1L, 1L, 0L)), s"doc after flush boundary: ${got(14L)}")
  }

  test("t15/t16: session knobs override defaults without recompiling") {
    val s2 = spark.newSession()
    s2.conf.set(T.T15ShardsKey, "2")
    s2.conf.set(T.T15BudgetKey, "100")
    import s2.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((0L, words(150)), (2L, words(30)), (1L, words(10))).toDF("doc_id", "text")
    val got = T.t15Core(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // shards=2: docs 0 and 2 share shard 0; budget=100: doc 0 straddles
    assert(got(0L) == ((0L, 0L, 1L, 0L)), s"doc 0 under budget=100: ${got(0L)}")
    assert(got(2L) == ((0L, 1L, 1L, 50L)), s"doc 2 offset 150%100: ${got(2L)}")
    assert(got(1L) == ((1L, 0L, 0L, 0L)), s"doc 1 own shard: ${got(1L)}")

    s2.conf.set(T.T16RatesKey, "1.0,1.0,1.0,1.0")
    val all = SparkEntry.queries("t16_mixture_sample")(s2, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(all.nonEmpty)
    all.foreach { case (src, total, kept) =>
      assert(kept == total, s"$src: rate-1.0 override must keep all ($kept/$total)") }
  }

  test("t16: deterministic, rate-1.0 sources keep everything, audit consistent") {
    val run1 = SparkEntry.queries("t16_mixture_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val run2 = SparkEntry.queries("t16_mixture_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(run1.sameElements(run2), "sampling decisions must be run-deterministic")
    assert(run1.nonEmpty)
    run1.foreach { case (src, target, total, kept, achieved) =>
      assert(kept >= 0 && kept <= total, s"$src kept $kept of $total")
      assert(math.abs(achieved - kept.toDouble / total) < 1e-12)
      if (target == 1.0) assert(kept == total, s"$src rate-1.0 must keep all")
      // Knuth-hash split: generous binomial envelope at small counts
      else assert(math.abs(achieved - target) < 0.2,
        s"$src achieved $achieved vs target $target")
    }
  }

  test("c20: hops account for every non-final event; probabilities sum to 1 per origin") {
    val rows = SparkEntry.queries("c20_event_transitions")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.sources.Tables.events(spark, sf)
    val (events, users) = (ev.count(), ev.select(countDistinct(col("user_id"))).head().getLong(0))
    // each user's path of n events contributes n-1 hops
    assert(rows.map(_._3).sum == events - users,
      s"hops ${rows.map(_._3).sum} != events $events - users $users")
    rows.groupBy(_._1).foreach { case (origin, ts) =>
      val p = ts.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-9, s"origin $origin probs sum to $p")
    }
  }

  test("c20: fixture — ties broken by event_id, self-loops counted") {
    import spark.implicits._
    // user 1: a(t=1) -> b(t=2) -> b(t=2, higher id) -> a(t=3)
    // user 2: a(t=1) -> a(t=2)
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (1L, 2L, 12L, "b"), (1L, 3L, 13L, "a"),
      (2L, 1L, 20L, "a"), (2L, 2L, 21L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = C.c20Core(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // hops: a->b, b->b (tie ordered 11 before 12), b->a, a->a
    assert(got(("a", "b")) == ((1L, 0.5)), s"a->b: ${got.get(("a", "b"))}")
    assert(got(("a", "a")) == ((1L, 0.5)), s"a->a: ${got.get(("a", "a"))}")
    assert(got(("b", "b")) == ((1L, 0.5)), s"b->b: ${got.get(("b", "b"))}")
    assert(got(("b", "a")) == ((1L, 0.5)), s"b->a: ${got.get(("b", "a"))}")
    assert(got.size == 4)
  }

  test("t18: every doc lands in exactly one shard, deterministically, hash-balanced") {
    val T = graft.operators.TextAnalysis
    val audit = T.t18ShardExport(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    // conservation: the written shards hold the whole corpus, token-exact
    assert(audit.values.map(_._1).sum == nDocs, s"doc conservation: $audit")
    val wsTotal = T.t3Tokens(spark, sf).agg(sum("ws_tokens")).head().getLong(0)
    assert(audit.values.map(_._2).sum == wsTotal, "token conservation across shards")
    // every shard materialized; hash balance keeps sizes within a small
    // multiple at ~31 docs/shard expected occupancy
    assert(audit.keySet == (0L until T.T18Shards).toSet, s"missing shards: ${audit.keySet}")
    val sizes = audit.values.map(_._1)
    assert(sizes.min > 0 && sizes.max <= 5 * sizes.min,
      s"shard skew: min=${sizes.min} max=${sizes.max}")
    // pure-function assignment: a second export reproduces the audit
    val again = T.t18ShardExport(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == audit, "shard assignment must be deterministic")
  }

  test("t18: STRIDED doc_ids still spread across shards (the hash is not id mod 16)") {
    import org.apache.spark.sql.functions._
    // ids in steps of 16: a bare `id mod 16` would pile ALL of them
    // into one shard — the review-caught degeneracy (2654435761 ≡ 1
    // mod 16, 10⁸ ≡ 0 mod 16). The prime fold must mix them. The spec
    // drives the PRODUCTION expression (t18Shard), not a private copy,
    // so a regression of the real hash fails here.
    val strided = spark.range(0, 100).select((col("id") * 16L).as("doc_id"))
    val counts = strided.select(graft.operators.TextAnalysis.t18Shard.as("s"))
      .groupBy("s").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size >= 8,
      s"strided ids collapsed to ${counts.size} shards: $counts")
    assert(counts.values.max <= 25, s"strided ids skewed: $counts")
  }
}
