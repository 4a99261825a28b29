package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Every declared query builds a plan and returns rows on sf0.001. */
class SmokeSpec extends AnyFunSuite {
  import TestSession._
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query key is snake_case and every oracle key is a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

/** Scala-side oracles for the non-SQL-expressible operators. */
class NonSqlOracleSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._

  test("t4_fingerprint is deterministic across runs") {
    val a = graft.operators.TextAnalysis.t4Fingerprint(spark, sf).collect().toSeq
    val b = graft.operators.TextAnalysis.t4Fingerprint(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  test("d3_minhash_lsh finds every strong exact-Jaccard pair (recall on tau>=0.5)") {
    val exact = graft.operators.Dedup.d2DedupNgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.Dedup.d3DedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- lsh
    assert(missed.isEmpty,
      s"minhash-LSH missed ${missed.size}/${exact.size} strong pairs: $missed")
  }

  test("d3 jaccard values agree with d2 on common pairs (capped-aware)") {
    val d2 = graft.operators.Dedup.d2DedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val d3 = graft.operators.Dedup.d3DedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val common = d2.keySet.intersect(d3.keySet)
    assert(common.nonEmpty)
    // d2 computes Jaccard over the df-capped shingle space; d3 verifies
    // on full arrays. They coincide exactly for pairs of docs untouched
    // by the cap — restrict the equality check to those (on a hotter
    // corpus the capped docs legitimately differ).
    val sh = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.functions.shingle_hashes(col("text"))).as("h"))
    val nDocs = sh.select("doc_id").distinct().count()
    val dfCap = math.max(graft.operators.Dedup.DfCapFloor,
      math.ceil(graft.operators.Dedup.DfCapFrac * nDocs).toLong)
    val cappedDocs = sh.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"),
        collect_set(col("doc_id")).as("ds"))
      .filter(col("df") > dfCap)
      .select(explode(col("ds")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val untouched = common.filter(k => !cappedDocs(k._1) && !cappedDocs(k._2))
    assert(untouched.nonEmpty, "no cap-untouched common pairs to compare at this SF")
    untouched.foreach { k => assert(d2(k) == d3(k), s"jaccard mismatch at $k") }
  }

  test("d4_simhash: near-identical docs collide, output is deterministic") {
    val a = graft.operators.Dedup.d4DedupSimhash(spark, sf).collect().toSeq
    val b = graft.operators.Dedup.d4DedupSimhash(spark, sf).collect().toSeq
    assert(a == b)
    a.foreach { r => assert(r.getInt(2) <= 3) } // hamming bound respected
  }

  test("s2_knn_lsh: bucketed neighbors are a subset of s1 candidates with sane recall") {
    val brute = graft.operators.Similarity.s1KnnBrute(spark, sf)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.Similarity.s2KnnLsh(spark, sf)
      .select("q_id", "cand_id", "cos_sim").collect()
    assert(lsh.nonEmpty, "LSH returned no neighbors at all")
    // every LSH result must be a real vector pair with cos_sim in [-1, 1]
    lsh.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0)
      assert(r.getLong(0) != r.getLong(1))
    }
    // recall vs brute force (random hyperplanes on near-random vectors:
    // just require nonzero overlap — the contract is candidate pruning,
    // not exactness)
    val overlap = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(brute)
    assert(overlap.nonEmpty, "LSH found zero of the true top-10 neighbors")
  }

  test("s5_knn_ivf: valid neighbors, deterministic, nonzero overlap with s1") {
    val brute = graft.operators.Similarity.s1KnnBrute(spark, sf)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = graft.operators.Similarity.s5KnnIvf(spark, sf).collect()
    val b = graft.operators.Similarity.s5KnnIvf(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "IVF not deterministic")
    assert(a.nonEmpty)
    val overlap = a.map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(brute)
    assert(overlap.nonEmpty, "IVF found zero of the true top-10 neighbors")
  }

  test("s10_knn_graph: NN-descent improves on the LSH init; valid, deterministic, bounded degree") {
    val S = graft.operators.Similarity
    val brute = S.s1KnnBrute(spark, sf)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = S.s10KnnGraph(spark, sf).collect()
    val b = S.s10KnnGraph(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq, "graph ANN not deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0)
      assert(r.getLong(0) != r.getLong(1))
    }
    // recall vs the exact top-10: the graph expansion must beat a
    // bare nonzero-overlap bar — the NoN hop exists to recover
    // neighbors the LSH buckets missed
    val got = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    println(s"[spec] s10 recall@10 vs s1: $recall")
    assert(recall >= 0.5, s"graph ANN recall $recall below floor 0.5")
    // the graph itself keeps its degree bound (≤ GraphK per vertex)
    val deg = S.knnGraph(spark, sf).groupBy("src").count()
      .agg(max("count")).head().getLong(0)
    assert(deg <= 10, s"graph degree $deg exceeds K")
  }

  test("s11_knn_pq: trained codebooks; ADC recall >= 0.8; deterministic; exact re-rank") {
    val S = graft.operators.Similarity
    val a = S.s11KnnPq(spark, sf).collect()
    val b = S.s11KnnPq(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "PQ not deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0)
      assert(r.getLong(0) != r.getLong(1))
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 10)
    }
    // recall vs the exact top-10 through the 128-deep shortlist + exact
    // re-rank: trained codebooks (r20) must hold at least the anchor
    // version's measured 0.80 — VERDICT r19 #8's strict bar
    val brute = S.s1KnnBrute(spark, sf).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    println(s"[spec] s11 recall@10 vs s1: $recall")
    assert(recall >= 0.8, s"trained-PQ recall $recall below floor 0.8")
    // EVERY reported similarity is the EXACT cosine (re-rank contract)
    // — recall-miss pairs included, so the check recomputes each pair
    // from the quantized vectors instead of only covering pairs s1
    // happened to also report
    val qn = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000.0, 0).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    def cosExact(x: Long, y: Long): Double = {
      val (va, vb) = (qn(x), qn(y))
      val dot = va.zip(vb).map { case (p, q) => p * q }.sum.toDouble
      dot / (math.sqrt(va.map(v => v * v).sum.toDouble) *
        math.sqrt(vb.map(v => v * v).sum.toDouble))
    }
    a.foreach(r => assert(r.getDouble(2) == cosExact(r.getLong(0), r.getLong(1)),
      s"re-ranked cos diverged from exact for $r"))
  }

  test("s12_knn_ivfpq: trained residual codebooks; probed-list ADC; recall; exact re-rank") {
    val S = graft.operators.Similarity
    val a = S.s12KnnIvfPq(spark, sf).collect()
    val b = S.s12KnnIvfPq(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "IVF-PQ not deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0)
      assert(r.getLong(0) != r.getLong(1))
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 10)
    }
    // recall vs the exact top-10 through probed lists + ADC + exact
    // re-rank — must hold s11's floor at the same PqM×PqK code budget
    val brute = S.s1KnnBrute(spark, sf).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    println(s"[spec] s12 recall@10 vs s1: $recall")
    // measured 0.88 at test SF (6/16 probed lists, trained residual
    // codebooks) — floor at s11's measured 0.80 as the verdict asked,
    // proving the composition beats flat PQ at the same code budget
    assert(recall >= 0.8, s"IVF-PQ recall $recall below floor 0.8")
    // re-rank contract: every reported similarity is the EXACT cosine
    val qn = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000.0, 0).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    def cosExact(x: Long, y: Long): Double = {
      val (va, vb) = (qn(x), qn(y))
      val dot = va.zip(vb).map { case (p, q) => p * q }.sum.toDouble
      dot / (math.sqrt(va.map(v => v * v).sum.toDouble) *
        math.sqrt(vb.map(v => v * v).sum.toDouble))
    }
    a.foreach(r => assert(r.getDouble(2) == cosExact(r.getLong(0), r.getLong(1)),
      s"re-ranked cos diverged from exact for $r"))
  }

  test("s7_knn_sq8: two-stage SQ8+rerank reproduces s1's exact top-10 at test SF") {
    val brute = graft.operators.Similarity.s1KnnBrute(spark, sf)
      .select("q_id", "cand_id", "cos_sim", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val sq8 = graft.operators.Similarity.s7KnnSq8(spark, sf)
      .select("q_id", "cand_id", "cos_sim", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // the 40-deep shortlist holds every true top-10 here, so the exact
    // re-rank must reproduce s1 bit-for-bit (cos included: both sides
    // compute the same integer dot / double division)
    assert(sq8 == brute,
      s"SQ8+rerank diverged from exact: ${sq8.toSet -- brute.toSet}")
  }

  test("s8_mmr_rerank: deterministic, top-1 = s1's, diversity beats plain top-k") {
    val S = graft.operators.Similarity
    val a = S.s8MmrRerank(spark, sf).collect().map(_.toSeq).toSeq
    val b = S.s8MmrRerank(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "MMR not deterministic")
    val mmr = a.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int],
      r(2).asInstanceOf[Long]))
    val brute = S.s1KnnBrute(spark, sf).select("q_id", "rk", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // the first MMR pick has no redundancy term: it must be s1's top-1
    val top1Mmr = mmr.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    val top1Brute = brute.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(top1Mmr == top1Brute, s"first pick diverged: $top1Mmr vs $top1Brute")
    // diversity: average pairwise cosine among MMR picks must not exceed
    // plain top-10's (that is the entire point of the redundancy term)
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000.0, 0).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def avgPairCos(ids: Seq[Long]): Double = {
      val pairs = for (i <- ids.indices; j <- i + 1 until ids.length) yield {
        val (a, b) = (vecs(ids(i)), vecs(ids(j)))
        val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
        dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(b.map(x => x * x).sum.toDouble))
      }
      pairs.sum / pairs.length
    }
    val qids = mmr.map(_._1).distinct
    val mmrAvg = qids.map(q => avgPairCos(mmr.filter(_._1 == q).map(_._3))).sum / qids.length
    val bruteAvg = qids.map(q => avgPairCos(brute.filter(_._1 == q).map(_._3))).sum / qids.length
    assert(mmrAvg <= bruteAvg + 1e-9,
      s"MMR picks not more diverse: $mmrAvg vs plain $bruteAvg")
  }

  test("s6_pairwise_lsh equals the exact all-pairs strong-pair set at test SF") {
    import spark.implicits._
    // independent exact ground truth: quantized all-pairs over the FULL corpus
    val q = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000.0, 0).cast("long")).as("qv"))
      .withColumn("nrm", aggregate(transform(col("qv"), v => v * v), lit(0L), _ + _))
    val exact = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (aggregate(zip_with(col("a.qv"), col("b.qv"), _ * _), lit(0L), _ + _).cast("double")
          / (sqrt(col("a.nrm").cast("double")) * sqrt(col("b.nrm").cast("double")))).as("cos_sim"))
      .filter(col("cos_sim") >= graft.operators.Similarity.PairTau)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = graft.operators.Similarity.s6PairwiseLsh(spark, sf)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(exact.nonEmpty, "no strong pairs at this SF — PairTau too high for the data")
    assert(lsh.keySet == exact.keySet,
      s"missed: ${exact.keySet -- lsh.keySet}; phantom: ${lsh.keySet -- exact.keySet}")
    lsh.foreach { case (k, v) => assert(v == exact(k), s"cosine drift at $k") }
  }

  test("m3 byte features match an independent plain-Scala byte computation") {
    val mimes = Array("image/png", "audio/wav", "video/mp4")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy { case (id, _) => mimes((id % 3).toInt) }
      .map { case (mime, rows) =>
        val stats = rows.map { case (_, text) =>
          val bytes = text.getBytes("UTF-8")
          val runs = if (bytes.isEmpty) 0L else {
            var maxRun = 1L; var run = 1L
            bytes.sliding(2).foreach { w =>
              if (w.length == 2 && w(0) == w(1)) { run += 1; if (run > maxRun) maxRun = run }
              else run = 1
            }
            maxRun
          }
          (bytes.length.toLong, bytes.map(b => (b & 0xff).toLong).sum,
            bytes.map(_ & 0xff).distinct.length.toLong, runs)
        }
        mime -> ((rows.length.toLong, stats.map(_._1).sum,
          stats.map(_._2).sum.toDouble / stats.map(_._1).sum,
          stats.map(_._3).max, stats.map(_._4).max))
      }
    val got = graft.operators.Multimodal.m3ByteFeatures(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"byte-feature drift: $got vs $expected")
  }

  test("s1_knn_brute: rank 1 matches an independent plain-Scala argmax") {
    import spark.implicits._
    val top1 = graft.operators.Similarity.s1KnnBrute(spark, sf)
      .filter(col("rk") === 1).select("q_id", "cand_id", "cos_sim")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(top1.size == 5)
    // independent oracle: same quantization, plain Scala loops
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map { r =>
        // Spark round() is HALF_UP away from zero; Math.round floors
        // toward +inf for negatives — replicate Spark's rule exactly
        def q(x: Double): Long = {
          val y = x * 1000.0
          if (y >= 0) math.floor(y + 0.5).toLong else -math.floor(-y + 0.5).toLong
        }
        r.getLong(0) -> r.getSeq[Float](1).map(x => q(x.toDouble)).toArray
      }
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    for (q <- 0L until 5L) {
      val (bestId, bestCos) = vecs.collect { case (id, v) if id != q => (id, cos(vecs(q), v)) }
        .maxBy { case (id, c) => (c, -id) }
      assert(top1(q)._1 == bestId, s"query $q: got ${top1(q)._1}, argmax is $bestId")
      assert(math.abs(top1(q)._2 - bestCos) < 1e-12)
    }
  }

  test("multimodal/streaming placeholder families keep queries total") {
    assert(SparkEntry.queries.size >= 50)
  }

  test("q20 HLL estimate is within rsd bounds of the exact distinct count") {
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.operators.Relational.q20ApproxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, est) =>
      // configured rsd = 0.01; allow ×4 safety (HLL error is a std-dev,
      // not a hard bound) with an absolute floor for tiny groups
      val tol = math.max(4.0 * 0.01 * exact(flag), 2.0)
      assert(math.abs(est.toDouble - exact(flag).toDouble) <= tol,
        s"$flag: HLL estimate $est vs exact ${exact(flag)} (tol $tol)")
    }
  }

  test("q26 approx percentiles sit inside exact bracketing percentiles") {
    val eps = 4.0 / graft.operators.Relational.ApproxPercentileAccuracy // ×4 safety on rank error
    def brackets(p: Double) = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(expr(s"percentile(o_totalprice, ${p - eps})").as("lo"),
        expr(s"percentile(o_totalprice, ${p + eps})").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val b50 = brackets(0.5)
    val b90 = brackets(0.9)
    val got = graft.operators.Relational.q26ApproxPercentile(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet == b50.keySet)
    got.foreach { case (k, (p50, p90)) =>
      assert(p50 >= b50(k)._1 && p50 <= b50(k)._2, s"$k p50 $p50 outside ${b50(k)}")
      assert(p90 >= b90(k)._1 && p90 <= b90(k)._2, s"$k p90 $p90 outside ${b90(k)}")
    }
  }

  test("m1 binary metadata matches an independent plain-Scala computation") {
    val mimes = Array("image/png", "audio/wav", "video/mp4")
    val expected = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val magic = bytes.take(4).map(b => f"${b & 0xff}%02X").mkString
        id -> ((mimes((id % 3).toInt), bytes.length.toLong, magic,
          if (bytes.length > 256) 1L else 0L))
      }.toMap
    val got = graft.operators.Multimodal.m1BinaryMeta(spark, sf)
      .select("doc_id", "mime", "n_bytes", "magic_hex", "is_large")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    assert(got == expected,
      s"drift sample: ${(got.toSet -- expected.toSet).take(3)}")
    // the stubbed decode seed must at least be deterministic
    val seeds1 = graft.operators.Multimodal.m1BinaryMeta(spark, sf)
      .select("doc_id", "fake_embedding_seed").collect().map(_.toSeq).toSet
    val seeds2 = graft.operators.Multimodal.m1BinaryMeta(spark, sf)
      .select("doc_id", "fake_embedding_seed").collect().map(_.toSeq).toSet
    assert(seeds1 == seeds2)
  }

  test("m5 dhash: hand-computed bits, perturbation tolerance, 100% twin recall") {
    val M = graft.operators.Multimodal
    // a left-to-right ramp image: every adjacent comparison is "right
    // cell brighter" → all 64 bits set
    val ramp = Array.tabulate(32 * 8)(i => ((i % 32) * 8).toByte)
    assert(M.dhash(ramp) == -1L, f"ramp dhash: ${M.dhash(ramp)}%x")
    // a constant image has no gradients → zero bits
    assert(M.dhash(Array.fill(256)(7.toByte)) == 0L)
    // the fixture's twin perturbation barely moves the hash
    val doc = graft.sources.Tables.documents(spark, sf)
      .select("text").head().getString(0).getBytes("UTF-8")
    val perturbed = doc.clone()
    (0 until perturbed.length by 50).foreach(i => perturbed(i) = (perturbed(i) + 8).toByte)
    assert(java.lang.Long.bitCount(M.dhash(doc) ^ M.dhash(perturbed)) <= M.M5MaxHamming)
    // every planted twin pair is recovered through the banded join
    val pairs = M.m5PhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twinPairs = pairs.filter(p => p._2 - p._1 == M.M5TwinOffset && p._1 % 10 == 0)
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(twinPairs.length == expected,
      s"twin recall ${twinPairs.length}/$expected")
    assert(pairs.forall(_._3 <= M.M5MaxHamming))
  }

  test("m5 bucket budget: emitted pairs stay a verified subset, deterministic, twins survive") {
    val M = graft.operators.Multimodal
    val exact = M.m5PhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a tight budget exercises the cap: output is a SUBSET of the exact
    // contract (never an invented pair), still hamming-verified, and
    // deterministic (lowest-ids keep-set, no RNG)
    spark.conf.set(M.M5BudgetKey, "8")
    try {
      val capped = M.m5PhashPairs(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(capped.toSet.subsetOf(exact.toSet),
        "budgeted run emitted a pair the exact run did not")
      assert(capped.forall(_._3 <= M.M5MaxHamming))
      val again = M.m5PhashPairs(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(capped.toSeq == again.toSeq, "budgeted run not deterministic")
      // a production-sized budget keeps every planted twin at this SF
      spark.conf.set(M.M5BudgetKey, "64")
      val wide = M.m5PhashPairs(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val twins = wide.count(p => p._2 - p._1 == M.M5TwinOffset && p._1 % 10 == 0)
      val expected = graft.sources.Tables.documents(spark, sf)
        .filter(col("doc_id") % 10 === 0).count()
      assert(twins == expected, s"twin recall under budget 64: $twins/$expected")
    } finally spark.conf.unset(M.M5BudgetKey)
    // the memoized exact contract is untouched by budgeted runs
    val after = M.m5PhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(after.toSeq == exact.toSeq, "budget run polluted the memoized exact frame")
  }

  test("m8: image clusters ≡ transitive closure of m5 pairs; twins cluster with originals") {
    val M = graft.operators.Multimodal
    val pairs = M.m5PhashPairs(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = M.m8ImageDedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = labels.map(l => l._1 -> l._2).toMap
    // driver-side union-find reference: min-label closure of the pairs
    val uf = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = uf.getOrElse(x, x)
      if (p == x) x else { val r = find(p); uf(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) uf(math.max(ra, rb)) = math.min(ra, rb)
    }
    byId.foreach { case (id, cl) =>
      assert(cl == find(id), s"cluster label for $id: got $cl, closure says ${find(id)}") }
    // every planted twin landed in its original's cluster, and the
    // keeper flag marks exactly the cluster representative
    byId.keys.filter(_ >= M.M5TwinOffset).foreach { twin =>
      assert(byId(twin) == byId(twin - M.M5TwinOffset), s"twin $twin split from original") }
    labels.foreach { case (id, cl, keep) =>
      assert(keep == (if (id == cl) 1L else 0L), s"keeper flag wrong for $id") }
    assert(labels.length == byId.size, "duplicate ids in the cluster table")
  }

  test("m4 PNG round-trip is lossless: decode(encode(bytes)) == bytes + zero pad") {
    val M = graft.operators.Multimodal
    val samples = Seq(
      Array.empty[Byte],
      Array[Byte](0, 127, -128, -1),
      (0 until 100).map(_.toByte).toArray,
      graft.sources.Tables.documents(spark, sf)
        .select("text").head().getString(0).getBytes("UTF-8"))
    samples.foreach { b =>
      val png = M.encodePng(b)
      // a real PNG, not a passthrough: magic bytes present
      assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
        "encodePng did not produce a PNG stream")
      val decoded = M.decodePng(png)
      assert(decoded.take(b.length).toSeq == b.toSeq,
        s"lossy round-trip at len ${b.length}")
      assert(decoded.drop(b.length).forall(_ == 0), "pad pixels not zero")
    }
  }

  test("m4 resize-pool matches an independent plain-Scala block average") {
    val M = graft.operators.Multimodal
    val expected = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        // independent re-derivation (same definition, separate code path
        // from the operator's kernel): width-32 image, 8x8 average pool
        val w = 32; val h = math.max(1, (bytes.length + w - 1) / w)
        val sums = Array.fill(64)(0L); val cnt = Array.fill(64)(0L)
        bytes.indices.foreach { i =>
          val cell = ((i / w) * 8 / h) * 8 + (i % w) * 8 / w
          sums(cell) += bytes(i) & 0xff; cnt(cell) += 1
        }
        val g = (0 until 64).map(j => if (cnt(j) == 0) 0.0 else sums(j).toDouble / cnt(j))
        r.getLong(0) -> ((g(0), g(63), math.sqrt(g.map(v => v * v).sum)))
      }.toMap
    val got = M.m4ResizePool(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == expected,
      s"pool drift sample: ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("d7 (LSH-pair clustering) equals d6 (exact-pair clustering) at test SF") {
    val d2Based = graft.operators.Dedup.d6DedupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d3Based = graft.operators.Dedup.d6DedupClustersLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d3Based == d2Based,
      s"clustering drift: ${(d2Based -- d3Based).take(3)} / ${(d3Based -- d2Based).take(3)}")
  }

  test("t8 (curation over LSH clusters) equals t7 (curation over exact clusters)") {
    val t7 = graft.operators.TextAnalysis.t7CorpusCuration(spark, sf)
      .collect().map(_.toSeq).toSet
    val t8 = graft.operators.TextAnalysis.t8CorpusCurationLsh(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(t7.nonEmpty && t8 == t7,
      s"curation drift: ${(t7 -- t8).take(3)} / ${(t8 -- t7).take(3)}")
  }

  test("label propagation equals a union-find oracle on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // deterministic trials
    for (_ <- 1 to 3) {
      val nodes = 50
      val edges = Seq.fill(60 + rnd.nextInt(40))(
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
        .filter { case (a, b) => a != b }.distinct
      // in-memory union-find, then min member per component
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val minOfRoot = touched.groupBy(v => find(v.toInt)).map {
        case (r, vs) => r -> vs.min
      }
      val expected = touched.map(v => v -> minOfRoot(find(v.toInt))).toMap
      val (labels, _) = graft.operators.Dedup.propagateLabels(
        edges.toDF("doc_a", "doc_b"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"CC drift on ${edges.size} edges: ${(got.toSet -- expected.toSet).take(5)}")
    }
  }

  test("pointer-doubling label propagation: correct chain closure in ~log rounds") {
    import spark.implicits._
    // a 64-node path graph: diameter 63 ⇒ one-hop propagation needs 63
    // rounds (the r2 formulation capped at 25 and would THROW here);
    // doubling must close it in ≤ ~log2(63)+slack and label every node 0
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = graft.operators.Dedup.propagateLabels(chain)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 64 && got.values.forall(_ == 0L),
      s"chain not fully labeled: ${got.filter(_._2 != 0L).take(5)}")
    assert(rounds <= 9, s"doubling should close diameter 63 in ≤9 rounds, took $rounds")
  }
}

/** Streaming operators behave like their batch twins; ML is deterministic. */
class StreamingAndMlSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._

  test("x14 snapshot table: pinned reads, time travel, CAS conflict, no file deletes") {
    val ST = graft.operators.SnapshotTable
    // run the operator end-to-end (v1 + v2 commits) and pin the oracle grain
    val latestAgg = ST.x14SnapshotTable(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val root = graft.operators.Engine.tmpDir("graft_snap_table")
    assert(ST.currentVersion(root) == 2)
    def dayAgg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ep_day") === graft.operators.Engine.X6LastDay)
      .agg(count(lit(1)), sum(col("value").cast("decimal(18,6)")).cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    // time travel: v1 still serves the PRE-merge day even though v2 is live
    val (n1, sum1) = dayAgg(ST.readAt(spark, root, 1))
    val (n2, sum2) = dayAgg(ST.readAt(spark, root, 2))
    assert(n1 == n2, "merge changed the day's row count")
    assert(math.abs(sum2 - (sum1 + 100.0 * n1)) < 1e-3,
      s"v2 day sum $sum2 != v1 $sum1 + 100*$n1")
    assert(latestAgg(graft.operators.Engine.X6LastDay)._2 == sum2,
      "read(latest) is not v2")
    // v1's replaced data file was NOT deleted by the v2 commit: any
    // reader holding the v1 manifest can still finish its scan
    ST.manifest(root, 1).foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
        s"commit deleted a referenced data file: $f")
    }
    // optimistic concurrency: two committers from base v2 race; the
    // CAS admits exactly one v3
    val mine = ST.commit(root, 2, ST.manifest(root, 2).map(p =>
      java.nio.file.Paths.get(p).getFileName.toString))
    assert(mine == 3)
    intercept[java.nio.file.FileAlreadyExistsException] {
      ST.commit(root, 2, Seq("data_v1_history.parquet"))
    }
    assert(ST.currentVersion(root) == 3, "conflicting commit corrupted the table")
    // vacuum below v2: v1's replaced day file is reclaimed, v2/v3 intact
    val v1Only = ST.manifest(root, 1).toSet -- ST.manifest(root, 2).toSet
    assert(v1Only.nonEmpty)
    ST.vacuum(root, 2)
    v1Only.foreach { f =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
        s"vacuum left an unreferenced file: $f")
    }
    assert(dayAgg(ST.readAt(spark, root, 2)) == ((n2, sum2)),
      "vacuum broke a surviving snapshot")
    intercept[Exception] { ST.manifest(root, 1) } // time travel below keepFrom retired
  }

  test("x6 partition swap: readers see the complete old day until the swap") {
    val E = graft.operators.Engine
    val snapDir = E.x6WriteSnapshot(spark, sf)
    def daySum(): Double = {
      spark.catalog.refreshByPath(snapDir)
      spark.read.parquet(snapDir)
        .filter(col("ep_day") === E.X6LastDay)
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double"))
        .collect()(0).getDouble(0)
    }
    def dayCount(): Long = {
      spark.catalog.refreshByPath(snapDir)
      spark.read.parquet(snapDir).filter(col("ep_day") === E.X6LastDay).count()
    }
    val sumBefore = daySum()
    val nBefore = dayCount()
    // merge fully staged — the "concurrent reader" mid-merge still sees
    // the untouched old partition, bit-for-bit
    val staged = E.x6StageMergedDay(spark, sf, snapDir)
    assert(daySum() == sumBefore, "reader saw merge effects before the swap")
    assert(dayCount() == nBefore)
    E.swapPartition(snapDir, s"ep_day=${E.X6LastDay}", staged)
    // post-swap: same event set, every value on the day +100
    assert(dayCount() == nBefore, "swap changed the day's row count")
    val sumAfter = daySum()
    assert(math.abs(sumAfter - (sumBefore + 100.0 * nBefore)) < 1e-3,
      s"post-swap sum $sumAfter != $sumBefore + 100*$nBefore")
  }

  test("st2 sessionizer matches c1 on a deliberately hot key (every event one user)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = graft.operators.Engine.tmpDir("graft_st2_hotkey")
    val scratch = graft.operators.Engine.tmpDir("graft_st2_hotkey_scratch")
    graft.sources.Tables.events(spark, sf)
      .withColumn("user_id", lit(1L))
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    // the streaming file source glob expects events.parquet to be a
    // single flat FILE (like the driver's testdata), not a directory
    val part = graft.operators.Engine.listDir(Paths.get(scratch))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    graft.operators.Engine.deleteRecursively(Paths.get(tmp, "events.parquet"))
    Files.move(part, Paths.get(tmp, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batch = graft.operators.Churn.c1Sessionize(spark, tmp)
      .select("user_id", "session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.Streams.st2StreamSessionize(spark, tmp)
      .select("user_id", "session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && stream == batch,
      s"hot-key stream-batch diff: ${(stream -- batch).take(3)} / ${(batch -- stream).take(3)}")
  }

  test("st6 O(1)-state sessionizer matches batch c1 on the on-time slice " +
      "(sf0.01: fixture proven to exercise timeout-then-return)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // sf0.01, NOT sf0.001: the r3 bug (state.remove() on timeout dropped
    // the session counter, renumbering a user who skips a batch and
    // returns) only manifests when some user is absent from a middle
    // micro-batch — sf0.001 had no such user, so the old spec passed
    // while the operator was wrong at bench SF.
    val sf01 = "/root/testdata/sf0.01"
    val S = graft.streaming.Streams
    val cut = S.OnTimeDayLimit
    val ep = expr("(ts div 1000000000)")
    val day = expr("(ts div 1000000000) div 86400")
    val slice = graft.sources.Tables.events(spark, sf01).filter(day < lit(cut))
    // fixture self-check: a user with events in batch0 and batch2 but
    // NONE in batch1, whose batch0 horizon (last ep + gap) is safely
    // below the watermark batch1 runs with (batch0's max ep − 1h delay)
    // — st6's timeout provably fires for them mid-stream, then they
    // return. Without such a user the parity assert can't catch the bug.
    val b0max = slice.filter(day < lit(cut - 4L)).agg(max(ep)).head.getLong(0)
    val perUser = slice.groupBy("user_id").agg(
      sum(when(day < lit(cut - 4L), 1).otherwise(0)).as("n0"),
      sum(when(day >= lit(cut - 4L) && day < lit(cut - 2L), 1).otherwise(0)).as("n1"),
      sum(when(day >= lit(cut - 2L), 1).otherwise(0)).as("n2"),
      max(when(day < lit(cut - 4L), ep)).as("last0"))
    val exercised = perUser.filter(col("n0") > 0 && col("n1") === 0 && col("n2") > 0 &&
      col("last0") + lit(graft.operators.Churn.SessionGapS + 2L) < lit(b0max - 3600L))
    assert(exercised.count() >= 1,
      "fixture has no timeout-then-return user: the spec would not exercise the r3 bug")

    // batch twin: c1 over ONLY the st6 input slice (staged as a flat
    // events.parquet file, the layout Tables.events expects)
    val tmp = graft.operators.Engine.tmpDir("graft_st6_slice")
    val scratch = graft.operators.Engine.tmpDir("graft_st6_slice_scratch")
    slice.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = graft.operators.Engine.listDir(Paths.get(scratch))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    graft.operators.Engine.deleteRecursively(Paths.get(tmp, "events.parquet"))
    Files.move(part, Paths.get(tmp, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batch = graft.operators.Churn.c1Sessionize(spark, tmp)
      .select("user_id", "session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.Streams.st6StreamSessionState(spark, sf01)
      .select("user_id", "session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && stream == batch,
      s"st6-c1 diff: ${(stream -- batch).take(3)} / ${(batch -- stream).take(3)}")
  }

  test("st6 tombstone retention: a >RetentionS watermark jump survives the clamp, " +
      "evicts the counter, and a later return restarts session_seq at 1") {
    import spark.implicits._
    val S = graft.streaming.Streams
    val gap = graft.operators.Churn.SessionGapS
    def evs(rows: (Long, Long)*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("user_id", "ep").withColumn("value", lit(0.0))
    val a = 1000000000L
    // batch0: user 1 gets two sessions — the first closes in-batch (gap
    // exceeded), the second (one event) stays open across batches
    val secondStart = a + 2L * gap + 100L
    val b0 = evs(1L -> a, 1L -> (a + 5L), 1L -> secondStart)
    // batch1: ONE watermark jump far past end+RetentionS. The timeout
    // that closes the open session must then write its tombstone with a
    // deadline already below the watermark — without the clamp Spark
    // rejects it (IllegalArgumentException) and this test crashes.
    val jump = secondStart + S.RetentionS + 10L * 86400L
    val b1 = evs(-1L -> jump)
    // batch2: first batch where the session timeout can fire (a key's
    // timeout only runs in a batch where it has NO data, with the
    // watermark from the PREVIOUS batch) — the tombstone is written here
    val b2 = evs(-1L -> (jump + 7200L))
    // batch3: one more advance so the clamped tombstone deadline (wm+1)
    // itself fires and the counter is evicted
    val b3 = evs(-1L -> (jump + 10800L))
    // batch4: user 1 returns AFTER eviction — numbering must restart at 1
    val ret = jump + 14400L
    val b4 = evs(1L -> ret)
    // batch5: final advance closes and emits the returned session
    val b5 = evs(-1L -> (ret + 2L * 86400L))
    // delivered through the pluggable StreamSource abstraction — the
    // same entry point a Kafka deployment would swap the transport under
    val got = S.runSessionState(spark, b0.schema, "st6_retention", Seq(
      "b0" -> b0, "b1" -> b1, "b2" -> b2, "b3" -> b3, "b4" -> b4, "b5" -> b5))
      .filter(col("user_id") >= 0L)
      .select("session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expected = Set(
      (1L, a, a + 5L, 2L),
      (2L, secondStart, secondStart, 1L),
      (1L, ret, ret, 1L)) // seq 1, not 3: the tombstone aged out
    assert(got == expected, s"retention path drifted: got $got expected $expected")
  }

  test("st7 stream-stream join: matches batch join AND buffers pairs across batches") {
    val S = graft.streaming.Streams
    // batch twin of the join, with the pair's batch indices
    val e = graft.sources.Tables.events(spark, sf)
      .withColumn("ep", expr("ts div 1000000000"))
    val su = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("u"), col("ep").as("s_ep"))
    val pu = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("ep").as("p_ep"), col("event_id"))
    val pairs = pu.join(su, Seq("u"))
      .filter(col("p_ep") >= col("s_ep") && col("p_ep") <= col("s_ep") + 3600L)
    def batchIdx(c: org.apache.spark.sql.Column) =
      when(c < S.St7Cut1, 0).when(c < S.St7Cut2, 1).otherwise(2)
    val cross = pairs
      .filter(batchIdx(col("s_ep")) =!= batchIdx(col("p_ep"))).count()
    assert(cross >= 1,
      "fixture has no pair straddling a batch cut — cross-batch state untested")
    val expected = pairs.groupBy(expr("p_ep div 86400").as("ep_day"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("event_id")).as("n_purchases"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = S.st7StreamStreamJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"stream-batch diff: ${(got -- expected).take(3)} / ${(expected -- got).take(3)}")
  }

  test("st2 stateful sessionizer matches batch c1 sessionization") {
    val batch = graft.operators.Churn.c1Sessionize(spark, sf)
      .select("user_id", "session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.Streams.st2StreamSessionize(spark, sf)
      .select("user_id", "session_seq", "start_ep", "end_ep", "n_events")
      .collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"stream-batch diff: ${(stream -- batch).take(3)} / ${(batch -- stream).take(3)}")
  }

  test("st1 windowed streaming agg equals batch tumbling-window group-by") {
    val got = graft.streaming.Streams.st1StreamWindowed(spark, sf)
    val batch = graft.sources.Tables.events(spark, sf)
      .withColumn("ep", expr("ts div 1000000000"))
      .withColumn("win_start", (col("ep") - pmod(col("ep"), lit(21600L))).cast("long"))
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(got.count() == batch.count())
  }

  test("st4 append-mode watermark: late event dropped, only finalized windows emitted") {
    val got = graft.streaming.Streams.st4StreamLateData(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // batch expectation from the on-time slice ONLY (the late replay must
    // contribute nothing), restricted to windows closed before the final
    // watermark (max on-time event_time − 1h)
    val slice = graft.sources.Tables.events(spark, sf)
      .withColumn("ep", expr("ts div 1000000000"))
      .filter(expr("ep div 86400") < lit(graft.streaming.Streams.OnTimeDayLimit))
    val maxEp = slice.agg(max(col("ep"))).collect().head.getLong(0)
    val wm = maxEp - 3600L
    val expected = slice
      .withColumn("win_start", (col("ep") - pmod(col("ep"), lit(21600L))).cast("long"))
      .filter(col("win_start") + 21600L <= wm) // window end ≤ watermark → finalized
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected,
      s"emitted-vs-expected diff: ${(got.toSet -- expected.toSet).take(3)} / ${(expected.toSet -- got.toSet).take(3)}")
    // the late event's own window must be present with the on-time count
    // (it would be +1 if the watermark had admitted the replay)
    val lateWin = slice.agg(min(col("ep"))).collect().head.getLong(0) / 21600L * 21600L
    assert(got.keys.exists(_._1 == lateWin), "late event's window was never emitted")
  }

  test("c15 metrics match an independent confusion matrix; positives monotone") {
    val scores = graft.ml.ChurnModel.c9TrainPredict(spark, sf)
      .filter(col("is_test") === 1L)
      .select("churned", "churn_prob").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val got = graft.ml.ChurnModel.c15ModelMetrics(spark, sf)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent confusion matrix at one threshold
    val t = 0.5
    val tp = scores.count { case (y, p) => p >= t && y == 1L }.toLong
    val fp = scores.count { case (y, p) => p >= t && y == 0L }.toLong
    val fn = scores.count { case (y, p) => p < t && y == 1L }.toLong
    val tn = scores.count { case (y, p) => p < t && y == 0L }.toLong
    assert(got(t) == ((tp, fp, fn, tn)), s"confusion drift at $t: ${got(t)}")
    // predicted positives can only shrink as the threshold rises
    val pos = got.toSeq.sortBy(_._1).map { case (_, (a, b, _, _)) => a + b }
    assert(pos == pos.sorted.reverse, s"positives not monotone: $pos")
  }

  test("distributed NTILE equals Spark's global-sort ntile (sizes, ties, directions)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 3, 4, 5, 6, 23, 150); k <- Seq(2, 5)) {
      // heavy ties: metric has only 13 distinct values
      val df = (1 to n).map(i => (i.toLong, (i * 7919 % 13).toLong)).toDF("user_id", "m")
      for (order <- Seq(Seq(asc("m"), asc("user_id")), Seq(desc("m"), asc("user_id")))) {
        val got = graft.operators.Churn.ntileDistributed(df, order, k, "s")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val exp = df.withColumn("s", ntile(k).over(Window.orderBy(order: _*)))
          .select("user_id", "s")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == exp, s"n=$n k=$k order=$order")
      }
    }
  }

  test("st5 streaming dedup drops every replayed duplicate") {
    val got = graft.streaming.Streams.st5StreamDedup(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = graft.sources.Tables.events(spark, sf)
      .withColumn("ep", expr("ts div 1000000000"))
      .filter(expr("ep div 86400") < lit(graft.streaming.Streams.OnTimeDayLimit))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected,
      s"replays leaked through dedup: ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("c9 churn model learns the churn signal (test-fold AUC)") {
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    val scored = graft.ml.ChurnModel.c9TrainPredict(spark, "/root/testdata/sf0.01")
      .filter(col("is_test") === 1L)
      .withColumn("label", col("churned").cast("double"))
      .withColumn("rawPrediction", col("churn_prob"))
    val pos = scored.filter(col("label") === 1.0).count()
    val neg = scored.filter(col("label") === 0.0).count()
    assume(pos > 0 && neg > 0, "test fold needs both classes for AUC")
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction").setLabelCol("label")
      .setMetricName("areaUnderROC").evaluate(scored)
    assert(auc >= 0.5, s"model no better than chance: AUC=$auc")
  }

  test("c13 save→load→score is bit-identical to c9's in-process scores") {
    val c9 = graft.ml.ChurnModel.c9TrainPredict(spark, sf)
      .select("user_id", "churned", "churn_prob", "prediction", "is_test")
      .collect().map(_.toSeq).toSeq
    val c13 = graft.ml.ChurnModel.c13ModelIo(spark, sf)
      .select("user_id", "churned", "churn_prob", "prediction", "is_test")
      .collect().map(_.toSeq).toSeq
    assert(c13 == c9, "reloaded-model scores drifted from the in-process model")
    // and the scoring output really went through the day-partitioned sink
    val runDays = graft.ml.ChurnModel.c13ModelIo(spark, sf)
      .select("run_day").distinct().collect().map(_.getLong(0)).toSeq
    assert(runDays.length == 1 && runDays.head > 0)
  }

  test("x10 compaction actually reduces the file count") {
    graft.operators.Engine.x10Compaction(spark, sf).count()
    val (frag, compact) = graft.operators.Engine.x10FileCounts()
    assert(frag > compact && compact > 0,
      s"compaction did not shrink the layout: $frag -> $compact files")
  }

  test("x3 salted aggregation is identical to the direct groupBy") {
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.operators.Engine.x3SaltedAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
  }

  test("x5 kmeans: deterministic, clusters cover all vectors") {
    val a = graft.operators.Engine.x5KmeansEmbeddings(spark, sf).collect()
    val b = graft.operators.Engine.x5KmeansEmbeddings(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getLong(1)).sum == graft.sources.Tables.embeddings(spark, sf).count())
  }

  test("c9 churn model: valid probabilities, deterministic, labels covered") {
    val a = graft.ml.ChurnModel.c9TrainPredict(spark, sf).collect()
    val b = graft.ml.ChurnModel.c9TrainPredict(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "churn model output not deterministic")
    a.foreach { r =>
      val p = r.getDouble(2)
      assert(p >= 0.0 && p <= 1.0)
      assert(Set(0L, 1L).contains(r.getLong(3)))
    }
    assert(a.length == graft.operators.Churn.c3ChurnLabel(spark, sf).count())
  }
}

/** The snapshot table's stats/sharded-manifest path: footer harvesting,
  * shard round-trips, CAS-loser cleanup, vacuum shard reclaim, and the
  * file-skipping readPruned scan x15 runs through. */
class SnapshotStatsSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  import java.nio.file.{Files, Paths}
  val ST = graft.operators.SnapshotTable

  private def freshRoot(tag: String): String = {
    val root = graft.operators.Engine.tmpDir(s"graft_snapstats_$tag")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    root
  }
  private def shardFiles(root: String): Seq[String] =
    graft.operators.Engine.listDir(Paths.get(root, "_manifests"))
      .map(_.getFileName.toString).filter(_.startsWith("shard_"))

  test("harvestEntries: the distributed (>=64 files) path matches the serial one, order preserved") {
    import spark.implicits._
    val root = freshRoot("harvest")
    // 70 one-row files: above the job threshold, so the Spark-job path
    // runs for real — it must agree entry-for-entry (stats, rows,
    // __bytes, ORDER) with the serial driver loop a small batch takes
    val rels = ST.writeDataFiles(
      (1L to 70L).toDF("k").repartition(70, col("k")), root, "h")
    val dist = ST.harvestEntries(spark, root, rels, "k")
    val serial = rels.map(ST.footerEntry(root, _, "k"))
    assert(dist == serial, s"distributed harvest diverged:\n$dist\nvs\n$serial")
    assert(dist.map(_.rel) == rels, "entry order must follow the input rels")
    assert(dist.forall(_.bytes.exists(_ > 0L)), "missing __bytes on the job path")
  }

  test("footerEntry harvests the file's actual min/max/rows for the key column") {
    import spark.implicits._
    val root = freshRoot("footer")
    val df = Seq((7L, "a"), (3L, "b"), (11L, "c"), (5L, "d")).toDF("k", "s")
    df.coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
    val part = graft.operators.Engine.listDir(Paths.get(root, "stage"))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(root, "data_f.parquet"))
    val e = ST.footerEntry(root, "data_f.parquet", "k")
    assert((e.rel, e.lo, e.hi, e.rows) == (("data_f.parquet", 3L, 11L, 4L)),
      s"footer stats drift: $e")
    // ...and the file's byte size rides the reserved __bytes extra
    // (r19): size-based planning reads the manifest, never a per-scan
    // Files.size sweep
    assert(e.bytes.contains(Files.size(Paths.get(root, "data_f.parquet"))),
      s"missing/wrong __bytes extra: $e")
    // the reserved size extra is NEVER served as column stats: a query
    // naming __bytes hits the never-pruned sentinel, not [size, 0]
    // (which would prune every file — lo > hi)
    assert(e.statsFor("__bytes", "k") == ((Long.MinValue, Long.MaxValue)))
    // ...and the z-order surface cannot harvest a USER column into the
    // same slot
    val eb = intercept[Exception](
      ST.footerEntryMulti(root, "data_f.parquet", "k", Seq("__bytes")))
    assert(eb.getMessage.contains("reserved"), eb.getMessage)
    // a column absent from the footer degrades to the never-pruned
    // sentinel (still carrying the row count), not a failure
    val none = ST.footerEntry(root, "data_f.parquet", "no_such_col")
    assert(none.lo == Long.MinValue && none.hi == Long.MaxValue && none.rows == 4L)
  }

  test("commitEntries above shardSize round-trips through shard files") {
    val root = freshRoot("shards")
    val entries = (0 until 7).map(i =>
      ST.FileEntry(s"data_$i.parquet", i * 10L, i * 10L + 9L, 100L + i))
    val v = ST.commitEntries(root, 0, entries, shardSize = 3)
    assert(v == 1)
    // the manifest itself holds only pointers (plus `#` metadata like
    // the in-commit timestamp); shards hold the entries
    val raw = ST.rawManifestLines(root, v).filterNot(_.startsWith("#"))
    assert(raw.nonEmpty && raw.forall(_.startsWith(">")), s"unsharded manifest: $raw")
    assert(shardFiles(root).size == 3) // 3+3+1
    assert(ST.manifestEntries(root, v) == entries, "entries lost in shard round-trip")
    // at-or-below shardSize stays inline — no pointless indirection
    val small = ST.commitEntries(root, v, entries.take(2), shardSize = 3)
    assert(ST.rawManifestLines(root, small).forall(!_.startsWith(">")))

    assert(ST.manifestEntries(root, small) == entries.take(2))
  }

  test("a CAS-losing sharded commit cleans up its own staged shards") {
    val root = freshRoot("casloser")
    val win = (0 until 4).map(i => ST.FileEntry(s"w_$i.parquet", i, i, 1L))
    ST.commitEntries(root, 0, win, shardSize = 2)
    val before = shardFiles(root).toSet
    val lose = (0 until 4).map(i => ST.FileEntry(s"l_$i.parquet", i, i, 1L))
    intercept[java.nio.file.FileAlreadyExistsException] {
      ST.commitEntries(root, 0, lose, shardSize = 2)
    }
    assert(shardFiles(root).toSet == before,
      s"CAS loser leaked shards: ${shardFiles(root).toSet -- before}")
    assert(ST.manifestEntries(root, 1) == win, "loser corrupted the winner's commit")
  }

  test("vacuum reclaims shards referenced only by dropped manifests") {
    val root = freshRoot("vacshard")
    import spark.implicits._
    // two sharded commits over real data files so vacuum's data sweep runs too
    def dataFile(tag: String, keys: Seq[Long]): ST.FileEntry = {
      keys.toDF("k").coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
      val part = graft.operators.Engine.listDir(Paths.get(root, "stage"))
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(root, s"data_$tag.parquet"))
      ST.footerEntry(root, s"data_$tag.parquet", "k")
    }
    val a = dataFile("a", Seq(1L, 2L))
    val b = dataFile("b", Seq(3L, 4L))
    val v1 = ST.commitEntries(root, 0, Seq(a, b), shardSize = 1)
    val b2 = dataFile("b2", Seq(5L, 6L))
    val v2 = ST.commitEntries(root, v1, Seq(a, b2), shardSize = 1)
    val v2Shards = ST.rawManifestLines(root, v2)
      .filter(_.startsWith(">")).map(_.drop(1)).toSet
    ST.vacuum(root, keepFrom = v2)
    // v1's manifest, its exclusive data file, and its shards are gone;
    // everything v2 references survives intact
    assert(!Files.exists(Paths.get(root, "_manifests", "v00001.txt")))
    assert(!Files.exists(Paths.get(root, "data_b.parquet")))
    assert(shardFiles(root).toSet == v2Shards,
      s"shard sweep wrong: kept ${shardFiles(root).toSet}, want $v2Shards")
    assert(ST.manifestEntries(root, v2) == Seq(a, b2), "vacuum broke the live snapshot")
  }

  test("x20 bloom point lookup: blooms route needles to few files; stats cannot") {
    val root = ST.bloomTable(spark, sf)
    val rels = ST.manifestEntries(root, ST.currentVersion(root)).map(_.rel)
    val ids = ST.x20Ids(root)
    val may = rels.map(r => r -> ST.bloomMayContain(root, r, "event_id", ids)).toMap
    assert(may.count(_._2.nonEmpty) < rels.size,
      s"bloom pruned nothing: ${may.count(_._2.nonEmpty)}/${rels.size}")
    // no false negatives: every needle comes back from the pruned scan
    val got = ST.x20PointLookup(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(got == ids, s"lookup returned $got, want $ids")
    // min/max stats on event_id are useless on the user-clustered
    // layout (every file's event_id range covers nearly every needle) —
    // the bloom keep-set must be strictly smaller
    val statKeep = ids.map { id =>
      rels.count { r =>
        val e = ST.footerEntry(root, r, "event_id"); e.lo <= id && id <= e.hi }
    }.sum
    val bloomKeep = may.values.map(_.size).sum
    assert(bloomKeep < statKeep,
      s"blooms ($bloomKeep file-hits) should beat stats ($statKeep) on a non-cluster column")
  }

  test("x15 readPruned scans strictly fewer files and matches the full scan") {
    val root = ST.statsTable(spark, sf)
    val v = ST.currentVersion(root)
    val all = ST.manifestEntries(root, v)
    val pruned = ST.prunedEntries(root, v, ST.X15Lo, ST.X15Hi)
    assert(all.size == 7, s"expected 7 five-day files, got ${all.map(_.rel)}")
    assert(pruned.size == 2, s"expected 2 surviving files, got ${pruned.map(_.rel)}")
    // every pruned-OUT file is provably irrelevant by its own stats
    (all.toSet -- pruned.toSet).foreach(e =>
      assert(e.hi < ST.X15Lo || e.lo > ST.X15Hi, s"unsound prune of $e"))
    // the pruned scan computes the same day aggregate as the full scan
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ep_day").between(ST.X15Lo, ST.X15Hi))
      .groupBy("ep_day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg(ST.readPruned(spark, root, "ep_day", ST.X15Lo, ST.X15Hi))
      == agg(ST.read(spark, root)))
    // stats say the two survivors hold every in-range row
    val sfRows = graft.sources.Tables.events(spark, sf)
      .filter(expr(s"(ts div 1000000000) div 86400").between(ST.X15Lo, ST.X15Hi)).count()
    assert(pruned.map(_.rows).sum >= sfRows)
  }
}

/** st8's exactly-once streaming commit path: batch↔version mapping,
  * batch-id metadata in both manifest layouts, replay no-op, and parity
  * with the batch aggregate. */
class StreamingSinkSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable
  val SS = graft.streaming.SnapshotSink

  test("st8: one manifest version per micro-batch, batch id recorded in both layouts") {
    SS.st8StreamSnapshotSink(spark, sf).collect() // build the table
    val root = graft.operators.Engine.tmpDir("graft_st8_table")
    val v = ST.currentVersion(root)
    assert(v == 3, s"expected 3 commits for 3 micro-batches, got $v")
    (1 to 3).foreach { i =>
      assert(ST.manifestMeta(root, i) - "cts" == Map("last_batch" -> (i - 1).toString),
        s"v$i metadata wrong: ${ST.manifestMeta(root, i)}")
      // each batch appends ≥1 per-task file (the distributed write may
      // emit several when the batch arrives in multiple partitions)
      val prev = if (i == 1) 0 else ST.manifestEntries(root, i - 1).size
      assert(ST.manifestEntries(root, i).size > prev, s"v$i appended no file")
    }
    // the run crossed the inline→sharded threshold (shardSize=2): v3 is
    // sharded, v1 inline — metadata survived both layouts (asserted above)
    assert(ST.rawManifestLines(root, 3).exists(_.startsWith(">")), "v3 not sharded")
    assert(!ST.rawManifestLines(root, 1).exists(_.startsWith(">")), "v1 sharded")
  }

  test("st8: replaying a committed batch is a no-op; the table matches the batch aggregate") {
    val res = SS.st8StreamSnapshotSink(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val root = graft.operators.Engine.tmpDir("graft_st8_table")
    val v = ST.currentVersion(root)
    val rows = ST.read(spark, root).count()
    // at-least-once replay: same batch id arrives again (crash-restart
    // shape) — the sink must skip it without writing or committing
    val replay = graft.sources.Tables.events(spark, sf)
      .withColumn("ep_day", expr("(ts div 1000000000) div 86400"))
      .select("event_id", "user_id", "event_type", "value", "ep_day")
      .limit(5)
    assert(!SS.appendBatch(root, replay, batchId = 0L), "replayed batch not skipped")
    assert(!SS.appendBatch(root, replay, batchId = 2L), "replayed batch not skipped")
    assert(ST.currentVersion(root) == v && ST.read(spark, root).count() == rows,
      "replay mutated the table")
    // a genuinely NEW batch id still commits
    assert(SS.appendBatch(root, replay, batchId = 3L), "new batch rejected")
    assert(ST.currentVersion(root) == v + 1 &&
      ST.read(spark, root).count() == rows + 5, "new batch not appended")
    // parity: the committed table's day aggregate == the raw log's
    val expect = graft.sources.Tables.events(spark, sf)
      .withColumn("ep_day", expr("(ts div 1000000000) div 86400"))
      .groupBy("ep_day")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(res == expect, "st8 result drifted from the batch aggregate")
  }
}

/** x16's OPTIMIZE: the clustering rewrite that converts a no-skip
  * layout into a pruning layout without changing a row. */
class ClusterOptimizeSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable

  test("x16: unclustered layout skips nothing, OPTIMIZEd layout skips files, content identical") {
    val root = ST.clusterTable(spark, sf)
    val v2 = ST.currentVersion(root)
    val v1 = v2 - 1
    val before = ST.manifestEntries(root, v1)
    val after = ST.manifestEntries(root, v2)
    assert(before.size == ST.X16Files && after.size == ST.X16Files)
    // round-robin files all span the query range: stats CANNOT skip
    assert(ST.prunedEntries(root, v1, ST.X16Lo, ST.X16Hi).size == before.size,
      "unclustered layout unexpectedly skippable — fixture broken")
    // clustered files own disjoint ranges: the 5-day query prunes most
    val pruned = ST.prunedEntries(root, v2, ST.X16Lo, ST.X16Hi)
    assert(pruned.size < after.size,
      s"optimize produced no pruning: ${after.map(e => (e.rel, e.lo, e.hi))}")
    // range partitioning puts each key in exactly one file: disjoint stats
    after.sortBy(_.lo).sliding(2).foreach {
      case Seq(a, b) => assert(a.hi <= b.lo, s"overlapping clustered files: $a $b")
      case _ =>
    }
    // the rewrite is layout-only: v1 and v2 hold the same rows
    val d1 = ST.readAt(spark, root, v1)
    val d2 = ST.readAt(spark, root, v2)
    assert(d1.count() == d2.count() && d1.except(d2).isEmpty && d2.except(d1).isEmpty,
      "OPTIMIZE changed table content")
    // OPTIMIZE records its op AND re-points statsCol at the cluster key
    // (carried metadata — losing statsCol would disable DSv2 pruning)
    assert(ST.manifestMeta(root, v2) - "cts" ==
      Map("optimize" -> "clustered:ep_day", "statsCol" -> "ep_day"))
    // pruned scan == full scan on the query itself
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ep_day").between(ST.X16Lo, ST.X16Hi))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(ST.readPruned(spark, root, "ep_day", ST.X16Lo, ST.X16Hi)) == agg(d2))
  }
}

/** x17's copy-on-write MERGE: file-level surgical rewrite driven by the
  * stats manifest, pre-merge snapshot intact, row-level semantics. */
class MergeSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable

  test("x17: merge rewrites only the files containing touched keys; old snapshot intact") {
    val root = ST.mergeTable(spark, sf)
    val v2 = ST.currentVersion(root)
    val v1 = v2 - 1
    val before = ST.manifestEntries(root, v1)
    val after = ST.manifestEntries(root, v2)
    // exactly one 5-day file owned the 3-day changeset: 6 of 7 entries
    // (rel, stats and all) are carried over untouched
    val carried = before.map(_.rel).toSet intersect after.map(_.rel).toSet
    assert(before.size == 7 && carried.size == 6,
      s"merge rewrote the wrong files: before=${before.map(_.rel)} after=${after.map(_.rel)}")
    val v2meta = ST.manifestMeta(root, v2)
    assert(v2meta.get("merge").contains("cow:event_id:1of7"), v2meta.toString)
    // the fixture is cdf=row: the merge registered its row-grain CDC
    // files (all four change types present) on this commit
    assert(v2meta.get("cdf").contains("row") &&
      Seq("update_preimage", "update_postimage", "delete", "insert")
        .forall(ty => v2meta("cdc").contains(s"$ty=")), v2meta.toString)
    // the pre-merge snapshot is still exactly the raw log
    val rawCount = graft.sources.Tables.events(spark, sf).count()
    assert(ST.readAt(spark, root, v1).count() == rawCount, "v1 lost pre-merge content")
    // row-level semantics on the merged snapshot
    val merged = ST.read(spark, root).cache()
    try {
      val touched = merged.filter(col("ep_day").between(ST.X17Lo, ST.X17Hi))
      assert(touched.filter(col("event_id") % 10 === 1).count() == 0, "deletes survived")
      assert(touched.filter(col("event_id") < 0).count() == (ST.X17Hi - ST.X17Lo + 1),
        "backfill inserts missing")
      val expUpd = ST.x17Changes(spark, sf).filter(col("op") === "u").drop("op")
      val gotUpd = touched.filter(col("event_id") % 10 === 0 && col("event_id") >= 0)
        .select(expUpd.columns.map(col).toIndexedSeq: _*)
      assert(expUpd.count() > 0 && expUpd.except(gotUpd).isEmpty &&
        gotUpd.except(expUpd).isEmpty, "updates drifted from the changeset")
      // untouched days are bit-identical across versions
      val out = (df: org.apache.spark.sql.DataFrame) =>
        df.filter(!col("ep_day").between(ST.X17Lo, ST.X17Hi))
      assert(out(ST.readAt(spark, root, v1)).except(out(merged)).isEmpty &&
        out(merged).except(out(ST.readAt(spark, root, v1))).isEmpty,
        "merge leaked outside the changeset range")
    } finally merged.unpersist()
  }

  private def freshRoot(name: String): String = {
    val root = graft.operators.Engine.tmpDir(name)
    graft.operators.Engine.listDir(java.nio.file.Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    root
  }

  test("full-rewrite widening merge on a captured table refreshes the schema (ADVICE r11)") {
    import spark.implicits._
    val root = freshRoot("graft_merge_fullrw_widen")
    // v1: 40 keys across 4 range-disjoint files, columns (id, v)
    val base = (1L to 40L).map(k => (k, 1.0 * k)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    assert(graft.streaming.SnapshotSink.appendBatch(root, base, 0L, keyCol = "id"))
    // v2: PARTIAL widening merge (keys 5..8 only) adds `score` — the
    // capture (schemaJson) is written because untouched files stay narrow
    val w1 = (5L to 8L).map(k => (k, 2.0 * k, 0.5)).toDF("id", "v", "score")
      .withColumn("op", lit("u"))
    ST.merge(spark, root, "id", "id", w1)
    val v2 = ST.currentVersion(root)
    assert(ST.manifestMeta(root, v2).contains("schemaJson"), "fixture: capture expected at v2")
    // v3: FULL-REWRITE widening merge (every key) adds `flag`. Pre-fix,
    // the stale 3-column capture was carried forward and explicit-schema
    // reads silently dropped `flag`; the fix drops both markers because
    // the rewritten files are uniform at the changeset's width.
    val w2 = (1L to 40L).map(k => (k, 3.0 * k, 1.0, 7L)).toDF("id", "v", "score", "flag")
      .withColumn("op", lit("u"))
    ST.merge(spark, root, "id", "id", w2)
    val v3 = ST.currentVersion(root)
    val meta = ST.manifestMeta(root, v3)
    assert(!meta.contains("schemaJson") && !meta.contains("schema"),
      s"full rewrite left stale evolution markers: $meta")
    val got = ST.read(spark, root)
    assert(got.columns.contains("flag"), "full-rewrite widening lost the new column")
    assert(got.filter(col("flag") === 7L).count() == 40)
    // time travel to the evolved-but-partial version still sees the capture
    assert(ST.readAt(spark, root, v2).columns.toSeq == Seq("id", "v", "score"))
  }

  test("widening merge refuses a changeset that retypes an existing column (ADVICE r11)") {
    import spark.implicits._
    val root = freshRoot("graft_merge_retype")
    val base = (1L to 40L).map(k => (k, 1.0 * k)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    assert(graft.streaming.SnapshotSink.appendBatch(root, base, 0L, keyCol = "id"))
    // widening changeset that declares v as FLOAT where the table holds
    // DOUBLE: freezing either type into the capture misdecodes — refuse
    val bad = (9L to 12L).map(k => (k, k.toFloat, 2L)).toDF("id", "v", "extra")
      .withColumn("op", lit("u"))
    val e = intercept[IllegalArgumentException] {
      ST.merge(spark, root, "id", "id", bad)
    }
    assert(e.getMessage.contains("must match existing column types"), e.getMessage)
  }
}

/** x18's add-column evolution: mixed-width files under one manifest,
  * schema-merge paid only by flagged versions, nulls where history is
  * narrow. */
class EvolveSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable

  test("x18: evolved version is wide with nulls on history; old version stays narrow") {
    val root = ST.evolveTable(spark, sf)
    val v2 = ST.currentVersion(root)
    val v1 = v2 - 1
    val narrow = ST.readAt(spark, root, v1)
    val wide = ST.readAt(spark, root, v2)
    assert(!narrow.columns.contains("quality"), "v1 grew a column")
    assert(wide.columns.contains("quality"), "v2 lacks the evolved column")
    // same rows; evolution adds width, not rows
    assert(narrow.count() == wide.count())
    // narrow-file rows surface null; enriched block is fully populated
    val lastBlock = col("ep_day") >= ST.X18Grp * 5
    assert(wide.filter(!lastBlock && col("quality").isNotNull).count() == 0,
      "history rows have non-null quality")
    assert(wide.filter(lastBlock && col("quality").isNull).count() == 0,
      "enriched rows missing quality")
    // only the flagged version pays mergeSchema: the v2 manifest says so
    assert(ST.manifestMeta(root, v2).get("schema").contains("evolved:+quality"))
    assert((ST.manifestMeta(root, v1) - "cts").isEmpty)
  }
}

/** x19's manifest-diff CDC: only the swapped files are read, the delta
  * is exactly the merge changeset, and a pure-append commit yields
  * insert-only changes. */
class ChangeFeedSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable

  test("x19: change feed reads only diffed files and reproduces the changeset") {
    val root = ST.mergeTable(spark, sf)
    val v = ST.currentVersion(root)
    val feed = ST.changesBetween(spark, root, v - 1, v)
    locally {
      // plan proof: the scan's file list is the manifest diff, not the table
      val scanned = feed.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.toSeq
      }.flatten.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
      val before = ST.manifestEntries(root, v - 1).map(_.rel).toSet
      val after = ST.manifestEntries(root, v).map(_.rel).toSet
      assert(scanned == (after -- before) ++ (before -- after),
        s"CDC read beyond the diff: $scanned")
      assert(scanned.size == 2, s"expected 1 removed + 1 added file, got $scanned")
      // content: deletes = pre-images of updates + deleted rows;
      // inserts = post-images + backfills — exactly the changeset
      val changes = ST.x17Changes(spark, sf)
      val nUpd = changes.filter(col("op") === "u").count()
      val nDel = changes.filter(col("op") === "d").count()
      val nIns = changes.filter(col("op") === "i").count()
      assert(feed.filter(col("change_type") === "delete").count() == nUpd + nDel)
      assert(feed.filter(col("change_type") === "insert").count() == nUpd + nIns)
      // applying the feed to v1 yields v2 (the CDC replay contract)
      val cols = feed.columns.filter(_ != "change_type").map(col).toIndexedSeq
      val v1 = ST.readAt(spark, root, v - 1)
      val replayed = v1.exceptAll(feed.filter(col("change_type") === "delete").select(cols: _*))
        .unionByName(feed.filter(col("change_type") === "insert").select(cols: _*))
      val v2 = ST.readAt(spark, root, v)
      assert(replayed.exceptAll(v2).isEmpty && v2.exceptAll(replayed).isEmpty,
        "replaying the change feed onto v1 does not reproduce v2")
    }
  }

  test("x19: a pure-append commit's feed is insert-only (st8's table)") {
    graft.streaming.SnapshotSink.st8StreamSnapshotSink(spark, sf).collect()
    val root = graft.operators.Engine.tmpDir("graft_st8_table")
    val feed = ST.changesBetween(spark, root, 1, 2)
    assert(feed.filter(col("change_type") =!= "insert").count() == 0)
    assert(feed.count() > 0)
  }
}

/** Incremental MV maintenance: signed-delta refresh equals recompute,
  * including the fully-deleted-group drop the x17 fixture never hits. */
class IncrementalMvSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable

  test("a day deleted in full vanishes from the maintained MV, as recompute would") {
    val root = graft.operators.Engine.tmpDir("graft_mv_spec")
    graft.operators.Engine.listDir(java.nio.file.Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    // two one-day files; v2 merges a changeset that deletes EVERY row of day 11
    val rows = Seq((1L, 10L, "a", 1.0, 10L), (2L, 10L, "a", 2.0, 10L),
      (3L, 11L, "b", 3.0, 11L), (4L, 11L, "b", 4.0, 11L))
      .toDF("event_id", "user_id", "event_type", "value", "ep_day")
    def stage(day: Long, tag: String): ST.FileEntry = {
      rows.filter(col("ep_day") === day).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/stage")
      val part = graft.operators.Engine.listDir(java.nio.file.Paths.get(root, "stage"))
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, java.nio.file.Paths.get(root, s"data_$tag.parquet"))
      ST.footerEntry(root, s"data_$tag.parquet", "ep_day")
    }
    val v1 = ST.commitEntries(root, 0, Seq(stage(10L, "d10"), stage(11L, "d11")), 4)
    val changes = rows.filter(col("ep_day") === 11L).withColumn("op", lit("d"))
    ST.merge(spark, root, "ep_day", "event_id", changes)
    val v2 = ST.currentVersion(root)
    assert(v2 == v1 + 1)
    // maintain the MV by signed deltas (same arithmetic as x23)
    val mv0 = ST.readAt(spark, root, v1).groupBy("ep_day")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val delta = ST.changesBetween(spark, root, v1, v2)
      .withColumn("sgn", when(col("change_type") === "insert", 1L).otherwise(-1L))
      .groupBy("ep_day").agg(sum(col("sgn")).as("dn"), sum(col("value") * col("sgn")).as("dv"))
    val mv1 = mv0.join(delta, Seq("ep_day"), "full_outer")
      .select(col("ep_day"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("v"), lit(0.0)) + coalesce(col("dv"), lit(0.0))).as("v"))
      .filter(col("n") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recompute = ST.read(spark, root).groupBy("ep_day")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mv1 == recompute, s"mv $mv1 != recompute $recompute")
    assert(!mv1.exists(_._1 == 11L), "fully-deleted day must vanish from the MV")
  }
}

/** Z-order clustering: two-dimensional stats pruning on the multi-
  * column manifest, against the one-dimensional blindness of a
  * single-key layout. */
class ZOrderSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable

  test("z-ordered layout prunes on BOTH columns; day layout is user-blind") {
    val root = ST.zorderTable(spark, sf)
    val v = ST.currentVersion(root)
    val (n1, n2) = (ST.manifestEntries(root, v - 1).size, ST.manifestEntries(root, v).size)
    val (qulo, quhi) = ST.x22UserRange(root)
    val userBox = Seq(("user_id", qulo, quhi))
    val dayBox = Seq(("ep_day", ST.X22DayLo, ST.X22DayHi))
    // v1 (day-clustered): the day box prunes, a user box cannot
    assert(ST.prunedEntriesBox(root, v - 1, "ep_day", dayBox).size < n1)
    assert(ST.prunedEntriesBox(root, v - 1, "ep_day", userBox).size == n1,
      "a day-clustered layout must be blind to user ranges")
    // v2 (z-ordered): BOTH single-column boxes prune, and the 2-dim box
    // prunes beyond either alone
    val u = ST.prunedEntriesBox(root, v, "user_id", userBox).size
    val dd = ST.prunedEntriesBox(root, v, "user_id", dayBox).size
    val both = ST.prunedEntriesBox(root, v, "user_id", userBox ++ dayBox).size
    assert(u < n2, s"user box kept all $n2 z files")
    assert(dd < n2, s"day box kept all $n2 z files")
    assert(both < u && both < dd, s"2-dim box ($both) should beat either dim alone ($u, $dd)")
  }

  test("x56 CLUSTER BY (a,b,c): every dimension prunes; 3-dim box beats each; content preserved") {
    val root = ST.clusterByTable(spark, sf)
    val v = ST.currentVersion(root)
    val (n1, n2) = (ST.manifestEntries(root, v - 1).size, ST.manifestEntries(root, v).size)
    val dims = Seq("user_id", "ep_day", "vmilli")
    val boxes = dims.map(c => c -> {
      val (lo, hi) = ST.statsQuartileRange(root, c)
      Seq((c, lo, hi))
    }).toMap
    // v1 (round-robin): every file spans every dimension — nothing prunes
    dims.foreach { c =>
      assert(ST.prunedEntriesBox(root, v - 1, "ep_day", boxes(c)).size == n1,
        s"round-robin layout should be blind to $c ranges")
    }
    // v2 (3-key curve): each single-dimension box prunes files, and
    // the 3-dim box opens at most what any single dimension does
    val singles = dims.map(c => ST.prunedEntriesBox(root, v, "user_id", boxes(c)).size)
    singles.zip(dims).foreach { case (n, c) =>
      assert(n < n2, s"$c box kept all $n2 clustered files") }
    val all3 = ST.prunedEntriesBox(root, v, "user_id",
      dims.flatMap(boxes)).size
    assert(all3 <= singles.min && all3 < n2,
      s"3-dim box ($all3) should not exceed the best single dim (${singles.min})")
    // layout-only: identical rows across versions; box scan ≡ filter
    assert(ST.readAt(spark, root, v).exceptAll(ST.readAt(spark, root, v - 1)).isEmpty)
    val pred = dims.map { c =>
      val (lo, hi) = ST.statsQuartileRange(root, c); col(c).between(lo, hi)
    }.reduce(_ && _)
    val viaBox = ST.readPrunedBox(spark, root, "user_id", dims.flatMap(boxes))
      .groupBy("event_type").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaFull = ST.readAt(spark, root, v).filter(pred)
      .groupBy("event_type").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBox == viaFull)
  }

  test("box scan equals full-scan filter; z rewrite preserves content") {
    val root = ST.zorderTable(spark, sf)
    val v = ST.currentVersion(root)
    val (qulo, quhi) = ST.x22UserRange(root)
    val box = Seq(("user_id", qulo, quhi), ("ep_day", ST.X22DayLo, ST.X22DayHi))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaBox = key(ST.readPrunedBox(spark, root, "user_id", box))
    val viaFull = key(ST.readAt(spark, root, v)
      .filter(col("user_id").between(qulo, quhi) &&
        col("ep_day").between(ST.X22DayLo, ST.X22DayHi)))
    assert(viaBox == viaFull)
    // layout-only change: v1 and v2 hold identical rows
    assert(ST.readAt(spark, root, v).exceptAll(ST.readAt(spark, root, v - 1)).isEmpty)
  }
}

/** The DSv2 snapshot-table connector: version-offset streaming with
  * batch-per-commit boundaries, offset restart, projection pushdown,
  * time travel, and the append-only guard. */
class SnapshotSourceSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  val ST = graft.operators.SnapshotTable

  test("streaming read delivers one micro-batch per commit, union = whole log") {
    val root = ST.streamTable(spark, sf)
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.count()); ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toMap
    // per-commit row deltas: each commit appended exactly one 10-day file
    val want = ST.St9Bounds.map { case (lo, hi) =>
      graft.sources.Tables.events(spark, sf)
        .filter(expr("(ts div 1000000000) div 86400").between(lo, hi)).count()
    }
    assert(got.size == want.size, s"expected ${want.size} commit-batches, got $got")
    assert((0 until want.size).map(i => got(i.toLong)) == want,
      s"batch boundaries drifted from commits: $got vs $want")
  }

  test("startingVersion offset skips already-consumed commits") {
    val root = ST.streamTable(spark, sf)
    val name = "st9_restart_out"
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "1").load(root)
      .writeStream.format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val fromV1 = spark.table(name).count()
    val total = spark.read.format("graft-snapshot").load(root).count()
    val v1 = spark.read.format("graft-snapshot").option("version", "1").load(root).count()
    assert(fromV1 == total - v1, s"offset replay wrong: $fromV1 != $total - $v1")
  }

  test("Trigger.AvailableNow drains the start-time backlog per-commit, " +
      "terminates, excludes a mid-run commit, and resumes it next run") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val Engine = graft.operators.Engine
    val root = Engine.tmpDir("graft_avnow")
    val cp = Engine.tmpDir("graft_avnow_cp")
    Seq(root, cp).foreach(p => Engine.listDir(java.nio.file.Paths.get(p))
      .foreach(Engine.deleteRecursively))
    // three 10-row commits of (k, v)
    var entries = Seq.empty[graft.operators.SnapshotTable.FileEntry]
    var v = 0
    (0 until 3).foreach { i =>
      val rel = ST.writeDataFile(
        ((i * 10 + 1) to (i * 10 + 10)).map(k => (k.toLong, k * 1.0)).toDF("k", "v"),
        root, s"b$i")
      entries :+= ST.footerEntry(root, rel, "k")
      v = ST.commitEntries(root, v, entries, 4, Map("statsCol" -> "k"))
    }
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("maxVersionsPerTrigger", "1").load(root)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.put(id, df.count())
          // a commit landing MID-RUN: after the start-time capture, so
          // this run must NOT consume it (the cap is the contract)
          if (appended.compareAndSet(false, true)) {
            val rel = ST.writeDataFile(
              (31L to 35L).map(k => (k, k * 1.0)).toDF("k", "v"), root, "late")
            ST.commitEntries(root, 3, entries :+ ST.footerEntry(root, rel, "k"),
              4, Map("statsCol" -> "k"))
          }
          ()
        }.trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000L), "AvailableNow did not self-terminate")
    }
    run()
    import scala.jdk.CollectionConverters._
    // exactly the 3 start-time commits, one batch each, 10 rows each;
    // the mid-run commit (5 rows) is absent
    assert(batches.asScala.toMap == Map(0L -> 10L, 1L -> 10L, 2L -> 10L),
      s"first run batches: ${batches.asScala.toMap}")
    assert(ST.currentVersion(root) == 4, "mid-run append did not commit")
    // second run from the SAME checkpoint drains only the late commit
    run()
    assert(batches.asScala.toMap.get(3L).contains(5L),
      s"second run did not pick up the late commit: ${batches.asScala.toMap}")
    assert(batches.size == 4)
  }

  test("Trigger.AvailableNow terminates the CDF stream after the change history") {
    import org.apache.spark.sql.streaming.Trigger
    val root = ST.mergeTable(spark, sf)
    val name = "avnow_cdf_out"
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L), "CDF AvailableNow did not self-terminate")
    // same change volume a continuous drain of the feed serves
    val name2 = "avnow_cdf_cont"
    val q2 = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName(name2).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table(name).count() == spark.table(name2).count())
  }

  test("projection pushdown reaches the DSv2 scan (readSchema = selected cols)") {
    val root = ST.streamTable(spark, sf)
    val plan = spark.read.format("graft-snapshot").load(root)
      .select("ep_day").queryExecution.executedPlan
    val scans = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.readSchema()
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    assert(scans.head.fieldNames.toSeq == Seq("ep_day"),
      s"projection not pushed: ${scans.head.fieldNames.toSeq}")
  }

  test("batch read is snapshot-pinned; version option time-travels") {
    val root = ST.streamTable(spark, sf)
    val v = ST.currentVersion(root)
    assert(v == 3)
    val counts = (1 to v).map(i => spark.read.format("graft-snapshot")
      .option("version", i.toString).load(root).count())
    assert(counts == counts.sorted && counts.last > counts.head,
      s"versions should grow monotonically: $counts")
    assert(counts.last == spark.read.format("graft-snapshot").load(root).count())
  }

  private def scanParts(d: org.apache.spark.sql.DataFrame): Int = {
    // an aggregate's exchange wraps the plan in AQE — unwrap to reach the scan
    def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => go(a.initialPlan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.partitions.size
    }.sum
    go(d.queryExecution.executedPlan)
  }

  test("filter pushdown prunes planned files via manifest stats (7 -> 2)") {
    val root = ST.statsTable(spark, sf)
    val base = spark.read.format("graft-snapshot").load(root)
    assert(scanParts(base.select("ep_day")) == 7)
    val ranged = base.filter(col("ep_day").between(ST.X15Lo, ST.X15Hi))
    assert(scanParts(ranged.select("ep_day")) == 2,
      "between-filter should prune to the 2 files owning the range")
    // parity: the pruned connector scan equals the readPruned path
    val viaConnector = ranged.groupBy("ep_day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = ST.readPruned(spark, root, "ep_day", ST.X15Lo, ST.X15Hi)
      .groupBy("ep_day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaConnector == viaApi)
  }

  test("unfiltered count(*) is served from the manifest, one partition, zero file reads") {
    val root = ST.statsTable(spark, sf)
    val base = spark.read.format("graft-snapshot").load(root)
    val cnt = base.groupBy().count()
    assert(scanParts(cnt) == 1, "count(*) should plan one manifest-answer partition")
    assert(cnt.head().getLong(0) == base.count())
    // a FILTERED count must take the scan path (manifest totals would
    // over-count) — and still prune files
    val filtered = base.filter(col("ep_day").between(ST.X15Lo, ST.X15Hi)).groupBy().count()
    assert(scanParts(filtered) == 2, "filtered count must scan (pruned) files")
    val expected = graft.sources.Tables.events(spark, sf)
      .filter(expr("(ts div 1000000000) div 86400").between(ST.X15Lo, ST.X15Hi)).count()
    assert(filtered.head().getLong(0) == expected)
  }

  test("SQL surface: CREATE TEMPORARY VIEW ... USING graft-snapshot") {
    val root = ST.streamTable(spark, sf)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW snap_sql_t " +
      s"USING `graft-snapshot` OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) FROM snap_sql_t").head().getLong(0) ==
      spark.read.format("graft-snapshot").load(root).count())
  }

  test("DSv2 batch write: each append commits one version; round-trips exactly") {
    import spark.implicits._
    val root = graft.operators.Engine.tmpDir("graft_w_spec")
    graft.operators.Engine.listDir(java.nio.file.Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    val a = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    val b = Seq((3L, "z", 3.5)).toDF("id", "s", "v")
    a.write.format("graft-snapshot").mode("append").save(root)
    assert(ST.currentVersion(root) == 1)
    b.write.format("graft-snapshot").mode("append").save(root)
    assert(ST.currentVersion(root) == 2)
    val back = spark.read.format("graft-snapshot").load(root)
    assert(back.schema.map(_.name) == Seq("id", "s", "v"))
    assert(back.exceptAll(a.unionAll(b)).isEmpty && a.unionAll(b).exceptAll(back).isEmpty)
    // time travel sees only the first append
    assert(spark.read.format("graft-snapshot").option("version", "1").load(root).count() == 2)
  }

  test("writer statsCol option makes a written table prunable on read") {
    import spark.implicits._
    val root = graft.operators.Engine.tmpDir("graft_w_stats_spec")
    graft.operators.Engine.listDir(java.nio.file.Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    // two appends with disjoint key ranges → two prunable files
    Seq((1L, 10.0), (5L, 11.0)).toDF("k", "v")
      .coalesce(1).write.format("graft-snapshot").mode("append")
      .option("statsCol", "k").save(root)
    Seq((100L, 12.0), (105L, 13.0)).toDF("k", "v")
      .coalesce(1).write.format("graft-snapshot").mode("append").save(root)
    // statsCol survives the second commit (carried forward)
    assert(ST.manifestMeta(root, ST.currentVersion(root)).get("statsCol").contains("k"))
    val base = spark.read.format("graft-snapshot").load(root)
    assert(scanParts(base.select("k")) == 2)
    val low = base.filter(col("k") <= 10L)
    assert(scanParts(low.select("k")) == 1, "stats from written footers should prune")
    assert(low.count() == 2)
  }

  test("DSv2 streaming sink: version per commit, checkpoint restart is a no-op") {
    val src = ST.streamTable(spark, sf)
    val dst = graft.operators.Engine.tmpDir("graft_w_stream_spec")
    val cp = graft.operators.Engine.tmpDir("graft_w_stream_spec_cp")
    Seq(dst, cp).foreach(p => graft.operators.Engine
      .listDir(java.nio.file.Paths.get(p))
      .foreach(graft.operators.Engine.deleteRecursively))
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(src)
        .writeStream.format("graft-snapshot")
        .option("path", dst).option("checkpointLocation", cp).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val v1 = ST.currentVersion(dst)
    assert(v1 == ST.currentVersion(src),
      s"sink should commit one version per source commit: $v1")
    assert(spark.read.format("graft-snapshot").load(dst)
      .exceptAll(spark.read.format("graft-snapshot").load(src)).isEmpty)
    // restart against the same checkpoint: no new source commits → the
    // sink must not grow (exactly-once, not at-least-once)
    run()
    assert(ST.currentVersion(dst) == v1, "restart duplicated data")
    assert(spark.read.format("graft-snapshot").load(dst).count() ==
      spark.read.format("graft-snapshot").load(src).count())
  }

  test("complete-mode streaming write REPLACES the table each epoch") {
    import spark.implicits._
    val dst = graft.operators.Engine.tmpDir("graft_w_complete_spec")
    val cp = graft.operators.Engine.tmpDir("graft_w_complete_spec_cp")
    Seq(dst, cp).foreach(p => graft.operators.Engine
      .listDir(java.nio.file.Paths.get(p))
      .foreach(graft.operators.Engine.deleteRecursively))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"))
    val batches = Seq(
      "b0" -> ev.filter(col("event_id") % 2 === 0),
      "b1" -> ev.filter(col("event_id") % 2 === 1))
    val q = graft.streaming.Streams.source
      .batched(spark, "complete_spec", ev.schema, batches)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("graft-snapshot").outputMode("complete")
      .option("path", dst).option("checkpointLocation", cp).start()
    q.processAllAvailable(); q.stop()
    // the table holds ONLY the final snapshot of the aggregate —
    // ignoring the overwrite flag would leave both epochs' rows
    val table = spark.read.format("graft-snapshot").load(dst)
    val expected = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(table.count() == expected.count(),
      s"complete-mode sink kept stale epochs: ${table.collect().toSeq}")
    assert(table.exceptAll(expected).isEmpty && expected.exceptAll(table).isEmpty)
  }

  test("a later append preserves other writers' epoch watermarks") {
    import spark.implicits._
    val src = ST.streamTable(spark, sf)
    val dst = graft.operators.Engine.tmpDir("graft_w_epoch_spec")
    val cp = graft.operators.Engine.tmpDir("graft_w_epoch_spec_cp")
    Seq(dst, cp).foreach(p => graft.operators.Engine
      .listDir(java.nio.file.Paths.get(p))
      .foreach(graft.operators.Engine.deleteRecursively))
    val q = spark.readStream.format("graft-snapshot").load(src)
      .writeStream.format("graft-snapshot")
      .option("path", dst).option("checkpointLocation", cp).start()
    q.processAllAvailable(); q.stop()
    val metaBefore = ST.manifestMeta(dst, ST.currentVersion(dst))
    val epochKeys = metaBefore.keys.filter(_.startsWith("epoch:")).toSet
    assert(epochKeys.nonEmpty, "streaming sink should have recorded its epoch")
    // an unrelated BATCH append must not erase the stream's watermark —
    // dropping it would re-open the replay window for that query
    Seq((999999L, 1L, "x", 0.0, 19723L))
      .toDF("event_id", "user_id", "event_type", "value", "ep_day")
      .write.format("graft-snapshot").mode("append").save(dst)
    val metaAfter = ST.manifestMeta(dst, ST.currentVersion(dst))
    assert(epochKeys.forall(k => metaAfter.get(k) == metaBefore.get(k)),
      s"append clobbered epoch watermarks: before=$metaBefore after=$metaAfter")
  }

  test("streaming a table with rewrite commits fails the append-only guard") {
    val root = ST.mergeTable(spark, sf) // v2 rewrote one of v1's files
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("memory").queryName("st9_guard_out").start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => t.getMessage != null && t.getMessage.contains("append-only")),
      s"wrong failure: ${ex.getMessage}")
  }
}

/** The manifest CAS under REAL thread races: every committer's retry
  * loop eventually lands, versions linearize with no lost updates, and
  * no orphan shards remain. */
class CommitRaceSpec extends AnyFunSuite {
  import TestSession._
  val ST = graft.operators.SnapshotTable

  test("N concurrent committers all land; no update lost, no shard leaked") {
    val root = graft.operators.Engine.tmpDir("graft_snapstats_race")
    graft.operators.Engine.listDir(java.nio.file.Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    val N = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(N)
    val landed = new java.util.concurrent.atomic.AtomicInteger
    val tasks = (1 to N).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var done = false
          while (!done) {
            val v = ST.currentVersion(root)
            val base = if (v == 0) Nil else ST.manifestEntries(root, v)
            try {
              // shardSize=2 forces the sharded path once a few commits
              // land, so CAS-loser shard cleanup races too
              ST.commitEntries(root, v,
                base :+ ST.FileEntry(s"f_$i.parquet", i, i, 1), shardSize = 2)
              landed.incrementAndGet(); done = true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => () // lost the race: re-read, retry
            }
          }
        }
      })
    }
    tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(landed.get == N)
    val v = ST.currentVersion(root)
    assert(v == N, s"expected $N linearized versions, got $v")
    val rels = ST.manifestEntries(root, v).map(_.rel).toSet
    assert(rels == (1 to N).map(i => s"f_$i.parquet").toSet,
      s"lost update: final manifest $rels")
    // every shard on disk is referenced by some surviving manifest
    val live = (1 to v).flatMap(i => ST.rawManifestLines(root, i)
      .collect { case l if l.startsWith(">") => l.drop(1) }).toSet
    val onDisk = graft.operators.Engine
      .listDir(java.nio.file.Paths.get(root, "_manifests"))
      .map(_.getFileName.toString).filter(_.startsWith("shard_")).toSet
    assert(onDisk.subsetOf(live), s"orphan shards: ${onDisk -- live}")
  }
}
