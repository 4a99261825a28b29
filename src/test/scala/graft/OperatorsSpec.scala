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

  test("d3 jaccard values agree with d2 on common pairs") {
    val d2 = graft.operators.Dedup.d2DedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val d3 = graft.operators.Dedup.d3DedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val common = d2.keySet.intersect(d3.keySet)
    assert(common.nonEmpty)
    common.foreach { k => assert(d2(k) == d3(k), s"jaccard mismatch at $k") }
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
}

/** Streaming operators behave like their batch twins; ML is deterministic. */
class StreamingAndMlSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._

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
