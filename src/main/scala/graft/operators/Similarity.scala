package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Similarity search over the embeddings table (SURVEY.md §2d).
  *
  * All cosine math runs on integer-quantized vectors (milli-units):
  * dots and norms are exact longs (≤6.4e13 ≪ 2^53), the final cosine is
  * one double division — bit-identical on Spark and DuckDB, so the
  * brute-force variants are fully oracle-checkable. The LSH variant is
  * the 100 TB path: candidate generation by bucket join, brute force
  * only within buckets.
  */
object Similarity {

  /** embeddings quantized to integer milli-units + exact integer norm. */
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000.0, 0).cast("long")).as("qv"))
      .withColumn("nrm", aggregate(transform(col("qv"), v => v * v), lit(0L), _ + _))

  private val quantizedSql =
    """qn AS (SELECT vec_id, label, qv,
      |  CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nrm FROM (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings) z)""".stripMargin

  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** s1_knn_brute — exact top-10 cosine neighbors for query vectors
    * (vec_id < 5): broadcast the tiny query side, stream the corpus,
    * per-query top-k via window. At scale this is the correctness
    * baseline ANN variants are measured against. */
  def s1KnnBrute(s: SparkSession, d: String): DataFrame = {
    val q = quantized(s, d)
    val queries = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos_sim"), asc("cand_id"))
    q.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        cosine(aggregate(zip_with(col("q_qv"), col("qv"), _ * _), lit(0L), _ + _),
          col("q_nrm"), col("nrm")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .orderBy("q_id", "rk")
  }

  val s1Sql: String =
    s"""WITH $quantizedSql,
       |qq AS (SELECT vec_id AS q_id, qv AS q_qv, nrm AS q_nrm FROM qn WHERE vec_id < 5),
       |scored AS (SELECT q_id, vec_id AS cand_id,
       |  CAST(list_sum(list_transform(range(1, len(q_qv) + 1), i -> q_qv[i] * qv[i])) AS DOUBLE)
       |    / (sqrt(CAST(q_nrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) AS cos_sim
       |  FROM qn CROSS JOIN qq WHERE vec_id <> q_id)
       |SELECT * FROM (SELECT q_id, cand_id, cos_sim,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id ASC) AS rk
       |  FROM scored) t
       |WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin

  private val LshTables = 8 // L independent hash tables
  private val LshBits   = 4 // k hyperplanes per table

  /** s2_knn_lsh — multi-table random-hyperplane LSH ANN: L=8 tables of
    * k=4 deterministic pseudo-hyperplanes (sign pattern from xxhash64 of
    * table⊗plane⊗dim — no stored model); a vector lands in one bucket
    * per table, candidates are bucket-mates in ANY table, brute force
    * runs only on candidates. L·k are the recall/cost dials (k grows
    * ~log n with corpus size; on a 100 TB corpus the bucket join is one
    * shuffle keyed on (table, bucket) and candidate counts track bucket
    * density, not corpus²). xxhash64 has no DuckDB twin → rows-only;
    * SimilaritySpec measures overlap vs s1's exact top-10. */
  /** Deterministic hyperplane signs computed once on the driver
    * (ShingleKernels.splitmix64) and shipped as array literals —
    * constant-folded into codegen, no per-row hashing. */
  private def splitmix64(seed: Long): Long =
    graft.functions.ShingleKernels.splitmix64(seed)

  def s2KnnLsh(s: SparkSession, d: String): DataFrame = {
    val q = quantized(s, d)
    // sign of <h_{t,p}, v> with h_{t,p}[i] = ±1 from splitmix64(t,p,i)
    val bucketCols = (0 until LshTables).map { t =>
      val bits = (0 until LshBits).map { p =>
        val signs: Seq[Long] = (0 until 64).map { i =>
          if ((splitmix64(((t.toLong * LshBits + p) << 8) + i) & 1L) == 1L) 1L else -1L
        }
        val signedSum = aggregate(
          zip_with(col("qv"), typedlit(signs), (v, sgn) => v * sgn),
          lit(0L), _ + _)
        (signedSum > 0).cast("long") * lit(1L << p)
      }
      bits.reduce(_ + _).as(s"bucket$t")
    }
    val bucketed = q.select(Seq(col("vec_id"), col("qv"), col("nrm")) ++ bucketCols: _*)
    val tabbed = bucketed.select(col("vec_id"), col("qv"), col("nrm"),
      posexplode(array((0 until LshTables).map(t => col(s"bucket$t")): _*))
        .as(Seq("tbl", "bucket")))
    val queries = tabbed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"),
        col("tbl").as("q_tbl"), col("bucket").as("q_bucket"))
    val cands = tabbed.join(broadcast(queries),
        col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        col("q_qv"), col("q_nrm"), col("qv"), col("nrm"))
      .dropDuplicates("q_id", "cand_id")
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos_sim"), asc("cand_id"))
    cands
      .select(col("q_id"), col("cand_id"),
        cosine(aggregate(zip_with(col("q_qv"), col("qv"), _ * _), lit(0L), _ + _),
          col("q_nrm"), col("nrm")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .orderBy("q_id", "rk")
  }

  /** s3_pairwise_topsim — globally most-similar pairs above 0.25 on the
    * deterministic 1-in-10 sample, top 50. Exact all-pairs — the
    * oracle-checkable small-SF twin; the unsampled scale path is
    * s6_pairwise_lsh (hyperplane-bucketed candidates). */
  def s3PairwiseTopsim(s: SparkSession, d: String): DataFrame = {
    val q = quantized(s, d).filter(pmod(col("vec_id"), lit(10)) === 0)
    q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(aggregate(zip_with(col("a.qv"), col("b.qv"), _ * _), lit(0L), _ + _),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= 0.25)
      .orderBy(desc("cos_sim"), asc("vec_a"), asc("vec_b"))
      .limit(50)
  }

  val s3Sql: String =
    s"""WITH $quantizedSql,
       |sampled AS (SELECT * FROM qn WHERE vec_id % 10 = 0),
       |scored AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
       |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos_sim
       |  FROM sampled a JOIN sampled b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= 0.25
       |ORDER BY cos_sim DESC, vec_a ASC, vec_b ASC LIMIT 50""".stripMargin

  /** s4_centroid — per-label centroids + farthest members. Distance is
    * kept in the exact integer domain: ‖n·v − Σv‖² (i.e. n²·‖v−μ‖²),
    * so ranking needs no float at all; longs stay < 2^63. */
  def s4Centroid(s: SparkSession, d: String): DataFrame = {
    val q = quantized(s, d)
    val counts = q.groupBy(col("label")).agg(count(lit(1)).as("n"))
    // dim-wise sums via posexplode (one shuffle on (label, dim))
    val sums = q.select(col("label"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("v")).as("sv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("sv")))),
        e => e.getField("sv")).as("sumv"))
    val w = Window.partitionBy(col("label")).orderBy(desc("scaled_dist"), asc("vec_id"))
    q.join(broadcast(counts), "label")
      .join(broadcast(sums), "label")
      .withColumn("scaled_dist",
        aggregate(zip_with(col("qv"), col("sumv"),
          (v, sv) => (col("n") * v - sv) * (col("n") * v - sv)), lit(0L), _ + _))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("label", "vec_id", "n", "scaled_dist", "rk")
      .orderBy("label", "rk")
  }

  val s4Sql: String =
    s"""WITH $quantizedSql,
       |dimsums AS (SELECT label, dim, CAST(SUM(v) AS BIGINT) AS sv FROM (
       |  SELECT label, unnest(qv) AS v, generate_subscripts(qv, 1) AS dim FROM qn) x
       |  GROUP BY label, dim),
       |sums AS (SELECT label, list(sv ORDER BY dim ASC) AS sumv FROM dimsums GROUP BY label),
       |cnt AS (SELECT label, COUNT(*) AS n FROM qn GROUP BY label),
       |scored AS (SELECT qn.label, vec_id, n,
       |  CAST(list_sum(list_transform(range(1, len(qv) + 1),
       |    i -> (n * qv[i] - sumv[i]) * (n * qv[i] - sumv[i]))) AS BIGINT) AS scaled_dist
       |  FROM qn JOIN sums ON qn.label = sums.label JOIN cnt ON qn.label = cnt.label)
       |SELECT * FROM (SELECT label, vec_id, n, scaled_dist,
       |  ROW_NUMBER() OVER (PARTITION BY label ORDER BY scaled_dist DESC, vec_id ASC) AS rk
       |  FROM scored) t
       |WHERE rk <= 3 ORDER BY label, rk""".stripMargin

  private val IvfLists  = 16 // coarse-quantizer cells
  private val IvfProbes = 2  // cells searched per query

  /** s5_knn_ivf — IVF-style ANN: a KMeans coarse quantizer (fixed seed)
    * partitions the corpus into inverted lists; each query probes only
    * its IvfProbes nearest cells and brute-forces within them. The
    * complement of s2's LSH: data-adaptive cells (better recall on
    * clustered corpora) at the cost of training a codebook. At 100 TB
    * the codebook is tiny and broadcast; the corpus shuffles once on
    * cell id — queries then touch IvfProbes/IvfLists of the data.
    * Iterative float training → rows-only; SimilaritySpec measures
    * recall vs s1. */
  def s5KnnIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val q = quantized(s, d)
      .withColumn("fvec", array_to_vector(
        transform(col("qv"), v => v.cast("double"))))
      .cache()
    val km = new KMeans().setK(IvfLists).setSeed(7L).setMaxIter(10)
      .setFeaturesCol("fvec").setPredictionCol("cell")
    val model = km.fit(q)
    val assigned = model.transform(q).select("vec_id", "label", "qv", "nrm", "cell")
    // queries probe their IvfProbes nearest cells: distances to the tiny
    // codebook are computed driver-side (it IS tiny — that's the point)
    val centroids = model.clusterCenters.map(_.toArray)
    val queryRows = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("qv")).collect()
    val probeCells: Map[Long, Seq[Int]] = queryRows.map { r =>
      val vid = r.getLong(0)
      val v = r.getSeq[Long](1).toArray
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        var acc = 0.0; var j = 0
        while (j < v.length) { val diff = v(j) - c(j); acc += diff * diff; j += 1 }
        (acc, i)
      }
      vid -> dists.sortBy(_._1).take(IvfProbes).map(_._2).toSeq
    }.toMap
    val probes = {
      import s.implicits._
      probeCells.toSeq.flatMap { case (vid, cells) => cells.map(c => (vid, c)) }
        .toDF("q_id", "probe_cell")
    }
    val qSide = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
      .join(probes, "q_id")
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos_sim"), asc("cand_id"))
    assigned.join(broadcast(qSide),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        cosine(aggregate(zip_with(col("q_qv"), col("qv"), _ * _), lit(0L), _ + _),
          col("q_nrm"), col("nrm")).as("cos_sim"))
      .dropDuplicates("q_id", "cand_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .orderBy("q_id", "rk")
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "s5_knn_ivf" -> (s5KnnIvf _, None),
    "s1_knn_brute" -> (s1KnnBrute _, Some(s1Sql)),
    "s2_knn_lsh" -> (s2KnnLsh _, None),
    "s3_pairwise_topsim" -> (s3PairwiseTopsim _, Some(s3Sql)),
    "s4_centroid" -> (s4Centroid _, Some(s4Sql)),
  )
}
