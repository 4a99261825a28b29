package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Protocol / feature gating (VERDICT r13 #1 — Delta's protocol-action
  * contract): commits that first use column mapping / deletion vectors /
  * schema capture stamp `#readerFeatures`, cdf/dvmode/checks stamp
  * `#writerFeatures`; a manifest requiring an UNKNOWN reader feature
  * refuses on every load route (batch, DSv2, streaming, catalog SQL,
  * vacuum) instead of silently returning wrong rows, and an unknown
  * writer feature blocks commits while reads keep working. */
class ProtocolGateSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def freshTable(name: String, ks: Seq[Long]): String = {
    val root = Engine.tmpDir(name)
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles(ks.map(k => (k, k * 1.0)).toDF("k", "v").coalesce(1),
        root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    root
  }

  /** Append a doctored next-version manifest: current content plus the
    * given feature stamp (manifests are immutable; the doctored state
    * is a NEW version, exactly what a future binary would commit). */
  private def doctor(root: String, stamp: String): Int = {
    val v = ST.currentVersion(root)
    val cur = new String(Files.readAllBytes(ST.manifestPath(root, v)))
    Files.write(ST.manifestPath(root, v + 1), (cur + "\n" + stamp).getBytes)
    v + 1
  }

  test("feature stamps: written when first used, recomputed (not carried stale)") {
    val root = freshTable("graft_gate_stamp", 1L to 20L)
    val m1 = ST.manifestMeta(root, 1)
    assert(!m1.contains("readerFeatures") && !m1.contains("writerFeatures"),
      s"plain table must carry no feature stamps: $m1")
    // colmap: a rename requires the reader to resolve the mapping
    ST.renameColumn(spark, root, "v", "val")
    val m2 = ST.manifestMeta(root, 2)
    assert(m2("readerFeatures").split(',').contains("colmap"), m2.toString)
    assert(m2("writerFeatures").split(',').contains("colmap"), m2.toString)
    // dvmode alone is writer-only (a DV-ignorant reader still reads
    // right until a sidecar exists); the first sidecar makes it a
    // reader feature
    ST.enableDeletionVectors(root)
    val m3 = ST.manifestMeta(root, 3)
    assert(!m3.get("readerFeatures").exists(_.split(',').contains("dv")), m3.toString)
    assert(m3("writerFeatures").split(',').contains("dv"), m3.toString)
    ST.delete(spark, root, "k = 3")
    val v4 = ST.currentVersion(root)
    assert(ST.manifestMeta(root, v4).get("dv").nonEmpty, "expected a MoR delete")
    assert(ST.manifestMeta(root, v4)("readerFeatures").split(',').contains("dv"))
    // OPTIMIZE materializes the mapping and applies the vectors: both
    // features un-require — stamps are recomputed per commit
    ST.optimizeClustered(spark, root, "k", targetFiles = 2)
    val v5 = ST.currentVersion(root)
    val m5 = ST.manifestMeta(root, v5)
    assert(!m5.get("readerFeatures").exists(f => f.contains("colmap") || f.contains("dv")),
      s"materialized table must drop the reader features: $m5")
    assert(ST.read(spark, root).count() == 19)
  }

  test("unknown reader feature refuses every load route, loudly") {
    val root = freshTable("graft_gate_reader", 1L to 6L)
    doctor(root, "#readerFeatures\tv9-hyperindex")
    def refusal(body: => Any): String = {
      val e = intercept[Exception](body)
      // streaming wraps the cause in StreamingQueryException — search
      // the chain for the protocol message
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("v9-hyperindex") && msgs.contains("reader feature"), msgs)
      msgs
    }
    refusal(ST.read(spark, root).collect())                       // Scala batch
    refusal(spark.read.format("graft-snapshot").load(root).collect()) // DSv2 batch
    // time travel through the doctored version refuses the same way;
    // an EARLIER clean version stays readable (old manifests carry no
    // stamp — the gate is per version, exactly Delta's contract)
    refusal(ST.readAt(spark, root, ST.currentVersion(root)).collect())
    assert(ST.readAt(spark, root, 1).count() == 6,
      "pre-feature versions must stay readable")
  }

  test("unknown reader feature: SQL, streaming and vacuum routes refuse too") {
    val root = freshTable("graft_gate_reader2", 1L to 6L)
    doctor(root, "#readerFeatures\tv9-hyperindex")
    val chain = (e: Throwable) =>
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    // SQL DML route (DELETE resolves the manifest before rewriting)
    val e1 = intercept[Exception](spark.sql(s"DELETE FROM '$root' WHERE k = 1").collect())
    assert(chain(e1).contains("reader feature"), chain(e1))
    // streaming route: the source refuses at planning
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot").load(root)
        .writeStream.format("memory").queryName(s"gate_${System.nanoTime()}")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(chain(e2).contains("reader feature"), chain(e2))
    // vacuum must not interpret (and delete under) a manifest it
    // cannot fully understand
    val e3 = intercept[Exception](ST.vacuumRetain(root, hours = 0.0))
    assert(chain(e3).contains("reader feature"), chain(e3))
  }

  test("unknown writer feature: reads keep working, commits refuse") {
    val root = freshTable("graft_gate_writer", 1L to 6L)
    doctor(root, "#writerFeatures\trow-tracking-v9")
    // reads are fine — the feature only constrains committers
    assert(ST.read(spark, root).count() == 6)
    // any commit against the doctored base refuses: merge, delete, flags
    val ch = Seq((99L, 99.0, "i")).toDF("k", "v", "op")
    val e1 = intercept[IllegalStateException](ST.merge(spark, root, "k", "k", ch))
    assert(e1.getMessage.contains("writer feature") &&
      e1.getMessage.contains("row-tracking-v9"), e1.getMessage)
    val e2 = intercept[IllegalStateException](ST.delete(spark, root, "k = 1"))
    assert(e2.getMessage.contains("writer feature"), e2.getMessage)
    val e3 = intercept[IllegalStateException](
      ST.setTableFlags(root, Map("cdf" -> "row")))
    assert(e3.getMessage.contains("writer feature"), e3.getMessage)
    // and the table is still at the doctored version — nothing minted
    assert(ST.currentVersion(root) == 2)
  }

  test("catalog route refuses an unknown reader feature by name") {
    val w = Files.createTempDirectory("graft_gate_cat").toString
    spark.conf.set("spark.sql.catalog.ggate", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggate.root", w)
    spark.sql("CREATE TABLE ggate.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO ggate.t VALUES (1, 1.0), (2, 2.0)")
    val root = Paths.get(w, "t").toString
    doctor(root, "#readerFeatures\tv9-hyperindex")
    val e = intercept[Exception](spark.sql("SELECT * FROM ggate.t").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("reader feature"), msgs)
  }
}
