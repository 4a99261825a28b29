package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DEEP CLONE — an independent copy of one snapshot: data files and DV
  * sidecars copy into the target under a fresh manifest; the source's
  * lifecycle (VACUUM, deletion, further commits) can never orphan the
  * clone — the hazard a SHALLOW clone's `../` refs accept. */
class DeepCloneSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def freshDir(name: String): String = {
    val p = Engine.tmpDir(s"graft_dclone_$name")
    Engine.listDir(Paths.get(p)).foreach(Engine.deleteRecursively)
    p
  }

  /** Two files, dvmode on, one DV'd row (k=5). */
  private def source(name: String): String = {
    val root = freshDir(name)
    val rels = ST.writeDataFiles((1L to 40L).map(k => (k, k * 1.0))
      .toDF("k", "v").repartitionByRange(2, col("k")), root, "a")
      .map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, rels, 16, Map("statsCol" -> "k"))
    ST.enableDeletionVectors(root)
    spark.sql(s"DELETE FROM '$root' WHERE k = 5").collect()
    root
  }

  test("deep clone survives the source's death; DVs and stats copy") {
    val src = source("indep")
    val dst = freshDir("indep_dst")
    spark.sql(s"CREATE TABLE '$dst' DEEP CLONE '$src'").collect()
    assert(ST.manifestMeta(dst, 1)("clone").startsWith("deep:"))
    // no entry escapes the clone root — everything is local bytes
    assert(ST.manifestEntries(dst, 1).forall(!_.rel.contains("..")))
    Engine.listDir(Paths.get(src)).foreach(Engine.deleteRecursively)
    val got = ST.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == (1L to 40L).filterNot(_ == 5).map(k => k -> k * 1.0).toMap,
      "deep clone lost rows (or resurrected the DV'd one) after source death")
    // stats pruning works from the copied entries' own stats
    assert(ST.readPruned(spark, dst, "k", 1L, 4L).count() == 4)
    // and the clone is a fully independent table: DML commits locally
    spark.sql(s"DELETE FROM '$dst' WHERE k = 6").collect()
    assert(ST.read(spark, dst).count() == 38)
  }

  test("deep clone of a SHALLOW clone materializes the referenced bytes") {
    val base = source("chain")
    val sc = freshDir("chain_sc")
    val dc = freshDir("chain_dc")
    ST.shallowClone(base, sc, None)
    assert(ST.manifestEntries(sc, 1).exists(_.rel.contains("..")),
      "fixture expected escaping refs in the shallow clone")
    spark.sql(s"CREATE TABLE '$dc' DEEP CLONE '$sc'").collect()
    assert(ST.manifestEntries(dc, 1).forall(!_.rel.contains("..")),
      "deep clone carried dangling-able refs instead of copying bytes")
    // both upstreams die; the deep clone keeps serving
    Seq(base, sc).foreach(p =>
      Engine.listDir(Paths.get(p)).foreach(Engine.deleteRecursively))
    assert(ST.read(spark, dc).count() == 39)
  }

  test("row identity carries: same ids for same keys across the copy") {
    val src = source("rowid")
    ST.enableRowTracking(spark, src)
    val before = ST.readWithRowIds(spark, src).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    val dst = freshDir("rowid_dst")
    ST.deepClone(spark, src, dst, None)
    val after = ST.readWithRowIds(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    assert(after == before, "deep clone changed row identities")
  }

  test("version pinning and refusals") {
    val src = source("pin")
    val v1Count = ST.readAt(spark, src, 1).count()
    val dst = freshDir("pin_dst")
    spark.sql(s"CREATE TABLE '$dst' DEEP CLONE '$src' VERSION AS OF 1").collect()
    assert(ST.read(spark, dst).count() == v1Count, "pinned clone drifted")
    // an already-committed target refuses
    assert(intercept[IllegalArgumentException](
      ST.deepClone(spark, src, dst, None))
      .getMessage.contains("already a committed table"))
    // an out-of-range version refuses
    assert(intercept[IllegalArgumentException](
      ST.deepClone(spark, src, freshDir("pin_dst2"), Some(99)))
      .getMessage.contains("no version"))
  }
}
