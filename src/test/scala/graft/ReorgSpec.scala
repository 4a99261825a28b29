package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REORG TABLE ... APPLY (PURGE) — Delta's targeted deletion-vector
  * cleanup: rewrite ONLY the files carrying DV sidecars (applying their
  * vectors), carry every clean file by reference byte-untouched, leave
  * the resulting version DV-free. The change feed must see NOTHING (the
  * purged rows were already deleted), row-tracked ids must survive the
  * move, and a DV-free table must be a version-unchanged no-op. */
class ReorgSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  /** Three range-clustered files of 20 rows each (k = 1..60), dvmode on. */
  private def fresh(name: String): String = {
    val root = Engine.tmpDir(s"graft_reorg_$name")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rels = ST.writeDataFiles((1L to 60L).map(k => (k, k * 1.0))
      .toDF("k", "v").repartitionByRange(3, col("k")), root, "a")
      .map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, rels, 16, Map("statsCol" -> "k"))
    ST.enableDeletionVectors(root)
    root
  }

  private def fileBytes(root: String, v: Int): Map[String, Long] =
    ST.manifestEntries(root, v)
      .map(e => e.rel -> Files.size(Paths.get(root, e.rel))).toMap

  test("purge rewrites ONLY the DV'd files; clean files carry byte-identical") {
    val root = fresh("basic")
    // dirty files 1 and 2 (k ranges ~[1,20] and ~[21,40]); file 3 stays clean
    spark.sql(s"DELETE FROM '$root' WHERE k IN (3, 25)").collect()
    val vDirty = ST.currentVersion(root)
    val dvBefore = ST.dvState(root, vDirty)
    assert(dvBefore.size == 2, s"fixture expected 2 DV'd files, got $dvBefore")
    val bytesBefore = fileBytes(root, vDirty)
    val cleanRels = ST.manifestEntries(root, vDirty).map(_.rel)
      .filterNot(dvBefore.contains).toSet
    assert(cleanRels.size == 1)

    val vClean = ST.reorgPurge(spark, root)
    assert(vClean == vDirty + 1, "REORG must commit exactly one version")
    assert(ST.dvState(root, vClean).isEmpty, "purge left deletion vectors")
    val audit = ST.manifestMeta(root, vClean)("reorg")
    assert(audit == "cow:2of3", audit)
    // the clean file survives AS THE SAME rel with the same bytes
    val after = ST.manifestEntries(root, vClean).map(_.rel).toSet
    assert(cleanRels.subsetOf(after), "REORG touched a DV-free file")
    cleanRels.foreach { r =>
      assert(Files.size(Paths.get(root, r)) == bytesBefore(r),
        s"clean file $r changed size") }
    // the dirtied rels are gone from the manifest
    assert(dvBefore.keySet.intersect(after).isEmpty, "a purged file survived")
    // content ≡ the negated filter, on both read routes
    val expect = (1L to 60L).filterNot(k => k == 3 || k == 25)
      .map(k => k -> k * 1.0).toMap
    assert(ST.read(spark, root).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap == expect)
    assert(spark.read.format("graft-snapshot").load(root).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap == expect)
    // count(*) may take the manifest fast path again: no DVs remain
    assert(spark.read.format("graft-snapshot").load(root).count() == 58)
    // stats pruning still works on the re-ranged replacements
    assert(ST.readPruned(spark, root, "k", 1L, 5L).count() == 4)
    // time travel: the dirty version still anti-filters its sidecars
    assert(ST.readAt(spark, root, vDirty).count() == 58)
    assert(ST.readAt(spark, root, vDirty - 2).count() == 60)
  }

  test("the change feed sees nothing across a REORG commit") {
    val root = fresh("feed")
    spark.sql(s"DELETE FROM '$root' WHERE k IN (7, 41)").collect()
    val vDirty = ST.currentVersion(root)
    val vClean = ST.reorgPurge(spark, root)
    assert(ST.changesBetween(spark, root, vDirty, vClean).count() == 0,
      "REORG must be change-feed-invisible: its rows were already deleted")
    // and the feed across delete+reorg equals the feed across the delete
    val feed = ST.changesBetween(spark, root, vDirty - 1, vClean)
    assert(feed.filter(col("change_type") === "delete").count() == 2)
    assert(feed.filter(col("change_type") === "insert").count() == 0)
  }

  test("a DV-free table is a version-unchanged no-op (Scala and SQL routes)") {
    val root = fresh("noop")
    val v = ST.currentVersion(root)
    assert(ST.reorgPurge(spark, root) == v, "no-op REORG must not commit")
    spark.sql(s"REORG TABLE '$root' APPLY (PURGE)").collect()
    assert(ST.currentVersion(root) == v, "SQL no-op REORG must not commit")
  }

  test("row-tracked ids survive the purge; a post-purge DV purges again") {
    val root = fresh("rowid")
    ST.enableRowTracking(spark, root)
    val idsBefore = ST.readWithRowIds(spark, root).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    spark.sql(s"DELETE FROM '$root' WHERE k IN (11, 31)").collect()
    ST.reorgPurge(spark, root)
    val idsAfter = ST.readWithRowIds(spark, root).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    assert(idsAfter.keySet == idsBefore.keySet - 11L - 31L)
    idsAfter.foreach { case (k, id) =>
      assert(id == idsBefore(k), s"row id of k=$k changed across REORG") }
    // second round: the purged table dirties and purges again
    spark.sql(s"DELETE FROM '$root' WHERE k = 55").collect()
    ST.reorgPurge(spark, root)
    assert(ST.dvState(root, ST.currentVersion(root)).isEmpty)
    val idsFinal = ST.readWithRowIds(spark, root).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    assert(idsFinal == idsAfter - 55L, "second purge broke id stability")
  }

  test("purge-to-empty leaves a readable zero-entry version") {
    val root = fresh("empty")
    spark.sql(s"DELETE FROM '$root' WHERE k <= 60").collect()
    // a full-match DELETE on dvmode may fall back to CoW past the
    // selectivity cap — only exercise purge when sidecars resulted
    if (ST.dvState(root, ST.currentVersion(root)).nonEmpty) {
      val vClean = ST.reorgPurge(spark, root)
      assert(ST.manifestEntries(root, vClean).isEmpty)
      assert(ST.read(spark, root).count() == 0)
      assert(spark.read.format("graft-snapshot").load(root).count() == 0)
    }
  }
}
