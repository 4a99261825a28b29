package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x41's contract: ROW TRACKING — every row a stable numeric identity.
  * Fresh files derive ids from a commit-time per-file base (zero
  * per-row write cost); deletion-vector DML preserves ordinals so ids
  * survive for free; copy-on-write rewrites (UPDATE/DELETE/MERGE/
  * OPTIMIZE) materialize carried ids into a hidden __row_id column the
  * colmap mechanism keeps out of plain reads; the high-water mark only
  * grows, so an id is never reused. */
class RowTrackingSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def fresh(name: String, n: Long = 40L, files: Int = 2): String = {
    val root = Engine.tmpDir(s"graft_rt_$name")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles((1L to n).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartitionByRange(files, col("k")), root, "a")
        .map(ST.footerEntry(root, _, "k")),
      16, Map("statsCol" -> "k"))
    ST.enableRowTracking(spark, root)
    root
  }

  private def ids(root: String): Map[Long, Long] =
    ST.readWithRowIds(spark, root).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap

  test("enable: metadata-only, identity colmap minted, feature-stamped, ids dense and unique") {
    val root = fresh("enable")
    val v = ST.currentVersion(root)
    val meta = ST.manifestMeta(root, v)
    assert(meta("rowtracking") == "on" && meta("rowhw").toLong == 40L)
    assert(meta.contains("colmap"), "enable must mint the hiding mapping")
    assert(meta("writerFeatures").split(',').contains("rowtracking"))
    assert(ST.enableRowTracking(spark, root) == v, "re-enable must be a no-op")
    val m = ids(root)
    assert(m.size == 40 && m.values.toSet.size == 40, "ids must be unique")
    assert(m.values.min == 0 && m.values.max == 39, "bases cover [0, rows)")
    // plain reads never see the machinery
    assert(ST.read(spark, root).columns.toSeq == Seq("k", "v"))
    // appends get fresh ranges above the mark; resident ids unchanged
    val before = ids(root)
    graft.streaming.SnapshotSink.appendBatch(root,
      Seq((100L, 1.0), (101L, 2.0)).toDF("k", "v"), batchId = 0L, keyCol = "k")
    val after = ids(root)
    assert(before.forall { case (k, id) => after(k) == id }, "append moved ids")
    assert(Seq(100L, 101L).map(after).forall(_ >= 40L), "fresh ids below the mark")
  }

  test("DELETE preserves ids on both paths: DV (ordinals) and CoW (materialized)") {
    val root = fresh("del")
    ST.enableDeletionVectors(root)
    val before = ids(root)
    // sparse delete → DV sidecar, zero data movement, ids by ordinal
    ST.delete(spark, root, "k = 7")
    val m1 = ids(root)
    assert(!m1.contains(7L) && m1.size == 39)
    assert(m1.forall { case (k, id) => before(k) == id }, "DV delete moved ids")
    // wide delete → CoW rewrite; survivors' ids materialize
    ST.delete(spark, root, "k <= 20")
    val meta = ST.manifestMeta(root, ST.currentVersion(root))
    assert(meta("delete").startsWith("cow:"), meta.get("delete").toString)
    val m2 = ids(root)
    assert(m2.keySet == (21L to 40L).toSet)
    assert(m2.forall { case (k, id) => before(k) == id }, "CoW delete moved ids")
  }

  test("UPDATE keeps every id (hits and survivors); MoR-update falls back to CoW under tracking") {
    val root = fresh("upd")
    ST.enableDeletionVectors(root)
    val before = ids(root)
    ST.update(spark, root, Seq("v" -> "v + 100.0"), "k % 5 = 0")
    val meta = ST.manifestMeta(root, ST.currentVersion(root))
    assert(meta("update").startsWith("cow:"),
      s"row-tracked UPDATE must be copy-on-write, got ${meta.get("update")}")
    val rows = ST.readWithRowIds(spark, root).select("k", "v", "_row_id")
      .as[(Long, Double, Long)].collect()
    assert(rows.length == 40)
    rows.foreach { case (k, v, id) =>
      assert(id == before(k), s"row $k changed id")
      assert(v == (if (k % 5 == 0) k + 100.0 else k * 1.0), s"row $k value $v")
    }
    // a second update over the MIXED layout (materialized + base files)
    ST.update(spark, root, Seq("v" -> "v + 1000.0"), "k = 3")
    val m2 = ids(root)
    assert(m2.forall { case (k, id) => before(k) == id }, "second update moved ids")
  }

  test("MERGE: updates inherit the replaced row's id, inserts mint fresh, deletes retire") {
    val root = fresh("merge")
    val before = ids(root)
    val hw = ST.manifestMeta(root, ST.currentVersion(root))("rowhw").toLong
    val changes = Seq(
      (5L, 555.0, "u"), (6L, 666.0, "u"), (41L, 41.0, "i"), (10L, 0.0, "d"))
      .toDF("k", "v", "op")
    ST.merge(spark, root, clusterCol = "k", idCol = "k", changes = changes)
    val m = ids(root)
    assert(m.size == 40) // 40 - 1 delete + 1 insert
    assert(m(5L) == before(5L) && m(6L) == before(6L), "update must keep the id")
    assert(!m.contains(10L))
    assert(m(41L) >= hw, s"insert id ${m(41L)} below the old mark $hw")
    (1L to 40L).filterNot(k => Seq(5L, 6L, 10L, 41L).contains(k)).foreach(k =>
      assert(m(k) == before(k), s"untouched row $k moved"))
    val vals = ST.read(spark, root).filter("k in (5, 6, 41)")
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(vals == Map(5L -> 555.0, 6L -> 666.0, 41L -> 41.0), vals.toString)
    // a changeset smuggling its own __row_id refuses — the engine owns ids
    val e = intercept[Exception](ST.merge(spark, root, clusterCol = "k",
      idCol = "k", changes = Seq((50L, 1.0, 7L, "i"))
        .toDF("k", "v", "__row_id", "op")))
    assert(e.getMessage.contains("assigned by the engine"), e.getMessage)
  }

  test("OPTIMIZE (full and scoped) compacts without re-identifying a single row") {
    val root = fresh("opt", n = 60L, files = 6)
    ST.delete(spark, root, "k = 30") // mix a materialized file in
    val before = ids(root)
    ST.optimizeClusteredWhere(spark, root, "k", 1L, 20L, targetFiles = 1)
    val m1 = ids(root)
    assert(m1 == before, "scoped optimize re-identified rows")
    ST.optimizeClustered(spark, root, "k", targetFiles = 2)
    val m2 = ids(root)
    assert(m2 == before, "full optimize re-identified rows")
    // the materialized table still hides the machinery and keeps stats
    assert(ST.read(spark, root).columns.toSeq == Seq("k", "v"))
    assert(ST.manifestMeta(root, ST.currentVersion(root)).contains("colmap"),
      "the hiding mapping must survive materialization")
    // and a post-optimize append still mints fresh, non-colliding ids
    graft.streaming.SnapshotSink.appendBatch(root,
      Seq((200L, 1.0)).toDF("k", "v"), batchId = 0L, keyCol = "k")
    val m3 = ids(root)
    assert(m3(200L) > m2.values.max, "fresh id collided after optimize")
  }

  test("interop: widen + row-CDF + generated columns compose with tracking") {
    val root = fresh("interop")
    ST.setTableFlags(root, Map("cdf" -> "row"))
    ST.setGeneratedColumn(spark, root, "v", "CAST(k AS DOUBLE)")
    val before = ids(root)
    // an UPDATE under ALL the machinery at once: gen recompute (k is
    // not SET so v re-derives to itself), row-grain CDC images, id
    // materialization — ids stable, values right, feed readable
    ST.update(spark, root, Seq("k" -> "k + 1000"), "k = 39")
    // wait: k is the stats/cluster col — SET on it is allowed for
    // UPDATE (only merge refuses); the row re-derives v = k + 1000
    val rows = ST.readWithRowIds(spark, root).select("k", "v", "_row_id")
      .as[(Long, Double, Long)].collect().map { case (k, v, id) => (k, (v, id)) }.toMap
    assert(rows.contains(1039L) && rows(1039L)._1 == 1039.0)
    assert(rows(1039L)._2 == before(39L), "updated row changed id")
    before.filterNot(_._1 == 39L).foreach { case (k, id) =>
      assert(rows(k)._2 == id, s"row $k moved") }
    // the row-grain feed still reads (the CDC files carry __row_id
    // inertly; the feed projects its own columns)
    val feed = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("afterVersion",
        (ST.currentVersion(root) - 1).toString).load(root)
    val types = feed.select("_change_type").as[String].collect().sorted
    assert(types.toSeq == Seq("update_postimage", "update_preimage"), types.toSeq)
    // widen the value column: mixed widths + mixed id layouts read
    ST.widenColumn(spark, root, "k", org.apache.spark.sql.types.LongType) // no-op (already long)
    val m2 = ids(root)
    assert(m2.values.toSet.size == m2.size)
  }

  test("racing appends assign disjoint fresh ranges (CAS serializes the mark)") {
    import graft.sources.{SnapshotCommit, SnapshotFileCommit}
    val root = fresh("race")
    val hw0 = ST.manifestMeta(root, ST.currentVersion(root))("rowhw").toLong
    // two independent writers stage files, then race their commits —
    // the CAS loser re-reads the winner's high-water mark, so the two
    // fresh ranges cannot overlap
    val relA = ST.writeDataFiles(Seq((201L, 1.0)).toDF("k", "v").coalesce(1), root, "ra").head
    val relB = ST.writeDataFiles(Seq((202L, 2.0), (203L, 3.0)).toDF("k", "v")
      .coalesce(1), root, "rb").head
    val t1 = new Thread(() => SnapshotCommit.append(root, Array(SnapshotFileCommit(relA)), Map.empty))
    val t2 = new Thread(() => SnapshotCommit.append(root, Array(SnapshotFileCommit(relB)), Map.empty))
    t1.start(); t2.start(); t1.join(); t2.join()
    val m = ids(root)
    assert(m.size == 43 && m.values.toSet.size == 43, "id collision under race")
    assert(Seq(201L, 202L, 203L).map(m).forall(_ >= hw0))
    assert(ST.manifestMeta(root, ST.currentVersion(root))("rowhw").toLong == hw0 + 3)
  }

  test("clone and restore carry identities; reserved name refused") {
    val root = fresh("clone_src")
    val before = ids(root)
    val dst = Engine.tmpDir("graft_rt_clone_dst")
    Engine.listDir(Paths.get(dst)).foreach(Engine.deleteRecursively)
    ST.shallowClone(root, dst)
    assert(ids(dst) == before, "clone changed identities")
    // restore past a delete brings rows back under their OLD ids
    val vKeep = ST.currentVersion(root)
    ST.delete(spark, root, "k <= 10")
    ST.restore(root, vKeep)
    assert(ids(root) == before, "restore changed identities")
    val e = intercept[Exception](ST.renameColumn(spark, root, "v", "__row_id"))
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }
}
