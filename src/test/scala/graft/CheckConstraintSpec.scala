package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x38's refusal matrix: CHECK constraints must refuse a violating
  * write on EVERY route — DSv2 INSERT (per-row task checker), MERGE
  * (ansi + changeset), UPDATE (CoW + MoR), the streaming sink — and
  * ADD CONSTRAINT itself must refuse when the resident data already
  * violates. NULL evaluates as PASS (SQL's three-valued CHECK). */
class CheckConstraintSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  private def fresh(name: String, rows: Seq[(Long, Double)]): String = {
    val root = Engine.tmpDir(name)
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles(rows.toDF("k", "v").coalesce(1), root, "a")
        .map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    root
  }

  test("ADD validates resident data; metadata-only; carried; dropped cleanly") {
    val root = fresh("graft_chk_add", (1L to 6L).map(k => (k, k * 1.0)))
    // a constraint the data violates refuses with the witness row
    val e = intercept[Exception](
      ST.addCheckConstraint(spark, root, "v_big", "v > 3"))
    assert(e.getMessage.contains("existing row violates"), e.getMessage)
    assert(ST.currentVersion(root) == 1, "refused ADD must not mint a version")
    // a holding constraint commits metadata only — zero data files move
    val filesBefore = ST.manifestEntries(root, 1).map(_.rel)
    val v2 = ST.addCheckConstraint(spark, root, "v_pos", "v > 0")
    assert(ST.manifestEntries(root, v2).map(_.rel) == filesBefore)
    assert(ST.checkConstraints(root, v2) == Map("v_pos" -> "v > 0"))
    assert(ST.manifestMeta(root, v2)("writerFeatures").split(',').contains("checks"))
    // carried across an unrelated commit; SQL DROP removes it
    ST.delete(spark, root, "k = 6")
    assert(ST.checkConstraints(root, ST.currentVersion(root)).contains("v_pos"))
    spark.sql(s"ALTER TABLE '$root' DROP CONSTRAINT v_pos").collect()
    assert(ST.checkConstraints(root, ST.currentVersion(root)).isEmpty)
    val e2 = intercept[Exception](ST.dropCheckConstraint(root, "v_pos"))
    assert(e2.getMessage.contains("no constraint"), e2.getMessage)
  }

  test("DSv2 INSERT refuses a violating row in-task; valid rows land; NULL passes") {
    val w = Files.createTempDirectory("graft_chk_ins").toString
    spark.conf.set("spark.sql.catalog.gchk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gchk.root", w)
    spark.sql("CREATE TABLE gchk.t (k BIGINT, v DOUBLE)")
    // the seeding batch carries a NULL so v lands parquet-OPTIONAL
    // (a REQUIRED column would refuse NULLs as NOT NULL before the
    // CHECK even runs — that contract has its own spec)
    spark.sql("INSERT INTO gchk.t VALUES (1, 1.0), (2, NULL)")
    val root = Paths.get(w, "t").toString
    spark.sql(s"ALTER TABLE '$root' ADD CONSTRAINT v_pos CHECK (v > 0)")
    val vBefore = ST.currentVersion(root)
    val e = intercept[Exception](
      spark.sql("INSERT INTO gchk.t VALUES (2, 2.0), (3, -3.0)").collect())
    assert(chain(e).contains("v_pos"), chain(e))
    assert(ST.currentVersion(root) == vBefore,
      "violating INSERT must not commit a version")
    assert(ST.read(spark, root).count() == 2, "violating INSERT leaked rows")
    // NULL passes (three-valued CHECK), valid rows land
    spark.sql("INSERT INTO gchk.t VALUES (4, 4.0), (5, NULL)")
    assert(ST.read(spark, root).count() == 4)
    // the catalog TBLPROPERTIES spelling works and validates resident data
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gchk.t SET TBLPROPERTIES ('check.v_cap' = 'v < 2')").collect())
    assert(chain(e2).contains("existing row violates"), chain(e2))
    spark.sql("ALTER TABLE gchk.t SET TBLPROPERTIES ('check.k_pos' = 'k > 0')")
    assert(ST.checkConstraints(root, ST.currentVersion(root)).contains("k_pos"))
    spark.sql("ALTER TABLE gchk.t UNSET TBLPROPERTIES ('check.k_pos')")
    assert(!ST.checkConstraints(root, ST.currentVersion(root)).contains("k_pos"))
  }

  test("MERGE and UPDATE refuse rows their changes drive out of the constraint") {
    val root = fresh("graft_chk_dml", (1L to 20L).map(k => (k, k * 1.0)))
    ST.addCheckConstraint(spark, root, "v_pos", "v > 0")
    val vBase = ST.currentVersion(root)
    // changeset merge: an insert violating the constraint refuses
    val badIns = Seq((99L, -1.0, "i")).toDF("k", "v", "op")
    val e1 = intercept[Exception](ST.merge(spark, root, "k", "k", badIns))
    assert(chain(e1).contains("v_pos"), chain(e1))
    // ansi merge: an UPDATE SET that goes negative refuses
    Seq((2L, 5.0)).toDF("k", "delta").createOrReplaceTempView("chk_src")
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING chk_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = t.v - 100""").collect())
    assert(chain(e2).contains("v_pos"), chain(e2))
    // SQL UPDATE (CoW): a SET driving rows negative refuses; an
    // in-constraint SET commits
    val e3 = intercept[Exception](spark.sql(
      s"UPDATE '$root' SET v = v - 100 WHERE k <= 2").collect())
    assert(chain(e3).contains("v_pos"), chain(e3))
    assert(ST.currentVersion(root) == vBase, "refused DML must not commit")
    spark.sql(s"UPDATE '$root' SET v = v + 1 WHERE k <= 2").collect()
    assert(ST.read(spark, root).filter(col("k") === 1).head().getDouble(1) == 2.0)
    // MoR UPDATE (dvmode): the postimage write enforces the same way
    ST.setTableFlags(root, Map("dvmode" -> "on"))
    val e4 = intercept[Exception](spark.sql(
      s"UPDATE '$root' SET v = -5 WHERE k = 7").collect())
    assert(chain(e4).contains("v_pos"), chain(e4))
    spark.sql(s"UPDATE '$root' SET v = v + 10 WHERE k = 7").collect()
    assert(ST.manifestMeta(root, ST.currentVersion(root))("update").startsWith("mor:"))
    assert(ST.read(spark, root).filter(col("k") === 7).head().getDouble(1) == 17.0)
  }

  test("DSv2 writeStream enforces per row; a violating epoch fails, valid epochs land") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val root = Engine.tmpDir("graft_chk_wstream")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // seed the table (nullable v via a None row) + constraint
    val seed = Seq((1L, Some(1.0)), (2L, None)).toDF("k", "v")
    seed.write.format("graft-snapshot").mode("append")
      .option("statsCol", "k").save(root)
    ST.addCheckConstraint(spark, root, "v_pos", "v > 0")
    implicit val sctx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_chk_ws").toString
    def start() = in.toDF().toDF("k", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(root)
    // a valid epoch lands through the per-row checker
    in.addData((3L, 3.0))
    val q1 = start(); q1.awaitTermination()
    assert(ST.read(spark, root).count() == 3)
    // a violating epoch fails the write job — no version mints
    val vBefore = ST.currentVersion(root)
    in.addData((4L, -4.0))
    val e = intercept[Exception] { val q2 = start(); q2.awaitTermination() }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("v_pos"))), e.getMessage)
    assert(ST.currentVersion(root) == vBefore,
      "violating streaming epoch must not commit")
    assert(ST.read(spark, root).count() == 3)
  }

  test("streaming sink enforces per batch; nothing commits for a violating batch") {
    val SS = graft.streaming.SnapshotSink
    val root = Engine.tmpDir("graft_chk_sink")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    def batch(rows: (Long, Long)*) = rows.toSeq.toDF("ep_day", "value_micros")
    assert(SS.appendBatch(root, batch((1L, 10L), (2L, 20L)), batchId = 0L))
    ST.addCheckConstraint(spark, root, "vm_pos", "value_micros > 0")
    val vBase = ST.currentVersion(root)
    val e = intercept[Exception](
      SS.appendBatch(root, batch((3L, -30L)), batchId = 1L))
    assert(chain(e).contains("vm_pos"), chain(e))
    assert(ST.currentVersion(root) == vBase,
      "violating batch must not commit — replay stays possible")
    // the same batch id, corrected, still lands (exactly-once intact)
    assert(SS.appendBatch(root, batch((3L, 30L)), batchId = 1L))
    assert(ST.read(spark, root).count() == 3)
  }

  test("a commit planned before a racing ADD CONSTRAINT aborts instead of bypassing it (r14 review)") {
    import graft.sources.{SnapshotCommit, SnapshotFileCommit}
    val root = fresh("graft_chk_race", (1L to 4L).map(k => (k, k * 1.0)))
    // stage a data file the way a DSv2 task would, with rows that
    // VIOLATE the constraint about to land — the planned-checks
    // snapshot (empty: no constraint at plan time) rode the write
    val rel = ST.writeDataFiles(Seq((9L, -9.0)).toDF("k", "v").coalesce(1),
      root, "race").head
    // the racing ADD CONSTRAINT lands first (validating only ITS
    // resident data, which passes)
    ST.addCheckConstraint(spark, root, "v_pos", "v > 0")
    // the in-flight commit must abort loudly — its rows were never
    // validated against the new constraint set
    val e = intercept[IllegalStateException](
      SnapshotCommit.append(root,
        Array(SnapshotFileCommit(rel)), Map.empty, plannedChecks = Map.empty))
    assert(e.getMessage.contains("CHECK constraints") &&
      e.getMessage.contains("changed while this write"), e.getMessage)
    // nothing committed; the violating file stays unreferenced garbage
    assert(ST.read(spark, root).count() == 4)
    // a commit planned WITH the current constraint set sails through
    val rel2 = ST.writeDataFiles(Seq((10L, 10.0)).toDF("k", "v").coalesce(1),
      root, "race2").head
    SnapshotCommit.append(root, Array(SnapshotFileCommit(rel2)), Map.empty,
      plannedChecks = Map("v_pos" -> "v > 0"))
    assert(ST.read(spark, root).count() == 5)
  }

  test("RENAME/DROP COLUMN refuse while a CHECK constraint references the column") {
    val root = fresh("graft_chk_evolve", (1L to 4L).map(k => (k, k * 1.0)))
    ST.addCheckConstraint(spark, root, "v_pos", "v > 0")
    val e1 = intercept[Exception](ST.renameColumn(spark, root, "v", "score"))
    assert(e1.getMessage.contains("referenced by CHECK constraint v_pos"), e1.getMessage)
    val e2 = intercept[Exception](ST.dropColumn(spark, root, "v"))
    assert(e2.getMessage.contains("referenced by CHECK constraint v_pos"), e2.getMessage)
    // an UNreferenced column still evolves freely (parsed references,
    // not substring matches: constraint on v must not block k)
    assert(ST.renameColumn(spark, root, "k", "key") > 0)
    // after DROP CONSTRAINT the rename goes through
    ST.dropCheckConstraint(root, "v_pos")
    assert(ST.renameColumn(spark, root, "v", "score") > 0)
    assert(ST.read(spark, root).columns.toSeq == Seq("key", "score"))
  }

  test("RESTORE refuses a version violating an active constraint; clones carry constraints") {
    import spark.implicits._
    val root = fresh("graft_chk_restore", Seq((1L, 1.0), (9L, -9.0)))
    spark.sql(s"DELETE FROM '$root' WHERE v < 0").collect()          // v2
    ST.addCheckConstraint(spark, root, "v_pos", "v > 0")             // v3
    // restoring to v1 would resurrect the violating row under the
    // active constraint — refuse (version AND timestamp spellings)
    val e1 = intercept[Exception](ST.restore(root, 1))
    assert(e1.getMessage.contains("ACTIVE check constraint v_pos"), e1.getMessage)
    val e2 = intercept[Exception](
      ST.restoreToTimestamp(root, ST.commitTimeMillis(root, 1)))
    assert(e2.getMessage.contains("ACTIVE check constraint"), e2.getMessage)
    // restoring to a SATISFYING version works
    assert(ST.restore(root, 2) > 0)
    assert(ST.read(spark, root).count() == 1)
    // after DROP CONSTRAINT the v1 restore goes through
    ST.dropCheckConstraint(root, "v_pos")
    ST.restore(root, 1)
    assert(ST.read(spark, root).count() == 2)
    // a SHALLOW CLONE carries the source's constraints and enforces
    // them on its own writes
    val src = fresh("graft_chk_clone_src", Seq((1L, 1.0)))
    ST.addCheckConstraint(spark, src, "v_pos", "v > 0")
    val dst = Engine.tmpDir("graft_chk_clone_dst")
    Engine.listDir(Paths.get(dst)).foreach(Engine.deleteRecursively)
    ST.shallowClone(src, dst)
    assert(ST.checkConstraints(dst, ST.currentVersion(dst)) == Map("v_pos" -> "v > 0"))
    val e3 = intercept[Exception](ST.merge(spark, dst, "k", "k",
      Seq((5L, -5.0, "i")).toDF("k", "v", "op")))
    assert(chain(e3).contains("v_pos"), chain(e3))
  }

  test("path-SQL grammar: ADD/DROP CONSTRAINT routing and name validation") {
    val root = fresh("graft_chk_sql", (1L to 4L).map(k => (k, k * 1.0)))
    spark.sql(s"ALTER TABLE '$root' ADD CONSTRAINT c1 CHECK (v > 0 AND k > 0)")
    assert(ST.checkConstraints(root, ST.currentVersion(root))("c1") ==
      "v > 0 AND k > 0")
    // duplicate name refuses; delimiter-hostile names refuse
    val e1 = intercept[Exception](
      ST.addCheckConstraint(spark, root, "c1", "v > 0"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[Exception](
      ST.addCheckConstraint(spark, root, "a=b", "v > 0"))
    assert(e2.getMessage.contains("manifest-delimiter"), e2.getMessage)
    // non-graft ALTERs fall through to Spark's parser untouched
    val e3 = intercept[Exception](
      spark.sql("ALTER TABLE nosuch.tbl ADD CONSTRAINT x CHECK (a > 0)").collect())
    assert(!chain(e3).contains("graft-snapshot SQL"), chain(e3))
  }
}
