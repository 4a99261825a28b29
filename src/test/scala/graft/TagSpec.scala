package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named refs (Iceberg-style TAGS): `CREATE TAG <name> [AS OF VERSION
  * n]` pins a snapshot against VACUUM and makes it addressable by name
  * on every read route; DROP TAG ends the protection. Tags are table
  * state — carried by every commit, writer-feature-stamped, surviving
  * RESTORE, deliberately NOT carried into clones. */
class TagSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  /** v1 = ks 1..10 in file A; v2 REPLACES it with ks 11..20 in file B —
    * so v1's data file is reachable ONLY through v1's manifest and a
    * tag is the only thing standing between it and VACUUM. */
  private def fresh(name: String): (String, String) = {
    val root = Engine.tmpDir(s"graft_tag_$name")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val relA = ST.writeDataFile((1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v"),
      root, "a")
    ST.commitEntries(root, 0, Seq(ST.footerEntry(root, relA, "k")), 4,
      Map("statsCol" -> "k"))
    val relB = ST.writeDataFile((11L to 20L).map(k => (k, k * 1.0)).toDF("k", "v"),
      root, "b")
    ST.commitEntries(root, 1, Seq(ST.footerEntry(root, relB, "k")), 4)
    (root, relA)
  }

  test("tag resolves on every read route and equals the version read") {
    val (root, _) = fresh("routes")
    spark.sql(s"ALTER TABLE '$root' CREATE TAG first AS OF VERSION 1").collect()
    val want = (1L to 10L).map(k => k -> k * 1.0).toMap
    assert(ST.readTag(spark, root, "first").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap == want)
    assert(spark.read.format("graft-snapshot").option("version", "first")
      .load(root).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == want)
    // numeric strings keep working through the same resolver
    assert(spark.read.format("graft-snapshot").option("version", "1")
      .load(root).count() == 10)
    // a bare CREATE TAG pins the CURRENT version
    ST.createTag(root, "head")
    assert(ST.readTag(spark, root, "head").collect()
      .map(r => r.getLong(0)).toSet == (11L to 20L).toSet)
  }

  test("catalog route: VERSION AS OF '<tag>' time-travels by name") {
    val w = Files.createTempDirectory("graft_tag_wh").toString
    spark.conf.set("spark.sql.catalog.gtag", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtag.root", w)
    spark.sql("CREATE TABLE gtag.evts AS SELECT 1L AS k, CAST(1.0 AS DOUBLE) AS v")
    spark.sql("INSERT INTO gtag.evts VALUES (2, 2.0)")
    val root = s"$w/evts"
    spark.sql(s"ALTER TABLE '$root' CREATE TAG seed AS OF VERSION 1").collect()
    assert(spark.sql("SELECT k FROM gtag.evts VERSION AS OF 'seed'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT count(*) FROM gtag.evts").head().getLong(0) == 2)
    // unknown ref through the catalog refuses with the tag inventory
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gtag.evts VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("unknown version or tag"), e.getMessage)
  }

  test("tags carry across commits and survive RESTORE; clones never inherit") {
    val (root, _) = fresh("carry")
    ST.createTag(root, "first", Some(1))
    val relC = ST.writeDataFile(Seq((21L, 21.0)).toDF("k", "v"), root, "c")
    val vNow = ST.currentVersion(root)
    ST.commitEntries(root, vNow,
      Seq(ST.footerEntry(root, relC, "k")), 4, ST.carriedMeta(root, vNow))
    assert(ST.resolveVersionRef(root, "first") == 1, "tag lost across a commit")
    spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF 2").collect()
    assert(ST.resolveVersionRef(root, "first") == 1, "tag lost across RESTORE")
    val clone = Engine.tmpDir("graft_tag_clone")
    Engine.listDir(Paths.get(clone)).foreach(Engine.deleteRecursively)
    ST.shallowClone(root, clone, None)
    val e = intercept[IllegalArgumentException](ST.resolveVersionRef(clone, "first"))
    assert(e.getMessage.contains("unknown version or tag"),
      "a clone renumbers history — a carried tag would point at the wrong snapshot")
  }

  test("VACUUM flows around a tagged version; DROP TAG ends the protection") {
    val (root, relA) = fresh("vacuum")
    spark.sql(s"ALTER TABLE '$root' CREATE TAG keepme AS OF VERSION 1").collect()
    val vTag = ST.currentVersion(root) // the tag commit itself
    spark.sql(s"VACUUM '$root' KEEP FROM $vTag").collect()
    // v1's manifest AND its only-reachable-from-v1 data file both stay
    assert(ST.readTag(spark, root, "keepme").count() == 10,
      "tagged snapshot no longer readable after VACUUM")
    assert(Files.exists(Paths.get(root, relA)), "tagged version's file reclaimed")
    // dry run agrees with the real vacuum: nothing tagged is listed
    assert(!spark.sql(s"VACUUM '$root' KEEP FROM $vTag DRY RUN").collect()
      .map(_.getString(0)).exists(p => p.contains(relA) || p == "manifest/v1.txt"))
    spark.sql(s"ALTER TABLE '$root' DROP TAG keepme").collect()
    val vDrop = ST.currentVersion(root)
    spark.sql(s"VACUUM '$root' KEEP FROM $vDrop").collect()
    assert(!Files.exists(Paths.get(root, relA)),
      "file of the un-tagged version survived the post-drop VACUUM")
    val e = intercept[IllegalArgumentException](ST.readTag(spark, root, "keepme"))
    assert(e.getMessage.contains("unknown version or tag"))
  }

  test("refusals: re-point, unknown drop, bad name, out-of-range version") {
    val (root, _) = fresh("refuse")
    ST.createTag(root, "t", Some(1))
    // idempotent same-target create is a no-op, not an error
    val v = ST.currentVersion(root)
    assert(ST.createTag(root, "t", Some(1)) == v)
    assert(intercept[IllegalArgumentException](ST.createTag(root, "t", Some(2)))
      .getMessage.contains("already points"))
    assert(intercept[IllegalArgumentException](ST.dropTag(root, "ghost"))
      .getMessage.contains("no tag"))
    assert(intercept[IllegalArgumentException](ST.createTag(root, "bad name"))
      .getMessage.contains("tag name"))
    assert(intercept[IllegalArgumentException](ST.createTag(root, "v9", Some(9)))
      .getMessage.contains("not a committed version"))
  }

  test("RESTORE TO VERSION AS OF '<tag>' rolls back by name (both spellings)") {
    val (root, _) = fresh("restore")
    spark.sql(s"ALTER TABLE '$root' CREATE TAG good AS OF VERSION 1").collect()
    def ks = ST.read(spark, root).collect().map(_.getLong(0)).toSet
    assert(ks == (11L to 20L).toSet)
    spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF 'good'").collect()
    assert(ks == (1L to 10L).toSet, "quoted tag restore drifted")
    spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF 2").collect()
    assert(ks == (11L to 20L).toSet, "numeric restore broke")
    spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF good").collect()
    assert(ks == (1L to 10L).toSet, "bare tag restore drifted")
    // an unknown ref refuses with the tag inventory, never restores
    val e = intercept[Exception](
      spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF ghost").collect())
    assert(e.getMessage.contains("unknown version or tag"), e.getMessage)
    // CLONE speaks the same refs: a clone pinned by tag copies v1
    val clone = Engine.tmpDir("graft_tag_clone_by_tag")
    Engine.listDir(Paths.get(clone)).foreach(Engine.deleteRecursively)
    spark.sql(s"CREATE TABLE '$clone' SHALLOW CLONE '$root' VERSION AS OF 'good'")
      .collect()
    assert(ST.read(spark, clone).collect().map(_.getLong(0)).toSet ==
      (1L to 10L).toSet, "clone-by-tag did not pin the tagged snapshot")
  }

  test("SHOW TAGS lists live refs name-sorted; empties after drops") {
    val (root, _) = fresh("show")
    ST.createTag(root, "beta", Some(1))
    ST.createTag(root, "alpha", Some(2))
    assert(spark.sql(s"SHOW TAGS '$root'").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("alpha", 2), ("beta", 1)))
    ST.dropTag(root, "beta")
    assert(spark.sql(s"SHOW TAGS '$root'").collect()
      .map(_.getString(0)).toSeq == Seq("alpha"))
    // an untagged table lists zero rows, not an error
    ST.dropTag(root, "alpha")
    assert(spark.sql(s"SHOW TAGS '$root'").count() == 0)
  }

  test("vacuum RESURRECTS a version tagged in the residual window (r20 race closure)") {
    // the interleaving ADVICE r19 flagged: a CREATE TAG commits after
    // vacuum's final stable-ref read and passes its residency check
    // BEFORE the manifest delete — previously the tag dangled silently
    // once data died. Injected via the test seam: the tag meta commits
    // between the manifest deletes and vacuum's post-delete ref
    // re-read (exactly the state a fully-passed createTag leaves).
    val (root, relA) = fresh("rescue")
    val vNow = ST.currentVersion(root) // 2
    ST.vacuumWithHook(root, vNow, () => {
      // mimic a createTag of v1 that already passed CAS (its residency
      // check is not re-run — the point is vacuum must not need it)
      val v = ST.currentVersion(root)
      ST.commitEntries(root, v, ST.manifestEntries(root, v), 16,
        ST.carriedMeta(root, v) + ("tag.late" -> "1"))
    })
    // the tag survived AND its snapshot is fully resident: manifest
    // restored, data file spared, readable by name on every route
    assert(ST.resolveVersionRef(root, "late") == 1)
    assert(Files.exists(ST.manifestPath(root, 1)), "rescued manifest absent")
    assert(Files.exists(Paths.get(root, relA)), "rescued version's data reclaimed")
    assert(ST.readTag(spark, root, "late").count() == 10,
      "rescued snapshot unreadable")
    // and the rescue is not a leak: dropping the tag releases the
    // version to the next vacuum
    ST.dropTag(root, "late")
    ST.vacuum(root, ST.currentVersion(root))
    assert(!Files.exists(Paths.get(root, relA)),
      "un-tagged rescued version survived the next vacuum")
  }

  test("a crash between manifest and data deletes leaks nothing permanently") {
    // ADVICE r19 (low): manifests die first, so a crash mid-vacuum
    // strands data files no surviving manifest references. The next
    // vacuum's dead-set is computed by SUBTRACTION (everything on disk
    // minus everything referenced), so orphans are reclaimed then.
    val (root, relA) = fresh("crash")
    val vNow = ST.currentVersion(root)
    // simulate the crash: delete exactly what a vacuum interrupted
    // right after its first phase would have — the manifests
    Files.delete(ST.manifestPath(root, 1))
    assert(Files.exists(Paths.get(root, relA)), "precondition: data orphaned")
    // the re-run reclaims the orphan and the table stays readable
    ST.vacuum(root, vNow)
    assert(!Files.exists(Paths.get(root, relA)),
      "orphaned data file not reclaimed by the re-run")
    assert(ST.read(spark, root).count() == 10, "current version damaged")
  }

  test("tags stamp the writer feature; the stamp retires with the last tag") {
    val (root, _) = fresh("feature")
    ST.createTag(root, "t", Some(1))
    val v = ST.currentVersion(root)
    assert(ST.manifestMeta(root, v).get("writerFeatures")
      .exists(_.split(',').contains("tags")),
      ST.manifestMeta(root, v).toString)
    ST.dropTag(root, "t")
    val v2 = ST.currentVersion(root)
    assert(!ST.manifestMeta(root, v2).get("writerFeatures")
      .exists(_.split(',').contains("tags")),
      "tags writer feature must retire when no tags remain")
  }
}
