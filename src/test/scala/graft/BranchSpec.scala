package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Writable refs (branches) + write-audit-publish: `CREATE BRANCH`
  * stages commits in a separate manifest namespace without moving
  * `_latest`; `FAST FORWARD BRANCH` publishes the staged state as one
  * main metadata commit (refusing if main advanced); `DROP BRANCH`
  * abandons it. Staged data files are vacuum-protected while the
  * branch lives and orphan-swept after. */
class BranchSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def fresh(name: String): String = {
    val root = Engine.tmpDir(s"graft_branch_$name")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rel = ST.writeDataFile((1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v"),
      root, "base")
    ST.commitEntries(root, 0, Seq(ST.footerEntry(root, rel, "k")), 4,
      Map("statsCol" -> "k"))
    root
  }

  test("stage on branch: main blind until FAST FORWARD publishes; branch retires") {
    val root = fresh("wap")
    spark.sql(s"ALTER TABLE '$root' CREATE BRANCH wap").collect()
    val vRef = ST.currentVersion(root)
    ST.appendToBranch(spark, root, "wap",
      (11L to 15L).map(k => (k, k * 1.0)).toDF("k", "v"))
    ST.appendToBranch(spark, root, "wap",
      (16L to 20L).map(k => (k, k * 1.0)).toDF("k", "v"))
    // SHOW BRANCHES lists the live ref with its base + staged count
    assert(spark.sql(s"SHOW BRANCHES '$root'").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq(("wap", 1, 2)))
    // main: still the base rows, still the ref-commit version
    assert(ST.read(spark, root).count() == 10, "staged rows leaked to main")
    assert(ST.currentVersion(root) == vRef, "_latest moved for a branch commit")
    // audit read: base + both staged appends
    assert(ST.readBranch(spark, root, "wap").collect()
      .map(_.getLong(0)).toSet == (1L to 20L).toSet)
    spark.sql(s"ALTER TABLE '$root' FAST FORWARD BRANCH wap").collect()
    assert(ST.read(spark, root).collect().map(_.getLong(0)).toSet ==
      (1L to 20L).toSet, "publish did not surface the staged rows")
    // the branch is fully retired: ref gone, manifests gone
    val cur = ST.currentVersion(root)
    assert(ST.branchesOf(ST.manifestMeta(root, cur)).isEmpty, "ref survived publish")
    assert(spark.sql(s"SHOW BRANCHES '$root'").count() == 0,
      "SHOW BRANCHES must empty after publish")
    assert(!Files.exists(ST.branchManifestPath(root, "wap", 1)),
      "branch manifest survived publish")
    // the publish commit carries its audit tag
    assert(ST.manifestMeta(root, cur).get("publish").contains("branch:wap:+2"))
    // ... and the audit is per-commit, never carried: a later commit
    // must not claim it published (r20 review — carriedMeta strips it)
    val rel2 = ST.writeDataFile(Seq((21L, 21.0)).toDF("k", "v"), root, "after")
    ST.commitEntries(root, cur,
      ST.manifestEntries(root, cur) :+ ST.footerEntry(root, rel2, "k"), 4,
      ST.carriedMeta(root, cur))
    assert(!ST.manifestMeta(root, ST.currentVersion(root)).contains("publish"),
      "publish audit carried into a later commit")
  }

  test("FAST FORWARD refuses when main advanced (the WAP conflict)") {
    val root = fresh("conflict")
    ST.createBranch(root, "b")
    ST.appendToBranch(spark, root, "b", Seq((11L, 11.0)).toDF("k", "v"))
    // a racing main commit
    val rel = ST.writeDataFile(Seq((99L, 99.0)).toDF("k", "v"), root, "racer")
    val v = ST.currentVersion(root)
    ST.commitEntries(root, v,
      ST.manifestEntries(root, v) :+ ST.footerEntry(root, rel, "k"), 4,
      ST.carriedMeta(root, v))
    val e = intercept[IllegalArgumentException](ST.fastForwardBranch(root, "b"))
    assert(e.getMessage.contains("main advanced"), e.getMessage)
    // the branch is untouched by the refusal — still auditable, still
    // droppable
    assert(ST.readBranch(spark, root, "b").count() == 11)
    ST.dropBranch(root, "b")
  }

  test("vacuum spares staged files while the branch lives; sweeps them after DROP") {
    val root = fresh("vac")
    ST.createBranch(root, "stage")
    ST.appendToBranch(spark, root, "stage", Seq((11L, 11.0)).toDF("k", "v"))
    val staged = ST.branchState(root, "stage")._1.map(_.rel)
      .filter(_.startsWith("data_br_stage"))
    assert(staged.nonEmpty, "fixture: no staged rel recorded")
    // vacuum to the current version: staged files must survive
    ST.vacuum(root, ST.currentVersion(root))
    staged.foreach(r => assert(Files.exists(Paths.get(root, r)),
      s"staged file $r reclaimed while branch lives"))
    assert(ST.readBranch(spark, root, "stage").count() == 11,
      "branch unreadable after vacuum")
    // DROP releases them to the next vacuum's orphan sweep
    ST.dropBranch(root, "stage")
    ST.vacuum(root, ST.currentVersion(root))
    staged.foreach(r => assert(!Files.exists(Paths.get(root, r)),
      s"dropped branch's staged file $r not swept"))
  }

  test("branch base is retention-exempt while the branch lives") {
    val root = fresh("exempt")
    ST.createBranch(root, "old", Some(1))
    val rel = ST.writeDataFile(Seq((50L, 50.0)).toDF("k", "v"), root, "adv")
    val v = ST.currentVersion(root)
    ST.commitEntries(root, v,
      ST.manifestEntries(root, v) :+ ST.footerEntry(root, rel, "k"), 4,
      ST.carriedMeta(root, v))
    ST.vacuum(root, ST.currentVersion(root))
    assert(Files.exists(ST.manifestPath(root, 1)),
      "branch base vacuumed away while the branch lives")
    ST.dropBranch(root, "old")
    ST.vacuum(root, ST.currentVersion(root))
    assert(!Files.exists(ST.manifestPath(root, 1)),
      "base survived vacuum after DROP BRANCH")
  }

  test("CHECK constraints enforce on branch appends; gen-column tables refuse") {
    val root = fresh("checks")
    spark.sql(s"ALTER TABLE '$root' ADD CONSTRAINT pos CHECK (k > 0)").collect()
    ST.createBranch(root, "b")
    val e = intercept[Exception](
      ST.appendToBranch(spark, root, "b", Seq((-1L, 1.0)).toDF("k", "v")))
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    assert(chain(e).contains("pos"), chain(e))
    // a valid staged row still publishes through the constraint
    ST.appendToBranch(spark, root, "b", Seq((11L, 11.0)).toDF("k", "v"))
    ST.fastForwardBranch(root, "b")
    assert(ST.read(spark, root).count() == 11)
    // generated-column tables refuse branch staging (r20 envelope)
    val root2 = fresh("gen")
    ST.setGeneratedColumn(spark, root2, "v", "k * 1.0")
    ST.createBranch(root2, "g")
    val e2 = intercept[IllegalArgumentException](
      ST.appendToBranch(spark, root2, "g", Seq((11L, 11.0)).toDF("k", "v")))
    assert(e2.getMessage.contains("GENERATED"), e2.getMessage)
  }

  test("refs share a namespace; writer feature stamps and retires; refusals") {
    val root = fresh("ns")
    ST.createTag(root, "shared", Some(1))
    assert(intercept[IllegalArgumentException](ST.createBranch(root, "shared"))
      .getMessage.contains("live TAG"))
    ST.createBranch(root, "b1")
    assert(intercept[IllegalArgumentException](ST.createTag(root, "b1"))
      .getMessage.contains("live BRANCH"))
    assert(intercept[IllegalArgumentException](ST.createBranch(root, "b1", Some(1)))
      .getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException](ST.dropBranch(root, "ghost"))
      .getMessage.contains("no branch"))
    // feature stamp while a branch lives, retired when the last drops
    val v1 = ST.currentVersion(root)
    assert(ST.manifestMeta(root, v1).get("writerFeatures")
      .exists(_.split(',').contains("branches")))
    ST.dropBranch(root, "b1")
    val v2 = ST.currentVersion(root)
    assert(!ST.manifestMeta(root, v2).get("writerFeatures")
      .exists(_.split(',').contains("branches")),
      "branches writer feature must retire with the last branch")
    // an idempotent re-create at the same base is a no-op
    ST.createBranch(root, "b2", Some(1))
    val vb = ST.currentVersion(root)
    assert(ST.createBranch(root, "b2", Some(1)) == vb)
  }

  test("DSv2 branch option: standard-reader audit read, pruning, agg fast path, refusals") {
    val root = fresh("dsv2")
    ST.createBranch(root, "b")
    ST.appendToBranch(spark, root, "b",
      (11L to 15L).map(k => (k, k * 1.0)).toDF("k", "v").coalesce(1))
    val df = spark.read.format("graft-snapshot").option("branch", "b").load(root)
    assert(df.collect().map(_.getLong(0)).toSet == (1L to 15L).toSet,
      "branch option must serve base + staged rows")
    // the zero-IO aggregate fast path answers from the BRANCH entries
    val cnt = df.groupBy().count()
    assert(cnt.queryExecution.executedPlan.toString.contains("from manifest"),
      "branch count(*) should be manifest-answered")
    assert(cnt.head().getLong(0) == 15)
    // stats pruning judges the staged files' own harvested ranges
    val scanned = {
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      val m = new java.util.HashMap[String, String]()
      m.put("branch", "b")
      val bld = new graft.sources.SnapshotScanBuilder(root, df.schema,
        new CaseInsensitiveStringMap(m))
      bld.pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 11L)))
      bld.build().toBatch.planInputPartitions().length
    }
    assert(scanned == 1, s"k>=11 should open only the staged file, got $scanned")
    // main stays blind through the plain route
    assert(spark.read.format("graft-snapshot").load(root).count() == 10)
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(intercept[Exception](spark.read.format("graft-snapshot")
      .option("branch", "b").option("version", "1").load(root)))
      .contains("conflict"))
    assert(chain(intercept[Exception](spark.read.format("graft-snapshot")
      .option("branch", "ghost").load(root).collect()))
      .contains("unknown branch"))
    assert(chain(intercept[Exception](Seq((99L, 9.0)).toDF("k", "v")
      .write.format("graft-snapshot").mode("append")
      .option("branch", "b").save(root)))
      .contains("appendToBranch"))
    ST.dropBranch(root, "b")
  }

  test("a dead committer's zero-byte branch slot is reclaimed; width mismatches refuse") {
    val root = fresh("stale")
    ST.createBranch(root, "b")
    // a crashed committer's corpse: claimed slot, never filled, old
    val corpse = ST.branchManifestPath(root, "b", 1)
    Files.createFile(corpse)
    Files.setLastModifiedTime(corpse,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - ST.StaleClaimMinAgeMs - 1000))
    // the append must reclaim the stale claim and land (pre-fix this
    // spun forever: head stayed 0, the slot never cleared)
    val got = ST.appendToBranch(spark, root, "b",
      Seq((11L, 11.0)).toDF("k", "v"))
    assert(got == 1, s"append landed at slot $got")
    assert(ST.readBranch(spark, root, "b").count() == 11)
    // width guard: a narrower frame refuses at staging with the diff
    val e = intercept[IllegalArgumentException](
      ST.appendToBranch(spark, root, "b", Seq(Tuple1(12L)).toDF("k")))
    assert(e.getMessage.contains("must equal"), e.getMessage)
    ST.dropBranch(root, "b")
  }

  test("an empty branch fast-forwards as a no-op and retires") {
    val root = fresh("empty")
    ST.createBranch(root, "noop")
    val vRef = ST.currentVersion(root)
    val v = ST.fastForwardBranch(root, "noop")
    assert(v == vRef, s"empty publish minted a content version: $v")
    assert(ST.branchesOf(ST.manifestMeta(root, ST.currentVersion(root))).isEmpty)
    assert(ST.read(spark, root).count() == 10)
  }
}
