package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 features COMPOSED: column mapping × deletion vectors ×
  * row-grain CDF × restore/clone. Each feature's spec proves it alone;
  * this suite proves the combinations a real warehouse hits — rename
  * then point-delete, DV'd table renamed, CDC across both, restore
  * across all three. */
class FeatureInteropSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def fresh(name: String): String = {
    val root = Engine.tmpDir(s"graft_fi_$name")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rels = ST.writeDataFiles((1L to 40L).map(k => (k, s"t$k", k * 1.0))
      .toDF("k", "tag", "v").repartitionByRange(2, col("k")), root, "a")
      .map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, rels, 16,
      Map("statsCol" -> "k", "cdf" -> "row"))
    root
  }

  test("rename → DV delete under the NEW name → scan, CDF, and lookup all compose") {
    val root = fresh("cm_dv")
    ST.enableDeletionVectors(root)
    ST.renameColumn(spark, root, "v", "score")
    // the DELETE names the renamed column; sparse → DV path
    spark.sql(s"DELETE FROM '$root' WHERE score = 7.0").collect()
    val v = ST.currentVersion(root)
    assert(ST.manifestMeta(root, v)("delete").startsWith("dv:"),
      ST.manifestMeta(root, v).toString)
    // both scan routes resolve mapping AND skip the DV'd row
    assert(ST.read(spark, root).count() == 39)
    assert(ST.read(spark, root).filter(col("score") === 7.0).count() == 0)
    val dsv2 = spark.read.format("graft-snapshot").load(root)
    assert(dsv2.columns.toSeq == Seq("k", "tag", "score"))
    assert(dsv2.count() == 39 && dsv2.filter(col("k") === 7).count() == 0)
    // the CDC image carries the LOGICAL name through the feed
    val feed = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
      .filter(col("_commit_version") === v).collect()
    assert(feed.map(r => (r.getAs[String]("_change_type"),
      r.getAs[Long]("k"), r.getAs[Double]("score"))).toSet ==
      Set(("delete", 7L, 7.0)), feed.mkString(","))
    // point lookup under the mapping skips the DV'd key
    assert(ST.readPointLookup(spark, root, "k", Seq(7L)).count() == 0)
    assert(ST.readPointLookup(spark, root, "k", Seq(8L)).count() == 1)
  }

  test("DV first, rename after: the sidecar keys on ordinals, so the rename is free") {
    val root = fresh("dv_cm")
    ST.enableDeletionVectors(root)
    spark.sql(s"DELETE FROM '$root' WHERE k = 3").collect()
    ST.renameColumn(spark, root, "v", "score")
    ST.dropColumn(spark, root, "tag")
    assert(ST.read(spark, root).columns.toSeq == Seq("k", "score"))
    assert(ST.read(spark, root).count() == 39)
    assert(spark.read.format("graft-snapshot").load(root)
      .filter(col("k") === 3).count() == 0)
    // an UPDATE on the mapped + DV'd table applies the DV in its
    // rewrite (no resurrection) and retires the sidecar entry
    spark.sql(s"UPDATE '$root' SET score = score + 100 WHERE k <= 5").collect()
    val got = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(3L), "UPDATE resurrected a DV-deleted row")
    assert(got(2L) == 102.0 && got(10L) == 10.0 && got.size == 39)
    assert(ST.dvState(root, ST.currentVersion(root)).isEmpty)
    // the UPDATE's CDC pair: pre/post images for the 4 live hits only
    val vU = ST.currentVersion(root)
    val ups = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
      .filter(col("_commit_version") === vU).collect()
    val pre = ups.filter(_.getAs[String]("_change_type") == "update_preimage")
    assert(pre.map(_.getAs[Long]("k")).toSet == Set(1L, 2L, 4L, 5L),
      "CDC images must exclude the DV-deleted row")
  }

  test("RESTORE walks back across DV + rename + drop in one step; clone forks the stack") {
    val root = fresh("restore_stack")
    ST.enableDeletionVectors(root)              // v2
    spark.sql(s"DELETE FROM '$root' WHERE k = 9").collect() // v3 (dv)
    ST.renameColumn(spark, root, "v", "score")  // v4
    ST.dropColumn(spark, root, "tag")           // v5
    // clone the full stack: mapping + dv state both carry
    val cl = Engine.tmpDir("graft_fi_fork")
    Engine.listDir(Paths.get(cl)).foreach(Engine.deleteRecursively)
    ST.shallowClone(root, cl)
    assert(ST.read(spark, cl).columns.toSeq == Seq("k", "score"))
    assert(ST.read(spark, cl).count() == 39)
    // restore to v1: original names, all 40 rows, no dv, no mapping
    ST.restore(root, 1)
    assert(ST.read(spark, root).columns.toSeq == Seq("k", "tag", "v"))
    assert(ST.read(spark, root).count() == 40)
    assert(ST.dvState(root, ST.currentVersion(root)).isEmpty)
    assert(ST.colMap(root, ST.currentVersion(root)).isEmpty)
    // redo to v5: the whole stack comes back
    ST.restore(root, 5)
    assert(ST.read(spark, root).columns.toSeq == Seq("k", "score"))
    assert(ST.read(spark, root).count() == 39)
    // ...and the clone was never disturbed
    assert(ST.read(spark, cl).count() == 39)
  }

  test("SET TBLPROPERTIES is the SQL route into cdf/dvmode; unknown keys refuse") {
    val w = java.nio.file.Files.createTempDirectory("graft_fi_props").toString
    spark.conf.set("spark.sql.catalog.gfp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gfp.root", w)
    // one 40-row file, so a single-row delete sits under the DV cap
    (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v").coalesce(1)
      .createOrReplaceTempView("gfp_src")
    spark.sql("CREATE TABLE gfp.t AS SELECT * FROM gfp_src")
    spark.sql("ALTER TABLE gfp.t SET TBLPROPERTIES ('dvmode' = 'on', 'cdf' = 'row')")
    val root = Paths.get(w, "t").toString
    // re-running the SAME statement is a version no-op (idempotent)
    val vAfter = ST.currentVersion(root)
    spark.sql("ALTER TABLE gfp.t SET TBLPROPERTIES ('dvmode' = 'on', 'cdf' = 'row')")
    assert(ST.currentVersion(root) == vAfter, "re-SET minted a version")
    // the flags took: a sparse DELETE goes merge-on-read and registers
    // row-grain CDC
    spark.sql(s"DELETE FROM '$root' WHERE k = 5").collect()
    val v = ST.currentVersion(root)
    assert(ST.manifestMeta(root, v)("delete").startsWith("dv:"),
      ST.manifestMeta(root, v).toString)
    assert(ST.manifestMeta(root, v).contains("cdc"))
    assert(spark.table("gfp.t").count() == 39)
    // UNSET removes the flag: the next sparse delete is CoW again
    spark.sql("ALTER TABLE gfp.t UNSET TBLPROPERTIES ('dvmode')")
    spark.sql(s"DELETE FROM '$root' WHERE k = 6").collect()
    assert(ST.manifestMeta(root, ST.currentVersion(root))("delete")
      .startsWith("cow:"))
    // unknown keys and bad values refuse loudly
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE gfp.t SET TBLPROPERTIES ('nope' = 'x')"))
    assert(e1.getMessage.contains("unsupported table property"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gfp.t SET TBLPROPERTIES ('dvmode' = 'banana')"))
    assert(e2.getMessage.contains("takes"), e2.getMessage)
  }

  test("OPTIMIZE materializes mapping AND compacts DVs in one rewrite") {
    val root = fresh("optimize_all")
    ST.enableDeletionVectors(root)
    spark.sql(s"DELETE FROM '$root' WHERE k IN (2, 22)").collect()
    ST.renameColumn(spark, root, "v", "score")
    ST.dropColumn(spark, root, "tag")
    ST.optimizeClustered(spark, root, "k", targetFiles = 2)
    val v = ST.currentVersion(root)
    assert(ST.colMap(root, v).isEmpty && ST.dvState(root, v).isEmpty)
    // files physically carry the logical names, deleted rows gone,
    // dropped column purged
    val footer = spark.read.parquet(
      Paths.get(root, ST.manifestEntries(root, v).head.rel).toString)
    assert(footer.columns.toSeq == Seq("k", "score"))
    assert(ST.read(spark, root).count() == 38)
    // dvmode survives the rewrite: the NEXT sparse delete is DV again
    spark.sql(s"DELETE FROM '$root' WHERE k = 30").collect()
    assert(ST.manifestMeta(root, ST.currentVersion(root))("delete")
      .startsWith("dv:"))
  }

  test("r14: widen composes with rename, row-grain CDF, and DML over mixed widths") {
    import org.apache.spark.sql.types._
    val root = Engine.tmpDir("graft_fi_widen")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val df = (1 to 6).map(i => (i.toLong, i * 10)).toDF("k", "q")
      .withColumn("q", col("q").cast("int"))
    ST.commitEntries(root, 0,
      ST.writeDataFiles(df.coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      16, Map("statsCol" -> "k", "cdf" -> "row"))
    // rename FIRST, then widen the RENAMED column — widen must resolve
    // the logical name through the mapping to the physical capture
    ST.renameColumn(spark, root, "q", "qty")
    ST.widenColumn(spark, root, "qty", LongType)
    assert(ST.read(spark, root).schema("qty").dataType == LongType)
    // a 64-bit merge lands; the row-grain CDC images carry the WIDENED
    // type even though the preimages come from narrow int32 files
    ST.merge(spark, root, "k", "k",
      Seq((2L, 6000000000L, "u"), (100L, 7000000000L, "i")).toDF("k", "qty", "op"))
    val v = ST.currentVersion(root)
    val feed = spark.read.format("graft-snapshot").option("readChangeFeed", "true")
      .option("afterVersion", (v - 1).toString).load(root).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[Long]("qty"))).toSet
    assert(feed == Set(
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 6000000000L),
      ("insert", 100L, 7000000000L)), feed.toString)
    // mixed-width UPDATE through SQL under the RENAMED+WIDENED name
    spark.sql(s"UPDATE '$root' SET qty = qty + 1 WHERE k = 1").collect()
    assert(ST.read(spark, root).filter(col("k") === 1).head().getAs[Long]("qty") == 11L)
  }

  test("r14: scoped OPTIMIZE preserves colmap and untouched DVs; compacted DVs retire") {
    val root = fresh("optw")
    // rename + dvmode, then DV-delete one row in EACH file
    ST.renameColumn(spark, root, "v", "score")
    ST.enableDeletionVectors(root)
    ST.delete(spark, root, "k = 3")   // file 1 (k 1..20)
    ST.delete(spark, root, "k = 33")  // file 2 (k 21..40)
    val v0 = ST.currentVersion(root)
    assert(ST.dvState(root, v0).size == 2, ST.dvState(root, v0).toString)
    // compact ONLY the low window: file 1 rewrites (its DV applied and
    // retired), file 2 carries with its DV intact
    val v1 = ST.optimizeClusteredWhere(spark, root, "k", 1L, 20L, targetFiles = 1)
    val dv1 = ST.dvState(root, v1)
    assert(dv1.size == 1, s"untouched file's DV must survive: $dv1")
    // the mapping survives the partial rewrite (unlike the full form,
    // which materializes it)
    assert(ST.manifestMeta(root, v1).contains("colmap"))
    assert(ST.read(spark, root).columns.toSeq == Seq("k", "tag", "score"))
    // content: both deleted rows stay deleted
    assert(ST.read(spark, root).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 40L).filterNot(k => k == 3 || k == 33))
    // and the feed survives the change commit (scoped optimize is a
    // rewrite: file-grain delete+insert pairs cancel under the fold)
    val folded = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
      .withColumn("sgn", when(col("_change_type")
        .isin("insert", "update_postimage"), 1L).otherwise(-1L))
      .agg(sum(col("sgn"))).head().getLong(0)
    assert(folded == 38L, s"signed fold must equal the live row count: $folded")
  }
}
