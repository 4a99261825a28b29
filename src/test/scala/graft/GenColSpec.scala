package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x40's contract: GENERATED ALWAYS AS columns. Attach validates the
  * RESIDENT data and commits metadata-only (`gen.<col>` key, `gencols`
  * writer feature); every write route then enforces `col <=> (expr)`
  * per row through the CHECK-constraint seams; UPDATE recomputes the
  * column when a SET shifts its inputs (and refuses SET on the column
  * itself); the streaming sink and withGeneratedColumns compute the
  * column when an incoming frame omits it; clone/restore carry the
  * expression with the data. */
class GenColSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val Engine = graft.operators.Engine

  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  /** (k, ts-seconds, d = ts div 86400) — d consistent with its
    * derivation so the attach's resident validation passes. */
  private def fresh(name: String, ks: Seq[Long]): String = {
    val root = Engine.tmpDir(name)
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rows = ks.map(k => (k, k * 40000L, (k * 40000L) / 86400L))
    ST.commitEntries(root, 0,
      ST.writeDataFiles(rows.toDF("k", "ts", "d").coalesce(1), root, "a")
        .map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    root
  }

  test("attach validates resident data; metadata-only; feature-stamped; carried; dropped") {
    val root = fresh("graft_gen_add", 1L to 6L)
    // an expression the resident d values do NOT satisfy refuses
    val e = intercept[Exception](
      ST.setGeneratedColumn(spark, root, "d", "ts div 1000"))
    assert(e.getMessage.contains("existing row violates"), e.getMessage)
    assert(ST.currentVersion(root) == 1, "refused attach must not mint a version")
    // the true derivation commits metadata only — zero files move
    val filesBefore = ST.manifestEntries(root, 1).map(_.rel)
    val v2 = ST.setGeneratedColumn(spark, root, "d", "ts div 86400")
    assert(ST.manifestEntries(root, v2).map(_.rel) == filesBefore)
    assert(ST.genExprs(root, v2) == Map("d" -> "ts div 86400"))
    // the invariant surfaces through the constraint map (the seam
    // every write route enforces through)
    assert(ST.checkConstraints(root, v2) == Map("gen:d" -> "`d` <=> (ts div 86400)"))
    assert(ST.manifestMeta(root, v2)("writerFeatures").split(',').contains("gencols"))
    // carried across an unrelated commit
    ST.delete(spark, root, "k = 6")
    assert(ST.genExprs(root, ST.currentVersion(root)).contains("d"))
    // DROP CONSTRAINT cannot remove it; dropGeneratedExpr can
    val e2 = intercept[Exception](ST.dropCheckConstraint(root, "gen:d"))
    assert(e2.getMessage.contains("generated-column invariant"), e2.getMessage)
    ST.dropGeneratedExpr(root, "d")
    assert(ST.genExprs(root, ST.currentVersion(root)).isEmpty)
    val e3 = intercept[Exception](ST.dropGeneratedExpr(root, "d"))
    assert(e3.getMessage.contains("no generation expression"), e3.getMessage)
  }

  test("refusal matrix: self-ref, nondeterminism, unknown column, chains, evolution") {
    val root = fresh("graft_gen_refuse", 1L to 4L)
    def refuse(substr: String)(f: => Any): Unit = {
      val e = intercept[Exception](f)
      assert(chain(e).toLowerCase.contains(substr.toLowerCase), chain(e))
    }
    refuse("references the column itself")(
      ST.setGeneratedColumn(spark, root, "d", "d + 1"))
    refuse("non-deterministic")(
      ST.setGeneratedColumn(spark, root, "d", "CAST(rand() * 10 AS BIGINT)"))
    refuse("no column")(
      ST.setGeneratedColumn(spark, root, "nope", "ts div 86400"))
    ST.setGeneratedColumn(spark, root, "d", "ts div 86400")
    refuse("already generated")(
      ST.setGeneratedColumn(spark, root, "d", "ts div 86400"))
    // no chains in either direction: k may not derive FROM generated d,
    // and ts (an input of d) may not itself become generated
    refuse("references generated column d")(
      ST.setGeneratedColumn(spark, root, "k", "d * 2"))
    refuse("is an input of generated column d")(
      ST.setGeneratedColumn(spark, root, "ts", "k * 40000"))
    // evolving the derivation's columns out from under it refuses with
    // the generation-specific hint (both the input and the column)
    refuse("drop the generation expression first")(
      ST.renameColumn(spark, root, "ts", "t2"))
    refuse("drop the generation expression first")(
      ST.dropColumn(spark, root, "d"))
  }

  test("DSv2 INSERT verifies the derivation per row; UPDATE recomputes; SET on gen refuses") {
    val w = Files.createTempDirectory("graft_gen_dml").toString
    spark.conf.set("spark.sql.catalog.ggen", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggen.root", w)
    spark.sql("DROP TABLE IF EXISTS ggen.t")
    (1L to 8L).map(k => (k, k * 40000L, (k * 40000L) / 86400L))
      .toDF("k", "ts", "d").createOrReplaceTempView("gen_seed")
    spark.sql("CREATE TABLE ggen.t AS SELECT * FROM gen_seed")
    val root = Paths.get(w, "t").toString
    // the TBLPROPERTIES spelling (Delta's property route)
    spark.sql("ALTER TABLE ggen.t SET TBLPROPERTIES ('gen.d' = 'ts div 86400')")
    val vBefore = ST.currentVersion(root)
    // a drifted derivation fails the write job in-task; no version mints
    val e = intercept[Exception](
      spark.sql("INSERT INTO ggen.t VALUES (9, 360000, 99)").collect())
    assert(chain(e).contains("gen:d"), chain(e))
    assert(ST.currentVersion(root) == vBefore)
    // the consistent row lands
    spark.sql("INSERT INTO ggen.t VALUES (9, 360000, 4)")
    assert(ST.read(spark, root).count() == 9)
    // UPDATE shifting the INPUT recomputes d (no d in the SET list)
    spark.sql(s"UPDATE '$root' SET ts = ts + 86400 WHERE k <= 2")
    val got = ST.read(spark, root).filter("k <= 2")
      .select("k", "ts", "d").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.forall { case (_, ts, d) => d == ts / 86400 },
      got.mkString(","))
    assert(got.map(_._3).toSeq == Seq(1L, 1L), got.mkString(","))
    // SET on the generated column itself refuses
    val e2 = intercept[Exception](
      spark.sql(s"UPDATE '$root' SET d = 7 WHERE k = 3").collect())
    assert(chain(e2).contains("GENERATED ALWAYS AS"), chain(e2))
    // merge (changeset route) enforces too: an upsert with a drifted d
    val bad = Seq((10L, 400000L, 77L, "i")).toDF("k", "ts", "d", "op")
    val e3 = intercept[Exception](
      ST.merge(spark, root, clusterCol = "k", idCol = "k", changes = bad))
    assert(chain(e3).contains("gen:d"), chain(e3))
  }

  test("withGeneratedColumns computes omitted columns; streaming sink computes per batch") {
    val root = fresh("graft_gen_sink", 1L to 3L)
    ST.setGeneratedColumn(spark, root, "d", "ts div 86400")
    // helper: a frame lacking d gets it computed, cast, and ordered
    val df = Seq((11L, 950400L)).toDF("k", "ts")
    val out = ST.withGeneratedColumns(spark, root, df)
    assert(out.columns.toSeq == Seq("k", "ts", "d"), out.columns.mkString(","))
    assert(out.select("d").as[Long].head() == 11L)
    // a frame that CARRIES d passes through untouched (then verified)
    val carried = Seq((12L, 86400L, 1L)).toDF("k", "ts", "d")
    assert(ST.withGeneratedColumns(spark, root, carried).columns.toSeq ==
      Seq("k", "ts", "d"))
    // the sink: a batch WITHOUT the generated column lands computed
    val SS = graft.streaming.SnapshotSink
    assert(SS.appendBatch(root, Seq((21L, 172800L)).toDF("k", "ts"), batchId = 0L, keyCol = "k"))
    val row = ST.read(spark, root).filter("k = 21").select("d").as[Long].collect()
    assert(row.toSeq == Seq(2L), row.mkString(","))
    // and a batch with a DRIFTED value refuses; corrected replay lands
    val eb = intercept[Exception](
      SS.appendBatch(root, Seq((22L, 172800L, 9L)).toDF("k", "ts", "d"), batchId = 1L, keyCol = "k"))
    assert(chain(eb).contains("gen:d"), chain(eb))
    assert(SS.appendBatch(root, Seq((22L, 172800L, 2L)).toDF("k", "ts", "d"), batchId = 1L, keyCol = "k"))
    assert(ST.read(spark, root).count() == 5)
  }

  test("DSv2 INSERT computes omitted gen columns — route parity with the sink (r16)") {
    val root = fresh("graft_gen_dsv2fill", 1L to 3L)
    ST.setGeneratedColumn(spark, root, "d", "ts div 86400")
    // path-route batch append OMITTING d: the task writer derives it
    // exactly as the sink does (before r16 this failed analysis on the
    // gen:d invariant referencing a column the frame lacked)
    Seq((31L, 259200L)).toDF("k", "ts")
      .write.format("graft-snapshot").mode("append").save(root)
    val got = ST.read(spark, root).filter("k = 31")
      .select("k", "ts", "d").as[(Long, Long, Long)].head()
    assert(got == ((31L, 259200L, 3L)), got.toString)
    // the widened file sits uniformly beside residents: full reads on
    // both routes agree and the footer carries d
    val rel = ST.manifestEntries(root, ST.currentVersion(root))
      .map(_.rel).filterNot(ST.manifestEntries(root, 1).map(_.rel).toSet)
    rel.foreach(r => assert(spark.read.parquet(Paths.get(root, r).toString)
      .columns.toSeq == Seq("k", "ts", "d"), r))
    assert(spark.read.format("graft-snapshot").load(root)
      .filter("k = 31").select("d").as[Long].head() == 3L)
    // a frame carrying a DRIFTED d still refuses in-task (the widened
    // binding must not weaken the existing invariant route)
    val e = intercept[Exception](Seq((32L, 259200L, 9L)).toDF("k", "ts", "d")
      .write.format("graft-snapshot").mode("append").save(root))
    assert(chain(e).contains("gen:d"), chain(e))
    // a frame omitting the gen column AND its input refuses loudly at
    // plan time — nothing to derive from
    val e2 = intercept[Exception](Seq(Tuple1(33L)).toDF("k")
      .write.format("graft-snapshot").mode("append").save(root))
    assert(chain(e2).toLowerCase.contains("ts") ||
      chain(e2).toLowerCase.contains("resolve"), chain(e2))
  }

  test("derived-filter pruning: a filter on the gen INPUT prunes files on the stats column") {
    // five day files, statsCol = the GENERATED day column — the query
    // filters only `sec` (the input) and must still open few files
    val root = Engine.tmpDir("graft_gen_prune")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val entries = (0L to 4L).flatMap { day =>
      val rows = (0L until 20L).map(i => (day * 20 + i, day * 86400L + i * 60, day))
      ST.writeDataFiles(rows.toDF("k", "sec", "d").coalesce(1), root, s"day$day")
        .map(ST.footerEntry(root, _, "d"))
    }
    ST.commitEntries(root, 0, entries, 8, Map("statsCol" -> "d"))
    ST.setGeneratedColumn(spark, root, "d", "sec div 86400")
    def scanParts(df: org.apache.spark.sql.DataFrame): Int = {
      def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => go(a.initialPlan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.partitions.size
      }.sum
      go(df.queryExecution.executedPlan)
    }
    val base = spark.read.format("graft-snapshot").load(root)
    assert(scanParts(base.select("k")) == 5)
    // range on the INPUT → 2 of 5 files (days 2 and 3)
    val ranged = base.filter("sec >= 172800 AND sec < 345600")
    assert(scanParts(ranged) == 2, "input-range filter must prune via the derivation")
    assert(ranged.count() == 40)
    // point lookup on the INPUT → 1 file, and the residual filter
    // still prunes ROWS (file-level judgment only)
    val point = base.filter("sec = 259260")
    assert(scanParts(point) == 1)
    assert(point.select("k").as[Long].collect().toSeq == Seq(61L))
    // a NON-whitelisted derivation must not derive (and stays correct):
    // multiplication can overflow, so it never prunes
    val root2 = Engine.tmpDir("graft_gen_prune_neg")
    Engine.listDir(Paths.get(root2)).foreach(Engine.deleteRecursively)
    val e2 = (0L to 2L).flatMap { day =>
      val rows = (0L until 5L).map(i => (day * 5 + i, day * 86400L + i, day * 2))
      ST.writeDataFiles(rows.toDF("k", "sec", "d").coalesce(1), root2, s"n$day")
        .map(ST.footerEntry(root2, _, "d"))
    }
    ST.commitEntries(root2, 0, e2, 8, Map("statsCol" -> "d"))
    ST.setGeneratedColumn(spark, root2, "d", "(sec div 86400) * 2")
    val b2 = spark.read.format("graft-snapshot").load(root2)
    // the non-whitelisted derivation must contribute NO derived filter
    // on the stats column (multiplication can overflow). Since r20 the
    // input's OWN auto-harvested stats prune 2 of 3 files — the
    // derivation's absence is probed at the pushdown surface, where a
    // derived bound would surface as a filter naming `d`.
    val builder = new graft.sources.SnapshotScanBuilder(root2, b2.schema,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    builder.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("sec", 86400L)))
    assert(!builder.pushedFilters().exists(_.references.contains("d")),
      s"non-whitelisted derivation must not derive a bound on d: " +
        builder.pushedFilters().mkString(","))
    assert(scanParts(b2.filter("sec >= 86400")) == 2,
      "the input's own r20 column stats prune days 1-2")
    assert(b2.filter("sec >= 86400").count() == 10)
    // while a direct filter on the generated column still prunes
    assert(scanParts(b2.filter("d = 2")) == 1)
  }

  test("attach canonicalizes case; ANSI MERGE recomputes on update and refuses SET on gen (r14 review)") {
    val root = fresh("graft_gen_case", 1L to 6L)
    // a case-mismatched attach stores the TABLE's spelling — the
    // exact-case lookups in UPDATE's overlay and the sink keep working
    ST.setGeneratedColumn(spark, root, "D", "ts div 86400")
    assert(ST.genExprs(root, ST.currentVersion(root)).keySet == Set("d"))
    val e0 = intercept[Exception](
      ST.setGeneratedColumn(spark, root, "D", "ts div 86400"))
    assert(chain(e0).contains("already generated"), chain(e0))
    // UPDATE recompute works (the r14-review failure mode was an
    // exact-case schema lookup crash here)
    ST.update(spark, root, Seq("ts" -> "ts + 86400"), "k = 1")
    val r1 = ST.read(spark, root).filter("k = 1")
      .select("ts", "d").as[(Long, Long)].head()
    assert(r1._2 == r1._1 / 86400, r1.toString)
    // SET on the gen column refuses (a case-mismatched "D" refuses one
    // check earlier — UPDATE's columns are exact-case by contract)
    val e1 = intercept[Exception](
      ST.update(spark, root, Seq("d" -> "7"), "k = 2"))
    assert(chain(e1).contains("GENERATED ALWAYS AS"), chain(e1))
    val e1b = intercept[Exception](
      ST.update(spark, root, Seq("D" -> "7"), "k = 2"))
    assert(chain(e1b).contains("unknown column"), chain(e1b))
    // ANSI MERGE: an input-shifting WHEN MATCHED UPDATE recomputes d
    // (same contract as UPDATE), and SET on the gen column refuses
    Seq((2L, 2L * 40000L + 86400L)).toDF("k", "ts")
      .createOrReplaceTempView("gen_case_src")
    graft.sources.SnapshotSql.exec(spark,
      s"MERGE INTO '$root' t USING gen_case_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET ts = s.ts")
    val r2 = ST.read(spark, root).filter("k = 2")
      .select("ts", "d").as[(Long, Long)].head()
    assert(r2._1 == 2L * 40000 + 86400 && r2._2 == r2._1 / 86400, r2.toString)
    val e2 = intercept[Exception](graft.sources.SnapshotSql.exec(spark,
      s"MERGE INTO '$root' t USING gen_case_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET d = 99"))
    assert(chain(e2).contains("GENERATED ALWAYS AS"), chain(e2))
    // case-insensitive drop resolves the stored spelling
    ST.dropGeneratedExpr(root, "D")
    assert(ST.genExprs(root, ST.currentVersion(root)).isEmpty)
  }

  test("widen x gen: safe widen revalidates and passes; a widen the expression can't analyze refuses") {
    val root = Engine.tmpDir("graft_gen_widen")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rows = (1L to 6L).map(k => (k, (k * 40000L).toInt, k * 40000L / 86400L))
    ST.commitEntries(root, 0,
      ST.writeDataFiles(rows.toDF("k", "sec", "d")
        .withColumn("sec", col("sec").cast("int")).coalesce(1), root, "a")
        .map(ST.footerEntry(root, _, "k")),
      8, Map("statsCol" -> "k"))
    ST.setGeneratedColumn(spark, root, "d", "sec div 86400")
    // int → long on the INPUT: `div` analyzes identically, resident
    // revalidation passes, and enforcement coheres over mixed widths
    ST.widenColumn(spark, root, "sec", org.apache.spark.sql.types.LongType)
    val SS = graft.streaming.SnapshotSink
    assert(SS.appendBatch(root, Seq((7L, 6000000000L, 69444L)).toDF("k", "sec", "d"),
      batchId = 0L, keyCol = "k"))
    val eb = intercept[Exception](SS.appendBatch(root,
      Seq((8L, 6000000000L, 7L)).toDF("k", "sec", "d"), batchId = 1L, keyCol = "k"))
    assert(chain(eb).contains("gen:d"), chain(eb))
    // int → double on the INPUT: `div` refuses non-integral operands —
    // the widen must refuse instead of committing a schema under which
    // every later write fails analysis
    val root2 = Engine.tmpDir("graft_gen_widen2")
    Engine.listDir(Paths.get(root2)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root2, 0,
      ST.writeDataFiles(rows.toDF("k", "sec", "d")
        .withColumn("sec", col("sec").cast("int")).coalesce(1), root2, "a")
        .map(ST.footerEntry(root2, _, "k")),
      8, Map("statsCol" -> "k"))
    ST.setGeneratedColumn(spark, root2, "d", "sec div 86400")
    val vBefore = ST.currentVersion(root2)
    val e = intercept[Exception](
      ST.widenColumn(spark, root2, "sec", org.apache.spark.sql.types.DoubleType))
    assert(chain(e).contains("widen on") &&
      (chain(e).contains("no longer analyzes") ||
        chain(e).contains("changes the semantics")), chain(e))
    assert(ST.currentVersion(root2) == vBefore, "refused widen must not mint")
  }

  test("colmap x gen: attach under renamed names, enforcement and derived pruning through the mapping") {
    val root = Engine.tmpDir("graft_gen_colmap")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val entries = (0L to 3L).flatMap { day =>
      val rows = (0L until 10L).map(i => (day * 10 + i, day * 86400L + i, day))
      ST.writeDataFiles(rows.toDF("k", "t", "d").coalesce(1), root, s"day$day")
        .map(ST.footerEntry(root, _, "d"))
    }
    ST.commitEntries(root, 0, entries, 8, Map("statsCol" -> "d"))
    // rename the future input; the files keep physical name `t`
    ST.renameColumn(spark, root, "t", "sec")
    ST.setGeneratedColumn(spark, root, "d", "sec div 86400")
    // enforcement speaks the NEW name on the sink route
    val SS = graft.streaming.SnapshotSink
    val eb = intercept[Exception](SS.appendBatch(root,
      Seq((40L, 0L, 3L)).toDF("k", "sec", "d"), batchId = 0L, keyCol = "d"))
    assert(chain(eb).contains("gen:d"), chain(eb))
    assert(SS.appendBatch(root, Seq((40L, 86401L, 1L)).toDF("k", "sec", "d"),
      batchId = 0L, keyCol = "d"))
    // derived pruning fires on a filter over the RENAMED input — the
    // statsCol meta holds the physical name, the filter the logical one
    def scanParts(df: org.apache.spark.sql.DataFrame): Int = {
      def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => go(a.initialPlan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.partitions.size
      }.sum
      go(df.queryExecution.executedPlan)
    }
    val base = spark.read.format("graft-snapshot").load(root)
    assert(scanParts(base.select("k")) == 5) // 4 day files + the sink batch
    val ranged = base.filter("sec >= 172800 AND sec < 259200")
    assert(scanParts(ranged) == 1, "derived pruning must resolve the mapping")
    assert(ranged.count() == 10)
  }

  test("MoR UPDATE recomputes the generated column in the postimage; originals byte-untouched") {
    val root = Engine.tmpDir("graft_gen_mor")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rows = (1L to 40L).map(k => (k, k * 40000L, k * 40000L / 86400L))
    ST.commitEntries(root, 0,
      ST.writeDataFiles(rows.toDF("k", "sec", "d")
        .repartitionByRange(2, col("k")), root, "a")
        .map(ST.footerEntry(root, _, "k")),
      16, Map("statsCol" -> "k"))
    ST.enableDeletionVectors(root)
    ST.setGeneratedColumn(spark, root, "d", "sec div 86400")
    val before = ST.manifestEntries(root, ST.currentVersion(root))
      .map(e => e.rel -> Files.size(Paths.get(root, e.rel))).toMap
    spark.sql(s"UPDATE '$root' SET sec = sec + 86400 WHERE k = 7")
    val meta = ST.manifestMeta(root, ST.currentVersion(root))
    assert(meta("update").startsWith("mor:"), meta.get("update").toString)
    before.foreach { case (rel, sz) =>
      if (Files.exists(Paths.get(root, rel)))
        assert(Files.size(Paths.get(root, rel)) == sz, s"$rel grew under MoR") }
    val got = ST.read(spark, root).filter("k = 7")
      .select("sec", "d").as[(Long, Long)].head()
    assert(got._2 == got._1 / 86400 && got._2 == (7L * 40000 + 86400) / 86400,
      got.toString)
  }

  test("path-SQL SET/UNSET TBLPROPERTIES: flags, constraints, generation expressions, refusals") {
    val root = fresh("graft_gen_props", 1L to 4L)
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('cdf' = 'row')").collect()
    assert(ST.manifestMeta(root, ST.currentVersion(root)).get("cdf").contains("row"))
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('gen.d' = 'ts div 86400')").collect()
    assert(ST.genExprs(root, ST.currentVersion(root)) == Map("d" -> "ts div 86400"))
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('check.k_pos' = 'k > 0')").collect()
    assert(ST.checkConstraints(root, ST.currentVersion(root)).contains("k_pos"))
    // refusals: unknown flag, validating key mixed with a flag,
    // malformed entry
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('nope' = 'x')").collect())
    assert(chain(e1).contains("unsupported table property"), chain(e1))
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('gen.k' = 'ts', 'cdf' = 'row')").collect())
    assert(chain(e2).contains("cannot mix"), chain(e2))
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE '$root' SET TBLPROPERTIES (d = 7)").collect())
    assert(chain(e3).contains("'key' = 'value'"), chain(e3))
    // SHOW TBLPROPERTIES reads the same state back through the
    // standard surface (catalog-name route)
    val w2 = Files.createTempDirectory("graft_gen_show").toString
    spark.conf.set("spark.sql.catalog.gshow", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gshow.root", w2)
    spark.sql("DROP TABLE IF EXISTS gshow.t")
    (1L to 3L).map(k => (k, k * 40000L, (k * 40000L) / 86400L))
      .toDF("k", "ts", "d").createOrReplaceTempView("gshow_seed")
    spark.sql("CREATE TABLE gshow.t AS SELECT * FROM gshow_seed")
    spark.sql("ALTER TABLE gshow.t SET TBLPROPERTIES ('gen.d' = 'ts div 86400')")
    spark.sql("ALTER TABLE gshow.t SET TBLPROPERTIES ('check.k_pos' = 'k > 0')")
    val props = spark.sql("SHOW TBLPROPERTIES gshow.t")
      .as[(String, String)].collect().toMap
    assert(props.get("gen.d").contains("ts div 86400"), props.toString)
    assert(props.get("check.k_pos").contains("k > 0"), props.toString)
    // UNSET detaches; the same spelling drops a constraint
    spark.sql(s"ALTER TABLE '$root' UNSET TBLPROPERTIES ('gen.d')").collect()
    assert(ST.genExprs(root, ST.currentVersion(root)).isEmpty)
    spark.sql(s"ALTER TABLE '$root' UNSET TBLPROPERTIES ('check.k_pos')").collect()
    assert(!ST.checkConstraints(root, ST.currentVersion(root)).contains("k_pos"))
    // SQL-standard doubled-quote escaping: an expression containing a
    // STRING LITERAL is spellable on this route (ADVICE r15 — the
    // value grammar previously could not carry a quote at all)
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES " +
      "('check.s_lit' = 'k > 0 or ''no'' = ''yes''')").collect()
    assert(ST.checkConstraints(root, ST.currentVersion(root))
      .get("s_lit").contains("k > 0 or 'no' = 'yes'"),
      ST.checkConstraints(root, ST.currentVersion(root)).toString)
    // the stored (unescaped) expression enforces: a violating insert
    // refuses through the in-task invariant
    val eq = intercept[Exception](spark.sql(
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('check.bad' = 'k > 99 and ''a'' = ''a''')").collect())
    assert(chain(eq).contains("existing row violates"), chain(eq))
    spark.sql(s"ALTER TABLE '$root' UNSET TBLPROPERTIES ('check.s_lit')").collect()
    assert(!ST.checkConstraints(root, ST.currentVersion(root)).contains("s_lit"))
  }

  test("a commit planned before a racing attach aborts instead of bypassing the derivation") {
    import graft.sources.{SnapshotCommit, SnapshotFileCommit}
    val root = fresh("graft_gen_race", 1L to 4L)
    // stage a file whose d DRIFTS from the derivation about to land —
    // planned (empty) checks rode the write before the attach
    val rel = ST.writeDataFiles(Seq((9L, 360000L, 77L)).toDF("k", "ts", "d")
      .coalesce(1), root, "race").head
    ST.setGeneratedColumn(spark, root, "d", "ts div 86400")
    val e = intercept[IllegalStateException](
      SnapshotCommit.append(root,
        Array(SnapshotFileCommit(rel)), Map.empty, plannedChecks = Map.empty))
    assert(e.getMessage.contains("changed while this write"), e.getMessage)
    assert(ST.read(spark, root).count() == 4, "no drifted rows may land")
    // a commit planned WITH the gen invariant sails through
    val rel2 = ST.writeDataFiles(Seq((10L, 360000L, 4L)).toDF("k", "ts", "d")
      .coalesce(1), root, "race2").head
    SnapshotCommit.append(root, Array(SnapshotFileCommit(rel2)), Map.empty,
      plannedChecks = ST.checkConstraints(root, ST.currentVersion(root)))
    assert(ST.read(spark, root).count() == 5)
  }

  test("clone carries the expression; restore validates against the ACTIVE derivation") {
    val root = fresh("graft_gen_clone_src", 1L to 4L)
    ST.setGeneratedColumn(spark, root, "d", "ts div 86400")
    val cloneRoot = Engine.tmpDir("graft_gen_clone_dst")
    Engine.listDir(Paths.get(cloneRoot)).foreach(Engine.deleteRecursively)
    ST.shallowClone(root, cloneRoot)
    assert(ST.genExprs(cloneRoot, ST.currentVersion(cloneRoot)) ==
      Map("d" -> "ts div 86400"))
    // the clone enforces from its first write
    val e = intercept[Exception](ST.merge(spark, cloneRoot, clusterCol = "k",
      idCol = "k", changes = Seq((30L, 86400L, 5L, "i")).toDF("k", "ts", "d", "op")))
    assert(chain(e).contains("gen:d"), chain(e))
    // restore: v1 predates the attach and satisfies it → allowed;
    // a version holding DRIFTED rows refuses while the gen is active
    val drift = fresh("graft_gen_restore", 1L to 3L)
    // v2: a consistent append; v3: attach (validates v2's rows)
    ST.commitEntries(drift, ST.currentVersion(drift),
      ST.manifestEntries(drift, ST.currentVersion(drift)) ++
        ST.writeDataFiles(Seq((9L, 360000L, 99L)).toDF("k", "ts", "d")
          .coalesce(1), drift, "bad").map(ST.footerEntry(drift, _, "k")),
      8, ST.carriedMeta(drift, ST.currentVersion(drift)))
    val vBad = ST.currentVersion(drift) // holds the drifted row
    ST.delete(spark, drift, "k = 9")    // drifted row gone
    ST.setGeneratedColumn(spark, drift, "d", "ts div 86400")
    val e2 = intercept[Exception](ST.restore(drift, vBad))
    assert(chain(e2).contains("gen:d"), chain(e2))
    // restoring to the clean v1 passes the active-invariant validation
    ST.restore(drift, 1)
    assert(ST.genExprs(drift, ST.currentVersion(drift)).contains("d"),
      "active generation expression must survive the restore")
  }
}
