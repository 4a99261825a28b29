package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: the scale properties SURVEY §5 claims
  * must be visible in the plans, not just intended. */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String = {
    import org.apache.spark.sql.execution.ExplainMode
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
  }

  test("q2: predicate and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"filters not pushed:\n${p.take(800)}")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      "scan reads more columns than the projection needs")
  }

  test("x25: UPDATE's find-touched-files scan pushes the WHERE predicate to parquet") {
    import org.apache.spark.sql.execution.ExplainMode
    val ST = graft.operators.SnapshotTable
    val root = ST.statsTable(spark, sf) // read-only day-clustered fixture
    val full = ST.read(spark, root)
    val p = ST.updateTouchedScan(full,
      s"ep_day BETWEEN ${ST.X25Lo} AND ${ST.X25Hi} AND event_type = 'click'")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains(s"GreaterThanOrEqual(ep_day,${ST.X25Lo})") &&
      p.contains(s"LessThanOrEqual(ep_day,${ST.X25Hi})") &&
      p.contains("EqualTo(event_type,click)"),
      s"UPDATE phase-1 predicate not pushed:\n${p.take(900)}")
  }

  test("q6: tight range filters pushed to scan") {
    val p = plan("q6_cond_agg")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThan(l_quantity,24.0)"))
  }

  test("q5: star join is all-broadcast at this SF (no sort-merge join)") {
    val p = plan("q5_multijoin")
    assert(!p.contains("SortMergeJoin"), "dim join fell back to SMJ")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
  }

  // AQE hides subtrees behind wrapper nodes whose inner plan is not a
  // tree child: descend through both wrappers when counting scans
  private def fileScans(d: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    d.collect() // AQE finalizes the plan only at execution
    def go(p: SparkPlan): Int = p.collect {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec => go(q.plan)
      case _: FileSourceScanExec => 1
    }.sum
    go(d.queryExecution.executedPlan)
  }

  test("t13: df via window, not self-join - exactly one corpus scan") {
    val n = fileScans(SparkEntry.queries("t13_tfidf_keywords")(spark, sf))
    assert(n == 1, s"t13 should scan documents once, found $n scans")
  }

  test("t12: LM counts via windows, not self-joins - exactly one corpus scan") {
    val n = fileScans(SparkEntry.queries("t12_lm_quality")(spark, sf))
    assert(n == 1, s"t12 should scan documents once, found $n scans")
  }

  test("t7: quality+language fused onto one verdict scan (dedup leg separate)") {
    val n = fileScans(SparkEntry.queries("t7_corpus_curation")(spark, sf))
    assert(n <= 2, s"t7 should scan documents at most twice, found $n scans")
  }

  test("q15: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q15_topk_order")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("c7: no window over an unpartitioned global sort (single-partition NTILE)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("c7_rfm")(spark, sf).queryExecution
    val unpartitioned = qe.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"c7 still funnels the table through one-task windows:\n$unpartitioned")
    // the distributed-rank path: range repartition instead of global sort
    assert(qe.executedPlan.toString.contains("rangepartitioning"),
      "expected the distributed NTILE's range repartition in the plan")
  }

  test("t15: packing windows are shard-partitioned — no global-sort window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("t15_seq_packing")(spark, sf).queryExecution
    val unpartitioned = qe.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"t15's running sum must partition by shard:\n$unpartitioned")
    // and the pack arithmetic costs exactly one corpus scan
    assert(fileScans(SparkEntry.queries("t15_seq_packing")(spark, sf)) == 1)
  }

  test("t17: BPE scoring is one map-side scan — codegen'd kernel, no join, no agg shuffle") {
    // warm the merge memo OUTSIDE the audited plan (training is its own
    // bounded wordcount job; the scoring query must not re-plan it)
    graft.operators.TextAnalysis.bpeMerges(spark, sf)
    val qe = SparkEntry.queries("t17_bpe_tokens")(spark, sf).queryExecution
    val p = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("bpe_token_count"), "kernel expression missing from the plan")
    // one documents scan, no join/agg, and the only exchange is the
    // output ordering's range partitioning — scoring itself never
    // shuffles (string asserts: AQE wraps sparkPlan in a leaf node)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"expected one corpus scan:\n${p.take(400)}")
    assert(!p.contains("Join") && !p.contains("Aggregate"), "scoring must not join or aggregate")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1 && p.contains("rangepartitioning"),
      s"the only shuffle must be the output sort's range exchange:\n${p.take(400)}")
  }

  test("t16: sampling is one scan with map-side partial aggregation") {
    val df = SparkEntry.queries("t16_mixture_sample")(spark, sf)
    assert(fileScans(df) == 1, "t16 must decide keep/drop in the scan pass")
    assert(df.queryExecution.executedPlan.toString.contains("partial_"),
      "per-source audit must combine map-side before the shuffle")
  }

  test("c20: journey window shuffles on user_id; no unpartitioned window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("c20_event_transitions")(spark, sf).queryExecution
    val unpartitioned = qe.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"c20 has a one-task window:\n$unpartitioned")
    assert(qe.executedPlan.toString.contains("hashpartitioning(user_id"),
      "lead() must key its exchange on user_id")
  }

  test("DSv2 scan reports manifest statistics — a small snapshot table auto-broadcasts") {
    import org.apache.spark.sql.functions._
    val ST = graft.operators.SnapshotTable
    val Engine = graft.operators.Engine
    val root = Engine.tmpDir("graft_stats_bhj")
    graft.operators.Engine.listDir(java.nio.file.Paths.get(root))
      .foreach(Engine.deleteRecursively)
    import spark.implicits._
    val dim = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "label")
    val rels = ST.writeDataFiles(dim, root, "dim")
    ST.commitEntries(root, 0, rels.map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    val fact = graft.sources.Tables.events(spark, sf)
      .select(pmod(col("user_id"), lit(50L)).as("k"), col("value"))
    val joined = fact.join(
      spark.read.format("graft-snapshot").load(root), Seq("k"))
    val p = joined.queryExecution.executedPlan.toString
    // without estimateStatistics the DSv2 relation defaults to "huge"
    // and this join sort-merges; manifest stats make it broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"small snapshot table not broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"))
    assert(joined.count() == fact.count(), "join must keep every fact row")
  }

  /** 5-file day-clustered fixture (disjoint ranges 0..9, …, 40..49),
    * rebuilt idempotently — both runtime-filtering tests share it. */
  private def runtimePruneFixture(): String = {
    val ST = graft.operators.SnapshotTable
    val Engine = graft.operators.Engine
    val root = Engine.tmpDir("graft_runtime_prune")
    Engine.listDir(java.nio.file.Paths.get(root)).foreach(Engine.deleteRecursively)
    import spark.implicits._
    val rels = (0 until 5).flatMap { g =>
      val df = ((g * 10L) until (g * 10L + 10L)).map(d => (d, d * 100)).toDF("ep_day", "v")
      ST.writeDataFiles(df.coalesce(1), root, s"g$g")
    }
    ST.commitEntries(root, 0, rels.map(ST.footerEntry(root, _, "ep_day")),
      shardSize = 8, Map("statsCol" -> "ep_day"))
    root
  }

  test("DSv2 runtime filtering prunes planned files from a join-key In filter") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val root = runtimePruneFixture()
    val schema = spark.read.format("graft-snapshot").load(root).schema
    def partitionsAfter(filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val scan = new graft.sources.SnapshotScanBuilder(root, schema,
        CaseInsensitiveStringMap.empty()).build()
      scan.asInstanceOf[SupportsRuntimeFiltering].filter(filters)
      scan.toBatch.planInputPartitions().length
    }
    assert(partitionsAfter(Array.empty) == 5, "baseline plans all 5 files")
    // a join-key In set hitting two file ranges keeps exactly those files
    assert(partitionsAfter(Array(
      org.apache.spark.sql.sources.In("ep_day", Array(3L, 37L)))) == 2)
    // a comparison runtime filter prunes by range
    assert(partitionsAfter(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("ep_day", 40L))) == 1)
    // a SECONDARY integral column prunes too (r20 general per-column
    // stats: v = ep_day*100, so v=300 lives only in the first file)
    assert(partitionsAfter(Array(
      org.apache.spark.sql.sources.In("v", Array(300L)))) == 1)
    // a column with no harvested stats prunes nothing (sound no-op)
    assert(partitionsAfter(Array(
      org.apache.spark.sql.sources.In("nosuch", Array(300L)))) == 5)
  }

  test("x54: pushed filters on a NON-cluster integral column prune planned files") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.sources._
    val ST = graft.operators.SnapshotTable
    val root = runtimePruneFixture() // statsCol=ep_day; v = ep_day*100
    val schema = spark.read.format("graft-snapshot").load(root).schema
    def planned(filters: Array[Filter]): Int = {
      val b = new graft.sources.SnapshotScanBuilder(root, schema,
        CaseInsensitiveStringMap.empty())
      b.pushFilters(filters)
      b.build().toBatch.planInputPartitions().length
    }
    // v spans [g*1000, g*1000+900] per file: range filters on the
    // non-cluster column open only the owning files
    assert(planned(Array(GreaterThanOrEqual("v", 4000L))) == 1)
    assert(planned(Array(LessThanOrEqual("v", 1500L))) == 2)
    // bounds on DIFFERENT columns AND together (intersection of
    // per-column judgments, not just the statsCol's)
    assert(planned(Array(LessThanOrEqual("v", 1500L),
      GreaterThanOrEqual("ep_day", 10L))) == 1)
    // end-to-end on x54's actual fixture: the event_id window opens a
    // strict subset of the day-clustered table's files
    val sroot = ST.statsTable(spark, sf)
    val v = ST.currentVersion(sroot)
    val total = ST.manifestEntries(sroot, v).size
    val n = ST.manifestEntries(sroot, v).map(_.rows).sum
    val sschema = spark.read.format("graft-snapshot").load(sroot).schema
    def plannedOn(filters: Array[Filter]): Int = {
      val b = new graft.sources.SnapshotScanBuilder(sroot, sschema,
        CaseInsensitiveStringMap.empty())
      b.pushFilters(filters)
      b.build().toBatch.planInputPartitions().length
    }
    val opened = plannedOn(Array(
      GreaterThanOrEqual("event_id", n / 4), LessThan("event_id", n / 2)))
    assert(total >= 6, s"fixture should hold ~7 files, saw $total")
    assert(opened >= 1 && opened < total,
      s"event_id window should open a strict subset: $opened of $total")
  }

  test("a time-travel scan prunes files against the HISTORICAL manifest") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val ST = graft.operators.SnapshotTable
    val root = runtimePruneFixture()
    // v2 compacts everything into one file; v1 keeps its 5-file layout
    ST.optimizeClustered(spark, root, "ep_day", targetFiles = 1)
    val schema = spark.read.format("graft-snapshot")
      .option("version", "1").load(root).schema
    def planned(version: String,
        filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val opts = new java.util.HashMap[String, String]()
      opts.put("version", version)
      val b = new graft.sources.SnapshotScanBuilder(root, schema,
        new CaseInsensitiveStringMap(opts))
      b.pushFilters(filters)
      b.build().toBatch.planInputPartitions().length
    }
    // the historical scan plans v1's files AND still stats-prunes them:
    // a day range hitting one 10-day block keeps exactly that file
    assert(planned("1", Array.empty) == 5, "v1 baseline plans its 5 files")
    assert(planned("1", Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("ep_day", 40L))) == 1,
      "pushed filter must prune the HISTORICAL file set")
    assert(planned("2", Array.empty) == 1, "current version plans the compacted file")
    // the pinned catalog route (VERSION AS OF) rides the same pruning:
    // the filtered historical read answers from the pruned scan
    spark.conf.set("spark.sql.catalog.gtt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt.root",
      java.nio.file.Paths.get(root).getParent.toString)
    val name = java.nio.file.Paths.get(root).getFileName.toString
    assert(spark.sql(
      s"SELECT count(*) FROM gtt.`$name` VERSION AS OF 1 WHERE ep_day >= 40")
      .head().getLong(0) == 10)
  }

  test("the optimizer injects dynamic pruning into the snapshot fact scan") {
    import org.apache.spark.sql.functions._
    val root = runtimePruneFixture()
    import spark.implicits._
    val dim = Seq((3L, "a"), (37L, "b"), (999L, "c")).toDF("ep_day", "tag")
    val fact = spark.read.format("graft-snapshot").load(root)
    val joined = fact.join(dim.filter(col("tag") =!= "c"), Seq("ep_day"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning") || p.contains("RuntimeFilters"),
      s"no runtime-filter injection in plan:\n${p.take(1500)}")
    assert(joined.count() == 2)
  }

  /** SF-proportional relations must not carry forced broadcast hints —
    * strategy stays with stats/AQE so the same code broadcasts at sf0.1
    * and sort-merges at 100 TB instead of OOMing. Fixed-size dims
    * (q5's nation/region) and provably tiny relations (d2's over-cap
    * reject list) may keep theirs. */
  private def hintCount(name: String): Int =
    "ResolvedHint".r.findAllIn(
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed.toString).size

  test("no forced broadcast of SF-proportional relations (q3/q14/q5/d2)") {
    assert(hintCount("q3_join_agg") == 0, "q3: customer must not be hint-broadcast")
    assert(hintCount("q14_scalar_subquery") == 0, "q14: partAvg must not be hint-broadcast")
    // q5 keeps exactly the two fixed-size dims (nation 25 rows, region 5)
    assert(hintCount("q5_multijoin") == 2, "q5: only nation+region may be hinted")
    // d2's only hint is the bounded heavy-hitter reject list (appears once
    // per self-join side in the analyzed tree)
    assert(hintCount("d2_dedup_ngram_jaccard") <= 2,
      "d2: only the over-cap reject list may be hinted")
  }

  test("s6: bucketed pairwise candidates — no cartesian / nested-loop join") {
    val p = plan("s6_pairwise_lsh")
    assert(!p.contains("CartesianProduct"), "s6 plans a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "s6 plans a nested-loop join")
  }

  test("s11: PQ scan is broadcast-bounded (5-query side), never corpus x corpus") {
    // the ADC scan joins the corpus against the CONSTANT-size query
    // side on a non-equi condition: a nested-loop join is the right
    // plan exactly BECAUSE one side is a broadcast of 5 rows (s1/s7
    // share the shape) — what must never appear is an unbroadcast
    // cartesian, which would be corpus x corpus at 100 TB
    val p = plan("s11_knn_pq")
    assert(!p.contains("CartesianProduct"), "s11 plans an unbroadcast cartesian")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "s11's query side is no longer broadcast — the scan shape regressed")
  }

  test("s12: IVF-PQ candidates join by cell EQUALITY — probed lists only, no cartesian") {
    // the ADC scan joins corpus rows to the broadcast probe set on
    // cell id: a BroadcastHashJoin, so only probed lists are ever
    // scored; the only nested-loop shapes allowed are broadcasts of
    // the constant-size query/centroid sides (s5/s11 share those)
    val p = plan("s12_knn_ivfpq")
    assert(!p.contains("CartesianProduct"), "s12 plans an unbroadcast cartesian")
    assert(p.contains("BroadcastHashJoin"),
      "s12's probed-list candidate join is not a broadcast-hash equi join")
  }

  test("x6: merge prunes the snapshot scan to the affected day partition") {
    import org.apache.spark.sql.execution.ExplainMode
    val E = graft.operators.Engine
    val snapDir = E.x6WriteSnapshot(spark, sf)
    // the nightly merge computation (what gets staged) must scan the
    // snapshot pruned to the one re-ingested day; the final readback
    // after the swap legitimately reads the whole table
    val p = E.x6MergedDay(spark, sf, snapDir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert("""PartitionFilters: \[[^\]]*ep_day[^\]]*19751""".r.findFirstIn(p).isDefined,
      s"no day-partition filter reached the snapshot scan")
  }

  test("t6: the count shuffle is keyed on bigram HASHES, not strings") {
    // the shuffle keying is asserted on the exact counts construction
    // the operator runs...
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.ExplainMode
    val counts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.functions.bigram_hashes(col("text"))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("doc_id")).as("doc_freq"))
    val cp = counts.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(cp.contains("bigram_hashes"), "native hash kernel missing from counts plan")
    assert("""hashpartitioning\(h#""".r.findFirstIn(cp).isDefined,
      s"count exchange is not keyed on the 8-byte hash:\n${cp.take(1500)}")
    // ...and the final plan's winner-string recovery rides a broadcast
    val df = SparkEntry.queries("t6_bigram_stats")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "winner-string join not broadcast")
  }

  test("d8: span df via window keyed on span HASHES — one corpus scan for the span leg") {
    val p = plan("d8_dedup_substring")
    // the df window's exchange must be keyed on the 8-byte xxhash64
    // column, never on the span string (at 100 TB the strings would
    // dominate every shuffle)
    assert("""hashpartitioning\(sh#""".r.findFirstIn(p).isDefined,
      s"span-df exchange is not keyed on the hash:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") || !p.contains("span#"),
      "span strings leaked into a shuffle join")
  }

  test("t10: benchmark shingle set is broadcast — corpus side never shuffles pre-rollup") {
    val p = plan("t10_contamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark join not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "corpus-vs-benchmark membership fell back to a shuffle join")
  }

  test("c16: bucketed range join — no cartesian / nested-loop in the plan") {
    val p = plan("c16_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to an all-pairs plan:\n${p.take(1200)}")
  }

  test("x13: runtime bloom filter from the dim predicate reaches the fact side") {
    val p = graft.operators.Engine.x13Plan(spark, sf)
    assert(p.contains("might_contain"),
      s"no bloom-filter might_contain in the executed plan:\n${p.take(2000)}")
  }

  test("x11: AQE splits the induced hot key at runtime (skew=true in final plan)") {
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> util.Try(spark.conf.get(k)).toOption).toMap
    try {
      // force the shuffled-join path and make the hot partition count as
      // skewed at toy scale — production keeps the defaults and gets the
      // same split when a partition really crosses 256MB
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "12KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "6KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // the final agg requires a different partitioning, so the split
      // "introduces an extra shuffle" from AQE's point of view — allow it
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // AQE can only split a skewed reduce partition at map-output-block
      // granularity, and the single-row-group test parquet yields ONE map
      // task — stage a 32-file copy of events (a real 100 TB fact table
      // has thousands of input splits, so this is automatic there); the
      // hot key also needs sf0.01 volume to cross even tiny thresholds
      import java.nio.file.{Files, Paths}
      val skewDir = Files.createTempDirectory("graft_skew_sf").toString
      graft.sources.Tables.events(spark, "/root/testdata/sf0.01").repartition(32)
        .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
      Files.createSymbolicLink(Paths.get(s"$skewDir/customer.parquet"),
        Paths.get("/root/testdata/sf0.01/customer.parquet"))
      val df = graft.operators.Engine.x11SkewJoin(spark, skewDir)
      df.collect() // materialize so AQE finalizes the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1500)}")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("x8: bucketed fact-fact join has no shuffle exchange") {
    val p = graft.operators.Engine.x8Plan(spark, sf)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${p.take(1200)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }
}
