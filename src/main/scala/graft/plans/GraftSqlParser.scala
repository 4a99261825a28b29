package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

import graft.sources.SnapshotSql

/** Parser injection making the snapshot table's maintenance verbs
  * first-class `spark.sql(...)` statements — the same
  * `SparkSessionExtensions.injectParser` seam Delta uses for its
  * path-addressed DML. Statements matching [[SnapshotSql]]'s grammar
  * (OPTIMIZE / MERGE INTO — changeset and ANSI spellings — / UPDATE /
  * DELETE / RESTORE / SHALLOW CLONE / VACUUM over `'<path>'` or
  * graft-catalog tables) parse to a [[SnapshotSqlCommand]]; EVERYTHING
  * else — including Spark's own DML on foreign catalogs — falls
  * through to the delegate parser untouched, so injecting this parser
  * can never change the meaning of a statement it doesn't own. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    SnapshotSql.historyRoot(session, sqlText)
      .map(SnapshotHistoryCommand(_): LogicalPlan)
      .orElse(SnapshotSql.detailRoot(session, sqlText)
        .map(SnapshotDetailCommand(_): LogicalPlan))
      .orElse(SnapshotSql.vacuumDryRunTarget(session, sqlText)
        .map { case (root, spec) =>
          SnapshotVacuumDryRunCommand(root, spec): LogicalPlan })
      .orElse(SnapshotSql.showTagsRoot(session, sqlText)
        .map(SnapshotShowTagsCommand(_): LogicalPlan))
      .orElse(SnapshotSql.showBranchesRoot(session, sqlText)
        .map(SnapshotShowBranchesCommand(_): LogicalPlan))
      .orElse(SnapshotSql.filesRoot(session, sqlText)
        .map(SnapshotDescribeFilesCommand(_): LogicalPlan))
      .getOrElse {
        if (SnapshotSql.owns(sqlText) ||
          SnapshotSql.ownsUpdate(session, sqlText) ||
          SnapshotSql.ownsDelete(sqlText) ||
          SnapshotSql.ownsRestore(session, sqlText) ||
          SnapshotSql.ownsClone(session, sqlText) ||
          SnapshotSql.ownsAnsiMerge(session, sqlText) ||
          SnapshotSql.ownsConstraint(session, sqlText)) SnapshotSqlCommand(sqlText)
        else delegate.parsePlan(sqlText)
      }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** The runnable command a graft maintenance statement parses to: one
  * row, the table's version after the operation — visible in query
  * results exactly like Delta's command output. Execution happens at
  * `run` (driver-side protocol: the heavy rewrite inside is a normal
  * distributed Spark job; only manifest arithmetic runs here). */
case class SnapshotSqlCommand(stmt: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(SnapshotSql.exec(sparkSession, stmt)))
}

/** DESCRIBE DETAIL <table> — the current snapshot's one-row summary
  * (Delta's command shape): location, version, file/row counts, data
  * bytes, carried metadata. Pure manifest arithmetic. */
case class SnapshotDetailCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("num_files", org.apache.spark.sql.types.LongType, nullable = false)(),
    // null when any manifest entry is stats-less (legacy line-only
    // commits): the count is unknown, never a negative sum
    AttributeReference("num_rows", org.apache.spark.sql.types.LongType, nullable = true)(),
    AttributeReference("size_bytes", org.apache.spark.sql.types.LongType, nullable = false)(),
    AttributeReference("meta", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val (loc, v, nf, nr, bytes, meta) = SnapshotSql.describeDetail(root)
    Seq(Row(loc, v, nf, nr.map(Long.box).orNull, bytes, meta))
  }
}

/** `VACUUM <table> ... DRY RUN` — one row per file the real VACUUM
  * would reclaim (data/sidecar/CDC files, retired manifests,
  * unreachable shards), root-relative; deletes NOTHING. The keep
  * floor resolves at RUN time against the commit clock, so the
  * preview and a subsequent VACUUM agree. */
case class SnapshotVacuumDryRunCommand(root: String,
    spec: Either[Int, Double]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    SnapshotSql.vacuumDryRunPaths(root, spec).map(Row(_))
}

/** DESCRIBE HISTORY '<path>' — one row per still-present version with
  * its commit TIMESTAMP (the same clock TIMESTAMP AS OF resolves —
  * in-commit stamps when present, Delta's column), file count,
  * manifest row count, and metadata (Delta's command shape over the
  * manifest log). */
case class SnapshotHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("timestamp", org.apache.spark.sql.types.TimestampType,
      nullable = false)(),
    AttributeReference("n_files", org.apache.spark.sql.types.LongType, nullable = false)(),
    AttributeReference("n_rows", org.apache.spark.sql.types.LongType, nullable = false)(),
    AttributeReference("meta", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    SnapshotSql.describeHistory(root).map { case (v, ts, f, r, m) =>
      Row(v, new java.sql.Timestamp(ts), f, r, m) }
}

/** DESCRIBE FILES '<path>' | <catalog>.<name> — one row per
  * current-version manifest entry (Iceberg's `.files` metadata table,
  * flattened): the pruning planner's exact inputs, zero data IO. */
case class SnapshotDescribeFilesCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("file", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("n_rows", org.apache.spark.sql.types.LongType, nullable = true)(),
    AttributeReference("size_bytes", org.apache.spark.sql.types.LongType,
      nullable = false)(),
    AttributeReference("stats_col", org.apache.spark.sql.types.StringType,
      nullable = true)(),
    AttributeReference("lo", org.apache.spark.sql.types.LongType, nullable = true)(),
    AttributeReference("hi", org.apache.spark.sql.types.LongType, nullable = true)(),
    // r20: the SECONDARY per-column ranges ("col:lo:hi;…") — which
    // non-primary predicates can prune this file
    AttributeReference("extra_stats", org.apache.spark.sql.types.StringType,
      nullable = true)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    SnapshotSql.describeFiles(root).map { case (f, r, b, sc, lo, hi, ex) =>
      Row(f, r.map(Long.box).orNull, b, sc.orNull,
        lo.map(Long.box).orNull, hi.map(Long.box).orNull, ex.orNull) }
}

/** SHOW TAGS '<path>' | <catalog>.<name> — one row per live named ref
  * (Iceberg's refs listing): the tag and the version it pins. */
case class SnapshotShowTagsCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    SnapshotSql.showTags(root).map { case (n, v) => Row(n, v) }
}

/** SHOW BRANCHES '<path>' | <catalog>.<name> — one row per live
  * writable ref: name, base version, staged commit count (the audit
  * listing of write-audit-publish). */
case class SnapshotShowBranchesCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("branch", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("base_version", IntegerType, nullable = false)(),
    AttributeReference("staged_commits", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    SnapshotSql.showBranches(root).map { case (n, b, h) => Row(n, b, h) }
}
