package graft.sources

import org.apache.spark.sql.SparkSession

import graft.operators.SnapshotTable

/** SQL-style row-level and maintenance operations against a
  * `graft-snapshot` table addressed BY PATH — the surface a Spark-SQL
  * user reaches for where the pure DataFrame connector
  * (`format("graft-snapshot")`) has no verb. Spark's parser owns real
  * DML syntax for catalog tables only; table formats solve this with
  * their own SQL extension (Delta's `MERGE INTO delta.`/path``) or a
  * `CALL`-style procedure namespace (Iceberg). This is the procedure
  * route: one statement string, parsed here, dispatched to the manifest
  * protocol — so OPTIMIZE/MERGE/VACUUM stop being Scala-API-only.
  *
  * Grammar (case-insensitive keywords; `'<path>'` is the table root):
  *
  *   OPTIMIZE '<path>' CLUSTER BY (col) [TARGET n]
  *   OPTIMIZE '<path>' ZORDER BY (colA, colB) [TARGET n]
  *   MERGE INTO '<path>' CLUSTER BY (col) ID (idCol) USING <viewName>
  *   VACUUM '<path>' KEEP FROM <version>
  *   DESCRIBE HISTORY '<path>'    (row-returning, parser route only)
  *
  * MERGE's source is a registered view/table carrying the table's
  * columns plus `op` ∈ {u, d, i} — the same caller-labeled changeset
  * contract as [[graft.operators.SnapshotTable.merge]]. Every statement
  * returns the table's resulting version. The x16/x17/x22 gate fixtures
  * run through this surface, so the route is oracle-checked every
  * round, not spec-only. */
object SnapshotSql {

  private val DefaultTargetFiles = 16

  private val OptimizeCluster =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+CLUSTER\s+BY\s+\((\w+)\)(?:\s+TARGET\s+(\d+))?\s*""".r
  private val OptimizeZorder =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s+\((\w+)\s*,\s*(\w+)\)(?:\s+TARGET\s+(\d+))?\s*""".r
  private val MergeInto =
    """(?is)\s*MERGE\s+INTO\s+'([^']+)'\s+CLUSTER\s+BY\s+\((\w+)\)\s+ID\s+\((\w+)\)\s+USING\s+([\w.]+)\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'\s+KEEP\s+FROM\s+(\d+)\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*""".r

  /** DESCRIBE HISTORY '<path>' — the statement's table root, when the
    * statement is one. Routed by the parser to a row-returning command
    * (unlike the version-returning maintenance verbs). */
  private[graft] def historyRoot(stmt: String): Option[String] = stmt match {
    case History(root) => Some(root)
    case _ => None
  }

  /** One row per still-present version (vacuumed manifests are skipped):
    * version, file count, manifest row count, and the `#key=value`
    * metadata — Delta's DESCRIBE HISTORY shape over the manifest log. */
  def describeHistory(root: String): Seq[(Int, Long, Long, String)] =
    (1 to SnapshotTable.currentVersion(root)).flatMap { v =>
      scala.util.Try {
        val es = SnapshotTable.manifestEntries(root, v)
        val meta = SnapshotTable.manifestMeta(root, v).toSeq.sorted
          .map { case (k, x) => s"$k=$x" }.mkString(",")
        (v, es.size.toLong, es.map(_.rows).sum, meta)
      }.toOption
    }

  /** Whether this statement belongs to the graft maintenance grammar —
    * the [[graft.plans.GraftSqlParser]] routing test. Deliberately the
    * SAME regexes exec dispatches on, so "owned but unparseable" is
    * impossible and everything un-owned falls through to Spark's
    * parser. */
  private[graft] def owns(stmt: String): Boolean = stmt match {
    case OptimizeCluster(_, _, _) | OptimizeZorder(_, _, _, _)
       | MergeInto(_, _, _, _) | Vacuum(_, _) | History(_) => true
    case _ => false
  }

  /** Parse and run one maintenance statement; returns the table's
    * version after the operation. */
  def exec(s: SparkSession, stmt: String): Int = stmt match {
    case OptimizeCluster(root, keyCol, target) =>
      SnapshotTable.optimizeClustered(s, root, keyCol,
        Option(target).map(_.toInt).getOrElse(DefaultTargetFiles))
    case OptimizeZorder(root, colA, colB, target) =>
      SnapshotTable.optimizeZOrder(s, root, colA, colB,
        Option(target).map(_.toInt).getOrElse(DefaultTargetFiles))
    case MergeInto(root, clusterCol, idCol, view) =>
      SnapshotTable.merge(s, root, clusterCol, idCol, s.table(view))
    case Vacuum(root, keepFrom) =>
      SnapshotTable.vacuum(root, keepFrom.toInt)
      SnapshotTable.currentVersion(root)
    case other => throw new IllegalArgumentException(
      s"graft-snapshot SQL: cannot parse '${other.trim.take(120)}' — expected " +
        "OPTIMIZE '<path>' CLUSTER BY (col) [TARGET n] | " +
        "OPTIMIZE '<path>' ZORDER BY (a, b) [TARGET n] | " +
        "MERGE INTO '<path>' CLUSTER BY (col) ID (id) USING <view> | " +
        "VACUUM '<path>' KEEP FROM <version>")
  }
}
