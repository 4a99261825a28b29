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
  * Grammar (case-insensitive keywords; `<table>` is either a quoted
  * `'<path>'` table root or a catalog identifier `<catalog>.[ns...]
  * .<name>` registered against [[GraftCatalog]] — the name route a
  * catalog user reaches for first, resolved through the catalog's
  * `root` conf to the same directory the path route addresses):
  *
  *   OPTIMIZE <table> CLUSTER BY (col) [TARGET n]
  *   OPTIMIZE <table> CLUSTER BY (col) [TARGET n] WHERE <col> BETWEEN lo AND hi
  *   OPTIMIZE <table> ZORDER BY (colA, colB) [TARGET n]
  *   MERGE INTO <table> CLUSTER BY (col) ID (idCol) USING <viewName>
  *   MERGE INTO <table> t USING <view> s ON t.<id> = s.<id>
  *     [WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, ...]
  *     [WHEN MATCHED [AND <cond>] THEN DELETE]
  *     [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT *]
  *     [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ...]
  *     [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]
  *   UPDATE <table> SET col = expr [, col = expr]* WHERE <predicate>
  *   RESTORE TABLE <table> TO VERSION AS OF <version | 'tag' | tag>
  *   CREATE TABLE <table> SHALLOW|DEEP CLONE <table> [VERSION AS OF <version | 'tag' | tag>]
  *   REORG TABLE <table> APPLY (PURGE)
  *   ALTER TABLE <table> CREATE TAG <name> [AS OF VERSION <n>]
  *   ALTER TABLE <table> DROP TAG <name>
  *   ALTER TABLE <table> CREATE BRANCH <name> [AS OF VERSION <n>]
  *   ALTER TABLE <table> FAST FORWARD BRANCH <name>   (publish)
  *   ALTER TABLE <table> DROP BRANCH <name>
  *   VACUUM <table> KEEP FROM <version>
  *   VACUUM <table> RETAIN <n> HOURS
  *   VACUUM <table> KEEP FROM <v> DRY RUN | RETAIN <n> HOURS DRY RUN
  *   RESTORE TABLE <table> TO TIMESTAMP AS OF '<ts>'
  *   DESCRIBE HISTORY <table>    (row-returning, parser route only)
  *   DESCRIBE DETAIL <table>     (row-returning, parser route only)
  *   SHOW TAGS <table>           (row-returning, parser route only)
  *   SHOW BRANCHES <table>       (row-returning, parser route only)
  *   DESCRIBE FILES <table>      (row-returning, parser route only)
  *
  * MERGE's source is a registered view/table carrying the table's
  * columns plus `op` ∈ {u, d, i} — the same caller-labeled changeset
  * contract as [[graft.operators.SnapshotTable.merge]]. Every statement
  * returns the table's resulting version. The x16/x17/x22 gate fixtures
  * run through this surface, so the route is oracle-checked every
  * round, not spec-only. */
object SnapshotSql {

  private val DefaultTargetFiles = 16

  // table position: a quoted path OR a dotted catalog identifier —
  // resolved by [[resolveRef]] at exec/parse time
  private val Ref = """'[^']+'|[A-Za-z_][\w.]*"""
  // one or more comma-separated keys: one key is the classic clustered
  // rewrite, N keys the liquid-style multi-key curve (x56)
  private val OptimizeCluster =
    s"""(?is)\\s*OPTIMIZE\\s+($Ref)\\s+CLUSTER\\s+BY\\s+\\((\\w+(?:\\s*,\\s*\\w+)*)\\)(?:\\s+TARGET\\s+(\\d+))?\\s*""".r
  // the SCOPED (incremental) compaction a 100 TB table runs nightly:
  // only files whose key range intersects the window rewrite
  private val OptimizeClusterWhere =
    (s"""(?is)\\s*OPTIMIZE\\s+($Ref)\\s+CLUSTER\\s+BY\\s+\\((\\w+)\\)""" +
      s"""(?:\\s+TARGET\\s+(\\d+))?\\s+WHERE\\s+(\\w+)\\s+BETWEEN\\s+(-?\\d+)\\s+AND\\s+(-?\\d+)\\s*""").r
  private val OptimizeZorder =
    s"""(?is)\\s*OPTIMIZE\\s+($Ref)\\s+ZORDER\\s+BY\\s+\\((\\w+)\\s*,\\s*(\\w+)\\)(?:\\s+TARGET\\s+(\\d+))?\\s*""".r
  private val MergeInto =
    s"""(?is)\\s*MERGE\\s+INTO\\s+($Ref)\\s+CLUSTER\\s+BY\\s+\\((\\w+)\\)\\s+ID\\s+\\((\\w+)\\)\\s+USING\\s+([\\w.]+)\\s*""".r
  // Delta's targeted DV-cleanup verb, spelled identically: rewrite
  // only the files carrying deletion vectors (SnapshotTable.reorgPurge)
  private val Reorg =
    s"""(?is)\\s*REORG\\s+TABLE\\s+($Ref)\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*""".r
  private val Vacuum =
    s"""(?is)\\s*VACUUM\\s+($Ref)\\s+KEEP\\s+FROM\\s+(\\d+)\\s*""".r
  // the production retention spelling (Delta's): cutoff resolved
  // against commit mtimes, time travel inside the window preserved
  private val VacuumRetain =
    s"""(?is)\\s*VACUUM\\s+($Ref)\\s+RETAIN\\s+(\\d+)\\s+HOURS?\\s*""".r
  // Delta's preview spellings: list what WOULD be reclaimed, delete
  // nothing (row-returning — routed by the parser like DESCRIBE)
  private val VacuumRetainDry =
    s"""(?is)\\s*VACUUM\\s+($Ref)\\s+RETAIN\\s+(\\d+)\\s+HOURS?\\s+DRY\\s+RUN\\s*""".r
  private val VacuumKeepDry =
    s"""(?is)\\s*VACUUM\\s+($Ref)\\s+KEEP\\s+FROM\\s+(\\d+)\\s+DRY\\s+RUN\\s*""".r
  private val History =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+($Ref)\\s*""".r
  private val Detail =
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+($Ref)\\s*""".r
  // standard DML spelling, no graft-specific clauses: the one verb a
  // Delta-habituated user types verbatim. The SET/WHERE boundary is
  // found by [[splitTopKeyword]] (quotes, parens respected — a string
  // literal or subquery containing ' WHERE ' must not split);
  // assignments split on top-level commas, so
  // `SET a = f(x, y), b = 'w WHERE z' WHERE ...` parses.
  private val UpdateHead =
    s"""(?is)\\s*UPDATE\\s+($Ref)\\s+SET\\s+(.+?)\\s*""".r

  /** (ref, setsStr, predicate) of an UPDATE statement, or None. */
  private def updateParts(stmt: String): Option[(String, String, String)] =
    stmt match {
      case UpdateHead(ref, rest) => splitTopKeyword(rest, "where")
        .map { case (sets, pred) => (ref, sets, pred) }
      case _ => None
    }

  /** Split `s` at the FIRST top-level occurrence of keyword `kw`
    * (case-insensitive, word-bounded, outside quotes and parens);
    * returns (before, after) without the keyword. */
  private def splitTopKeyword(s: String, kw: String): Option[(String, String)] = {
    var depth = 0; var quote: Char = 0; var btick = false; var i = 0
    val n = s.length
    def word(j: Int): Boolean =
      j + kw.length <= n && s.regionMatches(true, j, kw, 0, kw.length) &&
        (j == 0 || { val c = s.charAt(j - 1); !Character.isLetterOrDigit(c) && c != '_' }) &&
        (j + kw.length == n || { val c = s.charAt(j + kw.length)
          !Character.isLetterOrDigit(c) && c != '_' })
    while (i < n) {
      val c = s.charAt(i)
      if (btick) { if (c == '`') btick = false; i += 1 }
      else if (quote != 0) {
        // backslash-escaped chars stay inside the literal (doubling
        // needs no special case: it closes and reopens)
        if (c == '\\' && i + 1 < n) i += 2
        else { if (c == quote) quote = 0; i += 1 }
      }
      // Spark lexes BOTH '...' and "..." as string literals
      else if (c == '\'' || c == '"') { quote = c; i += 1 }
      else if (c == '`') { btick = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && word(i))
        return Some((s.substring(0, i).trim, s.substring(i + kw.length).trim))
      else i += 1
    }
    None
  }
  // standard DML spelling again: path-addressed row-level delete. The
  // NAME spelling (DELETE FROM catalog.tbl) is deliberately NOT claimed
  // — Spark's own analyzer runs it through the connector's DSv2
  // SupportsDelete, and claiming it here would shadow that standard
  // seam. The path spelling has no delegate that could run it.
  private val Delete =
    s"""(?is)\\s*DELETE\\s+FROM\\s+('[^']+')\\s+WHERE\\s+(.+?)\\s*""".r
  // Delta's undo verb, spelled identically: a metadata-only commit that
  // re-lists the target version's entries (SnapshotTable.restore)
  // the version position takes a NUMBER or a TAG ref (quoted or bare,
  // matching the read side's VERSION AS OF '<tag>' spelling) — restore
  // to a named snapshot is the rollback verb tags exist for
  private val Restore =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+($Ref)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+|'[^']+'|[A-Za-z_][A-Za-z0-9_\\-]*)\\s*""".r
  // timestamp spelling: resolve via the commit clock (ICT-backed) to
  // the newest commit at-or-before the instant, then restore to it
  private val RestoreTs =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+($Ref)\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*""".r
  // Delta's zero-copy fork, spelled identically: the clone's v1 is one
  // manifest commit re-listing the source version's files by reference
  // CLONE's version position takes the same NUMBER-or-TAG refs as
  // RESTORE — snapshot-copying is where named refs are most natural
  private val Clone =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+($Ref)\\s+(SHALLOW|DEEP)\\s+CLONE\\s+($Ref)(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+|'[^']+'|[A-Za-z_][A-Za-z0-9_\\-]*))?\\s*""".r

  /** Resolve a SQL version-position argument — a number, a 'quoted' or
    * bare tag name — against `root`'s refs (the shared decode point of
    * RESTORE's and CLONE's VERSION AS OF). */
  private def versionRefArg(root: String, raw0: String): Int = {
    val raw = raw0.trim
    val ref = if (raw.startsWith("'") && raw.endsWith("'") && raw.length >= 2)
      raw.substring(1, raw.length - 1) else raw
    SnapshotTable.resolveVersionRef(root, ref)
  }
  // the ANSI MERGE spelling (match-discovering; the CLUSTER BY form
  // above is the caller-labeled changeset primitive). Aliases are
  // REQUIRED (they disambiguate every t./s. reference in conditions and
  // SET expressions); ON is one equi-condition between the aliases.
  // `MERGE WITH SCHEMA EVOLUTION INTO` (Delta 3.2's per-statement
  // autoMerge spelling): source columns absent from the target widen it
  // through the merge's capture machinery instead of refusing.
  private val AnsiMerge =
    (s"""(?is)\\s*MERGE\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\s+($Ref)\\s+(?:AS\\s+)?(\\w+)\\s+USING\\s+([\\w.]+)""" +
      s"""\\s+(?:AS\\s+)?(\\w+)\\s+ON\\s+(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)\\s+(WHEN\\s.+?)\\s*""").r
  private val WhenUpdate =
    """(?is)\s*WHEN\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?)\s*""".r
  private val WhenDelete =
    """(?is)\s*WHEN\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE\s*""".r
  private val WhenInsert =
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s+\*\s*""".r
  // the sync family: target rows absent from the source (Delta's
  // WHEN NOT MATCHED BY SOURCE). Conditions/SETs are target-only.
  private val WhenNmbsUpdate =
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?)\s*""".r
  private val WhenNmbsDelete =
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE\s*""".r

  /** Split the WHEN-clause tail at TOP-LEVEL clause boundaries only: a
    * WHEN inside parens, inside a quoted string, or inside a
    * CASE ... END expression (SET v = CASE WHEN ... THEN ... END is
    * everyday merge SQL) must not start a new clause. */
  private[graft] def splitMergeClauses(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var caseDepth = 0; var quote: Char = 0; var btick = false
    var start = 0; var i = 0
    val n = s.length
    def word(j: Int, w: String): Boolean =
      j + w.length <= n && s.regionMatches(true, j, w, 0, w.length) &&
        (j == 0 || { val c = s.charAt(j - 1); !Character.isLetterOrDigit(c) && c != '_' }) &&
        (j + w.length == n || { val c = s.charAt(j + w.length)
          !Character.isLetterOrDigit(c) && c != '_' })
    while (i < n) {
      val c = s.charAt(i)
      if (btick) { if (c == '`') btick = false; i += 1 }
      else if (quote != 0) {
        if (c == '\\' && i + 1 < n) i += 2
        else { if (c == quote) quote = 0; i += 1 }
      }
      else if (c == '\'' || c == '"') { quote = c; i += 1 }
      else if (c == '`') { btick = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (word(i, "case")) { caseDepth += 1; i += 4 }
      else if (caseDepth > 0 && word(i, "end")) { caseDepth -= 1; i += 3 }
      else if (depth == 0 && caseDepth == 0 && word(i, "when") &&
          s.substring(start, i).trim.nonEmpty) {
        out += s.substring(start, i); start = i; i += 4
      }
      else i += 1
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private[graft] def parseMergeClauses(txt: String): Seq[SnapshotTable.MergeWhen] =
    splitMergeClauses(txt).map {
      case WhenUpdate(cond, sets) =>
        SnapshotTable.WhenMatchedUpdate(Option(cond), parseSets(sets))
      case WhenDelete(cond) => SnapshotTable.WhenMatchedDelete(Option(cond))
      // BY SOURCE must be tried before the INSERT pattern so a
      // malformed "NOT MATCHED BY SOURCE THEN INSERT" falls to the
      // loud refusal, not a half-match
      case WhenNmbsUpdate(cond, sets) =>
        SnapshotTable.WhenNotMatchedBySourceUpdate(Option(cond), parseSets(sets))
      case WhenNmbsDelete(cond) =>
        SnapshotTable.WhenNotMatchedBySourceDelete(Option(cond))
      case WhenInsert(cond) => SnapshotTable.WhenNotMatchedInsert(Option(cond))
      case other => throw new IllegalArgumentException(
        s"graft-snapshot SQL: cannot parse MERGE clause '${other.trim.take(100)}' — " +
          "expected WHEN MATCHED [AND <cond>] THEN UPDATE SET ... | " +
          "WHEN MATCHED [AND <cond>] THEN DELETE | " +
          "WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT * | " +
          "WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... | " +
          "WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE")
    }

  // Delta's constraint verbs, spelled identically: ADD validates the
  // resident data then commits `check.<name>` metadata; every write
  // route enforces from that version on. ALTER TABLE is real Spark
  // syntax, so routing is session-aware (see ownsConstraint).
  // Iceberg's named refs, spelled like its SQL extensions: a tag pins
  // a version against VACUUM and makes it addressable by name
  // (VERSION AS OF '<name>', .option("version", "<name>"))
  private val CreateTag =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+CREATE\\s+TAG\\s+([\\w\\-]+)(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*""".r
  private val DropTag =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+DROP\\s+TAG\\s+([\\w\\-]+)\\s*""".r
  // BRANCHES — the writable half of the ref model (write-audit-publish):
  // CREATE BRANCH opens a staging ref, FAST FORWARD publishes it as the
  // next main version (refusing if main advanced), DROP BRANCH abandons
  private val CreateBranch =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+CREATE\\s+BRANCH\\s+([\\w\\-]+)(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*""".r
  private val DropBranch =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+DROP\\s+BRANCH\\s+([\\w\\-]+)\\s*""".r
  private val FastForward =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+FAST\\s+FORWARD\\s+BRANCH\\s+([\\w\\-]+)\\s*""".r
  private val AddConstraint =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*""".r
  private val DropConstraint =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*""".r
  // the PATH spelling of SET/UNSET TBLPROPERTIES (the name route goes
  // through Spark's ALTER analysis into GraftCatalog.alterTable; both
  // feed SnapshotTable.applyTableProperties — one policy point). Only
  // quoted paths are claimed: no delegate could run them.
  private val SetTblProps =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+('[^']+')\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*""".r
  private val UnsetTblProps =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+('[^']+')\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*""".r
  // SQL-standard doubled-quote escaping inside the 'key' = 'value'
  // literals ('it''s' → it's): a generation expression containing a
  // string literal (`case when type = 'x' ...`) is now spellable on
  // the SET TBLPROPERTIES route (ADVICE r15). The alternation consumes
  // quotes only in PAIRS, so `'a' = 'b'` can never mis-group.
  private val PropPair = """(?s)\s*'((?:[^']|'')+)'\s*=\s*'((?:[^']|'')*)'\s*""".r
  private val PropKey = """(?s)\s*'((?:[^']|'')+)'\s*""".r
  private def unq(s: String): String = s.replace("''", "'")
  // the path spelling of TYPE WIDENING (the catalog-name route goes
  // through Spark's own ALTER COLUMN analysis into GraftCatalog)
  // the type capture admits parameterized/multi-word spellings
  // (DECIMAL(18,0), DOUBLE PRECISION) so those statements reach
  // widenColumn's clear unsupported-widening refusal instead of
  // falling through to Spark's parser and dying on the quoted path
  // Delta's identity-column spelling on the ALTER surface: declares a
  // BIGINT column whose values the engine assigns (= the row-tracking
  // ids — dense per-commit contiguous claims); routes to
  // SnapshotTable.setIdentityColumn.
  private val AddIdentity =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ref)\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+BIGINT\\s+""" +
      """GENERATED\s+ALWAYS\s+AS\s+IDENTITY""" +
      // optional options clause, captured RAW and parsed at dispatch:
      // START WITH / INCREMENT BY in either order (or alone) all reach
      // the handler's clear refusals instead of falling through to
      // Spark's parser and a confusing quoted-path error (r17 review)
      """(?:\s*\(([^)]*)\))?\s*""").r
  private val AlterColumnType =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+('[^']+')\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+TYPE\\s+(\\w+(?:\\s*\\([^)]*\\))?(?:\\s+\\w+)?)\\s*""".r
  // the PATH spellings of column-mapping evolution — top-level columns
  // AND struct-field paths at any depth (`a.b`, `a.b.c`, ... — nested
  // column mapping; the catalog-name spelling flows through Spark's
  // own ALTER analysis into GraftCatalog.alterTable, which since r19
  // joins the TableChange fieldNames array onto the same deep
  // field-path surface)
  // Delta's CONVERT TO DELTA, spelled for this format: adopt a plain
  // parquet directory in place as v1 of a snapshot table — one
  // manifest commit, zero copies. CLUSTER BY names the stats column
  // footer stats are harvested for (omit it for rows-only entries).
  private val Convert =
    s"""(?is)\\s*CONVERT\\s+TO\\s+SNAPSHOT\\s+($Ref)(?:\\s+CLUSTER\\s+BY\\s+\\((\\w+)\\))?\\s*""".r
  private val RenameCol =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+('[^']+')\\s+RENAME\\s+COLUMN\\s+(\\w+(?:\\.\\w+)*)\\s+TO\\s+(\\w+)\\s*""".r
  private val DropCol =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+('[^']+')\\s+DROP\\s+COLUMN\\s+(\\w+(?:\\.\\w+)*)\\s*""".r

  private val Quoted = "'([^']+)'".r

  /** Resolve a statement's table reference to a table root directory: a
    * quoted `'<path>'` verbatim, or a `<catalog>.[ns...].<name>`
    * identifier through the registered [[GraftCatalog]]'s `root` conf —
    * the same name→directory mapping `loadTable` walks, so the name and
    * path routes address the SAME table. A name whose catalog is not a
    * graft catalog is refused loudly (these verbs are not Spark SQL, so
    * there is no delegate that could run them). */
  private[graft] def resolveRef(s: SparkSession, ref: String): String = ref match {
    case Quoted(p) => p
    case ident =>
      val parts = ident.split('.')
      require(parts.length >= 2, s"graft-snapshot SQL: table reference '$ident' must be " +
        "a quoted '<path>' or a qualified <catalog>.<table> name")
      val catKey = s"spark.sql.catalog.${parts.head}"
      val cls = s.conf.getOption(catKey)
      require(cls.contains(classOf[GraftCatalog].getName),
        s"graft-snapshot SQL: '$ident' does not name a graft catalog table — " +
          s"$catKey is ${cls.getOrElse("unset")}")
      (s.conf.get(s"$catKey.root") +: parts.tail.toSeq).mkString("/")
  }

  /** DESCRIBE HISTORY <table> — the statement's table root, when the
    * statement is one. Routed by the parser to a row-returning command
    * (unlike the version-returning maintenance verbs). */
  private[graft] def historyRoot(s: SparkSession, stmt: String): Option[String] = stmt match {
    // an unresolvable name (not a graft catalog) falls through to the
    // delegate parser rather than erroring at parse time — DESCRIBE is
    // real Spark syntax, unlike the maintenance verbs below
    case History(ref) => scala.util.Try(resolveRef(s, ref)).toOption
    case _ => None
  }

  private val ShowTags =
    s"""(?is)\\s*SHOW\\s+TAGS\\s+($Ref)\\s*""".r
  private val ShowBranches =
    s"""(?is)\\s*SHOW\\s+BRANCHES\\s+($Ref)\\s*""".r

  private val DescFiles =
    s"""(?is)\\s*DESCRIBE\\s+FILES\\s+($Ref)\\s*""".r

  /** DESCRIBE FILES <table> — the statement's table root, when it is
    * one (row-returning like DESCRIBE HISTORY; DESCRIBE is real Spark
    * syntax, so an unresolvable name falls through). */
  private[graft] def filesRoot(s: SparkSession, stmt: String): Option[String] =
    stmt match {
      case DescFiles(ref) => scala.util.Try(resolveRef(s, ref)).toOption
      case _ => None
    }

  /** One row per CURRENT-version manifest entry (Iceberg's `.files`
    * metadata table, flattened): rel path, footer row count, data
    * bytes, and the stats column's [lo, hi] — the exact inputs the
    * pruning planner works from, zero data-file IO (legacy stats-less
    * entries surface NULL rows/bounds — the honest "never prunes"
    * signal). The operator's layout/pruning debugger: \"why did this
    * query open N files\" answers from these rows. */
  def describeFiles(root: String): Seq[(String, Option[Long], Long,
      Option[String], Option[Long], Option[Long], Option[String])] = {
    val v = SnapshotTable.currentVersion(root)
    if (v == 0) Nil
    else {
      val statsCol = SnapshotTable.manifestMeta(root, v).get("statsCol")
      SnapshotTable.manifestEntries(root, v).map { e =>
        val hasStats = e.rows >= 0
        // SECONDARY per-column ranges (r20's general harvest; the
        // z-order pair on older tables) — the multi-column half of
        // the planner's inputs. The reserved size slot is not a stat.
        val extras = e.extra.filterNot(_._1 == "__bytes")
          .map { case (c, lo, hi) => s"$c:$lo:$hi" }.mkString(";")
        (e.rel, if (hasStats) Some(e.rows) else None,
          SnapshotTable.entryBytes(root, e),
          statsCol.filter(_ => hasStats),
          if (hasStats) Some(e.lo) else None,
          if (hasStats) Some(e.hi) else None,
          if (extras.isEmpty) None else Some(extras))
      }
    }
  }

  /** SHOW TAGS <table> — the statement's table root, when it is one.
    * Row-returning like DESCRIBE HISTORY (one row per named ref);
    * SHOW is real Spark syntax, so an unresolvable name falls through
    * to the delegate. */
  private[graft] def showTagsRoot(s: SparkSession, stmt: String): Option[String] =
    stmt match {
      case ShowTags(ref) => scala.util.Try(resolveRef(s, ref)).toOption
      case _ => None
    }

  /** SHOW BRANCHES <table> — routing twin of [[showTagsRoot]]. */
  private[graft] def showBranchesRoot(s: SparkSession, stmt: String): Option[String] =
    stmt match {
      case ShowBranches(ref) => scala.util.Try(resolveRef(s, ref)).toOption
      case _ => None
    }

  /** (name, base version, staged commit count) of every live branch —
    * current-version state, name-sorted. */
  def showBranches(root: String): Seq[(String, Int, Int)] = {
    val cur = SnapshotTable.currentVersion(root)
    if (cur == 0) Nil
    else SnapshotTable.branchesOf(SnapshotTable.manifestMeta(root, cur))
      .toSeq.sortBy(_._1)
      .map { case (n, base) => (n, base, SnapshotTable.branchHead(root, n)) }
  }

  /** (name, pinned version) of every live tag — current-version state,
    * name-sorted. */
  def showTags(root: String): Seq[(String, Int)] = {
    val cur = SnapshotTable.currentVersion(root)
    if (cur == 0) Nil
    else SnapshotTable.tagsOf(SnapshotTable.manifestMeta(root, cur))
      .toSeq.sortBy(_._1)
  }

  /** DESCRIBE DETAIL <table> — routing twin of [[historyRoot]]. */
  private[graft] def detailRoot(s: SparkSession, stmt: String): Option[String] = stmt match {
    case Detail(ref) => scala.util.Try(resolveRef(s, ref)).toOption
    case _ => None
  }

  /** The current snapshot's one-row summary (Delta's DESCRIBE DETAIL
    * shape): location, version, file/row counts, total data bytes, and
    * the carried metadata — all from the manifest (byte sizes ride the
    * entries since r19; pre-r19 entries fall back to one `Files.size`
    * each), zero data-file IO. */
  def describeDetail(root: String): (String, Int, Long, Option[Long], Long, String) = {
    val v = SnapshotTable.currentVersion(root)
    val entries = if (v == 0) Nil else SnapshotTable.manifestEntries(root, v)
    val bytes = entries.map(SnapshotTable.entryBytes(root, _)).sum
    val meta = if (v == 0) "" else SnapshotTable.manifestMeta(root, v).toSeq.sorted
      .map { case (k, x) => s"$k=${x.take(60)}" }.mkString(",")
    // a stats-less legacy entry carries rows = -1: the count is then
    // UNKNOWN (null), not a negative sum — same guard the COUNT(*)
    // manifest fast path applies
    val rows = if (entries.forall(_.rows >= 0)) Some(entries.map(_.rows).sum) else None
    (root, v, entries.size.toLong, rows, bytes, meta)
  }

  /** One row per still-present version (vacuumed manifests are skipped):
    * version, commit timestamp millis (the TIMESTAMP AS OF clock —
    * in-commit stamps when present), file count, manifest row count,
    * and the `#key=value` metadata — Delta's DESCRIBE HISTORY shape
    * over the manifest log. */
  /** CHECKPOINT-ACCELERATED since r20: one summary-file read + the
    * ≤K manifests above the latest checkpoint, instead of an
    * O(versions) walk (the full walk remains the fallback when no
    * checkpoint exists). Only VACUUMED versions are skipped; a gated
    * version (unknown reader feature) refuses loudly — silently
    * hiding it from the history would mask the very state the
    * operator needs to see. */
  def describeHistory(root: String): Seq[(Int, Long, Long, Long, String)] =
    SnapshotTable.historyRows(root)

  /** Whether this statement belongs to the graft maintenance grammar —
    * the [[graft.plans.GraftSqlParser]] routing test. Deliberately the
    * SAME regexes exec dispatches on, so "owned but unparseable" is
    * impossible and everything un-owned falls through to Spark's
    * parser. */
  /** VACUUM ... DRY RUN routing — row-returning like DESCRIBE, so the
    * parser maps it to its own command; resolution of the keep floor
    * happens at RUN time (the preview must see the then-current
    * clock). */
  private[graft] def vacuumDryRunTarget(s: SparkSession,
      stmt: String): Option[(String, Either[Int, Double])] = stmt match {
    case VacuumRetainDry(ref, hours) =>
      scala.util.Try(resolveRef(s, ref)).toOption.map((_, Right(hours.toDouble)))
    case VacuumKeepDry(ref, kf) =>
      scala.util.Try(resolveRef(s, ref)).toOption.map((_, Left(kf.toInt)))
    case _ => None
  }

  /** The DRY RUN's row list for a routed target. */
  def vacuumDryRunPaths(root: String, spec: Either[Int, Double]): Seq[String] =
    spec match {
      case Left(keepFrom) => SnapshotTable.vacuumDryRun(root, keepFrom)
      case Right(hours) =>
        val kf = SnapshotTable.vacuumRetainKeepFrom(root, hours)
        if (kf == 0) Nil else SnapshotTable.vacuumDryRun(root, kf)
    }

  private[graft] def owns(stmt: String): Boolean = stmt match {
    // DESCRIBE HISTORY is deliberately NOT here: the parser routes it
    // through historyRoot, which falls through to the delegate when the
    // reference doesn't resolve (DESCRIBE is real Spark syntax another
    // extension in the session may own) — claiming it here would turn
    // that fall-through into an exec-time parse error
    case OptimizeCluster(_, _, _) | OptimizeClusterWhere(_, _, _, _, _, _)
       | OptimizeZorder(_, _, _, _)
       | MergeInto(_, _, _, _) | Vacuum(_, _) | VacuumRetain(_, _)
       | Reorg(_) | Convert(_, _) => true
    case _ => false
  }

  /** UPDATE routing — session-aware like [[historyRoot]], because
    * UPDATE is real Spark syntax (DSv2 row-level DML): a quoted-path
    * target is claimed unconditionally (no delegate could run it), an
    * identifier target only when it resolves through a registered graft
    * catalog — anything else falls through to Spark's parser so a
    * Delta/Iceberg UPDATE in the same session is untouched. */
  private[graft] def ownsUpdate(s: SparkSession, stmt: String): Boolean =
    updateParts(stmt).exists { case (ref, _, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess }

  /** DELETE routing — only the quoted-path spelling is claimed (see
    * [[Delete]]): a name-addressed DELETE is real Spark DSv2 DML and
    * must keep flowing through the delegate parser to the connector's
    * `SupportsDelete`. */
  private[graft] def ownsDelete(stmt: String): Boolean = stmt match {
    case Delete(_, _) => true
    case _ => false
  }

  /** RESTORE routing — session-aware like [[ownsUpdate]]: RESTORE is
    * not Spark syntax, but another extension (Delta) in the same
    * session may own the spelling for ITS tables, so an identifier
    * target is claimed only when it resolves through a graft catalog;
    * a quoted-path target is claimed unconditionally. */
  private[graft] def ownsRestore(s: SparkSession, stmt: String): Boolean = stmt match {
    case Restore(ref, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case RestoreTs(ref, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case _ => false
  }

  /** SHALLOW CLONE routing — CREATE TABLE is real Spark syntax, so the
    * statement is claimed only when BOTH references resolve here (a
    * quoted path, or an identifier through a graft catalog); a Delta
    * clone or a plain CREATE TABLE in the same session is untouched. */
  private[graft] def ownsClone(s: SparkSession, stmt: String): Boolean = stmt match {
    case Clone(dst, _, src, _) => Seq(dst, src).forall(r =>
      r.startsWith("'") || scala.util.Try(resolveRef(s, r)).isSuccess)
    case _ => false
  }

  /** ANSI-MERGE routing — MERGE INTO is real Spark syntax (DSv2
    * row-level DML), so the statement is claimed like UPDATE's rule: a
    * quoted-path target unconditionally, an identifier target only when
    * it resolves through a graft catalog — a Delta/Iceberg MERGE in the
    * same session falls through untouched. The custom CLUSTER BY form
    * cannot collide (its shape has no aliases/ON). */
  private[graft] def ownsAnsiMerge(s: SparkSession, stmt: String): Boolean = stmt match {
    case AnsiMerge(_, ref, _, _, _, _, _, _, _, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case _ => false
  }

  /** ADD/DROP CONSTRAINT routing — ALTER TABLE is real Spark syntax,
    * so a quoted-path target is claimed unconditionally and an
    * identifier only when it resolves through a graft catalog; a
    * Delta constraint statement in the same session is untouched. */
  private[graft] def ownsConstraint(s: SparkSession, stmt: String): Boolean = stmt match {
    case AddConstraint(ref, _, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case DropConstraint(ref, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case CreateTag(ref, _, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case DropTag(ref, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case CreateBranch(ref, _, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case DropBranch(ref, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case FastForward(ref, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    // path-addressed widening and TBLPROPERTIES are claimed
    // unconditionally (quoted paths have no delegate); the name
    // spellings stay with Spark's analyzer
    case AddIdentity(ref, _, _) => ref.startsWith("'") ||
      scala.util.Try(resolveRef(s, ref)).isSuccess
    case AlterColumnType(_, _, _) => true
    case SetTblProps(_, _) | UnsetTblProps(_, _) => true
    case RenameCol(_, _, _) | DropCol(_, _) => true
    case _ => false
  }

  /** Split on top-level commas: parens, single-quoted strings (with
    * backslash escapes), and backtick identifiers are opaque — the
    * same scanner discipline as [[splitTopKeyword]]. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var quote: Char = 0; var btick = false; var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (btick) { if (c == '`') btick = false; i += 1 }
      else if (quote != 0) {
        if (c == '\\' && i + 1 < s.length) i += 2
        else { if (c == quote) quote = 0; i += 1 }
      }
      else {
        c match {
          case '\'' | '"' => quote = c
          case '`' => btick = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            out += s.substring(start, i); start = i + 1
          case _ =>
        }
        i += 1
      }
    }
    out += s.substring(start)
    out.toSeq
  }

  private def parseSets(setsStr: String): Seq[(String, String)] =
    splitTop(setsStr).map { a =>
      a.split("=", 2) match {
        case Array(c, e) if c.trim.matches("""\w+""") && e.trim.nonEmpty =>
          (c.trim, e.trim)
        case _ => throw new IllegalArgumentException(
          s"graft-snapshot SQL: cannot parse SET assignment '${a.trim}' — " +
            "expected <column> = <expression>")
      }
    }

  /** Parse and run one maintenance statement; returns the table's
    * version after the operation. */
  def exec(s: SparkSession, stmt: String): Int = stmt match {
    case OptimizeClusterWhere(ref, keyCol, target, wcol, lo, hi) =>
      require(wcol.equalsIgnoreCase(keyCol),
        s"graft-snapshot SQL: scoped OPTIMIZE's WHERE column ($wcol) must be " +
          s"the cluster column ($keyCol) — the scope prunes by its stats")
      SnapshotTable.optimizeClusteredWhere(s, resolveRef(s, ref), keyCol,
        lo.toLong, hi.toLong,
        Option(target).map(_.toInt).getOrElse(DefaultTargetFiles))
    case RestoreTs(ref, ts) =>
      SnapshotTable.restoreToTimestamp(resolveRef(s, ref),
        SnapshotTable.parseTsLiteral(ts))
    case OptimizeCluster(ref, keyCols, target) =>
      SnapshotTable.optimizeClusterBy(s, resolveRef(s, ref),
        keyCols.split(',').toSeq.map(_.trim),
        Option(target).map(_.toInt).getOrElse(DefaultTargetFiles))
    case OptimizeZorder(ref, colA, colB, target) =>
      SnapshotTable.optimizeZOrder(s, resolveRef(s, ref), colA, colB,
        Option(target).map(_.toInt).getOrElse(DefaultTargetFiles))
    case MergeInto(ref, clusterCol, idCol, view) =>
      SnapshotTable.merge(s, resolveRef(s, ref), clusterCol, idCol, s.table(view))
    case AnsiMerge(evolution, ref, tAlias, srcView, sAlias, a1, c1, a2, c2, whenTxt) =>
      val (tCol, sCol) =
        if (a1 == tAlias && a2 == sAlias) (c1, c2)
        else if (a1 == sAlias && a2 == tAlias) (c2, c1)
        else throw new IllegalArgumentException(
          s"graft-snapshot SQL: MERGE ON must equate $tAlias.<col> = $sAlias.<col> " +
            s"(got $a1.$c1 = $a2.$c2)")
      SnapshotTable.ansiMerge(s, resolveRef(s, ref), tAlias, srcView, sAlias,
        tCol, sCol, parseMergeClauses(whenTxt), autoMerge = evolution != null)
    case stmt0 if updateParts(stmt0).isDefined =>
      val (ref, setsStr, pred) = updateParts(stmt0).get
      SnapshotTable.update(s, resolveRef(s, ref), parseSets(setsStr), pred)
    case Delete(ref, pred) =>
      SnapshotTable.delete(s, resolveRef(s, ref), pred)
    case Restore(ref, toVersion) =>
      val root = resolveRef(s, ref)
      SnapshotTable.restore(root, versionRefArg(root, toVersion))
    case Clone(dst, mode, src, version) =>
      val srcRoot = resolveRef(s, src)
      val v = Option(version).map(versionRefArg(srcRoot, _))
      if (mode.equalsIgnoreCase("deep"))
        SnapshotTable.deepClone(s, srcRoot, resolveRef(s, dst), v)
      else
        SnapshotTable.shallowClone(srcRoot, resolveRef(s, dst), v)
    case CreateTag(ref, name, version) =>
      SnapshotTable.createTag(resolveRef(s, ref), name,
        Option(version).map(_.toInt))
    case DropTag(ref, name) =>
      SnapshotTable.dropTag(resolveRef(s, ref), name)
    case CreateBranch(ref, name, version) =>
      SnapshotTable.createBranch(resolveRef(s, ref), name,
        Option(version).map(_.toInt))
    case DropBranch(ref, name) =>
      SnapshotTable.dropBranch(resolveRef(s, ref), name)
    case FastForward(ref, name) =>
      SnapshotTable.fastForwardBranch(resolveRef(s, ref), name)
    case AddConstraint(ref, name, exprSql) =>
      SnapshotTable.addCheckConstraint(s, resolveRef(s, ref), name, exprSql.trim)
    case DropConstraint(ref, name) =>
      SnapshotTable.dropCheckConstraint(resolveRef(s, ref), name)
    case AddIdentity(ref, colName, optsRaw) =>
      val opts = Option(optsRaw).map(_.trim).getOrElse("")
      val StartR = """(?i)START\s+WITH\s+(-?\d+)""".r
      val StepR = """(?i)INCREMENT\s+BY\s+(-?\d+)""".r
      val starts = StartR.findAllMatchIn(opts).map(_.group(1)).toSeq
      val steps = StepR.findAllMatchIn(opts).map(_.group(1)).toSeq
      // strict: exactly one of each clause at most, nothing else in the
      // options — a duplicate/conflicting clause must refuse, never
      // silently honor the first (r17 review)
      require(starts.size <= 1 && steps.size <= 1,
        s"graft-snapshot SQL: duplicate identity option in '($opts)' — " +
          "supported: (START WITH <n> [INCREMENT BY 1])")
      val leftover = StepR.replaceAllIn(StartR.replaceAllIn(opts, ""), "").trim
      require(leftover.isEmpty,
        s"graft-snapshot SQL: unrecognized identity option(s) '$leftover' — " +
          "supported: (START WITH <n> [INCREMENT BY 1])")
      def asLong(raw: String, what: String): Long =
        try raw.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft-snapshot SQL: $what $raw is out of BIGINT range") }
      val step = steps.headOption.map(asLong(_, "INCREMENT BY")).getOrElse(1L)
      require(step == 1L,
        s"graft-snapshot SQL: INCREMENT BY $step — identity values are " +
          "the engine's dense row ids (step 1); custom increments are not supported")
      SnapshotTable.setIdentityColumn(s, resolveRef(s, ref), colName,
        starts.headOption.map(asLong(_, "START WITH")).getOrElse(0L))
    case AlterColumnType(ref, colName, tpe) =>
      SnapshotTable.widenColumn(s, resolveRef(s, ref), colName,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(tpe))
    case Convert(ref, statsCol) =>
      SnapshotTable.convertInPlace(s, resolveRef(s, ref),
        Option(statsCol).getOrElse(""))
    case RenameCol(ref, from, to) =>
      SnapshotTable.renameColumn(s, resolveRef(s, ref), from, to)
    case DropCol(ref, name) =>
      SnapshotTable.dropColumn(s, resolveRef(s, ref), name)
    case SetTblProps(ref, propList) =>
      val root = resolveRef(s, ref)
      val sets = splitTop(propList).map {
        case PropPair(k, v) => (unq(k), unq(v))
        case other => throw new IllegalArgumentException(
          s"graft-snapshot SQL: SET TBLPROPERTIES entries are 'key' = 'value', " +
            s"got '${other.trim}'")
      }
      SnapshotTable.applyTableProperties(s, root, sets, Nil)
      SnapshotTable.currentVersion(root)
    case UnsetTblProps(ref, propList) =>
      val root = resolveRef(s, ref)
      val unsets = splitTop(propList).map {
        case PropKey(k) => unq(k)
        case other => throw new IllegalArgumentException(
          s"graft-snapshot SQL: UNSET TBLPROPERTIES entries are 'key', " +
            s"got '${other.trim}'")
      }
      SnapshotTable.applyTableProperties(s, root, Nil, unsets)
      SnapshotTable.currentVersion(root)
    case Reorg(ref) =>
      SnapshotTable.reorgPurge(s, resolveRef(s, ref))
    case Vacuum(ref, keepFrom) =>
      val root = resolveRef(s, ref)
      SnapshotTable.vacuum(root, keepFrom.toInt)
      SnapshotTable.currentVersion(root)
    case VacuumRetain(ref, hours) =>
      val root = resolveRef(s, ref)
      SnapshotTable.vacuumRetain(root, hours.toDouble)
      SnapshotTable.currentVersion(root)
    case other => throw new IllegalArgumentException(
      s"graft-snapshot SQL: cannot parse '${other.trim.take(120)}' — expected " +
        "OPTIMIZE <table> CLUSTER BY (col) [TARGET n] | " +
        "OPTIMIZE <table> ZORDER BY (a, b) [TARGET n] | " +
        "MERGE INTO <table> CLUSTER BY (col) ID (id) USING <view> | " +
        "MERGE INTO <table> [AS] t USING <view> [AS] s ON t.<id> = s.<id> WHEN ... | " +
        "UPDATE <table> SET <col> = <expr>[, ...] WHERE <pred> | " +
        "DELETE FROM '<path>' WHERE <pred> | " +
        "RESTORE TABLE <table> TO VERSION AS OF <version> | " +
        "RESTORE TABLE <table> TO TIMESTAMP AS OF '<ts>' | " +
        "ALTER TABLE <table> ADD CONSTRAINT <name> CHECK (<expr>) | " +
        "ALTER TABLE <table> DROP CONSTRAINT <name> | " +
        "ALTER TABLE '<path>' ALTER COLUMN <col> TYPE <wider> | " +
        "ALTER TABLE '<path>' RENAME COLUMN <col[.field...]> TO <new> | " +
        "ALTER TABLE '<path>' DROP COLUMN <col[.field...]> | " +
        "ALTER TABLE '<path>' SET TBLPROPERTIES ('k' = 'v') | " +
        "ALTER TABLE '<path>' UNSET TBLPROPERTIES ('k') | " +
        "CREATE TABLE <table> SHALLOW|DEEP CLONE <table> [VERSION AS OF <version>] | " +
        "CONVERT TO SNAPSHOT '<path>' [CLUSTER BY (col)] | " +
        "REORG TABLE <table> APPLY (PURGE) | " +
        "VACUUM <table> KEEP FROM <version> | " +
        "VACUUM <table> RETAIN <n> HOURS  (<table> = '<path>' or <catalog>.<name>)")
  }
}
