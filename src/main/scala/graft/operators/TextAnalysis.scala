package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Text analysis for LLM-training-data pipelines (SURVEY.md §2e):
  * language ID, quality scoring, token counting, fingerprinting, term
  * stats — all per-row scalar expressions (whole-stage codegen, no
  * shuffle except the final ordering / per-source aggregation), which is
  * exactly what survives a 100 TB corpus: a single parallel scan.
  *
  * Token-level counts use array ops on `split(text, ' ')` rather than
  * string replace tricks so the semantics are identical in DuckDB
  * (`list_filter`/`string_split`) with no overlap-handling ambiguity.
  */
object TextAnalysis {

  // limit=-1 keeps trailing empty strings: Java's split drops them,
  // DuckDB's string_split keeps them, so without the -1 a document whose
  // text ends in a space tokenizes differently in the two engines. With
  // it, split(text, " ", -1) ≡ string_split(text, ' ') on EVERY input.
  private def toks(c: Column): Column = split(c, " ", -1)

  /** The cross-engine whitespace contract (t3/t15). Never use a bare
    * `\s` in anything oracle-checked: Java's `\s` is `[ \t\n\x0B\f\r]`
    * while RE2's (DuckDB's regex engine) is `[ \t\n\f\r]` — a document
    * containing a vertical tab (0x0B) tokenizes differently. The class
    * below is spelled out so both engines see the identical set, and
    * empty tokens are removed on BOTH sides (Java split drops only
    * TRAILING empties; string_split_regex keeps leading and trailing). */
  private[graft] val WsSet = " \\t\\n\\x0B\\f\\r"
  private[graft] val WsRe = s"[$WsSet]+"
  private[graft] val BpeRe = s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9$WsSet]"
  /** Whitespace token count under the pinned contract: explicit class,
    * empty tokens removed. Empty / whitespace-only text → 0 tokens. */
  private[graft] def wsTokens(c: Column): Column =
    size(array_remove(split(c, WsRe, -1), "")).cast("long")
  private def hits(c: Column, word: String): Column =
    size(filter(toks(c), t => t === lit(word))).cast("long")

  /** t1's language vote as one expression — shared by t1 (which also
    * surfaces the per-language hit counts) and t7's fused verdict scan,
    * so the two can never drift. */
  private def langPredExpr(c: Column): Column = {
    val (en, fr, es, de) = (hits(c, "the"), hits(c, "le"), hits(c, "el"), hits(c, "der"))
    when(en >= fr && en >= es && en >= de, "en")
      .when(fr >= es && fr >= de, "fr")
      .when(es >= de, "es")
      .otherwise("de")
  }

  /** t2's quality score as one expression (same arithmetic, same
    * operand order) for t7's fused verdict scan. t2 itself keeps its
    * named-intermediate formulation (those columns are its output);
    * the t2 and t7 DuckDB oracles jointly pin the two equal. */
  private def qualityExpr(c: Column): Column = {
    val t = toks(c)
    val nTok = size(t).cast("long")
    val ttr = size(array_distinct(t)).cast("long").cast("double") / nTok
    val avgTokLen =
      (length(c).cast("long") - (nTok - lit(1L))).cast("double") / nTok
    val stopRatio = (hits(c, "the") + hits(c, "a")).cast("double") / nTok
    lit(0.5) * ttr +
      lit(0.3) * (lit(1.0) - abs(avgTokLen - lit(5.0)) / lit(10.0)) +
      lit(0.2) * (lit(1.0) - stopRatio)
  }

  /** t1_langid — stopword-marker language ID. On this synthetic corpus
    * the markers are shared English-ish vocab, so predictions skew 'en';
    * the operator contract is the deterministic scoring, not accuracy. */
  def t1Langid(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        hits(col("text"), "the").as("en_hits"),
        hits(col("text"), "le").as("fr_hits"),
        hits(col("text"), "el").as("es_hits"),
        hits(col("text"), "der").as("de_hits"),
        langPredExpr(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val t1Sql: String =
    """SELECT doc_id, lang,
      |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS BIGINT) AS en_hits,
      |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'le')) AS BIGINT) AS fr_hits,
      |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'el')) AS BIGINT) AS es_hits,
      |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'der')) AS BIGINT) AS de_hits,
      |  CASE
      |    WHEN len(list_filter(string_split(text, ' '), t -> t = 'the')) >= len(list_filter(string_split(text, ' '), t -> t = 'le'))
      |     AND len(list_filter(string_split(text, ' '), t -> t = 'the')) >= len(list_filter(string_split(text, ' '), t -> t = 'el'))
      |     AND len(list_filter(string_split(text, ' '), t -> t = 'the')) >= len(list_filter(string_split(text, ' '), t -> t = 'der')) THEN 'en'
      |    WHEN len(list_filter(string_split(text, ' '), t -> t = 'le')) >= len(list_filter(string_split(text, ' '), t -> t = 'el'))
      |     AND len(list_filter(string_split(text, ' '), t -> t = 'le')) >= len(list_filter(string_split(text, ' '), t -> t = 'der')) THEN 'fr'
      |    WHEN len(list_filter(string_split(text, ' '), t -> t = 'el')) >= len(list_filter(string_split(text, ' '), t -> t = 'der')) THEN 'es'
      |    ELSE 'de' END AS lang_pred
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t2_quality — heuristic quality score: type/token ratio, token-length
    * shape, stopword share. Pure per-row double arithmetic on exact
    * integer counts → bit-identical across engines. */
  def t2Quality(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("long")
    val nChars = length(col("text")).cast("long")
    val uniq = size(array_distinct(t)).cast("long")
    val stop = (hits(col("text"), "the") + hits(col("text"), "a")).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), nTok.as("n_tokens"), nChars.as("n_chars_m"),
        uniq.as("n_uniq"), stop.as("n_stop"))
      .withColumn("ttr", col("n_uniq").cast("double") / col("n_tokens"))
      .withColumn("avg_tok_len",
        (col("n_chars_m") - (col("n_tokens") - lit(1L))).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality",
        lit(0.5) * col("ttr")
          + lit(0.3) * (lit(1.0) - abs(col("avg_tok_len") - lit(5.0)) / lit(10.0))
          + lit(0.2) * (lit(1.0) - col("stop_ratio")))
      .withColumn("keep", when(col("quality") >= 0.5, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  val t2Sql: String =
    """WITH b AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_m,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'the'))
      |     + len(list_filter(string_split(text, ' '), t -> t = 'a')) AS BIGINT) AS n_stop
      |  FROM documents),
      |r AS (SELECT *,
      |  CAST(n_uniq AS DOUBLE) / n_tokens AS ttr,
      |  CAST(n_chars_m - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_tok_len,
      |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio FROM b)
      |SELECT doc_id, n_tokens, n_chars_m, n_uniq, n_stop, ttr, avg_tok_len, stop_ratio,
      |  0.5 * ttr + 0.3 * (1.0 - abs(avg_tok_len - 5.0) / 10.0)
      |    + 0.2 * (1.0 - stop_ratio) AS quality,
      |  CASE WHEN 0.5 * ttr + 0.3 * (1.0 - abs(avg_tok_len - 5.0) / 10.0)
      |    + 0.2 * (1.0 - stop_ratio) >= 0.5 THEN 1 ELSE 0 END AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  /** t3_tokens — token counting: whitespace tokens and a BPE-ish
    * pre-tokenizer regex (letter runs / digit runs / single symbols).
    * Both counts run under the [[WsRe]]/[[BpeRe]] pinned contract —
    * explicit whitespace class, empty tokens filtered on both engines. */
  def t3Tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        wsTokens(col("text")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit(BpeRe), lit(0))).cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("chars"))
      .orderBy("doc_id")

  val t3Sql: String =
    s"""SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(text, '$WsRe'), x -> x <> '')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '$BpeRe')) AS BIGINT) AS bpe_tokens,
      |  CAST(length(text) AS BIGINT) AS chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t4_fingerprint — rolling polynomial hash over token xxhash64s,
    * kept modular (p = 1e9+7) so the arithmetic never leaves the exact
    * long domain (Spark 4 runs ANSI mode: wraparound would throw). No
    * DuckDB twin for xxhash64 → driver records rows-only; TextSpec pins
    * exact values for determinism. */
  def t4Fingerprint(s: SparkSession, d: String): DataFrame = {
    val p = lit(1000000007L)
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(toks(col("text")), lit(0L),
          (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), p), p)).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** t5_tf_topterms — top-5 terms per source by frequency: explode →
    * per-source counts (map-side combine collapses the explosion before
    * the shuffle) → windowed top-k. */
  def t5TfTopterms(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(desc("c"), asc("term"))
    Tables.documents(s, d)
      .select(col("source"), explode(toks(col("text"))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy("source", "rk")
  }

  val t5Sql: String =
    """SELECT * FROM (
      |  SELECT source, term, COUNT(*) AS c,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY COUNT(*) DESC, term ASC) AS rk
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents) x
      |  GROUP BY source, term) t
      |WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  /** t6_bigram_stats — corpus bigram language-model counts: top-20
    * bigrams with document frequency — the n-gram statistics an
    * LLM-data pipeline keeps for contamination checks and quality
    * priors.
    *
    * Scale shape: the count shuffle carries 8-byte bigram HASHES
    * (native codegen'd `bigram_hashes` kernel), never strings — a
    * string-keyed groupBy here rewrites the whole corpus through the
    * shuffle ×2 (once for counts, once inside countDistinct's partial
    * pass). Display strings are recovered afterwards by a broadcast
    * semi-join of the ≤~20-row winner set against per-doc (hash,
    * string) entries — a second narrow scan, no string shuffle. The
    * threshold and winner branches RECOMPUTE the counts aggregate
    * (plan-level exchange reuse is a planner coincidence, not a
    * contract): measured at bench scale, the re-run costs less than
    * materializing the vocab frame; at true corpus scale the
    * production form caches/checkpoints `counts` once and the rest of
    * the plan is unchanged. Tie-breaks at the top-20 boundary stay
    * exact because every hash tied with the 20th count survives to
    * the final string sort. */
  def t6BigramStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs
      .select(col("doc_id"), explode(graft.functions.bigram_hashes(col("text"))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
    // inclusive threshold: every hash whose count ties the 20th-highest
    // survives, so the string tie-break below sees all contenders
    val c20 = counts.orderBy(desc("n_occurrences")).limit(20)
      .agg(min(col("n_occurrences")).as("c20"))
    val winners = counts.crossJoin(broadcast(c20))
      .filter(col("n_occurrences") >= col("c20"))
      .drop("c20")
    val strings = docs
      .select(explode(graft.functions.bigram_entries(col("text"))).as("e"))
      .select(col("e.h").as("h"), col("e.bg").as("bg"))
      .join(broadcast(winners.select("h")), "h")
      .groupBy(col("h")).agg(min(col("bg")).as("bigram"))
    winners.join(strings, "h")
      .select("bigram", "n_occurrences", "doc_freq")
      .orderBy(desc("n_occurrences"), asc("bigram"))
      .limit(20)
  }

  // --- t9_pii_redact ------------------------------------------------
  // The synthetic corpus carries no natural PII, so the operator first
  // INJECTS deterministic synthetic PII derived from doc_id (both the
  // Spark side and the DuckDB oracle construct the identical augmented
  // text), then runs the real detection/redaction machinery over it —
  // the regexes, the counting, and the residual-check are what a
  // production scrubbing pass runs; only the test fixture is synthetic
  // (same pattern as m1's synthesized binary payloads).
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "555-[0-9]{4}"

  /** t9_pii_redact — PII scrubbing, the pass every LLM training-data
    * pipeline runs before anything ships: detect emails/phones by
    * regex, count them per document, redact them to typed placeholder
    * tokens, and report the per-source audit (docs affected, matches
    * by type, residual matches after redaction — which the oracle
    * proves is ZERO). Pure per-row regex work → single parallel scan,
    * whole-stage codegen, no shuffle but the final per-source rollup.
    * Patterns use only portable regex constructs (char classes +
    * bounded repeats) so Java and DuckDB RE2 semantics agree. */
  def t9PiiRedact(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.documents(s, d)
      .withColumn("text2",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("contact u"), col("doc_id").cast("string"),
            lit("@example.com "), col("text")))
          .otherwise(col("text")))
      .withColumn("text2",
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(col("text2"), lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(col("text2")))
    val redacted = regexp_replace(
      regexp_replace(col("text2"), lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))
    aug
      .select(col("doc_id"), col("source"),
        regexp_count(col("text2"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("text2"), lit(PhoneRe)).cast("long").as("n_phones"),
        // residual scan runs on the REDACTED text: the oracle recomputes
        // it independently, so a broken replacement cannot hide
        (regexp_count(redacted, lit(EmailRe)) +
          regexp_count(redacted, lit(PhoneRe))).cast("long").as("n_residual"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_emails") + col("n_phones") > 0).cast("long")).as("docs_with_pii"),
        sum(col("n_emails")).as("total_emails"),
        sum(col("n_phones")).as("total_phones"),
        sum(col("n_residual")).as("total_residual"))
      .orderBy("source")
  }

  val t9Sql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "555-[0-9]{4}"
    s"""WITH aug AS (SELECT doc_id, source,
       |  CASE WHEN doc_id % 11 = 0 THEN
       |    (CASE WHEN doc_id % 7 = 0 THEN 'contact u' || CAST(doc_id AS VARCHAR) || '@example.com ' || text ELSE text END)
       |      || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |  WHEN doc_id % 7 = 0 THEN 'contact u' || CAST(doc_id AS VARCHAR) || '@example.com ' || text
       |  ELSE text END AS text2 FROM documents),
       |red AS (SELECT doc_id, source,
       |  CAST(len(regexp_extract_all(text2, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text2, '$phone')) AS BIGINT) AS n_phones,
       |  regexp_replace(regexp_replace(text2, '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g') AS redacted
       |  FROM aug)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |  CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       |  CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       |  CAST(SUM(CAST(len(regexp_extract_all(redacted, '$email')) AS BIGINT)
       |         + CAST(len(regexp_extract_all(redacted, '$phone')) AS BIGINT)) AS BIGINT) AS total_residual
       |FROM red GROUP BY source ORDER BY source""".stripMargin
  }

  /** t10_contamination — benchmark-contamination screen: the
    * decontamination pass run before training so eval benchmarks don't
    * leak into the corpus. Docs with doc_id % 50 == 0 stand in for the
    * benchmark suite; every other document is scored by 3-shingle
    * overlap against the benchmark's distinct shingle set and flagged
    * when ≥ half its shingles appear there. Scale shape: shingles ride
    * as 8-byte native hashes (ShingleHashes kernel); the benchmark set
    * is BROADCAST — eval suites are small by nature (MBs, not TBs), so
    * the corpus-side scan never shuffles; the only exchange is the
    * per-source rollup. All-integer output (shared/total counts, flag
    * sums) → bit-stable hash vs the string-based DuckDB twin. */
  def t10Contamination(s: SparkSession, d: String): DataFrame = {
    // (doc_id, h).distinct() IS the SQL twin's `DISTINCT doc_id,
    // shingle`: shingles pool per doc_id across repeated rows,
    // SOURCE-FREE (the twin attaches sources afterwards via a separate
    // DISTINCT (doc_id, source) join, so a doc_id listed under two
    // sources contributes its full pooled counts to both groups —
    // keeping source inside the dedup key would split the pool and
    // diverge on exactly that degenerate input). No-op beyond the
    // exchange when doc_id is unique.
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.shingle_hashes(col("text"))).as("h"))
      .distinct()
    val bench = sh.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select("h").distinct().withColumn("hit", lit(1L))
    val corp = sh.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      .join(broadcast(bench), Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    corp.join(Tables.documents(s, d).select("doc_id", "source").distinct(), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_hit") * 2 >= col("n_sh")).cast("long")).as("n_contaminated"),
        sum(col("n_sh")).as("shingles_total"),
        sum(col("n_hit")).as("shingles_shared"))
      .orderBy("source")
  }

  val t10Sql: String =
    """WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id,
      |    term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w AS shingle,
      |    LEAD(term, 2) OVER w AS t2
      |  FROM (SELECT doc_id, rid, unnest(string_split(text, ' ')) AS term,
      |        generate_subscripts(string_split(text, ' '), 1) AS pos
      |        FROM (SELECT *, row_number() OVER () AS rid FROM documents) dd) x
      |  WHERE term <> ''
      |  WINDOW w AS (PARTITION BY rid ORDER BY pos)) y
      |  WHERE t2 IS NOT NULL),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
      |corp AS (SELECT s.doc_id, COUNT(*) AS n_sh, COUNT(b.shingle) AS n_hit
      |  FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
      |  WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id)
      |SELECT d.source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN 2 * n_hit >= n_sh THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
      |  CAST(SUM(n_sh) AS BIGINT) AS shingles_total,
      |  CAST(SUM(n_hit) AS BIGINT) AS shingles_shared
      |FROM corp JOIN (SELECT DISTINCT doc_id, source FROM documents) d
      |  ON corp.doc_id = d.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  // the WHERE term <> '' mirrors the native kernels' skip-empty
  // tokenization: bigrams/shingles pair consecutive NON-EMPTY tokens,
  // so the SQL twin must drop empties before the LEAD window or a
  // double-space document diverges
  // windows partition by a per-ROW id, not doc_id: the kernels tokenize
  // each row independently, so if a doc_id ever repeats the SQL twin
  // must not interleave the two rows' token streams
  val t6Sql: String =
    """WITH toks AS (SELECT doc_id, rid, unnest(string_split(text, ' ')) AS term,
      |  generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM (SELECT *, row_number() OVER () AS rid FROM documents) dd),
      |bg AS (SELECT doc_id, term || ' ' || LEAD(term, 1) OVER w AS bigram,
      |  LEAD(term, 1) OVER w AS t1 FROM toks WHERE term <> ''
      |  WINDOW w AS (PARTITION BY rid ORDER BY pos))
      |SELECT bigram, COUNT(*) AS n_occurrences,
      |  COUNT(DISTINCT doc_id) AS doc_freq
      |FROM bg WHERE t1 IS NOT NULL
      |GROUP BY bigram ORDER BY n_occurrences DESC, bigram ASC LIMIT 20""".stripMargin

  /** t7_corpus_curation — the end-to-end curation verdict an LLM-data
    * pipeline ships: a document survives iff it passes the quality
    * floor (t2), is the canonical keeper of its near-dup cluster (d6),
    * and is predicted English (t1); reported as the per-source
    * audit table (docs/tokens in vs kept) data teams review before a
    * training run. One pass over each per-doc verdict, joined on
    * doc_id, rolled up per source — at 100 TB the three verdict frames
    * share the documents scan and the join keys are co-partitioned.
    * Fully oracle-checked: the DuckDB twin recomposes the same quality
    * formula, language CASE, and WITH RECURSIVE dedup closure. */
  def t7CorpusCuration(s: SparkSession, d: String): DataFrame =
    curationOver(s, d, Dedup.d6DedupClusters(s, d))

  /** t8_corpus_curation_lsh — t7's verdict with the dedup leg swapped
    * to d7's LSH-pair clustering: the form that actually runs at
    * 100 TB, where exact pair generation is off the table. Identical
    * aggregation; TextSpec pins t8 ≡ t7 at test SF (where the LSH and
    * exact pair sets agree — see the d7/d6 spec). */
  def t8CorpusCurationLsh(s: SparkSession, d: String): DataFrame =
    curationOver(s, d, Dedup.d6DedupClustersLsh(s, d))

  private def curationOver(s: SparkSession, d: String, clusters: DataFrame): DataFrame = {
    val dedup = clusters.select(col("doc_id"), col("is_keeper"))
    // quality + language are per-row scalar verdicts: compute them ON
    // the one documents scan instead of joining t1/t2's frames (which
    // re-scans the corpus per branch); only the dedup verdict — which
    // genuinely needs its own machinery — joins in
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        when(qualityExpr(col("text")) >= 0.5, 1L).otherwise(0L).as("q_keep"),
        langPredExpr(col("text")).as("lang_pred"))
      .join(dedup, "doc_id")
      .withColumn("kept", (col("q_keep") === 1L && col("is_keeper") === 1L &&
        col("lang_pred") === "en").cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("kept") === 1L, col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  val t7Sql: String = {
    val langCase =
      """CASE
        |    WHEN len(list_filter(string_split(text, ' '), t -> t = 'the')) >= len(list_filter(string_split(text, ' '), t -> t = 'le'))
        |     AND len(list_filter(string_split(text, ' '), t -> t = 'the')) >= len(list_filter(string_split(text, ' '), t -> t = 'el'))
        |     AND len(list_filter(string_split(text, ' '), t -> t = 'the')) >= len(list_filter(string_split(text, ' '), t -> t = 'der')) THEN 'en'
        |    WHEN len(list_filter(string_split(text, ' '), t -> t = 'le')) >= len(list_filter(string_split(text, ' '), t -> t = 'el'))
        |     AND len(list_filter(string_split(text, ' '), t -> t = 'le')) >= len(list_filter(string_split(text, ' '), t -> t = 'der')) THEN 'fr'
        |    WHEN len(list_filter(string_split(text, ' '), t -> t = 'el')) >= len(list_filter(string_split(text, ' '), t -> t = 'der')) THEN 'es'
        |    ELSE 'de' END""".stripMargin
    s"""WITH RECURSIVE sh AS (SELECT DISTINCT doc_id, shingle FROM (
       |  SELECT doc_id,
       |    term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w AS shingle,
       |    LEAD(term, 2) OVER w AS t2
       |  FROM (SELECT doc_id, rid, unnest(string_split(text, ' ')) AS term,
       |        generate_subscripts(string_split(text, ' '), 1) AS pos
       |        FROM (SELECT *, row_number() OVER () AS rid FROM documents) dd) x
       |  WHERE term <> ''
       |  WINDOW w AS (PARTITION BY rid ORDER BY pos)) y
       |  WHERE t2 IS NOT NULL),
       |kp AS (SELECT shingle FROM sh GROUP BY shingle
       |  HAVING COUNT(*) <= GREATEST(${Dedup.DfCapFloor},
       |    CAST(ceil(${Dedup.DfCapFrac} * (SELECT COUNT(DISTINCT doc_id) FROM sh)) AS BIGINT))),
       |idx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kp ON sh.shingle = kp.shingle),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
       |p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS (SELECT doc_a, doc_b FROM p0
       |  JOIN sizes sa ON p0.doc_a = sa.doc_id JOIN sizes sb ON p0.doc_b = sb.doc_id
       |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= ${Dedup.JaccardTau}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |walk(a, b) AS (SELECT src, dst FROM edges
       |  UNION SELECT w.a, e.dst FROM walk w JOIN edges e ON w.b = e.src),
       |cc AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM walk GROUP BY a),
       |qb AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_m,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'the'))
       |     + len(list_filter(string_split(text, ' '), t -> t = 'a')) AS BIGINT) AS n_stop
       |  FROM documents),
       |qr AS (SELECT doc_id,
       |  CAST(n_uniq AS DOUBLE) / n_tokens AS ttr,
       |  CAST(n_chars_m - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_tok_len,
       |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio FROM qb),
       |q AS (SELECT doc_id, CASE WHEN 0.5 * ttr + 0.3 * (1.0 - abs(avg_tok_len - 5.0) / 10.0)
       |    + 0.2 * (1.0 - stop_ratio) >= 0.5 THEN 1 ELSE 0 END AS q_keep FROM qr),
       |lp AS (SELECT doc_id, $langCase AS lang_pred FROM documents),
       |v AS (SELECT d.doc_id, d.source,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  CASE WHEN q.q_keep = 1
       |        AND COALESCE(cc.cluster_id, d.doc_id) = d.doc_id
       |        AND lp.lang_pred = 'en' THEN 1 ELSE 0 END AS kept
       |  FROM documents d
       |  JOIN q ON d.doc_id = q.doc_id
       |  JOIN lp ON d.doc_id = lp.doc_id
       |  LEFT JOIN cc ON d.doc_id = cc.doc_id)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(kept) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM v GROUP BY source ORDER BY source""".stripMargin
  }

  /** t11's fixed keyword query and BM25 constants (k1/b are the
    * standard Robertson defaults; idf is the Lucene +1 formulation, so
    * scores are always positive). */
  private[graft] val T11Query = Seq("join", "window", "scan")
  private val T11K1 = 1.2
  private val T11B = 0.75
  private val T11TopK = 15

  /** t11_bm25_search — keyword retrieval: BM25-ranked top-15 documents
    * for a fixed 3-term query. Scores are rounded to 6 decimals before
    * ranking so the Spark and DuckDB sides order identically (the
    * arithmetic is IEEE-double in both; rounding absorbs ulp-level
    * libm/summation-order drift).
    *
    * Scale shape: the only per-corpus work is one scan producing doc
    * lengths (an array `size`, no explode) and the query-term postings
    * (explode FILTERED to the 3 query terms before any shuffle — the
    * aggregation carries |docs containing a query term| rows, not the
    * corpus's token stream). df and avgdl are scalar/3-row aggregates
    * joined back by broadcast; the final top-k is a 1-partition sort of
    * per-doc scores, the classic searcher plan. */
  def t11Bm25Search(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val len = docs.select(col("doc_id"), size(toks(col("text"))).cast("long").as("dl"))
    // one stats pass over the doc-length frame (not two): nd + avgdl
    // together — at corpus scale this is the only full-width scan the
    // planning constants cost
    val stats = len.agg(count(lit(1)).cast("double").as("nd"), avg(col("dl")).as("avgdl")).head()
    val (nDocs, avgdl) = (stats.getDouble(0), stats.getDouble(1))
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .filter(col("term").isin(T11Query: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("f"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("dfc"))
    tf.join(broadcast(df), "term")
      .join(len, "doc_id")
      .withColumn("idf", log(lit(1.0) + (lit(nDocs) - col("dfc") + 0.5) / (col("dfc") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("f") * (T11K1 + 1.0) /
          (col("f") + lit(T11K1) * (lit(1.0 - T11B) + col("dl") * lit(T11B) / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(T11TopK)
  }

  val t11Sql: String = {
    val q = T11Query.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |len AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      |stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS nd FROM len),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS f
      |  FROM toks WHERE term IN ($q) GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfc FROM tf GROUP BY term)
      |SELECT doc_id,
      |  ROUND(SUM(ln(1.0 + (nd - dfc + 0.5) / (dfc + 0.5))
      |    * f * (${T11K1} + 1.0)
      |    / (f + ${T11K1} * (1.0 - ${T11B} + ${T11B} * dl / avgdl))), 6) AS bm25
      |FROM tf JOIN df USING (term) JOIN len USING (doc_id) CROSS JOIN stats
      |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT $T11TopK""".stripMargin
  }

  /** t12_lm_quality — per-document quality under the corpus's own
    * bigram language model: avg log P(w2|w1) with MLE conditional
    * probabilities (count(w1 w2) / count(w1 ·), both from the full
    * corpus — every doc's bigrams are in the counts, so probabilities
    * are never zero and no smoothing constant enters the oracle
    * contract). This is the perplexity-style fluency filter an LLM-data
    * pipeline runs beside t2's surface heuristics: boilerplate and
    * repeated templates score high, token soup scores low. Rounded to
    * 6dp so Spark and DuckDB summation orders agree.
    *
    * Scale shape: every shuffle is keyed on 8-byte hashes from the
    * `bigram_pair_hashes` kernel, never token strings. The first
    * aggregation collapses the corpus token stream to per-doc DISTINCT
    * bigram rows with occurrence counts (map-side combine); LM counts
    * are hb-/hl-partitioned WINDOWS over that one frame — one corpus
    * scan total (PlanSpec-gated), every later shuffle carries only the
    * distinct (doc, bigram) rows. */
  def t12LmQuality(s: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.bigram_pair_hashes(col("text"))).as("p"))
      .select(col("doc_id"), col("p.hl").as("hl"), col("p.hb").as("hb"))
      .groupBy(col("doc_id"), col("hb"))
      // hb is a function of (hl, right token): hl is constant per hb
      .agg(count(lit(1)).as("f"), first(col("hl")).as("hl"))
    // LM counts as WINDOWS over the per-doc frame, not self-joins: a
    // join of perDoc against its own aggregates recomputes the corpus
    // explode once per branch (3 scans); windows keep ONE scan and
    // shuffle only the distinct (doc, bigram) rows (PlanSpec counts)
    perDoc
      .withColumn("n2", sum(col("f")).over(Window.partitionBy(col("hb"))))
      .withColumn("n1", sum(col("f")).over(Window.partitionBy(col("hl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("f")).as("n_bigrams"),
        round(sum(col("f") * log(col("n2").cast("double") / col("n1").cast("double")))
          / sum(col("f")), 6).as("avg_ll"))
      .orderBy("doc_id")
  }

  val t12Sql: String =
    """WITH toks AS (SELECT doc_id, rid, unnest(string_split(text, ' ')) AS term,
      |  generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM (SELECT *, row_number() OVER () AS rid FROM documents) dd),
      |bg AS (SELECT doc_id, term AS w1, LEAD(term, 1) OVER w AS w2 FROM toks
      |  WHERE term <> ''
      |  WINDOW w AS (PARTITION BY rid ORDER BY pos)),
      |bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
      |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS n2 FROM bg2 GROUP BY w1, w2),
      |c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS n1 FROM bg2 GROUP BY w1)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  ROUND(AVG(ln(n2 / n1)), 6) AS avg_ll
      |FROM bg2 JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val T13TopK = 3

  /** t13_tfidf_keywords — per-document keyword extraction: top-3 terms
    * by tf·idf (raw tf, ln(N/df) idf — df from the full corpus),
    * rounded to 6dp, ties broken by term. The per-doc summary an
    * LLM-data pipeline materializes for retrieval/routing metadata.
    *
    * Scale shape: one explode → (doc, term) counts with map-side
    * combine; df comes from a term-partitioned WINDOW over the same
    * counts frame — one corpus scan total (PlanSpec-gated); the final
    * top-k is a per-doc window over each doc's distinct terms. */
  def t13TfidfKeywords(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.count().toDouble
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("f"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("tfidf"), asc("term"))
    // df as a WINDOW over tf, not a tf-self-join: the join form
    // recomputes the corpus explode for the df branch (a second full
    // scan); the window keeps one scan and shuffles the distinct
    // (doc, term) frame on term (PlanSpec counts the single scan)
    tf.withColumn("dfc", count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
      .withColumn("tfidf", round(col("f") * log(lit(nDocs) / col("dfc")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= T13TopK)
      .select("doc_id", "rk", "term", "tfidf")
      .orderBy("doc_id", "rk")
  }

  val t13Sql: String =
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS f
      |  FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfc FROM tf GROUP BY term),
      |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
      |scored AS (SELECT doc_id, term, ROUND(f * ln(n / dfc), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN nd)
      |SELECT doc_id, rk, term, tfidf FROM (
      |  SELECT doc_id, term, tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
      |  FROM scored) t
      |WHERE rk <= $T13TopK ORDER BY doc_id, rk""".stripMargin

  /** t14's flag thresholds (Gopher-style repetition gates): a document
    * is `repetitive` when over [[T14DupRatio]] of its word instances are
    * repeats, or its most frequent bigram covers ≥ [[T14TopBigram]] of
    * all bigram slots. */
  private[graft] val T14DupRatio = 0.6
  private[graft] val T14TopBigram = 0.1

  /** Core of t14 over any (doc_id, text) frame — separated so the spec
    * can plant degenerate-repetition fixtures. Token stats are
    * row-local (size / array_distinct, t2's discipline); the only
    * shuffled leg is the per-doc top-bigram count, keyed on
    * (doc_id, 8-byte bigram hash) then doc_id — never a string. */
  private[graft] def t14Core(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val base = docs.select(col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_uniq"),
      graft.functions.bigram_hashes(col("text")).as("bh"))
    val top = base.select(col("doc_id"), explode(col("bh")).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))
    val dup = lit(1.0) - col("n_uniq").cast("double") / col("n_tokens")
    val share = when(col("n_tokens") <= 1L, lit(0.0))
      .otherwise(coalesce(col("top_bigram_n"), lit(0L)).cast("double")
        / (col("n_tokens") - 1L))
    base.drop("bh").join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        dup.as("dup_word_ratio"), share.as("top_bigram_share"))
      .withColumn("repetitive",
        (col("dup_word_ratio") >= T14DupRatio ||
          col("top_bigram_share") >= T14TopBigram).cast("long"))
      .orderBy("doc_id")
  }

  /** t14_repetition — the intra-document repetition gate (the Gopher /
    * MassiveText "repetition" quality rules): templated or degenerate
    * text (navigation chrome, keyword stuffing, generation loops) shows
    * up as a high duplicate-word ratio or one bigram dominating the
    * document, long before cross-document dedup (d1-d8) can see it.
    * Emits per-doc token counts, duplicate-word ratio, top-bigram
    * share, and the drop flag. Fully oracle-checked (hash-vs-string
    * identity differs only on bigram-hash collisions). */
  def t14Repetition(s: SparkSession, d: String): DataFrame =
    t14Core(Tables.documents(s, d))

  val t14Sql: String =
    s"""WITH toks AS (SELECT doc_id, rid, unnest(string_split(text, ' ')) AS term,
       |  generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM (SELECT *, row_number() OVER () AS rid FROM documents) dd),
       |bg AS (SELECT doc_id, term || ' ' || LEAD(term, 1) OVER w AS bigram,
       |  LEAD(term, 1) OVER w AS nx FROM toks WHERE term <> ''
       |  WINDOW w AS (PARTITION BY rid ORDER BY pos)),
       |cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg
       |  WHERE nx IS NOT NULL GROUP BY doc_id, bigram),
       |top AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM cnt GROUP BY doc_id),
       |base AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
       |  FROM documents),
       |r AS (SELECT b.doc_id AS doc_id, b.n_tokens,
       |  1.0 - CAST(b.n_uniq AS DOUBLE) / b.n_tokens AS dup_word_ratio,
       |  CASE WHEN b.n_tokens <= 1 THEN 0.0
       |    ELSE CAST(COALESCE(t.top_bigram_n, 0) AS DOUBLE) / (b.n_tokens - 1)
       |  END AS top_bigram_share
       |  FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id)
       |SELECT doc_id, n_tokens, dup_word_ratio, top_bigram_share,
       |  CAST(CASE WHEN dup_word_ratio >= $T14DupRatio
       |    OR top_bigram_share >= $T14TopBigram THEN 1 ELSE 0 END AS BIGINT) AS repetitive
       |FROM r ORDER BY doc_id""".stripMargin

  /** t15_seq_packing — sequence packing for LLM training: concatenate
    * each shard's documents in doc_id order into one token stream and
    * split it at a fixed token budget. Emits, per document, the pack it
    * starts in, the pack it ends in (long documents straddle several),
    * and its token offset inside the first pack — exactly the layout a
    * trainer needs to materialize fixed-length batches with no padding
    * waste. Sharding is a deterministic `pmod(doc_id, shards)`, so every
    * shard packs independently: at 100 TB the running-sum window sorts
    * per-shard (no global order, no single-partition window), and the
    * shard count scales with the cluster, not the corpus. Token counts
    * reuse t3's whitespace tokenizer so the two surfaces agree. */
  def t15SeqPacking(s: SparkSession, d: String): DataFrame =
    t15Core(Tables.documents(s, d))

  /** t15's logic over any (doc_id, text) frame — fixture seam.
    *
    * Engine-agreement contract (the r9 driver corpus exposed how easy
    * this is to get wrong): tokens come from [[wsTokens]] (explicit
    * whitespace class, empties filtered — both engines identical on any
    * byte stream); the shard is a true non-negative pmod on both sides;
    * and the running sum uses an explicit RANGE frame on both sides so
    * duplicate doc_ids (degenerate but possible in user data) get the
    * deterministic peer-group sum instead of a tie-order-dependent ROWS
    * sum that no two engines need agree on. Every integer output column
    * in the oracle is CAST AS BIGINT: DuckDB widens SUM(BIGINT) to
    * HUGEINT, which pandas materializes as float64 — a dtype skew
    * against Spark's int64 that hash-canonicalizers may or may not
    * collapse (r10's only red row came from exactly this on
    * offset_in_pack). */
  private[graft] def t15Core(docs: DataFrame): DataFrame = {
    val conf = docs.sparkSession.conf
    val shards = conf.get(T15ShardsKey, T15Shards.toString).toInt
    val budget = conf.get(T15BudgetKey, T15Budget.toString).toInt
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget.toDouble)
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        wsTokens(col("text")).as("tokens"))
      .withColumn("cum_after", sum("tokens").over(w))
      .withColumn("cum_before", col("cum_after") - col("tokens"))
      .select(col("doc_id"), col("shard"), col("tokens"),
        floor(col("cum_before") / b).cast("long").as("pack_first"),
        // last token of the doc lives at cum_after-1; an empty doc
        // (0 tokens under the filtered contract) stays in its start pack
        floor(greatest(col("cum_after") - 1, col("cum_before")) / b)
          .cast("long").as("pack_last"),
        pmod(col("cum_before"), lit(budget.toLong)).as("offset_in_pack"))
      .orderBy("doc_id")
  }
  /** Session knobs ("raise the shard count with the cluster" must not
    * mean recompiling): defaults below; the oracle SQL is generated from
    * the same defaults, so override only in non-gate sessions/specs. */
  private[graft] val T15ShardsKey = "spark.graft.t15.shards"
  private[graft] val T15BudgetKey = "spark.graft.t15.budget"
  private[graft] val T15Shards = 8
  private[graft] val T15Budget = 512

  val t15Sql: String =
    s"""WITH b AS (SELECT doc_id, ((doc_id % $T15Shards) + $T15Shards) % $T15Shards AS shard,
       |  CAST(len(list_filter(string_split_regex(text, '$WsRe'), x -> x <> '')) AS BIGINT) AS tokens
       |  FROM documents),
       |c AS (SELECT *, SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_after FROM b)
       |SELECT doc_id, shard, tokens,
       |  CAST(floor((cum_after - tokens) / $T15Budget.0) AS BIGINT) AS pack_first,
       |  CAST(floor(greatest(cum_after - 1, cum_after - tokens) / $T15Budget.0) AS BIGINT) AS pack_last,
       |  CAST((cum_after - tokens) % $T15Budget AS BIGINT) AS offset_in_pack
       |FROM c ORDER BY doc_id""".stripMargin

  /** t16_mixture_sample — domain-mixture sampling: down-sample each
    * source to a prescribed keep rate so the corpus matches a target
    * mixture (the web/wiki/books reweighting every LLM data pipeline
    * runs before training). The keep/drop decision is a pure
    * deterministic function of doc_id — Knuth multiplicative hash,
    * folded below 1e8 BEFORE the multiply so ANSI mode can never
    * overflow (c18's discipline) — which makes the sample reproducible
    * across runs and engines, needs no RNG state, and costs one
    * map-side filter: the only shuffle is the tiny per-source audit
    * aggregate at the end (|sources| rows regardless of corpus size). */
  def t16MixtureSample(s: SparkSession, d: String): DataFrame = {
    val rates = t16Rates(s)
    // a source with no trailing digits extracts '' — under ANSI that
    // cast throws, so map it to NULL (→ the CASE's ELSE rate) exactly
    // as the oracle's NULLIF does
    val srcRaw = regexp_extract(col("source"), "([0-9]+)$", 1)
    val srcnum = when(srcRaw =!= "", srcRaw).cast("long")
    val rate = when(pmod(srcnum, lit(4L)) === 0, rates(0))
      .when(pmod(srcnum, lit(4L)) === 1, rates(1))
      .when(pmod(srcnum, lit(4L)) === 2, rates(2))
      .otherwise(rates(3))
    val h = pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(10000L))
    Tables.documents(s, d)
      .select(col("source"),
        rate.as("target_rate"),
        when(h < rate * 10000, 1L).otherwise(0L).as("keep"))
      .groupBy("source")
      .agg(max("target_rate").as("target_rate"),
        count(lit(1)).as("total"), sum("keep").as("kept"))
      .withColumn("achieved_rate",
        col("kept").cast("double") / col("total"))
      .orderBy("source")
  }

  /** t16's mixture table, session-configurable: CSV of the four keep
    * rates keyed by source-number mod 4. Oracle SQL is generated from
    * the defaults — override only in non-gate sessions/specs. */
  private[graft] val T16RatesKey = "spark.graft.t16.rates"
  private[graft] val T16RatesDefault = "1.0,0.5,0.25,0.1"
  private[graft] def t16Rates(s: SparkSession): Array[Double] = {
    val r = s.conf.get(T16RatesKey, T16RatesDefault).split(",").map(_.trim.toDouble)
    require(r.length == 4 && r.forall(x => x >= 0.0 && x <= 1.0),
      s"$T16RatesKey must be four rates in [0,1], got ${r.mkString(",")}")
    r
  }

  // the ((x % m) + m) % m wrappers mirror Spark's pmod: SQL's % keeps
  // the sign of the dividend, so a negative doc_id would otherwise land
  // in a different hash cell than pmod puts it
  val t16Sql: String =
    """WITH b AS (SELECT source,
      |  CASE CAST(NULLIF(regexp_extract(source, '([0-9]+)$', 1), '') AS BIGINT) % 4
      |    WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 ELSE 0.1
      |  END AS target_rate,
      |  CASE WHEN ((((((doc_id % 100000000) + 100000000) % 100000000)
      |      * 2654435761) % 10000) + 10000) % 10000
      |    < (CASE CAST(NULLIF(regexp_extract(source, '([0-9]+)$', 1), '') AS BIGINT) % 4
      |       WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 ELSE 0.1 END) * 10000
      |    THEN 1 ELSE 0 END AS keep
      |  FROM documents)
      |SELECT source, CAST(MAX(target_rate) AS DOUBLE) AS target_rate,
      |  COUNT(*) AS total, CAST(SUM(keep) AS BIGINT) AS kept,
      |  CAST(SUM(keep) AS DOUBLE) / COUNT(*) AS achieved_rate
      |FROM b GROUP BY source ORDER BY source""".stripMargin

  /** t17's trained merge table, memoized per (session, dir). Training
    * runs on the BOUNDED word-frequency dictionary: one distributed
    * wordcount shuffle (8-byte counts keyed on the words), then the
    * top-[[T17Vocab]] rows by (count desc, word asc) — a TakeOrdered
    * with a CONSTANT K, so the driver materialization does not grow
    * with the corpus. This is the corpus bounding every production BPE
    * trainer applies (cap/sample the word dict, learn merges on it);
    * the full corpus is never collected, and encoding never leaves the
    * executors. */
  private val bpeMemo = new graft.SessionMemo[Array[String]]
  private[graft] val T17Vocab = 4096
  private[graft] val T17Merges = 200
  private[graft] def bpeMerges(s: SparkSession, d: String): Array[String] =
    bpeMemo.getOrElseUpdate(s, d) {
      val dict = Tables.documents(s, d)
        .select(explode(array_remove(split(col("text"), WsRe, -1), "")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("w")).limit(T17Vocab)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.functions.BpeKernels.train(dict, T17Merges)
    }

  /** t17_bpe_tokens — token counting under an ACTUAL trained vocabulary
    * (t3's regex pre-tokenizer is a stand-in; this is the real thing a
    * trainer budgets with): learn [[T17Merges]] BPE merges from the
    * corpus's word-frequency dictionary, then count each document's
    * tokens under the learned merge ranks with a native codegen'd
    * kernel ([[graft.functions.BpeTokenCount]] — merges ride the plan,
    * the count is one map-side pass, no shuffle beyond the training
    * wordcount). Deterministic end to end (tie-breaks pinned), so the
    * rows-only gate plus BpeSpec's hand-derived fixtures pin it.
    * compression = chars per BPE token, the corpus-quality signal
    * packing and budget estimates run on. */
  def t17BpeTokens(s: SparkSession, d: String): DataFrame = {
    val merges = bpeMerges(s, d)
    Tables.documents(s, d)
      .select(col("doc_id"),
        wsTokens(col("text")).as("ws_tokens"),
        graft.functions.bpe_token_count(col("text"), merges).as("bpe_vocab_tokens"),
        length(col("text")).cast("long").as("chars"))
      .withColumn("compression",
        round(col("chars").cast("double") /
          greatest(col("bpe_vocab_tokens"), lit(1L)).cast("double"), 4))
      .orderBy("doc_id")
  }

  /** t18's shard fan-out (16 locally; a production export raises it
    * with the corpus — the assignment stays a pure function). */
  private[graft] val T18Shards = 16L

  /** t18's shard assignment, THE expression (the spec tests this exact
    * Column, not a private copy). The hash must be folded through a
    * modulus COPRIME to the shard count before the final mod:
    * 2654435761 ≡ 1 (mod 16) and 10⁸ ≡ 0 (mod 16), so taking the
    * product mod 16 directly would degenerate to doc_id mod 16 —
    * strided ids (an upstream generator allocating in steps of
    * 4/8/16) would pile into a fraction of the shards. The prime fold
    * (1000003) restores the multiplier's mixing; bias from
    * 1000003 mod 16 ≠ 0 is ~10⁻⁵. pmod at every stage keeps the
    * result engine-independent for NEGATIVE ids too (the oracle's
    * C-style % is wrapped to match at the one stage that can go
    * negative). */
  private[graft] def t18Shard: Column =
    pmod(pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L),
      lit(1000003L)), lit(T18Shards))

  /** t18_shard_export — the training-data pipeline's LAST MILE: the
    * corpus dealt into N size-balanced shards by a DETERMINISTIC
    * pseudo-shuffle (Knuth multiplicative hash of doc_id, the
    * c18/t16 discipline — every run, engine, and replay agrees; no RNG
    * state rides the job), physically WRITTEN one parquet directory
    * per shard (`partitionBy` — the layout a training loader consumes
    * shard-by-shard), and audited FROM THE WRITTEN FILES: the audit
    * re-reads the export, so the gate proves the round trip, not just
    * the assignment. Hash-sharding is the 100 TB answer to "global
    * shuffle": no total order, no skewed key (balance is
    * hash-uniform, spec-asserted), one wide write at the cluster's
    * parallelism — a sort-based shuffle would pay a full range
    * exchange for an order nobody needs. */
  def t18ShardExport(s: SparkSession, d: String): DataFrame = {
    val out = Engine.tmpDir("graft_t18_shards")
    Engine.listDir(java.nio.file.Paths.get(out)).foreach(Engine.deleteRecursively)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        wsTokens(col("text")).as("n_tokens"), t18Shard.as("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    s.read.parquet(out)
      .withColumn("shard_id", col("shard_id").cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("token_sum"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("shard_id")
  }

  val t18Sql: String =
    s"""WITH e AS (SELECT doc_id, source,
      |  CAST(len(list_filter(string_split_regex(text, '$WsRe'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |  ((((((doc_id % 100000000) + 100000000) % 100000000) * 2654435761) % 1000003) % $T18Shards) AS shard_id
      |  FROM documents)
      |SELECT shard_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS token_sum,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM e GROUP BY shard_id ORDER BY shard_id""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "t18_shard_export" -> (t18ShardExport _, Some(t18Sql)),
    "t17_bpe_tokens" -> (t17BpeTokens _, None),
    "t15_seq_packing" -> (t15SeqPacking _, Some(t15Sql)),
    "t16_mixture_sample" -> (t16MixtureSample _, Some(t16Sql)),
    "t14_repetition" -> (t14Repetition _, Some(t14Sql)),
    "t13_tfidf_keywords" -> (t13TfidfKeywords _, Some(t13Sql)),
    "t12_lm_quality" -> (t12LmQuality _, Some(t12Sql)),
    "t11_bm25_search" -> (t11Bm25Search _, Some(t11Sql)),
    "t7_corpus_curation" -> (t7CorpusCuration _, Some(t7Sql)),
    "t8_corpus_curation_lsh" -> (t8CorpusCurationLsh _, None),
    "t6_bigram_stats" -> (t6BigramStats _, Some(t6Sql)),
    "t1_langid" -> (t1Langid _, Some(t1Sql)),
    "t2_quality" -> (t2Quality _, Some(t2Sql)),
    "t3_tokens" -> (t3Tokens _, Some(t3Sql)),
    "t4_fingerprint" -> (t4Fingerprint _, None),
    "t5_tf_topterms" -> (t5TfTopterms _, Some(t5Sql)),
    "t9_pii_redact" -> (t9PiiRedact _, Some(t9Sql)),
    "t10_contamination" -> (t10Contamination _, Some(t10Sql)),
  )
}
