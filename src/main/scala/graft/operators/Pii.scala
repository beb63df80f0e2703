package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before anything else sees the text (cf. the C4 /
  * RefinedWeb cleanup stages: e-mail, phone, and IP literals are the
  * canonical regex-detectable classes). Pure single-pass
  * `regexp_extract_all` / `regexp_replace` column expressions: zero
  * shuffles, whole-stage codegen, runs at parquet-scan speed at any
  * corpus size.
  *
  * The patterns are written to the common subset of java.util.regex
  * (Spark) and RE2 (DuckDB) — no backrefs, no lookaround — so the
  * oracle applies the IDENTICAL pattern strings.
  */
object Pii {

  /** E-mail: local part @ dotted domain with an alphabetic TLD. */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Dotted-quad IPv4 (word-bounded so version strings like 1.2.3.4a
    * don't half-match).
    */
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Phone-like digit run: ≥7 chars of digits/space/()/- starting
    * with an optional +. The class has no '.', so dotted IPs can't
    * match; applied AFTER e-mail and IP redaction so their digit
    * spans are gone.
    */
  val phoneRe = "\\+?[0-9][0-9() -]{5,}[0-9]"

  /** Per-type match counts + redacted text for any text column.
    * Counts are independent matches of each pattern against the
    * input; redaction applies e-mail → IP → phone sequentially (the
    * phone class can't span the '.' in an un-redacted IP, but the
    * fixed order makes the composition well-defined regardless).
    */
  def redactCols(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("long").as("n_email"),
    size(regexp_extract_all(text, lit(ipRe), lit(0))).cast("long").as("n_ip"),
    size(regexp_extract_all(text, lit(phoneRe), lit(0))).cast("long").as("n_phone"),
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>").as("redacted"))

  /** Gate: the synthetic corpus is digit-free word salad, so a
    * redaction run over raw `text` would be vacuously green. Instead
    * both engines append the same deterministic PII-shaped tail
    * (e-mail / phone / IP literals derived from doc_id) and the gate
    * verifies detection counts and the redacted result — the regex
    * semantics, not the corpus, are what's under test. doc_id is
    * bounded mod 10⁵ in the e-mail local part so its digit run stays
    * below phoneRe's 7-char floor at any scale factor.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val piiText = concat($"text",
      lit(" reach me at u"), ($"doc_id" % 100000).cast("string"),
      lit("@mail.example.com or +1 (555) 010-"),
      lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
      lit(" from 10."), ($"doc_id" % 256).cast("string"),
      lit(".0."), (($"doc_id" * 7) % 256).cast("string"))
    Tables.documents(spark, dir)
      .select($"doc_id" +: redactCols(piiText): _*)
  }

  val piiRedactSql: String =
    s"""WITH pii AS (
          SELECT doc_id,
                 text || ' reach me at u' || (doc_id % 100000)::VARCHAR
                      || '@mail.example.com or +1 (555) 010-'
                      || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                      || ' from 10.' || (doc_id % 256)::VARCHAR
                      || '.0.' || ((doc_id * 7) % 256)::VARCHAR AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t, '$ipRe')) AS BIGINT) AS n_ip,
               CAST(len(regexp_extract_all(t, '$phoneRe')) AS BIGINT) AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(t,
                 '$emailRe', '<EMAIL>', 'g'),
                 '$ipRe', '<IP>', 'g'),
                 '$phoneRe', '<PHONE>', 'g') AS redacted
        FROM pii"""

  /** k-anonymity audit (Sweeney 2002) — the release-gate check a
    * governance pass runs before person-keyed data leaves the
    * pipeline: every quasi-identifier combination (here nation ×
    * market segment × a 2000-unit balance band) must cover ≥ k
    * people, else those rows are re-identifiable and need
    * suppression or coarser generalization. Lists the violating
    * groups with their sizes. One map-side-partial hash aggregate
    * over the QI key — group count, not row count, crosses the
    * exchange; the HAVING prunes to the (small) violation set. The
    * balance band floors integer cents over an IEEE double division,
    * identical in both engines (a bare integer `div` would differ on
    * negative balances: Spark truncates, DuckDB floors).
    */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_mktsegment",
        floor(round($"c_acctbal" * 100).cast("long").cast("double")
          / 200000.0).cast("long").as("bal_band"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      .agg(count(lit(1)).as("group_size"))
      .filter($"group_size" < k)
      .orderBy($"c_nationkey", $"c_mktsegment", $"bal_band")
  }

  val kAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment,
              CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                         / 200000.0) AS BIGINT) AS bal_band,
              CAST(count(*) AS BIGINT) AS group_size
       FROM customer
       GROUP BY 1, 2, 3
       HAVING count(*) < 5
       ORDER BY 1, 2, 3"""

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006 — the
    * follow-up k-anonymity needs: a group can be large yet still leak
    * if every member shares one SENSITIVE value). Quasi-identifier =
    * (nation, balance band); sensitive attribute = market segment;
    * report every QI group whose distinct-sensitive count is below l,
    * with the group's size and its dominant segment as the breach
    * witness. One partial-agg'd two-level aggregation — the
    * |QI-groups|-sized frame never round-trips the corpus.
    */
  def lDiversity(spark: SparkSession, dir: String, l: Int = 3): DataFrame = {
    import spark.implicits._
    val cells = Tables.customer(spark, dir)
      .select($"c_nationkey",
        floor(round($"c_acctbal" * 100).cast("long").cast("double")
          / 200000.0).cast("long").as("bal_band"),
        $"c_mktsegment")
      .groupBy($"c_nationkey", $"bal_band", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
    cells.groupBy($"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("n_sensitive"),
        sum($"n").as("group_size"),
        max(struct($"n", $"c_mktsegment")).getField("c_mktsegment")
          .as("dominant_segment"))
      .filter($"n_sensitive" < l)
      .orderBy($"c_nationkey", $"bal_band")
  }

  def lDiversitySql(l: Int = 3): String =
    s"""WITH cells AS (
         SELECT c_nationkey,
                CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT)
                                AS DOUBLE) / 200000.0) AS BIGINT) AS bal_band,
                c_mktsegment, CAST(count(*) AS BIGINT) AS n
         FROM customer GROUP BY 1, 2, 3)
       SELECT c_nationkey, bal_band,
              CAST(count(*) AS BIGINT) AS n_sensitive,
              CAST(sum(n) AS BIGINT) AS group_size,
              (max(struct_pack(n := n, seg := c_mktsegment))).seg AS dominant_segment
       FROM cells
       GROUP BY 1, 2
       HAVING count(*) < $l
       ORDER BY 1, 2"""

  /** t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007 — the
    * step after [[lDiversity]]: a group can be diverse yet still
    * leak if its sensitive DISTRIBUTION skews far from the table's;
    * "every member of this cell skews 90% BUILDING" is a disclosure
    * even with all five segments present). Distance is the
    * categorical EMD = total variation ½ Σ_s |p_s − q_s| between the
    * group's sensitive distribution and the global one. Per-sentinel
    * |p − q| is quantized ONCE to integer ppm (pinned divisions of
    * exact counts, ≤ |segments| rows per group), so the group sum is
    * an exact BIGINT and the ½ is an integer halving. Reports every
    * QI group above `tPpm` — same quasi-identifiers as the k-anon
    * gate, so the three audits read one release candidate.
    *
    * Scale: two partial-agg'd aggregations to the (QI × segment)
    * cell frame; the global distribution is a |segments|-row
    * broadcast; nothing corpus-sized past the first groupBy.
    */
  def tCloseness(spark: SparkSession, dir: String,
      tPpm: Long = 300000L): DataFrame =
    tClosenessOf(Tables.customer(spark, dir), tPpm)

  /** Audit core over any (c_nationkey, c_mktsegment, c_acctbal)
    * frame — lets specs plant skewed cells through the real path.
    */
  def tClosenessOf(customer: DataFrame, tPpm: Long): DataFrame = {
    import customer.sparkSession.implicits._
    val cells = customer
      .select($"c_nationkey",
        floor(round($"c_acctbal" * 100).cast("long").cast("double")
          / 200000.0).cast("long").as("bal_band"),
        $"c_mktsegment")
      .groupBy($"c_nationkey", $"bal_band", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
    val global = cells.groupBy($"c_mktsegment")
      .agg(sum($"n").as("ns"))
      .crossJoin(broadcast(cells.agg(sum($"n").as("n_total"))))
    val groups = cells.groupBy($"c_nationkey", $"bal_band")
      .agg(sum($"n").as("group_size"))
    // the group × segment frame needs ABSENT segments too (p = 0
    // still contributes |0 − q|): build it from groups × global and
    // left-join the observed cells
    groups.crossJoin(broadcast(global))
      .join(cells, Seq("c_nationkey", "bal_band", "c_mktsegment"), "left")
      .withColumn("dev_ppm",
        abs(round(coalesce($"n", lit(0L)).cast("double") * lit(1.0e6)
            / $"group_size".cast("double"))
          - round($"ns".cast("double") * lit(1.0e6)
            / $"n_total".cast("double"))).cast("long"))
      .groupBy($"c_nationkey", $"bal_band")
      .agg(min($"group_size").as("group_size"),
        sum($"dev_ppm").as("sum_dev"))
      .withColumn("t_ppm", expr("sum_dev div 2"))
      .filter($"t_ppm" > tPpm)
      .select($"c_nationkey", $"bal_band", $"group_size", $"t_ppm")
      .orderBy($"c_nationkey", $"bal_band")
  }

  def tClosenessSql(tPpm: Long = 300000L): String =
    s"""WITH cells AS (
         SELECT c_nationkey,
                CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT)
                                AS DOUBLE) / 200000.0) AS BIGINT) AS bal_band,
                c_mktsegment, CAST(count(*) AS BIGINT) AS n
         FROM customer GROUP BY 1, 2, 3),
       g AS (SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS ns FROM cells
             GROUP BY 1),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells),
       grp AS (SELECT c_nationkey, bal_band,
                      CAST(sum(n) AS BIGINT) AS group_size
               FROM cells GROUP BY 1, 2),
       dev AS (
         SELECT grp.c_nationkey, grp.bal_band, grp.group_size,
                CAST(abs(round(CAST(coalesce(cells.n, 0) AS DOUBLE) * 1000000
                           / CAST(grp.group_size AS DOUBLE))
                     - round(CAST(g.ns AS DOUBLE) * 1000000
                           / CAST(tot.n_total AS DOUBLE))) AS BIGINT)
                  AS dev_ppm
         FROM grp CROSS JOIN g CROSS JOIN tot
         LEFT JOIN cells ON cells.c_nationkey = grp.c_nationkey
           AND cells.bal_band = grp.bal_band
           AND cells.c_mktsegment = g.c_mktsegment)
       SELECT c_nationkey, bal_band,
              CAST(min(group_size) AS BIGINT) AS group_size,
              CAST(sum(dev_ppm) // 2 AS BIGINT) AS t_ppm
       FROM dev GROUP BY 1, 2
       HAVING sum(dev_ppm) // 2 > $tPpm
       ORDER BY 1, 2"""

  /** Generalization LADDER for the k-anonymity release (Samarati
    * 2001's generalization lattice, walked as the practical ladder):
    * four increasingly coarse quasi-identifier encodings of the
    * customer table — L0 (nation, segment, $2 000 balance band),
    * L1 (nation, segment, $10 000 band), L2 (REGION, segment,
    * $10 000 band), L3 (region, $50 000 band, segment dropped) —
    * each audited in one aggregate pass, with the minimal level that
    * achieves k-anonymity flagged `chosen` (the release decision;
    * if none achieves it the coarsest level is chosen). Bands floor
    * integer cents over an IEEE double division — the kAnonymity
    * device: `div` would truncate-vs-floor-differ on negative
    * balances. Everything after the per-level aggregate is
    * 4-row metadata; the winner comes off a one-row min aggregate +
    * broadcast join, no window.
    */
  def generalizationLadder(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("c_nationkey"),
          $"n_regionkey".as("region"))), Seq("c_nationkey"))
      .select($"c_nationkey".as("nation"), $"region", $"c_mktsegment",
        round($"c_acctbal" * 100).cast("long").as("cents"))
      .localCheckpoint(true)
    def band(c: org.apache.spark.sql.Column, unitCents: Long) =
      floor(c.cast("double") / unitCents.toDouble).cast("long")
    def audit(level: Long, keys: Seq[org.apache.spark.sql.Column]) =
      cust.groupBy(keys: _*).agg(count(lit(1)).as("gs"))
        .agg(count(lit(1)).as("n_groups"), min($"gs").as("min_group"),
          sum(when($"gs" < k, 1L).otherwise(0L)).as("n_violating"),
          sum(when($"gs" < k, $"gs").otherwise(0L)).as("rows_at_risk"))
        .select(lit(level).as("level"), $"n_groups", $"min_group",
          $"n_violating", $"rows_at_risk")
    val levels = Seq(
      audit(0L, Seq($"nation", $"c_mktsegment", band($"cents", 200000L))),
      audit(1L, Seq($"nation", $"c_mktsegment", band($"cents", 1000000L))),
      audit(2L, Seq($"region", $"c_mktsegment", band($"cents", 1000000L))),
      audit(3L, Seq($"region", band($"cents", 5000000L))))
      .reduce(_.unionByName(_))
    val best = levels
      .agg(coalesce(min(when($"n_violating" === 0L, $"level")),
        lit(3L)).as("best_level"))
    levels.crossJoin(broadcast(best))
      .select($"level", $"n_groups", $"min_group", $"n_violating",
        $"rows_at_risk",
        when($"level" === $"best_level", 1L).otherwise(0L).as("chosen"))
      .orderBy($"level")
  }

  def generalizationLadderSql(k: Int = 5): String = {
    def lvl(level: Int, keys: String, unit: Long) =
      s"""SELECT CAST($level AS BIGINT) AS level,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(min(gs) AS BIGINT) AS min_group,
                 CAST(sum(CASE WHEN gs < $k THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
                 CAST(sum(CASE WHEN gs < $k THEN gs ELSE 0 END) AS BIGINT)
                   AS rows_at_risk
          FROM (SELECT CAST(count(*) AS BIGINT) AS gs FROM cu
                GROUP BY $keys)"""
    val b2 = "CAST(floor(CAST(cents AS DOUBLE) / 200000.0) AS BIGINT)"
    val b10 = "CAST(floor(CAST(cents AS DOUBLE) / 1000000.0) AS BIGINT)"
    val b50 = "CAST(floor(CAST(cents AS DOUBLE) / 5000000.0) AS BIGINT)"
    s"""WITH cu AS (
          SELECT c.c_nationkey AS nation, n.n_regionkey AS region,
                 c.c_mktsegment,
                 CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
          FROM customer c JOIN nation n
            ON n.n_nationkey = c.c_nationkey),
        levels AS (
          ${lvl(0, s"nation, c_mktsegment, $b2", 200000L)}
          UNION ALL
          ${lvl(1, s"nation, c_mktsegment, $b10", 1000000L)}
          UNION ALL
          ${lvl(2, s"region, c_mktsegment, $b10", 1000000L)}
          UNION ALL
          ${lvl(3, s"region, $b50", 5000000L)}),
        best AS (
          SELECT coalesce(min(CASE WHEN n_violating = 0 THEN level END),
                          3) AS best_level
          FROM levels)
        SELECT level, n_groups, min_group, n_violating, rows_at_risk,
               CAST(CASE WHEN level = best_level THEN 1 ELSE 0 END
                 AS BIGINT) AS chosen
        FROM levels CROSS JOIN best
        ORDER BY level"""
  }
}
