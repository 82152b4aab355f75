package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Data-quality audit operators: the schema-wide column profile and the
  * declarative constraint suite (the Deequ/Great-Expectations shape) a
  * pipeline runs against every ingested table before trusting it — at
  * 100 TB you validate the data you DIDN'T look at, and these two
  * queries are how.
  *
  * Arithmetic discipline: numeric extrema ship as floor-micros BIGINTs
  * and timestamps as epoch-micros — NEVER as rendered strings, because
  * double→VARCHAR formatting is engine-specific ("1.0E7" vs
  * "10000000.0") and would break oracle parity; string extrema ship as
  * strings. One row per column / per rule, so the output is
  * constant-size regardless of corpus scale.
  */
object AuditOps {
  import Relational.QFn

  val defs: Seq[(String, QFn, Option[String])] = Seq(

    // ---- Chapman capture-recapture population estimate (Chapman 1951;
    //      the mark-recapture estimator web-scale crawls use to answer
    //      "how many unique documents exist out there, given two
    //      overlapping crawls?"): two deterministic hash-defined crawls
    //      of the corpus (≈70% and ≈60% inclusion, independent hashes),
    //        N̂ = ((n1+1)·(n2+1)) DIV (m+1) − 1
    //      with m the overlap. SELF-CERTIFYING: the fixture's true N is
    //      the corpus size, emitted beside the estimate, so the oracle
    //      run itself demonstrates the estimator recovers N within
    //      sampling error. All exact integers; one scan, one aggregate
    //      (the crawls are pure hash predicates — map-side flags, no
    //      join). Scale shape: nothing beyond a 5-sum aggregate.
    ("q255_capture_recapture", (s: SparkSession, dir: String) => {
      import graft.text.TextStats
      Tables(s, dir).documents
        .select(
          (pmod(TextStats.portableHash64(
            concat(lit("crawl1:"), col("doc_id"))), lit(10L)) < 7L).as("in1"),
          (pmod(TextStats.portableHash64(
            concat(lit("crawl2:"), col("doc_id"))), lit(10L)) < 6L).as("in2"))
        .agg(count(lit(1)).as("true_n"),
          sum(when(col("in1"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("in2"), 1L).otherwise(0L)).as("n2"),
          sum(when(col("in1") && col("in2"), 1L).otherwise(0L)).as("m"))
        .selectExpr("true_n", "n1", "n2", "m",
          "((n1 + 1) * (n2 + 1)) DIV (m + 1) - 1 AS chapman_est")
    }, Some {
      import graft.text.TextStats
      val h1 = TextStats.portableHash64Sql("concat('crawl1:', CAST(doc_id AS VARCHAR))")
      val h2 = TextStats.portableHash64Sql("concat('crawl2:', CAST(doc_id AS VARCHAR))")
      s"""
      WITH f AS (
        SELECT (($h1 % 10 + 10) % 10) < 7 AS in1,
               (($h2 % 10 + 10) % 10) < 6 AS in2
        FROM documents),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS true_n,
               CAST(SUM(CASE WHEN in1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN in2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END) AS BIGINT) AS m
        FROM f)
      SELECT true_n, n1, n2, m,
             ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman_est
      FROM a"""
    }),

    // ---- per-column table profile of `orders`: row count, null count,
    //      exact distinct count, and typed extrema for every column in
    //      ONE aggregation pass. Spark plans the 6-way exact
    //      count-distinct as a single Expand + two-stage aggregate —
    //      one shuffle total, partial aggregation map-side; the Expand
    //      multiplies rows by the distinct-column count, the documented
    //      cost of exactness (the sketch alternative is q42's
    //      approx_count_distinct when ±2% is acceptable). The profile
    //      itself is 6 rows — driver-safe at any corpus size.
    ("q169_profile", (s: SparkSession, dir: String) => {
      // round 14: the 6-way exact-distinct Expand is this query's whole
      // CPU bill and the fixture table is one unsplittable split —
      // Stage.fanOut parallelizes the Expand+partial-agg (no-op at real
      // scale where the scan has many splits). Idle wall 2.9 s → the
      // partial agg runs 32-way; Expand itself is unchanged (the
      // documented cost of exactness).
      val agg = graft.Stage.fanOut(Tables(s, dir).orders).selectExpr(
        "count(1) AS n_rows",
        // o_orderkey
        "sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn_ok",
        "count(DISTINCT o_orderkey) AS nd_ok",
        "CAST(min(o_orderkey) * 1000000 AS BIGINT) AS mn_ok",
        "CAST(max(o_orderkey) * 1000000 AS BIGINT) AS mx_ok",
        // o_custkey
        "sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn_ck",
        "count(DISTINCT o_custkey) AS nd_ck",
        "CAST(min(o_custkey) * 1000000 AS BIGINT) AS mn_ck",
        "CAST(max(o_custkey) * 1000000 AS BIGINT) AS mx_ck",
        // o_orderstatus
        "sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn_os",
        "count(DISTINCT o_orderstatus) AS nd_os",
        "min(o_orderstatus) AS smn_os", "max(o_orderstatus) AS smx_os",
        // o_totalprice
        "sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn_tp",
        "count(DISTINCT o_totalprice) AS nd_tp",
        "CAST(floor(min(o_totalprice) * 1000000) AS BIGINT) AS mn_tp",
        "CAST(floor(max(o_totalprice) * 1000000) AS BIGINT) AS mx_tp",
        // o_orderdate
        "sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn_od",
        "count(DISTINCT o_orderdate) AS nd_od",
        "unix_micros(CAST(min(o_orderdate) AS TIMESTAMP)) AS mn_od",
        "unix_micros(CAST(max(o_orderdate) AS TIMESTAMP)) AS mx_od",
        // o_orderpriority
        "sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn_op",
        "count(DISTINCT o_orderpriority) AS nd_op",
        "min(o_orderpriority) AS smn_op", "max(o_orderpriority) AS smx_op")
      agg.selectExpr("""stack(6,
          'o_orderkey',     n_rows, nn_ok, nd_ok, mn_ok, mx_ok,
                            CAST(NULL AS STRING), CAST(NULL AS STRING),
          'o_custkey',      n_rows, nn_ck, nd_ck, mn_ck, mx_ck,
                            CAST(NULL AS STRING), CAST(NULL AS STRING),
          'o_orderstatus',  n_rows, nn_os, nd_os, CAST(NULL AS BIGINT),
                            CAST(NULL AS BIGINT), smn_os, smx_os,
          'o_totalprice',   n_rows, nn_tp, nd_tp, mn_tp, mx_tp,
                            CAST(NULL AS STRING), CAST(NULL AS STRING),
          'o_orderdate',    n_rows, nn_od, nd_od, mn_od, mx_od,
                            CAST(NULL AS STRING), CAST(NULL AS STRING),
          'o_orderpriority', n_rows, nn_op, nd_op, CAST(NULL AS BIGINT),
                            CAST(NULL AS BIGINT), smn_op, smx_op)
          AS (col_name, n_rows, n_null, n_distinct,
              min_num_micros, max_num_micros, min_str, max_str)""")
        .orderBy(col("col_name"))
    }, Some("""
      WITH a AS (
        SELECT CAST(count(1) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ok,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_ok,
               CAST(min(o_orderkey) * 1000000 AS BIGINT) AS mn_ok,
               CAST(max(o_orderkey) * 1000000 AS BIGINT) AS mx_ok,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ck,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_ck,
               CAST(min(o_custkey) * 1000000 AS BIGINT) AS mn_ck,
               CAST(max(o_custkey) * 1000000 AS BIGINT) AS mx_ck,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_os,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_os,
               min(o_orderstatus) AS smn_os, max(o_orderstatus) AS smx_os,
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_tp,
               CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_tp,
               CAST(floor(min(o_totalprice) * 1000000) AS BIGINT) AS mn_tp,
               CAST(floor(max(o_totalprice) * 1000000) AS BIGINT) AS mx_tp,
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_od,
               CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd_od,
               epoch_us(min(o_orderdate)) AS mn_od,
               epoch_us(max(o_orderdate)) AS mx_od,
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_op,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_op,
               min(o_orderpriority) AS smn_op, max(o_orderpriority) AS smx_op
        FROM orders)
      SELECT 'o_orderkey' AS col_name, n_rows, nn_ok AS n_null, nd_ok AS n_distinct,
             mn_ok AS min_num_micros, mx_ok AS max_num_micros,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
      UNION ALL
      SELECT 'o_custkey', n_rows, nn_ck, nd_ck, mn_ck, mx_ck,
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM a
      UNION ALL
      SELECT 'o_orderstatus', n_rows, nn_os, nd_os, CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), smn_os, smx_os FROM a
      UNION ALL
      SELECT 'o_totalprice', n_rows, nn_tp, nd_tp, mn_tp, mx_tp,
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM a
      UNION ALL
      SELECT 'o_orderdate', n_rows, nn_od, nd_od, mn_od, mx_od,
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM a
      UNION ALL
      SELECT 'o_orderpriority', n_rows, nn_op, nd_op, CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), smn_op, smx_op FROM a
      ORDER BY col_name""")),

    // ---- declarative constraint suite over `orders`: uniqueness,
    //      completeness, referential integrity, a range rule, and a
    //      domain rule — each one row (rule, n_checked, n_violations,
    //      passed). The four scan rules fold into ONE aggregation pass
    //      (conditional sums + a single exact distinct); referential
    //      integrity is the q06 anti-join counted — broadcast when the
    //      dimension fits, plain shuffled anti-join (still one shuffle
    //      each side, null-safe) when it doesn't. A failed `passed`
    //      gates the pipeline; n_violations sizes the quarantine.
    ("q170_constraints", (s: SparkSession, dir: String) => {
      val o = Tables(s, dir).orders
      val c = Tables(s, dir).customer
      val scans = o.selectExpr(
        "count(1) AS n",
        "count(DISTINCT o_orderkey) AS nd",
        "sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null",
        "sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_range",
        "sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_domain")
      val orphans = o.join(c.select(col("c_custkey")),
          o("o_custkey") === c("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v_ref"))
      val rep = scans.crossJoin(broadcast(orphans))
      rep.selectExpr("""stack(5,
          'orderkey_unique',      n, n - nd,
          'custkey_complete',     n, v_null,
          'custkey_referential',  n, v_ref,
          'totalprice_positive',  n, v_range,
          'status_domain',        n, v_domain)
          AS (rule, n_checked, n_violations)""")
        .withColumn("passed", col("n_violations") === 0L)
        .orderBy(col("rule"))
    }, Some("""
      WITH a AS (
        SELECT CAST(count(1) AS BIGINT) AS n,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
               CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_domain
        FROM orders),
      r AS (
        SELECT CAST(count(1) AS BIGINT) AS v_ref FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      rules AS (
        SELECT 'orderkey_unique' AS rule, n AS n_checked, n - nd AS n_violations FROM a
        UNION ALL SELECT 'custkey_complete', n, v_null FROM a
        UNION ALL SELECT 'custkey_referential', a.n, r.v_ref FROM a, r
        UNION ALL SELECT 'totalprice_positive', n, v_range FROM a
        UNION ALL SELECT 'status_domain', n, v_domain FROM a)
      SELECT rule, n_checked, n_violations, (n_violations = 0) AS passed
      FROM rules ORDER BY rule""")),

    // ---- k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    //      et al. 2007) over the customer table: quasi-identifier =
    //      (nation, market segment), sensitive attribute = account
    //      balance bucketed to thousands. Emits the equivalence-class
    //      SIZE histogram (kind='k_hist': how many QI groups of size k,
    //      covering how many rows), the re-identification risk row
    //      (kind='at_risk': rows in groups smaller than k=5 — the
    //      release gate a privacy review reads first), and the
    //      minimum-l row (kind='l_div_min': the least-diverse group's
    //      distinct-sensitive count — l=1 means the QI reveals the
    //      sensitive value outright). The whole audit is one groupBy
    //      over the QI key (map-side combined, bucketable) + three
    //      constant-size aggregates of the GROUP table — group-count
    //      state only, never row state; at 100 TB the QI cardinality
    //      (nations × segments) bounds everything downstream of the
    //      first agg. The oracle replays the same three readouts.
    ("q210_k_anonymity", (s: SparkSession, dir: String) => {
      val groups = Tables(s, dir).customer
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("k"),
          countDistinct(expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")).as("l"))
        .transform(graft.Stage.mat)
      val hist = groups.groupBy(col("k"))
        .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
        .select(lit("k_hist").as("kind"), col("k"), col("n_groups"), col("n_rows"))
      val risk = groups.filter(col("k") < 5)
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_groups"),
          coalesce(sum(col("k")), lit(0L)).as("n_rows"))
        .select(lit("at_risk").as("kind"), lit(5L).as("k"),
          col("n_groups"), col("n_rows"))
      val lmin = groups.groupBy(col("l"))
        .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
        .orderBy(col("l")).limit(1)
        .select(lit("l_div_min").as("kind"), col("l").as("k"),
          col("n_groups"), col("n_rows"))
      hist.unionByName(risk).unionByName(lmin)
        .orderBy(col("kind"), col("k"))
    }, Some("""
      WITH groups AS (
        SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l
        FROM customer GROUP BY c_nationkey, c_mktsegment),
      hist AS (
        SELECT 'k_hist' AS kind, k, CAST(count(*) AS BIGINT) AS n_groups,
               CAST(SUM(k) AS BIGINT) AS n_rows
        FROM groups GROUP BY k),
      risk AS (
        SELECT 'at_risk' AS kind, CAST(5 AS BIGINT) AS k,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(COALESCE(SUM(k), 0) AS BIGINT) AS n_rows
        FROM groups WHERE k < 5),
      lmin AS (
        SELECT 'l_div_min' AS kind, l AS k, CAST(count(*) AS BIGINT) AS n_groups,
               CAST(SUM(k) AS BIGINT) AS n_rows
        FROM groups GROUP BY l ORDER BY l LIMIT 1)
      SELECT * FROM hist UNION ALL SELECT * FROM risk UNION ALL SELECT * FROM lmin
      ORDER BY kind, k""")),

    // ---- t-closeness (Li et al. 2007) — the third privacy gate after
    //      q210's k-anonymity and l-diversity rows: a QI class can be
    //      large (k-safe) AND diverse (l-safe) yet still leak if its
    //      sensitive DISTRIBUTION sits far from the table's (every
    //      member of a 200-person class being near-broke is a
    //      disclosure). For the ORDERED sensitive attribute (balance
    //      thousand-buckets) the prescribed distance is the 1-D EMD —
    //      the q252 closed form: t = Σ_i |CDF_class − CDF_global| /
    //      (m−1), exact ppm with one truncating DIV per CDF cell and
    //      one for t, all replayed by the oracle. Output: the 10
    //      farthest classes + the zz_fail release-gate row (rows in
    //      classes with t > 0.2; the failing-class count rides the
    //      t_ppm column — the q290 column-reuse convention).
    //
    //      Scale shape: one (QI, bucket) aggregate, per-class CDFs via
    //      windows PARTITIONED BY class (bucket-count-sized
    //      partitions), and the GLOBAL CDF recovered as Σ_classes of
    //      the per-class cums (one bucket-keyed re-aggregate) — no
    //      unpartitioned window anywhere, nothing downstream of the
    //      first agg scales past QI-cardinality × buckets.
    ("q350_t_closeness", (s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val cell = Tables(s, dir).customer
        .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("sb"))
        .agg(count(lit(1)).as("c"))
        .transform(graft.Stage.mat)
      val grid = cell.select(col("nk"), col("seg")).distinct()
        .crossJoin(broadcast(cell.select(col("sb")).distinct()))
        .join(cell, Seq("nk", "seg", "sb"), "left")
        .select(col("nk"), col("seg"), col("sb"),
          coalesce(col("c"), lit(0L)).as("c"))
      val cums = graft.Stage.mat(grid.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("nk"), col("seg"))
          .orderBy(col("sb")))))
      val glob = cums.groupBy(col("sb"))
        .agg(sum(col("cum")).as("cumg"), count(lit(1)).as("n_classes"))
      val tot = cell.agg(sum(col("c")).as("n"),
        expr("CAST(count(DISTINCT sb) AS BIGINT)").as("m"))
      val perClass = cums
        .join(cums.groupBy(col("nk"), col("seg"))
          .agg(max(col("cum")).as("n_c")), Seq("nk", "seg"))
        .join(glob, Seq("sb")).crossJoin(broadcast(tot))
        .selectExpr("nk", "seg", "n_c", "m",
          "abs((1000000 * cum) DIV n_c - (1000000 * cumg) DIV n) AS gap_ppm")
        .groupBy(col("nk"), col("seg"))
        .agg(max(col("n_c")).as("n_rows"), max(col("m")).as("m"),
          sum(col("gap_ppm")).as("sg"))
        .selectExpr("nk", "seg", "n_rows",
          "sg DIV greatest(m - 1, 1) AS t_ppm")
        .transform(graft.Stage.mat)
      val top = perClass
        .orderBy(col("t_ppm").desc, col("nk"), col("seg")).limit(10)
      val fail = perClass.filter(col("t_ppm") > 200000L)
        .agg(coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
          count(lit(1)).as("t_ppm"))
        .selectExpr("CAST(-1 AS BIGINT) AS nk", "'zz_fail' AS seg", "n_rows",
          "t_ppm")
      top.unionByName(fail)
        .orderBy(col("t_ppm").desc, col("nk"), col("seg"))
    }, Some("""
      WITH cell AS (
        SELECT c_nationkey AS nk, c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS sb,
               CAST(count(*) AS BIGINT) AS c
        FROM customer GROUP BY 1, 2, 3),
      grid AS (
        SELECT q.nk, q.seg, b.sb, COALESCE(cell.c, 0) AS c
        FROM (SELECT DISTINCT nk, seg FROM cell) q
        CROSS JOIN (SELECT DISTINCT sb FROM cell) b
        LEFT JOIN cell ON cell.nk = q.nk AND cell.seg = q.seg AND cell.sb = b.sb),
      cums AS (
        SELECT nk, seg, sb, c,
               CAST(SUM(c) OVER (PARTITION BY nk, seg ORDER BY sb) AS BIGINT) AS cum
        FROM grid),
      gcum AS (SELECT sb, CAST(SUM(cum) AS BIGINT) AS cumg FROM cums GROUP BY sb),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                     CAST(count(DISTINCT sb) AS BIGINT) AS m FROM cell),
      nc AS (SELECT nk, seg, CAST(MAX(cum) AS BIGINT) AS n_c
             FROM cums GROUP BY nk, seg),
      perclass AS (
        SELECT cums.nk, cums.seg, MAX(nc.n_c) AS n_rows, MAX(tot.m) AS m,
               CAST(SUM(abs((1000000 * cum) // nc.n_c
                            - (1000000 * cumg) // tot.n)) AS BIGINT) AS sg
        FROM cums JOIN nc ON nc.nk = cums.nk AND nc.seg = cums.seg
        JOIN gcum ON gcum.sb = cums.sb CROSS JOIN tot
        GROUP BY cums.nk, cums.seg),
      scored AS (SELECT nk, seg, n_rows,
                        sg // GREATEST(m - 1, 1) AS t_ppm
                 FROM perclass),
      top AS (SELECT * FROM scored ORDER BY t_ppm DESC, nk, seg LIMIT 10),
      fail AS (SELECT CAST(-1 AS BIGINT) AS nk, 'zz_fail' AS seg,
                      CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS t_ppm
               FROM scored WHERE t_ppm > 200000)
      SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM fail)
      ORDER BY t_ppm DESC, nk, seg"""))
  )
}
