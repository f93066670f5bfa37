package graft

import graft.QueryShared._
import graft.operators.{Checks, Decontam, Dedup, Graphs, Joins, Layout, Sessionize, Similarity, Splits, Stats, TextAnalysis, TopN, Wrangling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** distribution statistics, drift, sketches and outlier screens — query registry + DuckDB oracles.
  * Merged into the driver contract by [[ScaleQueries]]. */
private[graft] object StatsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // classifier calibration: sweep quality-score cutoffs against the
    // "is English" label in ONE pass — confusion counts + P/R/F1 per
    // threshold, how a filter's operating point gets chosen
    "q_threshold_sweep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis
        .qualityScore(docs, "text")
        .select(col("doc_id"), col("quality"))
        .join(
          docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          Seq("doc_id")
        )
      Stats
        .thresholdSweep(scored, "quality", "is_en", Seq(0.3, 0.5, 0.7, 0.9))
        .orderBy("threshold")
    }),

    // exact per-language Gini concentration of document lengths — the
    // inequality summary for concentration dashboards; tie-invariant
    // integer rank sums over the distinct-value grid, one final division
    "q_gini" -> ((s, dir) => {
      Stats
        .giniCoefficient(
          t(s, dir, "documents"),
          "n_chars",
          groupCols = Seq("lang"),
          valueDecimals = 0
        )
        .orderBy("lang")
    }),

    // exact tie-aware ROC AUC of the same score/label pair: integer
    // rank sums (ties counted half), one grouped pass + a distinct-score
    // window — threshold-free ranking power of the quality filter
    "q_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // barrier: aucRoc's null-gate would otherwise be pushed below the
      // projection with the whole quality expression substituted into the
      // predicate, evaluating the text scorer twice per row
      val scored = TextAnalysis
        .qualityScore(docs, "text")
        .select(col("doc_id"), col("quality"))
        .join(
          docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          Seq("doc_id")
        )
        .localCheckpoint(false)
      Stats.aucRoc(scored, "quality", "is_en")
    }),

    // reliability curve + ECE of the same score/label pair: can the
    // quality score be read as a probability? Bit-exact by construction
    // (decimal bin sums; the ECE telescopes to sum|ssum-pos|/N)
    "q_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // barrier: same pushed-predicate duplication as q_auc
      val scored = TextAnalysis
        .qualityScore(docs, "text")
        .select(col("doc_id"), col("quality"))
        .join(
          docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          Seq("doc_id")
        )
        .localCheckpoint(false)
      Stats
        .calibrationBins(scored, "quality", "is_en", bins = 10)
        .orderBy("bin")
    }),

    // distributional moments per group: corr / stddev / avg (bounded
    // magnitudes; co-moment merge order can differ in the last ulp across
    // engines, so everything is rounded to 6dp)
    "q_stats_moments" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qty_disc"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("n")
        )
        .orderBy("l_returnflag")
    }),

    // correlation matrix from exact decimal sums (one streaming aggregate
    // for all pairs; engine-exact unlike native corr()). completeCase
    // shares each column's sums across pairs — 10 decimal sums instead of
    // 18, exactly the oracle's form; identical values (lineitem has no
    // nulls in these columns)
    "q_corr_matrix" -> ((s, dir) => {
      Stats
        .correlationMatrix(
          t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          completeCase = true
        )
        .orderBy("col_a", "col_b")
    }),

    // exact linear-interpolation percentiles per order status
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))").as("__p"),
          count(lit(1)).as("n")
        )
        .select(
          col("o_orderstatus"),
          round(element_at(col("__p"), 1), 4).as("p25"),
          round(element_at(col("__p"), 2), 4).as("p50"),
          round(element_at(col("__p"), 3), 4).as("p75"),
          col("n")
        )
        .orderBy("o_orderstatus")
    }),

    // 20-bin fixed-width price histogram (edge bins clamp out-of-range)
    "q_histogram" -> ((s, dir) => {
      Stats
        .histogram(t(s, dir, "lineitem"), "l_extendedprice", 900.0, 105000.0, 20)
        .orderBy("bin")
    }),

    // per-group winsorization at [p05, p95]: clip counts + clipped mean
    // (exact percentiles so the DuckDB quantile_cont oracle is bit-equal;
    // the operator's DEFAULT is the mergeable percentile_approx sketch)
    "q_winsorize" -> ((s, dir) => {
      Stats
        .winsorize(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
          0.05, 0.95, exact = true
        )
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("__p_lo"), 1).otherwise(0))
            .as("n_lo"),
          sum(when(col("l_extendedprice") > col("__p_hi"), 1).otherwise(0))
            .as("n_hi"),
          min("__p_lo").as("p_lo"),
          min("__p_hi").as("p_hi"),
          // decimal(25,6) here and DECIMAL(25,6) in the oracle — the two
          // sides must quantize identically for the hash gate to be robust
          round(
            sum(col("l_extendedprice_wins").cast("decimal(25,6)"))
              .cast("double") / count(lit(1)),
            4
          ).as("avg_wins")
        )
        .orderBy("l_returnflag")
    }),

    // robust MAD outliers in event values per type (Iglewicz-Hoaglin 3.5)
    "q_mad_outliers" -> ((s, dir) => {
      Stats
        .madOutliers(t(s, dir, "events"), "value", Seq("event_type"))
        .filter(col("is_outlier"))
        .select("event_id", "event_type", "value", "robust_z")
        .orderBy("event_id")
    }),

    // chi-square independence of the language mix vs source
    "q_chi_square" -> ((s, dir) => {
      Stats.chiSquareIndependence(t(s, dir, "documents"), "lang", "source")
    }),

    // mutual information on the same (lang, source) pair as q_chi_square:
    // MI/NMI via the three-entropy identity with the corpusEntropy
    // quantized-term pattern — fully hash-oracled
    "q_mutual_info" -> ((s, dir) => {
      Stats.mutualInformation(t(s, dir, "documents"), "lang", "source")
    }),

    // equi-depth quartile binning without a global sort (exact percentiles
    // for the quantile_cont oracle; the operator default is the sketch)
    "q_equidepth" -> ((s, dir) => {
      Stats
        .equiDepthBins(
          t(s, dir, "lineitem"), "l_extendedprice", 4, outCol = "bin",
          exact = true
        )
        .groupBy("bin")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .as("total")
        )
        .orderBy("bin")
    }),

    // the 100 TB path: equi-depth binning over the DEFAULT mergeable
    // percentile_approx sketch (O(accuracy) aggregation state, no O(rows)
    // single-task buffer). Probabilistic boundaries -> no SQL oracle; the
    // rows gate plus ScaleSpec's sketch-vs-exact bound assertion cover it.
    "q_equidepth_sketch" -> ((s, dir) => {
      Stats
        .equiDepthBins(t(s, dir, "lineitem"), "l_extendedprice", 4, outCol = "bin")
        .groupBy("bin")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .as("total")
        )
        .orderBy("bin")
    }),

    // exact top-2 heaviest event types per user (heavy hitters)
    "q_heavy_hitters" -> ((s, dir) => {
      TopN
        .heavyHitters(
          events(s, dir).filter(col("user_id") < 50),
          Seq("user_id"), "event_type", 2
        )
        .orderBy("user_id", "rank")
    }),

    // categorical mix drift: language shares of the first corpus half vs
    // the second — the source/language-mix alarm of an ingestion pipeline
    "q_cat_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Stats.categoricalStabilityIndex(
        docs.filter(col("doc_id") < 250),
        docs.filter(col("doc_id") >= 250),
        "lang"
      )
    }),

    // distribution drift between order-status cohorts: the PSI monitor a
    // training-data pipeline runs between its reference snapshot and the
    // live feed (10 fixed bins, eps-smoothed, decimal-exact sum)
    "q_psi_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Stats.populationStabilityIndex(
        o.filter(col("o_orderstatus") === "F"),
        o.filter(col("o_orderstatus") === "O"),
        "o_totalprice", lo = 0.0, hi = 400000.0, nBins = 10
      )
    }),

    // label-quality gate: Cohen's kappa between the heuristic lang-ID
    // prediction and the actual lang column — agreement beyond chance,
    // integer counts until one final division
    "q_kappa" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Stats.cohenKappa(
        TextAnalysis
          .langId(docs, "text")
          .select(col("doc_id"), col("lang_pred"))
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
        "lang_pred",
        "lang"
      )
    }),

    // the binning-free companion: two-sample KS statistic on the same
    // drift pair — integer CDF cross-products until one final division,
    // sup location + asymptotic lambda
    "q_ks_test" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Stats.ksTwoSample(
        o.filter(col("o_orderstatus") === "F"),
        o.filter(col("o_orderstatus") === "O"),
        "o_totalprice"
      )
    }),

    // exact 1-D Wasserstein drift on the same F-vs-O slice pair as
    // q_ks_test: the L1 integral of the CDF gap in price units — integer
    // micro-grid arithmetic end-to-end (one division at the end), so the
    // oracle replays it bit-for-bit in HUGEINT
    "q_wasserstein" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Stats.wasserstein1(
        o.filter(col("o_orderstatus") === "F"),
        o.filter(col("o_orderstatus") === "O"),
        "o_totalprice"
      )
    }),

    // incremental distinct counting: corpus sketched once (doc_id < 250),
    // batch sketched separately, tables MERGED — the corpus rows are never
    // rescanned. Cardinalities here are sparse-mode small, so the HLL
    // estimates are exact and a count(DISTINCT) oracle can gate them.
    "q_hll_distinct" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus =
        Stats.hllSketchTable(docs.filter(col("doc_id") < 250), Seq("lang"), "source")
      val batch =
        Stats.hllSketchTable(docs.filter(col("doc_id") >= 250), Seq("lang"), "source")
      Stats
        .hllEstimate(Stats.hllMergeSketches(Seq(corpus, batch), Seq("lang")), Seq("lang"))
        .orderBy("lang")
    }),

    // Spearman rank correlation (average-rank ties) of quantity vs
    // extended price: heavy ties on one side (50 distinct quantities),
    // near-unique values on the other — the rank grid rides partitioned
    // prefix sums, integer sums until ONE final division
    "q_spearman" -> ((s, dir) =>
      Stats.spearmanCorrelation(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice"
      )),

    // exact semi-join behind a Bloom pre-filter: lineitems of the
    // top-value orders — result identical to the plain IN-subquery (the
    // oracle), the bloom only prunes the shuffle
    "q_bloom_semijoin" -> ((s, dir) => {
      import graft.operators.Joins
      Joins
        .bloomSemiJoin(
          t(s, dir, "lineitem").select("l_orderkey", "l_linenumber"),
          t(s, dir, "orders")
            .filter(col("o_totalprice") > 150000.0)
            .select(col("o_orderkey").as("l_orderkey")),
          "l_orderkey"
        )
        .orderBy("l_orderkey", "l_linenumber")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_threshold_sweep" -> {
      val ts = Seq(0.3, 0.5, 0.7, 0.9)
      val sums = ts.zipWithIndex
        .map { case (t, i) =>
          s"""SUM(CASE WHEN s >= $t THEN 1 ELSE 0 END) AS pp$i,
             |    SUM(CASE WHEN l AND s >= $t THEN 1 ELSE 0 END) AS tp$i""".stripMargin
        }
        .mkString(",\n    ")
      val rows = ts.zipWithIndex
        .map { case (t, i) =>
          s"""SELECT CAST($t AS DOUBLE) AS threshold,
             |       CAST(tp$i AS BIGINT) AS tp,
             |       CAST(pp$i - tp$i AS BIGINT) AS fp,
             |       CAST(pos - tp$i AS BIGINT) AS fn,
             |       CAST(total - pp$i - (pos - tp$i) AS BIGINT) AS tn,
             |       ROUND(CASE WHEN pp$i > 0 THEN CAST(tp$i AS DOUBLE) / pp$i END, 6) AS "precision",
             |       ROUND(CASE WHEN pos > 0 THEN CAST(tp$i AS DOUBLE) / pos END, 6) AS recall,
             |       ROUND(CASE WHEN pp$i > 0 AND pos > 0 AND (CAST(tp$i AS DOUBLE) / pp$i + CAST(tp$i AS DOUBLE) / pos) > 0
             |             THEN 2.0 * (CAST(tp$i AS DOUBLE) / pp$i) * (CAST(tp$i AS DOUBLE) / pos)
             |                  / (CAST(tp$i AS DOUBLE) / pp$i + CAST(tp$i AS DOUBLE) / pos) END, 6) AS f1
             |FROM a""".stripMargin
        }
        .mkString("\nUNION ALL\n")
      s"""WITH $duckQualityScoreCte, j AS (
         |  SELECT q.s, (d.lang = 'en') AS l FROM q JOIN documents d USING (doc_id)
         |), a AS (
         |  SELECT count(*) AS total,
         |    SUM(CASE WHEN l THEN 1 ELSE 0 END) AS pos,
         |    $sums
         |  FROM j
         |)
         |$rows
         |ORDER BY threshold""".stripMargin
    },

    "q_calibration" -> {
      // NULL guards mirror the operator's exclusions exactly (DuckDB
      // LEAST/GREATEST skip NULLs, so an unguarded NULL score would
      // clamp to 1.0 instead of dropping; a NULL lang would count as a
      // negative) — latent on this fixture, load-bearing on any
      // regeneration with NULL text/lang
      s"""WITH $duckQualityScoreCte, j AS (
         |  SELECT GREATEST(0.0, LEAST(1.0, ROUND(q.s, 6))) AS s,
         |         (d.lang = 'en') AS l
         |  FROM q JOIN documents d USING (doc_id)
         |  WHERE q.s IS NOT NULL AND d.lang IS NOT NULL
         |), b AS (
         |  SELECT CAST(LEAST(9, FLOOR(s * 10)) AS INT) AS bin,
         |         COUNT(*) AS n,
         |         SUM(CASE WHEN l THEN 1 ELSE 0 END) AS pos,
         |         SUM(CAST(s AS DECIMAL(20,6))) AS ssum
         |  FROM j GROUP BY 1
         |), bb AS (
         |  SELECT bin, n, pos, ssum, ABS(ssum - pos) AS d FROM b
         |), t AS (
         |  SELECT SUM(n) AS nt, SUM(d) AS dsum FROM bb
         |)
         |SELECT bin,
         |       ROUND(CAST(bin AS DOUBLE) / 10, 6) AS bin_lo,
         |       ROUND(CAST(bin + 1 AS DOUBLE) / 10, 6) AS bin_hi,
         |       CAST(n AS BIGINT) AS n,
         |       ROUND(CAST(ssum AS DOUBLE) / n, 6) AS mean_score,
         |       ROUND(CAST(pos AS DOUBLE) / n, 6) AS frac_pos,
         |       ROUND(CAST(d AS DOUBLE) / n, 6) AS abs_gap,
         |       ROUND(CAST(dsum AS DOUBLE) / nt, 6) AS ece
         |FROM bb, t
         |ORDER BY bin""".stripMargin
    },

    "q_gini" ->
      """WITH v AS (
        |  SELECT lang,
        |         CAST(round(CAST(n_chars AS DOUBLE) * 1.0) AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL
        |), g AS (
        |  SELECT lang, v, count(*) AS c FROM v GROUP BY lang, v
        |), r AS (
        |  SELECT lang, v, c,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |           AS before
        |  FROM g
        |), a AS (
        |  SELECT lang,
        |         sum(c) AS n,
        |         sum(CAST(v AS HUGEINT) * c) AS s1,
        |         sum(CAST(v AS HUGEINT) * c *
        |             (2 * CAST(before AS HUGEINT) + c + 1)) AS sr2
        |  FROM r GROUP BY lang
        |)
        |SELECT lang, CAST(n AS BIGINT) AS n_values,
        |       ROUND(CAST(sr2 - (n + 1) * s1 AS DOUBLE) /
        |             CAST(n * s1 AS DOUBLE), 12) AS gini
        |FROM a ORDER BY lang""".stripMargin,

    "q_auc" -> {
      s"""WITH $duckQualityScoreCte, j AS (
         |  SELECT ROUND(q.s, 6) AS s, (d.lang = 'en') AS l
         |  FROM q JOIN documents d USING (doc_id)
         |), g AS (
         |  SELECT s,
         |         SUM(CASE WHEN l THEN 1 ELSE 0 END) AS p,
         |         COUNT(*) AS c
         |  FROM j GROUP BY s
         |), r AS (
         |  SELECT p, c,
         |         COALESCE(SUM(c) OVER (ORDER BY s
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM g
         |), a AS (
         |  SELECT SUM(p) AS np, SUM(c - p) AS nn,
         |         SUM(p * (2 * before + c + 1)) AS r2
         |  FROM r
         |)
         |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
         |       ROUND(CASE WHEN np > 0 AND nn > 0
         |             THEN CAST(r2 - np * (np + 1) AS DOUBLE)
         |                  / CAST(2 * np * nn AS DOUBLE) END, 6) AS auc
         |FROM a""".stripMargin
    },

    "q_corr_matrix" ->
      """WITH st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS s_q,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS s_e,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS s_d,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS s_qq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS s_ee,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS s_dd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS s_qe,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS s_qd,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS s_ed
        |  FROM lineitem
        |)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |         CAST(n AS BIGINT) AS n,
        |         ROUND((n*s_qe - s_q*s_e)
        |               / sqrt((n*s_qq - s_q*s_q)*(n*s_ee - s_e*s_e)), 6) AS corr
        |  FROM st
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', CAST(n AS BIGINT),
        |         ROUND((n*s_qd - s_q*s_d)
        |               / sqrt((n*s_qq - s_q*s_q)*(n*s_dd - s_d*s_d)), 6)
        |  FROM st
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', CAST(n AS BIGINT),
        |         ROUND((n*s_ed - s_e*s_d)
        |               / sqrt((n*s_ee - s_e*s_e)*(n*s_dd - s_d*s_d)), 6)
        |  FROM st
        |)
        |ORDER BY col_a, col_b""".stripMargin,

    "q_stats_moments" ->
      """SELECT l_returnflag,
        |       ROUND(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
        |       ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |       ROUND(avg(l_quantity), 6) AS avg_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderstatus,
        |       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_histogram" ->
      """WITH p AS (
        |  SELECT CAST(900.0 AS DOUBLE) AS lo,
        |         (CAST(105000.0 AS DOUBLE) - CAST(900.0 AS DOUBLE)) / 20 AS w
        |), b AS (
        |  SELECT CAST(least(19, greatest(0,
        |           CAST(floor((l_extendedprice - p.lo) / p.w) AS BIGINT)
        |         )) AS INT) AS bin
        |  FROM lineitem, p WHERE l_extendedprice IS NOT NULL
        |)
        |SELECT bin,
        |       ROUND((SELECT lo FROM p) + bin * (SELECT w FROM p), 6) AS bin_lo,
        |       ROUND((SELECT lo FROM p) + (bin + 1) * (SELECT w FROM p), 6) AS bin_hi,
        |       count(*) AS n
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_winsorize" ->
      """WITH bounds AS (
        |  SELECT l_returnflag,
        |         ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS b_lo,
        |         ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS b_hi
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l.l_returnflag, count(*) AS n,
        |       CAST(sum(CASE WHEN l_extendedprice < b_lo THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_lo,
        |       CAST(sum(CASE WHEN l_extendedprice > b_hi THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_hi,
        |       min(b_lo) AS p_lo, min(b_hi) AS p_hi,
        |       ROUND(CAST(sum(CAST(least(greatest(l_extendedprice, b_lo), b_hi)
        |                          AS DECIMAL(25,6))) AS DOUBLE) / count(*),
        |             4) AS avg_wins
        |FROM lineitem l JOIN bounds USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_chi_square" ->
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, count(*) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2
        |), rt AS (
        |  SELECT a, SUM(o) AS ra FROM cells GROUP BY a
        |), ct AS (
        |  SELECT b, SUM(o) AS rb FROM cells GROUP BY b
        |), g AS (
        |  SELECT CAST(SUM(o) AS DOUBLE) AS n,
        |         count(DISTINCT a) AS ka, count(DISTINCT b) AS kb
        |  FROM cells
        |), terms AS (
        |  SELECT CAST(round(
        |           (CAST(COALESCE(o, 0) AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE) / n)
        |         * (CAST(COALESCE(o, 0) AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE) / n)
        |         / (CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE) / n), 12)
        |         AS DECIMAL(28,12)) AS term, ka, kb, n
        |  FROM rt CROSS JOIN ct
        |       LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b, g
        |)
        |SELECT CAST(ka AS BIGINT) AS n_categories_a,
        |       CAST(kb AS BIGINT) AS n_categories_b,
        |       CAST(n AS BIGINT) AS n_rows,
        |       round(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
        |       CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
        |       CASE WHEN least(ka - 1, kb - 1) > 0
        |            THEN round(sqrt(CAST(SUM(term) AS DOUBLE) /
        |                            (n * least(ka - 1, kb - 1))), 6)
        |       END AS cramers_v
        |FROM terms GROUP BY ka, kb, n""".stripMargin,

    "q_mad_outliers" ->
      """WITH m AS (
        |  SELECT event_type, median(value) AS med
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |), d AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med
        |  FROM events e JOIN m USING (event_type)
        |), md AS (
        |  SELECT event_type, median(abs(value - med)) AS mad
        |  FROM d WHERE value IS NOT NULL GROUP BY 1
        |)
        |SELECT d.event_id, d.event_type, d.value,
        |       round((d.value - d.med) / (1.4826 * md.mad), 6) AS robust_z
        |FROM d JOIN md USING (event_type)
        |WHERE md.mad >= 1e-12
        |  AND abs(round((d.value - d.med) / (1.4826 * md.mad), 6)) > 3.5
        |ORDER BY event_id""".stripMargin,

    "q_equidepth" ->
      """WITH b AS (
        |  SELECT [ROUND(quantile_cont(l_extendedprice, 0.25), 6),
        |          ROUND(quantile_cont(l_extendedprice, 0.5), 6),
        |          ROUND(quantile_cont(l_extendedprice, 0.75), 6)] AS bounds
        |  FROM lineitem
        |)
        |SELECT bin, count(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT l_extendedprice,
        |         CAST(1 + len(list_filter(bounds, x -> l_extendedprice > x)) AS INT) AS bin
        |  FROM lineitem, b
        |)
        |GROUP BY bin ORDER BY bin""".stripMargin,

    "q_heavy_hitters" ->
      """SELECT user_id, event_type, n, CAST(rank AS INT) AS rank FROM (
        |  SELECT user_id, event_type, count(*) AS n,
        |         row_number() OVER (
        |           PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rank
        |  FROM events WHERE user_id < 50 GROUP BY user_id, event_type
        |) WHERE rank <= 2 ORDER BY user_id, rank""".stripMargin,

    "q_hll_distinct" ->
      """SELECT lang, count(DISTINCT source) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cat_drift" ->
      """WITH rc AS (
        |  SELECT CAST(lang AS VARCHAR) AS cat, count(*) AS rn
        |  FROM documents WHERE doc_id < 250 AND lang IS NOT NULL GROUP BY 1
        |), cc AS (
        |  SELECT CAST(lang AS VARCHAR) AS cat, count(*) AS cn
        |  FROM documents WHERE doc_id >= 250 AND lang IS NOT NULL GROUP BY 1
        |), j AS (
        |  SELECT coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
        |  FROM rc FULL OUTER JOIN cc USING (cat)
        |), tot AS (
        |  SELECT CAST(sum(rn) AS BIGINT) AS rt, CAST(sum(cn) AS BIGINT) AS ct,
        |         count(*) AS ncat
        |  FROM j
        |), terms AS (
        |  SELECT CAST(ROUND(
        |           (greatest(CAST(rn AS DOUBLE) / (SELECT rt FROM tot), 0.000001) -
        |            greatest(CAST(cn AS DOUBLE) / (SELECT ct FROM tot), 0.000001)) *
        |           ln(greatest(CAST(rn AS DOUBLE) / (SELECT rt FROM tot), 0.000001) /
        |              greatest(CAST(cn AS DOUBLE) / (SELECT ct FROM tot), 0.000001)),
        |         10) AS DECIMAL(22,10)) AS contrib
        |  FROM j
        |)
        |SELECT (SELECT rt FROM tot) AS n_ref, (SELECT ct FROM tot) AS n_cur,
        |       CAST((SELECT ncat FROM tot) AS INT) AS n_categories,
        |       CAST(ROUND(sum(contrib), 6) AS DOUBLE) AS psi
        |FROM terms""".stripMargin,

    "q_psi_drift" ->
      """WITH spine AS (
        |  SELECT CAST(range AS INT) AS bin FROM range(10)
        |), rb AS (
        |  SELECT CAST(least(9, greatest(0,
        |           floor((CAST(o_totalprice AS DOUBLE) - 0.0) / 40000.0)))
        |         AS INT) AS bin, count(*) AS rn
        |  FROM orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), cb AS (
        |  SELECT CAST(least(9, greatest(0,
        |           floor((CAST(o_totalprice AS DOUBLE) - 0.0) / 40000.0)))
        |         AS INT) AS bin, count(*) AS cn
        |  FROM orders WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), j AS (
        |  SELECT coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
        |  FROM spine LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)
        |), tot AS (
        |  SELECT CAST(sum(rn) AS BIGINT) AS rt, CAST(sum(cn) AS BIGINT) AS ct
        |  FROM j
        |), terms AS (
        |  SELECT (SELECT rt FROM tot) AS rt, (SELECT ct FROM tot) AS ct,
        |         CAST(ROUND(
        |           (greatest(CAST(rn AS DOUBLE) / (SELECT rt FROM tot), 0.000001) -
        |            greatest(CAST(cn AS DOUBLE) / (SELECT ct FROM tot), 0.000001)) *
        |           ln(greatest(CAST(rn AS DOUBLE) / (SELECT rt FROM tot), 0.000001) /
        |              greatest(CAST(cn AS DOUBLE) / (SELECT ct FROM tot), 0.000001)),
        |         10) AS DECIMAL(22,10)) AS contrib
        |  FROM j
        |)
        |SELECT rt AS n_ref, ct AS n_cur,
        |       CAST(ROUND(sum(contrib), 6) AS DOUBLE) AS psi
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "q_kappa" -> {
      // rater A = the shared langId oracle chain (12-language argmax +
      // script fallback), rater B = the table's lang label
      s"""WITH $duckLangPred, j AS (
         |  SELECT p.lang_pred AS a, d.lang AS b
         |  FROM lp p JOIN documents d USING (doc_id)
         |  WHERE p.lang_pred IS NOT NULL AND d.lang IS NOT NULL
         |), t AS (
         |  SELECT COUNT(*) AS n,
         |         SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
         |  FROM j
         |), m AS (
         |  SELECT c, SUM(x) AS n1, SUM(y) AS n2 FROM (
         |    SELECT a AS c, 1 AS x, 0 AS y FROM j
         |    UNION ALL SELECT b, 0, 1 FROM j
         |  ) GROUP BY c
         |), s AS (
         |  SELECT COALESCE(SUM(CAST(n1 AS HUGEINT) * n2), 0) AS sp FROM m
         |)
         |SELECT CAST(t.n AS BIGINT) AS n,
         |       ROUND(CASE WHEN t.n > 0
         |             THEN CAST(t.agree AS DOUBLE) / t.n END, 6) AS po,
         |       ROUND(CASE WHEN t.n > 0
         |             THEN CAST(s.sp AS DOUBLE) /
         |                  CAST(CAST(t.n AS HUGEINT) * t.n AS DOUBLE) END, 6)
         |         AS pe,
         |       ROUND(CASE WHEN CAST(t.n AS HUGEINT) * t.n - s.sp > 0
         |             THEN CAST(CAST(t.agree AS HUGEINT) * t.n - s.sp AS DOUBLE) /
         |                  CAST(CAST(t.n AS HUGEINT) * t.n - s.sp AS DOUBLE) END, 6)
         |         AS kappa
         |FROM t, s""".stripMargin
    },

    "q_mutual_info" ->
      """WITH base AS (
        |  SELECT lang AS a, source AS b FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |), nn AS (
        |  SELECT COUNT(*) AS n FROM base
        |), ca AS (
        |  SELECT a, count(*) AS c FROM base GROUP BY a
        |), cb AS (
        |  SELECT b, count(*) AS c FROM base GROUP BY b
        |), cab AS (
        |  SELECT a, b, count(*) AS c FROM base GROUP BY a, b
        |), ha AS (
        |  SELECT SUM(CAST(ROUND(
        |    -(CAST(c AS DOUBLE) / nn.n) *
        |      (ln(CAST(c AS DOUBLE) / nn.n) / ln(2.0)),
        |    9) AS DECIMAL(19,9))) AS h FROM ca, nn
        |), hb AS (
        |  SELECT SUM(CAST(ROUND(
        |    -(CAST(c AS DOUBLE) / nn.n) *
        |      (ln(CAST(c AS DOUBLE) / nn.n) / ln(2.0)),
        |    9) AS DECIMAL(19,9))) AS h FROM cb, nn
        |), hab AS (
        |  SELECT SUM(CAST(ROUND(
        |    -(CAST(c AS DOUBLE) / nn.n) *
        |      (ln(CAST(c AS DOUBLE) / nn.n) / ln(2.0)),
        |    9) AS DECIMAL(19,9))) AS h FROM cab, nn
        |)
        |SELECT CAST(nn.n AS BIGINT) AS n_rows,
        |       CAST(ROUND(ha.h, 6) AS DOUBLE) AS h_a,
        |       CAST(ROUND(hb.h, 6) AS DOUBLE) AS h_b,
        |       CAST(ROUND(hab.h, 6) AS DOUBLE) AS h_ab,
        |       CAST(ROUND(ha.h + hb.h - hab.h, 6) AS DOUBLE) AS mi,
        |       CASE WHEN ROUND(ha.h, 6) > 0 AND ROUND(hb.h, 6) > 0 THEN
        |         ROUND(CAST(ROUND(ha.h + hb.h - hab.h, 6) AS DOUBLE) /
        |               sqrt(CAST(ROUND(ha.h, 6) AS DOUBLE) *
        |                    CAST(ROUND(hb.h, 6) AS DOUBLE)), 6)
        |       END AS nmi
        |FROM nn, ha, hb, hab""".stripMargin,

    "q_wasserstein" ->
      """WITH u AS (
        |  SELECT CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 1000000) AS BIGINT)
        |           AS vq, 1 AS a, 0 AS b
        |  FROM orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 1000000) AS BIGINT)
        |           AS vq, 0 AS a, 1 AS b
        |  FROM orders WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
        |), g AS (
        |  SELECT vq, SUM(a) AS ca, SUM(b) AS cb FROM u GROUP BY vq
        |), r AS (
        |  SELECT vq,
        |         SUM(ca) OVER (ORDER BY vq
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ra,
        |         SUM(cb) OVER (ORDER BY vq
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rb,
        |         LEAD(vq) OVER (ORDER BY vq) AS nvq
        |  FROM g
        |), t AS (
        |  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g
        |), s AS (
        |  SELECT SUM(ABS(CAST(ra AS HUGEINT) * nb - CAST(rb AS HUGEINT) * na)
        |             * CAST(nvq - vq AS HUGEINT)) AS s1
        |  FROM r, t WHERE nvq IS NOT NULL
        |)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |       ROUND(CAST(COALESCE(s.s1, 0) AS DOUBLE) /
        |             (CAST(t.na AS DOUBLE) * t.nb * 1000000), 6) AS w1
        |FROM t, s""".stripMargin,

    "q_ks_test" ->
      """WITH u AS (
        |  SELECT ROUND(CAST(o_totalprice AS DOUBLE), 6) AS v, 1 AS a, 0 AS b
        |  FROM orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        |  UNION ALL
        |  SELECT ROUND(CAST(o_totalprice AS DOUBLE), 6) AS v, 0 AS a, 1 AS b
        |  FROM orders WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
        |), g AS (
        |  SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM u GROUP BY v
        |), r AS (
        |  SELECT v,
        |         SUM(ca) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ra,
        |         SUM(cb) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rb
        |  FROM g
        |), t AS (
        |  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g
        |), m AS (
        |  SELECT r.v,
        |         ABS(CAST(ra AS HUGEINT) * nb - CAST(rb AS HUGEINT) * na) AS num
        |  FROM r, t
        |), mm AS (
        |  SELECT MAX(num) AS mx FROM m
        |), at AS (
        |  SELECT MIN(m.v) AS atv FROM m, mm WHERE m.num = mm.mx
        |)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |       ROUND(CAST(mm.mx AS DOUBLE) / (CAST(t.na AS DOUBLE) * t.nb), 6)
        |         AS ks_stat,
        |       at.atv AS ks_at,
        |       ROUND(CAST(mm.mx AS DOUBLE) / (CAST(t.na AS DOUBLE) * t.nb) *
        |             sqrt(CAST(t.na AS DOUBLE) * t.nb / (t.na + t.nb)), 6)
        |         AS ks_lambda
        |FROM t, mm, at""".stripMargin,

    // doubled average ranks stay integers (2*rank = 2*runningCount -
    // ties + 1); all sums in HUGEINT, one final double division —
    // mirrors Stats.spearmanCorrelation bit-for-bit
    "q_spearman" ->
      """WITH base AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS a,
        |         CAST(l_extendedprice AS DOUBLE) AS b
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |), ca AS (
        |  SELECT a, count(*) AS c FROM base GROUP BY a
        |), ra AS (
        |  SELECT a, 2 * SUM(c) OVER (ORDER BY a) - c + 1 AS dra FROM ca
        |), cb AS (
        |  SELECT b, count(*) AS c FROM base GROUP BY b
        |), rb AS (
        |  SELECT b, 2 * SUM(c) OVER (ORDER BY b) - c + 1 AS drb FROM cb
        |), j AS (
        |  SELECT dra, drb FROM base JOIN ra USING (a) JOIN rb USING (b)
        |), s AS (
        |  SELECT count(*) AS n,
        |         SUM(CAST(dra AS HUGEINT)) AS sx,
        |         SUM(CAST(drb AS HUGEINT)) AS sy,
        |         SUM(CAST(dra AS HUGEINT) * dra) AS sxx,
        |         SUM(CAST(drb AS HUGEINT) * drb) AS syy,
        |         SUM(CAST(dra AS HUGEINT) * drb) AS sxy
        |  FROM j
        |)
        |SELECT CAST(n AS BIGINT) AS n,
        |       ROUND(CASE WHEN n > 0 AND (n*sxx - sx*sx) > 0
        |                   AND (n*syy - sy*sy) > 0
        |             THEN CAST(n*sxy - sx*sy AS DOUBLE) /
        |                  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |                   sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
        |             END, 6) AS spearman_rho
        |FROM s""".stripMargin,

    "q_bloom_semijoin" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
        |)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
