package graft

import graft.QueryShared._
import graft.operators.{Checks, Decontam, Dedup, Graphs, Joins, Layout, Sessionize, Similarity, Splits, Stats, TextAnalysis, TopN, Wrangling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sessionization, event analytics, time joins and graph analytics — query registry + DuckDB oracles.
  * Merged into the driver contract by [[ScaleQueries]]. */
private[graft] object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dense hourly series per user with zero-filled gaps (bounded users)
    "q_gap_fill" -> ((s, dir) => {
      Sessionize
        .fillTimeGaps(
          events(s, dir).filter(col("user_id") < 20),
          "user_id", "ts", bucketSeconds = 3600L
        )
        .orderBy("user_id", "bucket_start")
    }),

    // gap sessionization (30 min)
    "q_sessionize" -> ((s, dir) => {
      Sessionize
        .sessionize(events(s, dir), gapSeconds = 1800)
        .orderBy("user_id", "session_id")
    }),

    // SCD2 validity intervals from the event stream read as per-user state
    // history (key = user, tracked attr = event_type, version = ts):
    // consecutive same-type events collapse into one interval row
    "q_scd2" -> ((s, dir) => {
      import graft.operators.Wrangling
      Wrangling
        .scd2History(
          events(s, dir).select("user_id", "event_type", "ts"),
          keyCols = Seq("user_id"),
          attrCols = Seq("event_type"),
          versionCol = "ts"
        )
        .orderBy("user_id", "valid_from")
    }),

    // top-50 within-session 3-step event-type paths (sequential patterns)
    "q_session_paths" -> ((s, dir) => {
      Sessionize
        .frequentPaths(events(s, dir), gapSeconds = 1800, pathLen = 3)
        .orderBy(col("n_occurrences").desc, col("path"))
        .limit(50)
    }),

    // last-touch conversion attribution report per touch channel
    "q_attribution" -> ((s, dir) => {
      Sessionize
        .attributeConversions(
          events(s, dir), gapSeconds = 1800,
          conversionType = "purchase", touchTypes = Seq("view", "click"),
          model = "last_touch"
        )
        .groupBy("touch_type")
        .agg(
          count(lit(1)).as("n_conversions"),
          sum(col("conversion_value").cast("decimal(18,2)"))
            .cast("double")
            .as("total_value")
        )
        .orderBy("touch_type")
    }),

    // within-session event-type transition matrix (first-order Markov)
    "q_event_transitions" -> ((s, dir) => {
      Sessionize
        .eventTransitions(events(s, dir), gapSeconds = 1800)
        .orderBy("from_type", "to_type")
    }),

    // tumbling 1h event-time windows
    "q_window_1h" -> ((s, dir) => {
      Sessionize
        .tumblingWindowAgg(events(s, dir), "1 hour")
        .orderBy("window_start")
    }),

    // sliding 1h windows every 30 min (each event in 2 windows)
    "q_window_sliding" -> ((s, dir) => {
      Sessionize
        .slidingWindowAgg(events(s, dir), "1 hour", "30 minutes")
        .orderBy("window_start")
    }),

    // bin-bucketed interval join: 37-minute windows every 2h13m across the
    // events month, aggregated per window. Odd sizes make intervals span
    // multiple 15-minute bins, exercising the explode path.
    "q_range_join" -> ((s, dir) => {
      val iv = s.range(325).select(
        timestamp_seconds(lit(1704067200L) + col("id") * 7980).as("w_start"),
        timestamp_seconds(lit(1704067200L) + col("id") * 7980 + 2220).as("w_end")
      )
      Joins
        .rangeJoin(events(s, dir), "ts", iv, "w_start", "w_end", binSeconds = 900)
        .groupBy("w_start", "w_end")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value")
        )
        .orderBy("w_start")
    }),

    // two-table as-of join: each purchase enriched with the latest view at
    // or before it (union-merge, one shuffle; oracle = DuckDB ASOF JOIN)
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = Dedup
        .exactDedup(
          ev.filter(col("event_type") === "view")
            .select("user_id", "ts", "value", "event_id"),
          Seq("user_id", "ts"),
          Seq(col("event_id"))
        )
        .select("user_id", "ts", "value")
      Joins
        .asOfJoin(purchases, views, "user_id", "ts", "ts", Seq("value", "ts"))
        .orderBy("event_id")
    }),

    // point-in-time as-of with a 2h staleness bound: older matches null out
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = Dedup
        .exactDedup(
          ev.filter(col("event_type") === "view")
            .select("user_id", "ts", "value", "event_id"),
          Seq("user_id", "ts"),
          Seq(col("event_id"))
        )
        .select("user_id", "ts", "value")
      Joins
        .asOfJoinTolerant(
          purchases, views, "user_id", "ts", "ts",
          Seq("value", "ts"), toleranceSeconds = 7200L
        )
        .orderBy("event_id")
    }),

    // as-of: last prior 'view' before each 'purchase' per user
    "q_asof_purchase_view" -> ((s, dir) => {
      Sessionize
        .asOfPrior(events(s, dir), "purchase", "view")
        .select("event_id", "user_id", "ts", "last_prior_ts")
        .orderBy("event_id")
    }),

    // 3-iteration PageRank over a symmetric supplier-derived graph
    "q_pagerank" -> ((s, dir) => {
      val base = t(s, dir, "supplier")
        .select(
          col("s_nationkey").cast("long").as("a"),
          (col("s_suppkey") % 25).cast("long").as("b")
        )
        .filter(col("a") =!= col("b"))
        .distinct()
      val edges = base
        .select(col("a").as("src"), col("b").as("dst"))
        .union(base.select(col("b").as("src"), col("a").as("dst")))
      Graphs
        .pageRank(edges, "src", "dst", iterations = 3, damping = 0.85)
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy("id")
    }),

    // 3-round deterministic label propagation (most-frequent neighbor
    // label, ties to the smallest) over the same supplier-derived graph
    // as q_pagerank — the community-detection layer over dedup/interaction
    // graphs, fully unrollable so the whole labeling is oracle-checked
    "q_label_prop" -> ((s, dir) => {
      val base = t(s, dir, "supplier")
        .select(
          col("s_nationkey").cast("long").as("a"),
          (col("s_suppkey") % 25).cast("long").as("b")
        )
        .filter(col("a") =!= col("b"))
        .distinct()
      Graphs
        .labelPropagation(base, "a", "b", rounds = 3)
        .orderBy("id")
    }),

    // nearest view (either direction in time) for each purchase per user
    "q_nearest_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = Dedup
        .exactDedup(
          ev.filter(col("event_type") === "view")
            .select("user_id", "ts", "value", "event_id"),
          Seq("user_id", "ts"),
          Seq(col("event_id"))
        )
        .select("user_id", "ts", "value")
      Joins
        .nearestJoin(purchases, views, "user_id", "ts", "ts", "value")
        .orderBy("event_id")
    }),

    // daily cohort retention triangle over events
    "q_retention" -> ((s, dir) => {
      Sessionize
        .retentionMatrix(events(s, dir), "user_id", "ts", bucketSeconds = 86400L)
        .withColumn("cohort_start", col("cohort_start").cast("string"))
        .orderBy("cohort_start", "offset")
    }),

    // view -> click -> purchase funnel progression per user
    "q_funnel" -> ((s, dir) => {
      Sessionize
        .funnel(
          events(s, dir).filter(col("user_id") < 200),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase")
        )
        .orderBy("user_id")
    }),

    // exact triangle count of the parts-co-ordered-together graph. The
    // synthetic co-order graph is unusually DENSE (degree ~90 at any SF:
    // parts and orders both scale with SF, so density is constant and the
    // wedge count grows superlinearly in the bench); the census runs on
    // the deterministic 1-in-3 part subgraph, which keeps the measured
    // work the operator's (orientation + wedge joins), not the synthetic
    // density artifact. Vertex-induced subgraphs preserve triangle
    // semantics exactly.
    "q_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey").as("__ok"), col("l_partkey").as("__pk"))
      val edges = li
        .join(li.select(col("__ok"), col("__pk").as("__pk2")), Seq("__ok"))
        .filter(col("__pk") < col("__pk2"))
        .select(col("__pk").as("src"), col("__pk2").as("dst"))
      Graphs.triangleCount(edges, "src", "dst")
    }),

    // trailing 5-row frame stats per user (ROWS BETWEEN frame family)
    "q_rolling" -> ((s, dir) => {
      Sessionize
        .rollingStats(
          events(s, dir).filter(col("user_id") < 30),
          "user_id", "ts", "value", n = 5, tieCol = "event_id"
        )
        .select("user_id", "event_id", "roll_n", "roll_sum", "roll_min", "roll_max", "roll_avg")
        .orderBy("user_id", "event_id")
    }),

    // interval-interval overlap join via bin bucketing (first-shared-bin
    // dedupe, no distinct, no nested loop): 2h view-windows against 3h
    // campaign-windows derived from the event stream
    "q_interval_overlap" -> ((s, dir) => {
      val e = events(s, dir)
      val l = e
        .filter(col("event_id") % 37 === 0)
        .select(
          col("event_id").as("l_id"),
          col("ts").as("l_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("l_end")
        )
      val r = e
        .filter(col("event_id") % 53 === 0)
        .select(
          col("event_id").as("r_id"),
          col("ts").as("r_start"),
          (col("ts") + expr("INTERVAL 3 HOURS")).as("r_end")
        )
      Joins
        .intervalOverlapJoin(l, "l_start", "l_end", r, "r_start", "r_end",
          binSeconds = 7200)
        .select("l_id", "r_id")
        .orderBy("l_id", "r_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH v0 AS (
        |  SELECT user_id, ts, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'view'
        |), vd AS (
        |  SELECT user_id, ts, value FROM v0 WHERE rn = 1
        |), p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.ts,
        |       vd.value AS asof_value, vd.ts AS asof_ts
        |FROM p ASOF LEFT JOIN vd ON p.user_id = vd.user_id AND p.ts >= vd.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_asof_tolerance" ->
      """WITH v0 AS (
        |  SELECT user_id, ts, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'view'
        |), vd AS (
        |  SELECT user_id, ts, value FROM v0 WHERE rn = 1
        |), p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT p.event_id, p.user_id, p.ts, vd.value AS mv, vd.ts AS mt,
        |         CASE WHEN vd.ts IS NOT NULL
        |                AND epoch_us(p.ts) - epoch_us(vd.ts) <= 7200000000
        |              THEN 1 ELSE 0 END AS fresh
        |  FROM p ASOF LEFT JOIN vd ON p.user_id = vd.user_id AND p.ts >= vd.ts
        |)
        |SELECT event_id, user_id, ts,
        |       CASE WHEN fresh = 1 THEN mv END AS asof_value,
        |       CASE WHEN fresh = 1 THEN mt END AS asof_ts,
        |       CASE WHEN fresh = 1
        |            THEN round((epoch_us(ts) - epoch_us(mt)) / 1000000.0, 6) END
        |         AS asof_age_seconds
        |FROM j ORDER BY event_id""".stripMargin,

    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR lag(event_type) OVER w IS DISTINCT FROM event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type NULLS FIRST)
        |), r AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_type NULLS FIRST
        |                           ROWS UNBOUNDED PRECEDING) AS run
        |  FROM o
        |), g AS (
        |  SELECT user_id, run, min(event_type) AS event_type,
        |         min(ts) AS valid_from, count(*) AS n_versions
        |  FROM r GROUP BY user_id, run
        |), f AS (
        |  SELECT user_id, event_type, valid_from,
        |         lead(valid_from) OVER (PARTITION BY user_id
        |                                ORDER BY valid_from,
        |                                         event_type NULLS FIRST)
        |           AS valid_to,
        |         n_versions
        |  FROM g
        |)
        |SELECT user_id, event_type, valid_from, valid_to,
        |       valid_to IS NULL AS is_current,
        |       CAST(n_versions AS BIGINT) AS n_versions
        |FROM f ORDER BY user_id, valid_from""".stripMargin,

    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_id""".stripMargin,

    "q_session_paths" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), p AS (
        |  SELECT user_id, sid, event_type,
        |         lag(event_type, 2) OVER w2 AS t2,
        |         lag(event_type, 1) OVER w2 AS t1
        |  FROM s WHERE event_type IS NOT NULL
        |  WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
        |), g AS (
        |  SELECT t2 || '>' || t1 || '>' || event_type AS path,
        |         user_id || '#' || CAST(sid AS BIGINT) AS sess
        |  FROM p WHERE t2 IS NOT NULL
        |)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences,
        |       CAST(count(DISTINCT sess) AS BIGINT) AS n_sessions
        |FROM g GROUP BY path
        |ORDER BY n_occurrences DESC, path LIMIT 50""".stripMargin,

    "q_attribution" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), a AS (
        |  SELECT event_type, value,
        |         last_value(CASE WHEN event_type IN ('view', 'click')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tt
        |  FROM s
        |)
        |SELECT COALESCE(tt, '(none)') AS touch_type,
        |       CAST(count(*) AS BIGINT) AS n_conversions,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), p AS (
        |  SELECT event_type,
        |         lag(event_type, 1) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS ft
        |  FROM s
        |), c AS (
        |  SELECT ft AS from_type, event_type AS to_type, count(*) AS n
        |  FROM p WHERE ft IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
        |       round(CAST(n AS DOUBLE) /
        |             CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
        |         AS p_transition
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS b
        |  FROM events WHERE user_id < 20
        |), c AS (
        |  SELECT user_id, b, count(*) AS n FROM e GROUP BY 1, 2
        |), s AS (
        |  SELECT user_id, min(b) AS lo, max(b) AS hi FROM c GROUP BY 1
        |), ab AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS b FROM s
        |)
        |SELECT ab.user_id,
        |       CAST(to_timestamp(ab.b * 3600) AS TIMESTAMP) AS bucket_start,
        |       COALESCE(c.n, 0) AS n_events
        |FROM ab LEFT JOIN c ON c.user_id = ab.user_id AND c.b = ab.b
        |ORDER BY ab.user_id, bucket_start""".stripMargin,

    "q_window_1h" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_sliding" ->
      """WITH w AS (
        |  SELECT unnest([
        |    CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP),
        |    CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP)
        |  ]) AS window_start, value
        |  FROM events
        |)
        |SELECT window_start, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT CAST(to_timestamp(1704067200 + range*7980) AS TIMESTAMP) AS w_start,
        |         CAST(to_timestamp(1704067200 + range*7980 + 2220) AS TIMESTAMP) AS w_end
        |  FROM range(325)
        |)
        |SELECT w_start, w_end, count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q_asof_purchase_view" ->
      """SELECT event_id, user_id, ts, last_prior_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |         MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_prior_ts
        |  FROM events
        |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_label_prop" -> {
      val rounds = (1 to 3).map { r =>
        s""", m$r AS (
           |  SELECT und.a AS id, l.community, count(*) AS c
           |  FROM und JOIN l${r - 1} l ON l.id = und.b
           |  GROUP BY 1, 2
           |), l$r AS (
           |  SELECT id, community FROM (
           |    SELECT id, community,
           |           ROW_NUMBER() OVER (PARTITION BY id
           |                              ORDER BY c DESC, community) AS rn
           |    FROM m$r
           |  ) WHERE rn = 1
           |)""".stripMargin
      }.mkString
      s"""WITH base AS (
         |  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS a,
         |         CAST(s_suppkey % 25 AS BIGINT) AS b
         |  FROM supplier
         |  WHERE CAST(s_nationkey AS BIGINT) <> CAST(s_suppkey % 25 AS BIGINT)
         |), und AS (
         |  SELECT a, b FROM base
         |  UNION
         |  SELECT b AS a, a AS b FROM base
         |), l0 AS (
         |  SELECT DISTINCT a AS id, a AS community FROM und
         |)$rounds
         |SELECT id, community FROM l3 ORDER BY id""".stripMargin
    },

    "q_pagerank" ->
      """WITH base AS (
        |  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS a,
        |         CAST(s_suppkey % 25 AS BIGINT) AS b
        |  FROM supplier
        |  WHERE CAST(s_nationkey AS BIGINT) <> CAST(s_suppkey % 25 AS BIGINT)
        |), e AS (
        |  SELECT a AS src, b AS dst FROM base
        |  UNION
        |  SELECT b AS src, a AS dst FROM base
        |), nodes AS (SELECT DISTINCT src AS id FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
        |        FROM e GROUP BY 1),
        |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
        |r1 AS (SELECT nodes.id,
        |         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(f.inflow, 0) AS rank
        |       FROM nodes LEFT JOIN (
        |         SELECT e.dst AS id, sum(r.rank / d.outdeg) AS inflow
        |         FROM e JOIN r0 r ON e.src = r.id JOIN deg d ON e.src = d.src
        |         GROUP BY 1) f ON nodes.id = f.id),
        |r2 AS (SELECT nodes.id,
        |         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(f.inflow, 0) AS rank
        |       FROM nodes LEFT JOIN (
        |         SELECT e.dst AS id, sum(r.rank / d.outdeg) AS inflow
        |         FROM e JOIN r1 r ON e.src = r.id JOIN deg d ON e.src = d.src
        |         GROUP BY 1) f ON nodes.id = f.id),
        |r3 AS (SELECT nodes.id,
        |         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(f.inflow, 0) AS rank
        |       FROM nodes LEFT JOIN (
        |         SELECT e.dst AS id, sum(r.rank / d.outdeg) AS inflow
        |         FROM e JOIN r2 r ON e.src = r.id JOIN deg d ON e.src = d.src
        |         GROUP BY 1) f ON nodes.id = f.id)
        |SELECT id, ROUND(rank, 6) AS rank FROM r3 ORDER BY id""".stripMargin,

    "q_nearest_join" ->
      """WITH v0 AS (
        |  SELECT user_id, ts, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'view'
        |), vd AS (
        |  SELECT user_id, ts, value FROM v0 WHERE rn = 1
        |), p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), b AS (
        |  SELECT p.event_id, p.user_id, p.ts, vd.value AS bv, vd.ts AS bt
        |  FROM p ASOF LEFT JOIN vd ON p.user_id = vd.user_id AND p.ts >= vd.ts
        |), f AS (
        |  SELECT p.event_id, vd.value AS fv, vd.ts AS ft
        |  FROM p ASOF LEFT JOIN vd ON p.user_id = vd.user_id AND p.ts <= vd.ts
        |)
        |SELECT b.event_id, b.user_id, b.ts,
        |  CASE WHEN bt IS NOT NULL AND (ft IS NULL
        |            OR epoch_us(b.ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(b.ts))
        |       THEN bv ELSE fv END AS near_value,
        |  CASE WHEN bt IS NOT NULL AND (ft IS NULL
        |            OR epoch_us(b.ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(b.ts))
        |       THEN bt ELSE ft END AS near_ts,
        |  CASE WHEN bt IS NOT NULL AND (ft IS NULL
        |            OR epoch_us(b.ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(b.ts))
        |       THEN epoch_us(b.ts) - epoch_us(bt)
        |       ELSE epoch_us(ft) - epoch_us(b.ts) END AS near_dist_us
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u,
        |         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS b
        |  FROM events
        |), f AS (
        |  SELECT u, min(b) AS first FROM act GROUP BY 1
        |), cs AS (
        |  SELECT first, count(*) AS cohort_n FROM f GROUP BY 1
        |), m AS (
        |  SELECT f.first, a.b - f.first AS "offset", count(*) AS n_active
        |  FROM act a JOIN f ON a.u = f.u GROUP BY 1, 2
        |)
        |SELECT CAST(make_timestamp(m.first * 86400000000) AS VARCHAR) AS cohort_start,
        |       "offset", n_active, CAST(cohort_n AS BIGINT) AS n_cohort,
        |       ROUND(CAST(n_active AS DOUBLE) / cohort_n, 6) AS retention_rate
        |FROM m JOIN cs ON m.first = cs.first
        |ORDER BY cohort_start, "offset"""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_type FROM events WHERE user_id < 200
        |), s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1
        |)
        |SELECT u.user_id, t1 AS step_0_ts, t2 AS step_1_ts, t3 AS step_2_ts,
        |       CAST((CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) +
        |            (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) +
        |            (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_steps
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 3 = 0
        |), co AS (
        |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM li l1 JOIN li l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |)
        |SELECT
        |  CAST((SELECT count(*) FROM
        |        (SELECT a AS v FROM co UNION SELECT b FROM co)) AS BIGINT)
        |    AS n_vertices,
        |  CAST((SELECT count(*) FROM co) AS BIGINT) AS n_edges,
        |  CAST((SELECT count(*) FROM co e1
        |        JOIN co e2 ON e1.b = e2.a
        |        JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
        |    AS n_triangles""".stripMargin,

    "q_rolling" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS roll_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        |  CAST(MIN(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_min,
        |  CAST(MAX(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_max,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |        / (count(*) OVER w), 6) AS roll_avg
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_interval_overlap" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS us FROM events
        |), l AS (
        |  SELECT event_id AS l_id, us AS ls, us + 7200000000 AS le
        |  FROM e WHERE event_id % 37 = 0
        |), r AS (
        |  SELECT event_id AS r_id, us AS rs, us + 10800000000 AS re
        |  FROM e WHERE event_id % 53 = 0
        |)
        |SELECT l_id, r_id FROM l JOIN r ON ls < re AND rs < le
        |ORDER BY l_id, r_id""".stripMargin
  )
}
