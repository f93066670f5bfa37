package graft

import graft.QueryShared._
import graft.operators.{Checks, Decontam, Dedup, Graphs, Joins, Layout, Sessionize, Similarity, Splits, Stats, TextAnalysis, TopN, Wrangling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-style analytics, wrangling, governance and table-layout queries — query registry + DuckDB oracles.
  * Merged into the driver contract by [[ScaleQueries]]. */
private[graft] object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val disc = lit(1) - col("l_discount").cast("decimal(4,2)")
      val charge = disc * (lit(1) + col("l_tax").cast("decimal(4,2)"))
      li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") * disc).cast("double").as("sum_disc_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") * charge).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-style segment revenue top-10 (3-way join headline)
    "q3_top_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1) - col("l_discount").cast("decimal(4,2)"))
          ).cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style regional revenue: 6-way join with co-located customer/
    // supplier nations; dimension tables broadcast, fact joins shuffle on
    // their keys
    "q5_region_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      // region selectivity applied BEFORE the fact joins: the tiny
      // region-filtered nation dim broadcasts onto customer and supplier
      // first, so the big customer-orders-lineitem-supplier joins carry
      // only the selected region's rows (~1/5 of the data) instead of
      // joining everything and discarding 80% at the end — the shape that
      // matters at 100x scale
      val asiaN = n
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cAsia = c
        .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val suAsia = su
        .join(
          broadcast(asiaN.select(col("n_nationkey").as("__snk"))),
          col("s_nationkey") === col("__snk")
        )
        .select(col("s_suppkey"), col("s_nationkey"))
      cAsia
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(suAsia, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1) - col("l_discount").cast("decimal(4,2)"))
          ).cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // left-semi join (EXISTS): customers with a 1997 order
    "q_join_semi" -> ((s, dir) => {
      val o97 = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      )
      t(s, dir, "customer")
        .join(o97, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // left-anti join (NOT EXISTS): customers with no high-value order
    "q_join_anti" -> ((s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // set operations: union / intersect / except over customer key sets
    "q_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey")
      val bld = c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
      val union = auto.union(bld).distinct().withColumn("op", lit("union"))
      val inter = auto.intersect(bld).withColumn("op", lit("intersect"))
      val minus = auto.except(bld).withColumn("op", lit("except"))
      union.union(inter).union(minus).orderBy("op", "c_nationkey")
    }),

    // rollup: subtotals + grand total over (nation, segment)
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .rollup("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy(
          col("c_nationkey").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first
        )
    }),

    // pivot: segment counts as columns per nation (reshape counterpart of
    // the flowchart's unpivot)
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .pivot(
          "c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        )
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("c_nationkey")
    }),

    // salted join under deliberate 90% key skew: lineitem rows collapse onto
    // hot group 0, the small dim side replicates per salt value, and the
    // aggregate proves result equivalence with the plain join (the oracle).
    // ScaleSpec asserts the hot key spans multiple partitions post-join.
    "q_skew_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(
          when(col("l_orderkey") % 100 < 90, lit(0L))
            .otherwise(col("l_orderkey") % 100).as("grp"),
          col("l_quantity")
        )
      val dim = s.range(100)
        .select(col("id").as("grp"), concat(lit("g"), col("id")).as("grp_label"))
      Joins
        .saltedJoin(li, dim, Seq("grp"), saltFactor = 8)
        .groupBy("grp", "grp_label")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty")
        )
        .orderBy("grp")
    }),

    // ranking-function battery per customer: lag/lead/ntile/percent_rank/
    // cume_dist over a deterministic (price, key) order
    "q_window_funcs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 200)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume")
        )
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    }),

    // full cube with grouping_id (subtotals on every dimension combination)
    "q_cube" -> ((s, dir) => {
      t(s, dir, "customer")
        .cube("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(
          col("gid"),
          col("c_nationkey").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first
        )
    }),

    // wide-to-long reshape of lineitem rate columns (bounded slice)
    "q_melt" -> ((s, dir) => {
      graft.operators.Wrangling
        .melt(
          t(s, dir, "lineitem")
            .filter(col("l_orderkey") < 100)
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
          idCols = Seq("l_orderkey", "l_linenumber"),
          valueCols = Seq("l_quantity", "l_discount", "l_tax")
        )
        .orderBy("l_orderkey", "l_linenumber", "variable")
    }),

    // k-anonymity suppression on (nation, segment) quasi identifiers
    "q_kanon" -> ((s, dir) => {
      graft.operators.Privacy
        .kAnonymize(t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 12)
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // ... and the suppressed-group report
    "q_kanon_violations" -> ((s, dir) => {
      graft.operators.Privacy
        .kAnonymityViolations(
          t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 12
        )
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // TPC-H Q14-flavoured part-type revenue share: the part dim broadcasts
    // onto the fact scan, and the one-row grand total broadcasts back for
    // the share — one fact pass, no second scan, no global sort
    "q14_type_share" -> ((s, dir) => {
      val part = t(s, dir, "part").select("p_partkey", "p_type")
      val rev = t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_type")
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1.0).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
          ).as("__rev"),
          count(lit(1)).as("n")
        )
      val total = rev.agg(sum("__rev").as("__tot"))
      rev
        .crossJoin(broadcast(total))
        .select(
          col("p_type"),
          col("__rev").cast("double").as("revenue"),
          col("n"),
          round(col("__rev").cast("double") / col("__tot").cast("double"), 6)
            .as("share")
        )
        .orderBy("p_type")
    }),

    // TPC-H Q7-style nation-pair shipping volume: nation dims filter FIRST
    // (broadcast), so the fact join only carries the two nations' rows
    "q7_nation_volume" -> ((s, dir) => {
      val nations = Seq("NATION_1", "NATION_2")
      val su = t(s, dir, "supplier")
        .join(
          broadcast(
            t(s, dir, "nation")
              .filter(col("n_name").isin(nations: _*))
              .select(col("n_nationkey"), col("n_name").as("supp_nation"))
          ),
          col("s_nationkey") === col("n_nationkey")
        )
        .select("s_suppkey", "supp_nation")
      val cu = t(s, dir, "customer")
        .join(
          broadcast(
            t(s, dir, "nation")
              .filter(col("n_name").isin(nations: _*))
              .select(col("n_nationkey"), col("n_name").as("cust_nation"))
          ),
          col("c_nationkey") === col("n_nationkey")
        )
        .select("c_custkey", "cust_nation")
      t(s, dir, "lineitem")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(
          t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey")
        )
        .join(cu, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(
          col("supp_nation"),
          col("cust_nation"),
          year(col("l_shipdate")).as("l_year")
        )
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1.0).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
          ).cast("double").as("revenue"),
          count(lit(1)).as("n")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // archive upsert: latest-version-wins merge, update side wins ties
    "q_upsert_archive" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val existing = orders.filter(col("o_orderkey") % 3 =!= 0)
      val updates = orders
        .filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      graft.sources.Tables
        .upsertArchive(existing, updates, Seq("o_orderkey"), "o_orderdate")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    }),

    // per-key snapshot diff: which keys were added/removed/changed by a
    // refresh — the audit run before replacing an archive version. Old and
    // new sides are derived deterministically from orders (mod filters +
    // a planted price bump) so every status is exercised
    "q_snapshot_diff" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val oldSnap = orders
        .filter(col("o_orderkey") % 11 =!= 0)
        .select("o_orderkey", "o_totalprice")
      val newSnap = orders
        .filter(col("o_orderkey") % 7 =!= 0)
        .select(
          col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice"))
            .as("o_totalprice")
        )
      graft.sources.Tables
        .snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
        .groupBy("status")
        .agg(
          count(lit(1)).as("n"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key")
        )
        .orderBy("status")
    }),

    // corpus duplication health check (one-row summary)
    "q_dup_report" -> ((s, dir) => {
      Dedup.duplicationReport(t(s, dir, "documents"), "text")
    }),

    // text canonicalization: lowercase, strip control+punct, collapse ws
    "q_normalize" -> ((s, dir) => {
      Wrangling
        .normalizeText(
          t(s, dir, "documents").filter(col("text").isNotNull),
          "text", stripPunctuation = true, outCol = "norm"
        )
        .select(
          col("doc_id"),
          md5(col("norm")).as("norm_md5"),
          length(col("norm")).as("n_chars_norm")
        )
        // barrier: shuffle-free per-row normalization; without it the
        // sort's range-boundary sampling re-executes it from the scan
        .localCheckpoint(false)
        .orderBy("doc_id")
    }),

    // long-format data-quality profile over mixed column types
    "q_profile" -> ((s, dir) => {
      Stats
        .profile(
          t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        )
        .orderBy("column")
    }),

    // the 100 TB path of the same profile: HyperLogLog++ distinct counts —
    // one streaming pass, no Expand. Sketch estimates are implementation-
    // defined (DuckDB's HLL lands on different values) -> no SQL oracle;
    // the rows gate plus the suite's ±rsd bound assertion against the
    // exact twin cover it, and this entry exists to PRICE the approx plan
    // in the bench next to q_profile's exact Expand.
    "q_profile_approx" -> ((s, dir) => {
      Stats
        .profile(
          t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"),
          approxDistinct = true
        )
        .orderBy("column")
    }),

    // schema-on-read JSON extraction from the event-properties column,
    // aggregated per event type
    "q_json_extract" -> ((s, dir) => {
      Wrangling
        .parseJsonColumn(events(s, dir), "props", "k INT")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min("k").as("min_k"),
          max("k").as("max_k")
        )
        .orderBy("event_type")
    }),

    // Morton (Z-order) codes for write-time two-column clustering
    "q_zorder" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          Layout
            .mortonCode(col("l_partkey"), col("l_suppkey"))
            .as("zcode")
        )
        .orderBy("zcode", "l_orderkey", "l_linenumber")
    }),

    // key-skew diagnostic (the "do I need a salted join" one-row report)
    "q_key_skew" -> ((s, dir) => {
      Stats.keySkewReport(events(s, dir), Seq("event_type"))
    }),

    // exact-moment z-score standardization (stats over the FULL table,
    // output bounded for the dump)
    "q_standardize" -> ((s, dir) => {
      Stats
        .standardize(t(s, dir, "lineitem"), Seq("l_quantity", "l_extendedprice"))
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity_z", "l_extendedprice_z")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Unicode NFC canonicalization (native codegen'd expression): each
    // doc gets a decomposed-accent suffix planted, both engines normalize,
    // and the md5s must agree — proving byte-level canonical equivalence
    "q_nfc" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(
            graft.functions.TextFunctions.normalizeUnicode(
              concat(col("text"), lit(" café"))
            )
          ).as("h_nfc")
        )
        .orderBy("doc_id")
    }),

    // data-contract gate: four scalar checks fused into ONE scan pass,
    // plus a keyed uniqueness check and a broadcast referential probe —
    // the dbt-test / expectation-suite shape over the fact table
    "q_checks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Checks.runChecks(
        li,
        Seq(
          Checks.NotNull("l_orderkey"),
          Checks.InRange("l_discount", 0.0, 0.05),
          Checks.AcceptedValues("l_returnflag", Seq("A", "N", "R")),
          Checks.MatchesRegex("l_linestatus", "^[A-Z]$"),
          Checks.Unique(Seq("l_orderkey", "l_linenumber")),
          Checks.ReferencedIn("l_suppkey", t(s, dir, "supplier"), "s_suppkey")
        )
      )
    }),

    // Hilbert-curve index per part (the codegen'd bit-serial state
    // machine); the oracle replays the same walk as a 16-step recursive
    // CTE — one of the few ways to express a per-row loop in SQL
    "q_hilbert" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          Layout.hilbertIndex(col("p_partkey"), col("p_size"), bits = 16)
            .as("hilbert")
        )
        .orderBy("p_partkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_revenue" ->
      """SELECT o_orderkey, o_orderdate,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """WITH auto AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
        |bld AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT c_nationkey, 'union' AS op FROM (SELECT DISTINCT c_nationkey FROM (SELECT * FROM auto UNION ALL SELECT * FROM bld))
        |UNION ALL
        |SELECT c_nationkey, 'intersect' AS op FROM (SELECT c_nationkey FROM auto INTERSECT SELECT c_nationkey FROM bld)
        |UNION ALL
        |SELECT c_nationkey, 'except' AS op FROM (SELECT c_nationkey FROM auto EXCEPT SELECT c_nationkey FROM bld)
        |ORDER BY op, c_nationkey""".stripMargin,

    "q_rollup" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n
        |FROM customer GROUP BY ROLLUP(c_nationkey, c_mktsegment)
        |ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT c_nationkey,
        |  count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
        |  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS "BUILDING",
        |  count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS "FURNITURE",
        |  count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
        |  count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS "MACHINERY"
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > 400000
        |)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM orders WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin,

    "q_cube" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |       CAST(GROUPING(c_nationkey, c_mktsegment) AS BIGINT) AS gid
        |FROM customer GROUP BY CUBE(c_nationkey, c_mktsegment)
        |ORDER BY gid, c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q_skew_join" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0
        |              ELSE l_orderkey % 100 END AS grp,
        |         l_quantity
        |  FROM lineitem
        |), dim AS (
        |  SELECT range AS grp, 'g' || range AS grp_label FROM range(100)
        |)
        |SELECT grp, grp_label, count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM li JOIN dim USING (grp)
        |GROUP BY grp, grp_label ORDER BY grp""".stripMargin,

    "q_melt" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey < 100
        |)
        |SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM li
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM li
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM li
        |)
        |ORDER BY l_orderkey, l_linenumber, variable""".stripMargin,

    "q_kanon" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment FROM customer
        |  GROUP BY 1, 2 HAVING count(*) >= 12
        |)
        |SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment
        |FROM customer c SEMI JOIN g
        |  ON c.c_nationkey = g.c_nationkey AND c.c_mktsegment = g.c_mktsegment
        |ORDER BY c.c_custkey""".stripMargin,

    "q_kanon_violations" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 12
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q14_type_share" ->
      """WITH r AS (
        |  SELECT p_type,
        |         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             (CAST(1.0 AS DECIMAL(4,2)) -
        |              CAST(l_discount AS DECIMAL(4,2)))) AS rev,
        |         count(*) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1
        |)
        |SELECT p_type, CAST(rev AS DOUBLE) AS revenue, n,
        |       ROUND(CAST(rev AS DOUBLE)
        |             / CAST((SELECT SUM(rev) FROM r) AS DOUBLE), 6) AS share
        |FROM r ORDER BY p_type""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1.0 AS DECIMAL(4,2)) -
        |                 CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 0
        |), n AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |), d AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |              WHEN n.o_orderkey IS NULL THEN 'removed'
        |              WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |)
        |SELECT status, count(*) AS n,
        |       CAST(min(k) AS BIGINT) AS min_key,
        |       CAST(max(k) AS BIGINT) AS max_key
        |FROM d GROUP BY status ORDER BY status""".stripMargin,

    "q_upsert_archive" ->
      """WITH existing AS (
        |  SELECT *, 0 AS src FROM orders WHERE o_orderkey % 3 <> 0
        |), updates AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice * 2 AS o_totalprice, o_orderdate,
        |         o_orderpriority, 1 AS src
        |  FROM orders WHERE o_orderkey % 2 = 0
        |), u AS (
        |  SELECT * FROM existing UNION ALL SELECT * FROM updates
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderkey
        |    ORDER BY o_orderdate DESC, src DESC) AS rn
        |  FROM u
        |)
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM r WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    "q_dup_report" ->
      """WITH clusters AS (
        |  SELECT md5(text) AS h, count(*) AS size
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1
        |)
        |SELECT CAST(sum(size) AS BIGINT) AS n_docs,
        |       count(*) AS n_unique,
        |       CAST(coalesce(sum(CASE WHEN size > 1 THEN size END), 0)
        |            AS BIGINT) AS n_dup_docs,
        |       ROUND(CAST(coalesce(sum(CASE WHEN size > 1 THEN size END), 0)
        |                  AS DOUBLE) / CAST(sum(size) AS DOUBLE), 6) AS dup_frac,
        |       CAST(max(size) AS BIGINT) AS max_cluster
        |FROM clusters""".stripMargin,

    "q_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
        |      '[!-/:-@\[-`{-~]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS norm_md5,
        |  CAST(length(trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
        |      '[!-/:-@\[-`{-~]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS INT) AS n_chars_norm
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    "q_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_value,
           |       CAST(max($c) AS VARCHAR) AS max_value
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        .map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_zorder" ->
      """WITH s AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_partkey & 65535 AS x0, l_suppkey & 65535 AS y0
        |  FROM lineitem
        |), a AS (
        |  SELECT l_orderkey, l_linenumber,
        |         (x0 | (x0 << 8)) & 16711935 AS x1,
        |         (y0 | (y0 << 8)) & 16711935 AS y1 FROM s
        |), b AS (
        |  SELECT l_orderkey, l_linenumber,
        |         (x1 | (x1 << 4)) & 252645135 AS x2,
        |         (y1 | (y1 << 4)) & 252645135 AS y2 FROM a
        |), c AS (
        |  SELECT l_orderkey, l_linenumber,
        |         (x2 | (x2 << 2)) & 858993459 AS x3,
        |         (y2 | (y2 << 2)) & 858993459 AS y3 FROM b
        |), d AS (
        |  SELECT l_orderkey, l_linenumber,
        |         (x3 | (x3 << 1)) & 1431655765 AS x4,
        |         (y3 | (y3 << 1)) & 1431655765 AS y4 FROM c
        |)
        |SELECT l_orderkey, l_linenumber, x4 | (y4 << 1) AS zcode
        |FROM d ORDER BY zcode, l_orderkey, l_linenumber""".stripMargin,

    "q_standardize" ->
      """WITH st AS (
        |  SELECT CAST(count(l_quantity) AS DOUBLE) AS n_q,
        |    CAST(count(l_extendedprice) AS DOUBLE) AS n_e,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS s_q,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS ss_q,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS s_e,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS ss_e
        |  FROM lineitem
        |)
        |SELECT l_orderkey, l_linenumber,
        |  ROUND((CAST(l_quantity AS DOUBLE) - s_q/n_q)
        |        / sqrt((ss_q - s_q*s_q/n_q)/(n_q-1)), 6) AS l_quantity_z,
        |  ROUND((CAST(l_extendedprice AS DOUBLE) - s_e/n_e)
        |        / sqrt((ss_e - s_e*s_e/n_e)/(n_e-1)), 6) AS l_extendedprice_z
        |FROM lineitem, st WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_key_skew" ->
      """WITH c AS (
        |  SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n
        |  FROM events GROUP BY 1
        |)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |       CAST(MAX(n) AS BIGINT) AS max_count,
        |       (SELECT key FROM c ORDER BY n DESC, key DESC LIMIT 1) AS top_key,
        |       ROUND(CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / count(*)), 6) AS skew_ratio,
        |       ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS top_fraction
        |FROM c""".stripMargin,

    "q_nfc" ->
      ("SELECT doc_id, md5(nfc_normalize(text || ' café')) AS h_nfc " +
        "FROM documents ORDER BY doc_id"),

    "q_checks" ->
      """WITH r AS (
        |  SELECT 'not_null:l_orderkey' AS c,
        |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_discount',
        |         CAST(sum(CASE WHEN l_discount IS NOT NULL AND
        |                        (CAST(l_discount AS DOUBLE) < 0.0 OR
        |                         CAST(l_discount AS DOUBLE) > 0.05)
        |                  THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'accepted_values:l_returnflag',
        |         CAST(sum(CASE WHEN l_returnflag IS NOT NULL AND
        |                        CAST(l_returnflag AS VARCHAR) NOT IN ('A','N','R')
        |                  THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'matches_regex:l_linestatus',
        |         CAST(sum(CASE WHEN l_linestatus IS NOT NULL AND
        |                        NOT regexp_matches(l_linestatus, '^[A-Z]$')
        |                  THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:l_orderkey,l_linenumber',
        |         coalesce((SELECT CAST(sum(n) AS BIGINT) FROM (
        |           SELECT count(*) AS n FROM lineitem
        |           GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
        |         )), 0)
        |  UNION ALL
        |  SELECT 'referenced_in:l_suppkey',
        |         (SELECT count(*) FROM lineitem
        |          WHERE l_suppkey IS NOT NULL
        |            AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        |)
        |SELECT c AS "check", n_violations, n_violations = 0 AS passed
        |FROM r ORDER BY c""".stripMargin,

    "q_hilbert" ->
      """WITH RECURSIVE h AS (
        |  SELECT p_partkey,
        |         CAST(p_partkey AS BIGINT) & 65535 AS x,
        |         CAST(p_size AS BIGINT) & 65535 AS y,
        |         CAST(0 AS BIGINT) AS d,
        |         CAST(32768 AS BIGINT) AS s
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey,
        |         CASE WHEN (y & s) = 0 THEN
        |           CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END
        |         ELSE x END AS x,
        |         CASE WHEN (y & s) = 0 THEN
        |           CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END
        |         ELSE y END AS y,
        |         d + s * s * (CASE WHEN (x & s) > 0 AND (y & s) > 0 THEN 2
        |                           WHEN (x & s) > 0 THEN 3
        |                           WHEN (y & s) > 0 THEN 1
        |                           ELSE 0 END) AS d,
        |         s // 2 AS s
        |  FROM h WHERE s > 0
        |)
        |SELECT p_partkey, d AS hilbert FROM h WHERE s = 0
        |ORDER BY p_partkey""".stripMargin
  )
}
