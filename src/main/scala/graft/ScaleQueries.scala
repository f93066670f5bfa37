package graft

import graft.operators.{Checks, Decontam, Dedup, Graphs, Joins, Layout, Sessionize, Similarity, Splits, Stats, TextAnalysis, TopN, Wrangling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star scale queries (dedup / similarity / text analysis /
  * sessionization / TPC-H-style analytics) and their DuckDB oracles.
  *
  * Oracle parity tactics:
  *   - hashes are md5 hex (portable), string mins are ASCII-safe;
  *   - double aggregation goes through DECIMAL (order-independent exact) or
  *     sequential array folds identical on both engines;
  *   - integer-typed columns are cast to matching widths (Spark `size` /
  *     `row_number` are INT32; DuckDB `len`/`row_number` BIGINT);
  *   - deterministic ORDER BY everywhere.
  */
object ScaleQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver has shipped events.parquet under several timestamp
    * physical types across regenerations — TIMESTAMP(NANOS) (arrives as
    * long nanos under `spark.sql.legacy.parquet.nanosAsLong`),
    * micros-without-timezone (Spark 4 reads TIMESTAMP_NTZ), and tz'd
    * micros (TIMESTAMP). Normalize all of them to the microsecond
    * session-zone TIMESTAMP the operators and DuckDB oracles assume
    * (UTC session ⇒ identical instants in every case). Public: this is
    * the canonical batch loader for the events table — tests and tools
    * should read through it rather than re-deriving the ts conversion. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Hyperplanes shared between the Spark ANN query and its generated
    * oracle SQL. 6 planes => 64 buckets over 500-5000 vectors. */
  private val AnnPlanes = Similarity.randomHyperplanes(numPlanes = 6, dim = 64)

  /** Fellegi-Sunter fields for q_linkage_score: (agreement column, m, u).
    * The ln(m/u) / ln((1-m)/(1-u)) contributions are Scala-computed
    * constants inlined into BOTH the Spark plan and the generated oracle
    * SQL, so no libm difference can split the engines. */
  private val FsFields = Seq(
    ("agree_head", 0.9, 0.05),
    ("agree_lang", 0.95, 0.3),
    ("agree_source", 0.8, 0.05),
    ("agree_len", 0.9, 0.2)
  )
  private val FsW: Map[String, (Double, Double)] =
    graft.operators.Dedup
      .linkageWeights(FsFields)
      .map { case (c, a, d) => c -> ((a, d)) }
      .toMap

  /** Independent banks for the OR-amplified multi-band ANN query. Sized from
    * the measured data: the synthetic embeddings are near-random (median
    * top-5 cosine 0.32 => per-plane match probability m ~ 0.60), so 16 banks
    * of 3 planes gives predicted recall 1-(1-m^3)^16 ~ 0.98 (ScaleSpec
    * asserts >= 0.9). On real clustered corpora (m -> 1 for true near-dups)
    * far fewer banks reach the same recall — the bank count IS the
    * recall/cost dial. */
  private val AnnBanks =
    Similarity.randomHyperplaneBanks(numBanks = 16, planesPerBank = 3, dim = 64)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary (headline bench query)
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

    // deterministic hash-based train/val/test split (80/10/10 by order key)
    "q_hash_split" -> ((s, dir) => {
      Splits
        .hashSplit(
          t(s, dir, "orders"),
          "o_orderkey",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        )
        .groupBy("split")
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total")
        )
        .orderBy("split")
    }),

    // exact fuzzy pairs: levenshtein <= 2 with length-banded candidates
    "q_fuzzy_pairs" -> ((s, dir) => {
      Dedup
        .fuzzyStringPairs(
          t(s, dir, "customer").filter(col("c_custkey") <= 300),
          "c_custkey", "c_name", maxDist = 2
        )
        .orderBy("id_a", "id_b")
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

    // exact dedup: one event per (user, type), deterministic min event_id
    "q_dedup_exact" -> ((s, dir) => {
      Dedup
        .exactDedup(
          events(s, dir),
          Seq("user_id", "event_type"),
          Seq(col("event_id"))
        )
        .select("event_id", "user_id", "event_type")
        .orderBy("user_id", "event_type")
    }),

    // MinHash+LSH near-dedup over documents (portable md5 signatures)
    "q_dedup_minhash" -> ((s, dir) => {
      Dedup
        .dedupNearMinHash(
          t(s, dir, "documents"),
          "doc_id",
          "text",
          threshold = 0.9,
          shingleK = 1,
          numHashes = 16,
          bands = 4
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // MinHash near-dedup with full transitive clustering: connected
    // components over the candidate-pair graph, one survivor (the min id)
    // per cluster — the CCNet-style semantics. Oracle computes reachability
    // with a recursive CTE.
    "q_dedup_minhash_cc" -> ((s, dir) => {
      Dedup
        .dedupNearMinHash(
          t(s, dir, "documents"),
          "doc_id",
          "text",
          threshold = 0.9,
          shingleK = 1,
          numHashes = 16,
          bands = 4,
          transitive = true
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // exact token-set Jaccard near-dup pairs via inverted index. The
    // synthetic corpus is a ~50-word vocabulary, so *every* doc pair shares
    // tokens and the true >=0.8 pair set itself grows quadratically with
    // corpus size — bounded here to the first 500 docs so the benchmark
    // measures the operator, not an unboundedly growing result.
    "q_jaccard_pairs" -> ((s, dir) => {
      Dedup
        .ngramJaccardPairs(
          t(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", 1, 0.8
        )
        .orderBy("id_a", "id_b")
    }),

    // SimHash signatures (portable md5 bit-votes — oracle-checked)
    "q_simhash" -> ((s, dir) => {
      Dedup
        .simHashSignatures(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs: quarter-bucketed candidates, exact for
    // hamming <= 3 (pigeonhole) — oracle is the brute-force pair set, which
    // proves the bucketing loses nothing. Bounded like q_jaccard_pairs: the
    // ~50-word-vocabulary corpus makes the true pair set itself quadratic.
    "q_simhash_pairs" -> ((s, dir) => {
      Dedup
        .simHashCandidatePairs(
          t(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", maxHamming = 3
        )
        .orderBy("id_a", "id_b")
    }),

    // SimHash near-dedup: exact-signature pass + quarter-bucket-minimum
    // pairs within hamming <= 3 (the SimHash counterpart of q_dedup_minhash)
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup
        .dedupNearSimHash(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // brute-force cosine top-10 for query vectors vec_id < 3
    "q_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity
        .cosineTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 10)
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank")
        )
        .orderBy("query_id", "rank")
    }),

    // int8-quantized brute-force top-10: 4x-smaller integer index, scales
    // cancel in the cosine, codegen'd integer loop
    "q_ann_quantized" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity
        .cosineTopKQuantized(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 10)
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(col("cosine_q"), 6).as("cosine_q"),
          col("rank")
        )
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed approximate top-5 (scale path; same planes as oracle)
    "q_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity
        .annTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5, AnnPlanes)
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank")
        )
        .orderBy("query_id", "rank")
    }),

    // embedding near-dup pairs in shared LSH buckets (cosine >= 0.8)
    "q_embed_dedup" -> ((s, dir) => {
      Dedup
        // 0.4 is below near-dup territory, deliberately: the synthetic
        // embeddings top out at pairwise cosine 0.51, so a realistic 0.8+
        // threshold returns zero rows — a trivially-green oracle. 0.4
        // yields a real pair set that actually exercises the bucket-join
        // and threshold logic.
        .embeddingDedupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", AnnPlanes, 0.4
        )
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // OR-amplified multi-band embedding near-dup pairs (recall dial over
    // q_embed_dedup: 16 banks x 3 planes recover nearly all >= 0.4 pairs
    // where the single 6-plane bucket finds a handful). Input bounded to
    // the first 1000 vectors for the same reason as q_jaccard_pairs: on
    // near-random embeddings with 8 buckets/bank the candidate (and true)
    // pair set grows quadratically with corpus size, so an unbounded bench
    // would measure result-set growth, not the operator. Real corpora tune
    // planes-per-bank up (smaller buckets) as size grows.
    "q_embed_dedup_mb" -> ((s, dir) => {
      Dedup
        .embeddingDedupPairsMultiBand(
          t(s, dir, "embeddings").filter(col("vec_id") < 1000),
          "vec_id", "embedding", AnnBanks, 0.4
        )
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // drop-the-losers form of q_embed_dedup_mb: survivors after removing
    // every vector linked to a smaller id at cosine >= 0.4 (the embedding
    // counterpart of q_dedup_minhash / q_dedup_simhash)
    "q_embed_dedup_drop" -> ((s, dir) => {
      Dedup
        .dedupNearEmbedding(
          t(s, dir, "embeddings").filter(col("vec_id") < 1000),
          "vec_id", "embedding", AnnBanks, 0.4
        )
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // SemDeDup (Abbas et al. 2023): k-means cluster-local semantic dedup —
    // within each of 8 clusters, every cosine>=0.4 pair drops the member
    // closer to the centroid (diversity-keeping); survivors listed
    "q_semdedup" -> ((s, dir) => {
      Dedup
        .semDeDup(
          t(s, dir, "embeddings").select("vec_id", "embedding"),
          "vec_id", "embedding", k = 8, rounds = 2, threshold = 0.4
        )
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // corpus k-NN graph: top-3 cosine neighbors per vector among
    // multi-band LSH candidates (bounded slice for the same quadratic-
    // result reason as q_embed_dedup_mb)
    "q_knn_graph" -> ((s, dir) => {
      Similarity
        .knnGraph(
          t(s, dir, "embeddings").filter(col("vec_id") < 300),
          "vec_id", "embedding", AnnBanks, k = 3
        )
        .select(
          col("id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank")
        )
        .orderBy("id", "rank")
    }),

    // contrastive training pairs: kPos LSH-graph positives + mNeg
    // hash-deterministic pool negatives per anchor
    "q_contrastive_pairs" -> ((s, dir) => {
      Similarity
        .contrastivePairs(
          t(s, dir, "embeddings").filter(col("vec_id") < 300),
          "vec_id", "embedding", AnnBanks,
          kPos = 3, mNeg = 3, poolSize = 64, salt = "cp"
        )
        .select(
          col("anchor_id"), col("pair_id"), col("label"),
          round(col("cosine"), 6).as("cosine"), col("rank")
        )
        .orderBy("anchor_id", "label", "rank")
    }),

    // transitive (SemDeDup-style) variant: one survivor per cosine-linked
    // connected component; oracle computes reachability recursively like
    // q_dedup_minhash_cc
    "q_embed_dedup_cc" -> ((s, dir) => {
      Dedup
        .dedupNearEmbedding(
          t(s, dir, "embeddings").filter(col("vec_id") < 1000),
          "vec_id", "embedding", AnnBanks, 0.4, transitive = true
        )
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // IVF approximate top-5 with a deterministic codebook: centroids are
    // the corpus vectors at vec_id % 64 == 0 (8 cells at sf0.01), cosine
    // assignment/probing — fully SQL-expressible, so unlike k-means IVF
    // this variant is oracle-checked end to end. The k-means-trained path
    // (Similarity.ivfTopK) shares this exact search code and is gated by
    // the ScaleSpec recall assertion instead.
    "q_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val centroids = e
        .filter(col("vec_id") % 64 === 0)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]](0).toSeq)
        .toSeq
      Similarity
        .ivfTopKWithCentroids(e, e.filter(col("vec_id") < 3), "vec_id",
          "embedding", k = 5, centroids, nProbe = 3)
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank")
        )
        .orderBy("query_id", "rank")
    }),

    // deterministic Lloyd k-means (k=8, 2 rounds): md5-seeded, exact
    // integer centroid sums — the clustering stage of cluster-then-curate
    // (SemDeDup cluster-local dedup, cluster-balanced sampling); fully
    // engine-portable, so the whole model is oracle-checked end to end
    "q_kmeans" -> ((s, dir) => {
      Similarity
        .kmeansCluster(
          t(s, dir, "embeddings").select("vec_id", "embedding"),
          "vec_id", "embedding", k = 8, rounds = 2
        )
        .select("vec_id", "cluster", "sq_dist")
        .orderBy("vec_id")
    }),

    // cluster-balanced subsample: 12 docs per k-means cluster chosen by
    // the deterministic md5 order — diversity-preserving downsampling
    // (each topic keeps representation no matter how skewed the corpus);
    // composes kmeansCluster + the hash-ranked top-n
    "q_cluster_sample" -> ((s, dir) => {
      val clustered = Similarity
        .kmeansCluster(
          t(s, dir, "embeddings").select("vec_id", "embedding"),
          "vec_id", "embedding", k = 8, rounds = 2
        )
      TopN
        .firstRow(
          clustered.withColumn("__bk", Splits.hashBucket(col("vec_id"))),
          n = 12,
          partitionBy = Seq(col("cluster")),
          orderBy = Seq(col("__bk").asc, col("vec_id").asc)
        )
        .select("vec_id", "cluster")
        .orderBy("cluster", "vec_id")
    }),

    // OR-amplified multi-band LSH top-5 (recall dial over q_ann_topk)
    "q_ann_multiband" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity
        .annTopKMultiBand(
          e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5, AnnBanks
        )
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank")
        )
        .orderBy("query_id", "rank")
    }),

    // language-ID heuristic scores + argmax
    "q_lang_id" -> ((s, dir) => {
      TextAnalysis
        .langId(t(s, dir, "documents"), "text")
        .select("doc_id", "score_en", "score_es", "score_de", "score_fr", "lang_pred")
        .orderBy("doc_id")
    }),

    // token-budget mixture allocation: the LLaMA-style data-recipe table
    // (per-source allocation + epochs under a budget, caps at 1 epoch,
    // one deterministic redistribution pass) — integer ppm arithmetic
    "q_mixture_alloc" -> ((s, dir) => {
      val bySource = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(sum(size(graft.functions.TextFunctions.tokens(col("text")))).as("tokens"))
      Splits
        .mixtureAllocation(
          bySource, "source", "tokens",
          targetWeights = Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
          totalBudget = 4000L
        )
        .orderBy("source")
    }),

    // per-doc character entropy: the cheap gibberish/template-spam signal
    // (low entropy = repetitive padding, high = binary-in-text)
    "q_char_entropy" -> ((s, dir) => {
      TextAnalysis
        .charEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // quality metrics
    "q_quality" -> ((s, dir) => {
      TextAnalysis
        .qualityScore(t(s, dir, "documents"), "text")
        .select(
          "doc_id", "n_chars_calc", "n_tokens", "mean_token_len",
          "punct_count", "stopword_ratio", "quality"
        )
        .orderBy("doc_id")
    }),

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

    // exact tie-aware ROC AUC of the same score/label pair: integer
    // rank sums (ties counted half), one grouped pass + a distinct-score
    // window — threshold-free ranking power of the quality filter
    "q_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis
        .qualityScore(docs, "text")
        .select(col("doc_id"), col("quality"))
        .join(
          docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          Seq("doc_id")
        )
      Stats.aucRoc(scored, "quality", "is_en")
    }),

    // Gopher-rule quality flags (minTokens lowered to 20 so the synthetic
    // docs, mostly 20-60 tokens, exercise both sides of every rule)
    "q_gopher" -> ((s, dir) => {
      TextAnalysis
        .gopherQualityFlags(t(s, dir, "documents"), "text", minTokens = 20)
        .select(
          "doc_id", "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
          "alpha_ratio_ok", "stopword_ok", "gopher_keep"
        )
        .orderBy("doc_id")
    }),

    // token counting (whitespace + BPE-ish regex)
    "q_token_counts" -> ((s, dir) => {
      TextAnalysis
        .tokenCounts(t(s, dir, "documents"), "text")
        .select("doc_id", "ws_tokens", "bpe_ish_tokens")
        .orderBy("doc_id")
    }),

    // document fingerprinting (md5 canonical + min-shingle)
    "q_fingerprint" -> ((s, dir) => {
      TextAnalysis
        .fingerprints(t(s, dir, "documents"), "text")
        .select("doc_id", "fp_md5", "fp_min_shingle")
        .orderBy("doc_id")
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

    // deterministic mixture upsampling: src0 x2.5, src1 x0.5, others x1
    "q_weighted_repeat" -> ((s, dir) => {
      Splits
        .weightedRepeat(
          t(s, dir, "documents"), "doc_id", "source",
          Seq("src0" -> 2.5, "src1" -> 0.5)
        )
        .select("doc_id", "source", "copy_id")
        .orderBy("doc_id", "copy_id")
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

    // asymmetric 2-gram containment pairs (contained-in detection) over
    // the same bounded slice as q_jaccard_pairs
    "q_containment" -> ((s, dir) => {
      Dedup
        .containmentPairs(
          t(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", 2, 0.9
        )
        .orderBy("id_a", "id_b")
    }),

    // train/test decontamination report: held-out set = doc_id % 10 == 0,
    // contamination = sharing any word 3-gram with it
    "q_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontam
        .contaminationReport(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id",
          "text",
          n = 3
        )
        .select("doc_id", "n_shared_grams", "contaminated")
        .orderBy("doc_id")
    }),

    // cross-split leakage audit: 80/10/10 hash split of documents, then
    // per held-out doc the share of its distinct 3-grams seen in train
    "q_split_leakage" -> ((s, dir) => {
      val split = Splits.hashSplit(
        t(s, dir, "documents"),
        "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      )
      Decontam
        .crossSplitLeakage(split, "doc_id", "text", "split", n = 3)
        .orderBy("doc_id")
    }),

    // tokenizer vocab coverage: OOV rate of every document against the
    // corpus' own top-12 doc-frequency terms (the 31-word synthetic vocab
    // makes the remaining 19 words OOV, so rates are non-trivial)
    "q_vocab_coverage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextAnalysis
        .topTerms(docs, "doc_id", "text", k = 12)
        .select("term")
      TextAnalysis
        .vocabCoverage(docs, "doc_id", "text", vocab, "term")
        .orderBy("doc_id")
    }),

    // Gopher-style repetition metrics over word 2-grams
    "q_repetition" -> ((s, dir) => {
      TextAnalysis
        .repetitionStats(t(s, dir, "documents"), "doc_id", "text", n = 2)
        .select(
          "doc_id", "total_ngrams", "top_ngram_count",
          "top_ngram_frac", "dup_ngram_frac"
        )
        .orderBy("doc_id")
    }),

    // PII-style regex redaction chain (emails, integer literals, a stopword
    // set), verified via match counts + md5 of the redacted text
    "q_redact_text" -> ((s, dir) => {
      TextAnalysis
        .redactPatterns(
          t(s, dir, "documents"),
          "text",
          Seq(
            "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "[EMAIL]",
            "\\b[0-9]+\\b" -> "[NUM]",
            "\\b(the|a|and)\\b" -> "[W]"
          ),
          "redacted"
        )
        .select(
          col("doc_id"),
          regexp_count(col("text"), lit("\\b(the|a|and)\\b")).as("n_stop_matches"),
          md5(col("redacted")).as("redacted_md5")
        )
        .orderBy("doc_id")
    }),

    // corpus vocabulary: top-25 terms by document frequency
    "q_top_terms" -> ((s, dir) => {
      TextAnalysis
        .topTerms(t(s, dir, "documents"), "doc_id", "text", 25)
        .orderBy("rank")
    }),

    // per-document top-3 TF-IDF terms (smooth ln(N/df), rounded to 6dp)
    "q_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis
        .tfIdfTopTerms(docs, "doc_id", "text", docs.count(), n = 3)
        .orderBy("doc_id", "rank")
    }),

    // dense hourly series per user with zero-filled gaps (bounded users)
    "q_gap_fill" -> ((s, dir) => {
      Sessionize
        .fillTimeGaps(
          events(s, dir).filter(col("user_id") < 20),
          "user_id", "ts", bucketSeconds = 3600L
        )
        .orderBy("user_id", "bucket_start")
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

    // gap sessionization (30 min)
    "q_sessionize" -> ((s, dir) => {
      Sessionize
        .sessionize(events(s, dir), gapSeconds = 1800)
        .orderBy("user_id", "session_id")
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

    // deterministic stratified sampling: per-language keep rates
    "q_stratified_sample" -> ((s, dir) => {
      Splits
        .stratifiedHashSample(
          t(s, dir, "documents"), "doc_id", "lang",
          Seq("en" -> 0.5, "es" -> 0.25), defaultFraction = 0.1
        )
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))
        .orderBy("lang")
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

    // C4-style chunk dedup: drop 10-token chunks occurring > 2 times
    // corpus-wide, reassemble the surviving text (md5 keeps rows skinny)
    "q_chunk_dedup" -> ((s, dir) => {
      TextAnalysis
        .chunkDedup(
          t(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 10, maxFreq = 2
        )
        .select(
          col("doc_id"), col("kept_chunks"), col("dropped_chunks"),
          md5(col("clean_text")).as("clean_md5")
        )
        .orderBy("doc_id")
    }),

    // unigram LM quality: mean token log-prob under the corpus model
    "q_unigram_logprob" -> ((s, dir) => {
      TextAnalysis
        .unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // sequence packing: per-source token streams cut into 512-token blocks
    "q_pack_sequences" -> ((s, dir) => {
      Splits
        .packSequences(
          t(s, dir, "documents"), "doc_id", "text", "source",
          blockTokens = 512
        )
        .select("doc_id", "source", "n_tokens", "block_id", "block_offset")
        .orderBy("doc_id")
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

    // deterministic per-group sample: 3 docs per (lang, source) stratum
    // under md5-hash order of doc_id
    "q_group_sample" -> ((s, dir) => {
      Splits
        .groupSample(t(s, dir, "documents"), Seq("lang", "source"), "doc_id", 3)
        .select("doc_id", "lang", "source")
        .orderBy("lang", "source", "doc_id")
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

    // Johnson-Lindenstrauss random projection 64 -> 8 dims (long format)
    "q_random_projection" -> ((s, dir) => {
      Similarity
        .randomProjection(
          t(s, dir, "embeddings").filter(col("vec_id") < 200),
          "vec_id", "embedding", inDims = 64, outDims = 8
        )
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "dim")
    }),

    // overlapping token-window chunking (embedding / long-context prep)
    "q_chunk_text" -> ((s, dir) => {
      TextAnalysis
        .chunkText(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", chunkTokens = 20, overlapTokens = 5
        )
        .orderBy("doc_id", "chunk_id")
    }),

    // self-perplexity under the corpus's own MLE bigram model
    "q_bigram_logprob" -> ((s, dir) => {
      TextAnalysis
        .bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // CCNet-style per-language perplexity bucketing (Wenzek et al. 2020):
    // score fluency with the corpus bigram LM, then split each language
    // into head/middle/tail at its own tertiles (higher logprob = head)
    "q_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis
        .bigramLogProb(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      Stats
        .quantileBuckets(
          scored, Seq("lang"), "avg_bigram_logprob",
          probs = Seq(1.0 / 3, 2.0 / 3),
          labels = Seq("tail", "middle", "head"),
          outCol = "ppl_bucket"
        )
        .select("doc_id", "lang", "avg_bigram_logprob", "ppl_bucket")
        .orderBy("doc_id")
    }),

    // semantic decontamination report: max cosine of every corpus embedding
    // to a planted eval set (every 97th vector) — paraphrase-robust leakage
    // audit; eval members self-match at exactly 1.0
    "q_semantic_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Decontam
        .semanticContaminationReport(
          emb, emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding",
          threshold = 0.95
        )
        .select("vec_id", "max_eval_cosine", "contaminated")
        .orderBy("vec_id")
    }),

    // the drop form: corpus minus everything within 0.95 cosine of eval
    "q_semantic_drop" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Decontam
        .semanticDecontaminate(
          emb, emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding",
          threshold = 0.95
        )
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // DSIR importance weights: how target-like (zh-like) every corpus doc's
    // hashed unigram+bigram features are — the pretraining data-selection
    // scorer (Xie et al. 2023), decimal-quantized for engine parity
    "q_dsir" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis
        .dsirLogWeights(
          docs, docs.filter(col("lang") === "zh"), "doc_id", "text",
          numBuckets = 8192, smoothing = 1.0
        )
        .orderBy("doc_id")
    }),

    // DSIR selection: importance-weighted sample of 40 docs without
    // replacement via the log-domain Efraimidis-Spirakis key
    "q_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis
        .dsirResample(
          docs, docs.filter(col("lang") === "zh"), "doc_id", "text",
          k = 40, numBuckets = 8192, smoothing = 1.0
        )
        .orderBy("sample_key", "doc_id")
    }),

    // exact duplicated-span removal (suffix-array-style dedup, Lee et al.
    // 2022): every duplicated 8-token gram keeps only its canonical first
    // occurrence; covered positions are cut and the survivors re-joined
    "q_span_dedup" -> ((s, dir) => {
      TextAnalysis
        .spanDedup(t(s, dir, "documents"), "doc_id", "text", spanTokens = 8)
        .orderBy("doc_id")
    }),

    // hashed Naive-Bayes quality-classifier model (wiki-vs-crawl shape):
    // src0-2 as the reference class vs the rest, 4096 hashed buckets
    "q_nb_train" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis
        .trainTokenClassifier(
          docs.filter(col("source").isin("src0", "src1", "src2")),
          docs.filter(!col("source").isin("src0", "src1", "src2")),
          "text",
          numBuckets = 4096
        )
        .orderBy("bucket")
    }),

    // score the whole corpus with that model: mean bucket log-odds per doc
    "q_nb_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = TextAnalysis.trainTokenClassifier(
        docs.filter(col("source").isin("src0", "src1", "src2")),
        docs.filter(!col("source").isin("src0", "src1", "src2")),
        "text",
        numBuckets = 4096
      )
      TextAnalysis
        .classifierScore(docs, "doc_id", "text", model, numBuckets = 4096)
        .orderBy("doc_id")
    }),

    // deterministic global shuffle into 16 training shards: pure md5
    // shard + sort_key assignment (the write path adds the one shard-keyed
    // shuffle; no global sort anywhere)
    "q_shuffle_shards" -> ((s, dir) => {
      Splits
        .shuffleIntoShards(
          t(s, dir, "documents").select("doc_id"),
          "doc_id",
          nShards = 16,
          salt = "ep0"
        )
        .orderBy("doc_id")
    }),

    // dataset-release manifest: per shard, row count + order-independent
    // md5-sum checksum over the full document row
    "q_shard_manifest" -> ((s, dir) => {
      Splits
        .shardManifest(
          Splits.shuffleIntoShards(
            t(s, dir, "documents"), "doc_id", nShards = 16, salt = "ep0"
          ),
          Seq("doc_id", "text", "lang", "source", "n_chars")
        )
        .orderBy("shard")
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

    // corpus-level content overlap between two document halves
    "q_content_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contentOverlap(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text"
      )
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

    // leak-free 5-fold cross-validation assignment by customer key
    "q_kfold" -> ((s, dir) => {
      Splits
        .kFoldAssign(t(s, dir, "orders"), "o_custkey", k = 5)
        .groupBy("fold")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_customers")
        )
        .orderBy("fold")
    }),

    // per-source corpus health dashboard (counts, dup fraction, tokens)
    "q_corpus_report" -> ((s, dir) => {
      TextAnalysis
        .corpusReport(t(s, dir, "documents"), "text", "source")
        .orderBy("source")
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

    // Fellegi-Sunter linkage weights over sorted-neighborhood candidates
    "q_linkage_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.sortedNeighborhoodPairs(
        docs.select(col("doc_id"), substring(col("text"), 1, 40).as("head")),
        "doc_id", "head", windowSize = 4, blockChars = 3
      )
      val attrs =
        docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val j = pairs
        .join(
          attrs.select(col("doc_id").as("id_a"), col("lang").as("__la"),
            col("source").as("__sa"), col("n_chars").as("__na")),
          Seq("id_a")
        )
        .join(
          attrs.select(col("doc_id").as("id_b"), col("lang").as("__lb"),
            col("source").as("__sb"), col("n_chars").as("__nb")),
          Seq("id_b")
        )
        .withColumn("agree_head", col("dist") <= 5)
        .withColumn("agree_lang", col("__la") === col("__lb"))
        .withColumn("agree_source", col("__sa") === col("__sb"))
        .withColumn("agree_len", abs(col("__na") - col("__nb")) <= 20)
      Dedup
        .linkageScore(j, FsFields)
        .filter(col("match_weight") > 0)
        .select("id_a", "id_b", "match_weight")
        .orderBy("id_a", "id_b")
    }),

    // robust MAD outliers in event values per type (Iglewicz-Hoaglin 3.5)
    "q_mad_outliers" -> ((s, dir) => {
      Stats
        .madOutliers(t(s, dir, "events"), "value", Seq("event_type"))
        .filter(col("is_outlier"))
        .select("event_id", "event_type", "value", "robust_z")
        .orderBy("event_id")
    }),

    // Zipf rank-frequency fit over the top-500 vocabulary
    "q_zipf" -> ((s, dir) => {
      TextAnalysis.zipfFit(t(s, dir, "documents"), "text", topN = 500)
    }),

    // Unicode script mix per document (multilingual routing signal)
    "q_script_profile" -> ((s, dir) => {
      TextAnalysis
        .scriptProfile(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text"
        )
        .orderBy("doc_id")
    }),

    // chi-square independence of the language mix vs source
    "q_chi_square" -> ((s, dir) => {
      Stats.chiSquareIndependence(t(s, dir, "documents"), "lang", "source")
    }),

    // PMI-ranked adjacent-word collocations (phrase-mining census)
    "q_collocations" -> ((s, dir) => {
      TextAnalysis
        .collocations(t(s, dir, "documents"), "text", minCount = 5)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(100)
    }),

    // purged temporal split: train before Jan 20, 1-day embargo, test after
    // (counts + boundary timestamps per split and event type)
    "q_temporal_split" -> ((s, dir) => {
      Splits
        .temporalSplit(
          events(s, dir), "ts",
          new java.sql.Timestamp(1705708800000L), // 2024-01-20 00:00:00 UTC
          embargoSeconds = 86400L
        )
        .groupBy("split", "event_type")
        .agg(
          count(lit(1)).as("n_events"),
          min("ts").as("first_ts"),
          max("ts").as("last_ts")
        )
        .orderBy("split", "event_type")
    }),

    // unigram-distribution divergence between the en and de corpus slices
    "q_vocab_divergence" -> ((s, dir) => {
      TextAnalysis
        .vocabDivergence(
          t(s, dir, "documents"), "text", "lang", "en", "de", smoothing = 0.5
        )
    }),

    // sorted-neighborhood dedup candidates over the normalized text prefix:
    // near-identical openings land adjacent in the per-block sort and pair
    // within a 4-row window; dist verifies (<= 12 keeps real near-dups)
    "q_snm_pairs" -> ((s, dir) => {
      Dedup
        .sortedNeighborhoodPairs(
          t(s, dir, "documents")
            .select(col("doc_id"), substring(col("text"), 1, 40).as("head")),
          "doc_id", "head", windowSize = 4, blockChars = 3
        )
        .filter(col("dist") <= 12)
        .orderBy("id_a", "id_b")
    }),

    // sparse TF-IDF cosine document pairs via inverted index
    "q_tfidf_pairs" -> ((s, dir) => {
      TextAnalysis
        .tfidfCosinePairs(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", docCount = 300, threshold = 0.8, maxDfFraction = 0.5
        )
        .orderBy("id_a", "id_b")
    }),

    // key-skew diagnostic (the "do I need a salted join" one-row report)
    "q_key_skew" -> ((s, dir) => {
      Stats.keySkewReport(events(s, dir), Seq("event_type"))
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

    // incremental ingestion dedup: batch (doc_id >= 250) cleaned against
    // the stored signatures of an existing corpus (doc_id < 250) — corpus
    // text is never rescanned
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpusSigs = Dedup.minHashSignatures(
        docs.filter(col("doc_id") < 250), "doc_id", "text",
        shingleK = 1, numHashes = 16, portable = true
      )
      Dedup
        .dedupNearMinHashIncremental(
          docs.filter(col("doc_id") >= 250), "doc_id", "text",
          corpusSigs, threshold = 0.9, shingleK = 1, numHashes = 16, bands = 4
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // incremental SimHash ingestion dedup: same corpus/batch split as
    // q_dedup_incremental, signature store = 8 bytes per corpus doc
    "q_dedup_simhash_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpusSigs = Dedup.simHashSignatures(
        docs.filter(col("doc_id") < 250), "doc_id", "text", portable = true
      )
      Dedup
        .dedupNearSimHashIncremental(
          docs.filter(col("doc_id") >= 250), "doc_id", "text",
          corpusSigs, maxHamming = 3
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
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

    // exact-moment z-score standardization (stats over the FULL table,
    // output bounded for the dump)
    "q_standardize" -> ((s, dir) => {
      Stats
        .standardize(t(s, dir, "lineitem"), Seq("l_quantity", "l_extendedprice"))
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity_z", "l_extendedprice_z")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // end-to-end retrieval-shaped pipeline, composed the way a user chains
    // the operators: MinHash near-dedup of the training slice ->
    // decontaminate against the held-out slice (word 4-grams: long enough
    // that drops are real cross-split overlap, ~17% of docs, not the
    // common-trigram collateral that 3-grams inflict) -> quality gate ->
    // deterministic hash split -> sequence
    // packing per split shard. Exercises operator COMPOSITION: column
    // collisions (qualityScore and packSequences both emit n_tokens — last
    // writer wins by design), null-text propagation (retained by dedup and
    // decontam, dropped at the quality gate in both engines), and the
    // dedup-survivor set feeding downstream stages.
    "q_pipeline_e2e" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val deduped = Dedup.dedupNearMinHash(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        threshold = 0.9, shingleK = 1, numHashes = 16, bands = 4
      )
      val clean = Decontam.decontaminate(
        deduped, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 4
      )
      val scored = TextAnalysis
        .qualityScore(clean, "text")
        .filter(col("quality") >= 0.5)
      val split = Splits.hashSplit(
        scored, "doc_id", Seq("train" -> 0.8, "val" -> 0.1),
        defaultLabel = "test"
      )
      Splits
        .packSequences(split, "doc_id", "text", "split", blockTokens = 512)
        .select(
          "doc_id", "split", "quality", "n_tokens", "block_id", "block_offset"
        )
        .orderBy("doc_id")
    }),

    // BM25 relevance of the whole corpus against a fixed query-term set:
    // 'dup' is rare (high idf), 'spark' ubiquitous (low idf), 'shuffle'
    // absent (exercises the no-match arm); score 0 for non-matching docs
    "q_bm25" -> ((s, dir) => {
      TextAnalysis
        .bm25Scores(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "shuffle", "dup"), k1 = 1.2, b = 0.75
        )
        .orderBy("doc_id")
    }),

    // cross-document boilerplate removal at word granularity: units in
    // >100 distinct docs are corpus chrome; only the rare 'dup' marker
    // survives, and all-boilerplate docs come back as empty strings
    "q_boilerplate" -> ((s, dir) => {
      TextAnalysis
        .stripBoilerplate(
          t(s, dir, "documents"), "doc_id", "text",
          maxDocs = 100, delimiter = " "
        )
        .orderBy("doc_id")
    }),

    // temperature-flattened language mixture (alpha = 0.5) plus its
    // deterministic realization: per-language shares, the repeat weight,
    // and the post-mixture row count from weightedRepeatByTable
    "q_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mix = Splits.temperatureMixture(docs, "lang", alpha = 0.5)
      val applied = Splits.weightedRepeatByTable(
        docs, "doc_id", "lang", mix, weightStrataCol = "source"
      )
      val after =
        applied.groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
      mix
        .withColumnRenamed("source", "lang")
        .join(after, Seq("lang"), "left")
        .select(
          col("lang"), col("n_rows"), col("natural_share"),
          col("temp_share"), col("weight"),
          coalesce(col("n_after"), lit(0L)).as("n_after")
        )
        .orderBy("lang")
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

    // keep-BEST dedup: each near-dup cluster (exact-signature groups glued
    // with bucket-min near pairs) retains its longest member, not its
    // smallest id — the quality-aware production dedup policy
    "q_dedup_keep_best" -> ((s, dir) => {
      Dedup
        .dedupNearMinHashKeepBest(
          t(s, dir, "documents"), "doc_id", "text", "n_chars",
          threshold = 0.9, shingleK = 1, numHashes = 16, bands = 4
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // budgeted data selection: highest-n_chars docs until 8k tokens —
    // global (score desc, id) running sum built WITHOUT a global sort
    "q_budget_select" -> ((s, dir) => {
      Splits
        .selectByTokenBudget(
          t(s, dir, "documents")
            .select(
              col("doc_id"), col("n_chars"),
              size(split(lower(col("text")), " ")).as("n_tokens")
            ),
          "doc_id", "n_chars", "n_tokens", tokenBudget = 8000L
        )
        .select("doc_id", "n_chars", "n_tokens", "cum_tokens")
        .orderBy("cum_tokens")
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
    }),

    // Efraimidis-Spirakis weighted sample without replacement: longer
    // documents proportionally likelier, deterministic across engines
    "q_weighted_sample" -> ((s, dir) => {
      Splits
        .weightedSample(
          t(s, dir, "documents").select("doc_id", "lang", "source", "n_chars"),
          "doc_id", "n_chars", k = 50
        )
        .select("doc_id", "lang", "source", "sample_score")
        .orderBy(col("sample_score").desc, col("doc_id"))
    }),

    // BPE merge-rule training on the corpus word dictionary (8 rounds).
    // The greedy per-word merge fold is iterative and not SQL-expressible
    // -> rows-only gate (same policy as q_equidepth_sketch); the merge
    // sequence itself is hand-verified in ScaleSpec.
    "q_bpe" -> ((s, dir) => {
      TextAnalysis.bpeMerges(t(s, dir, "documents"), "text", numMerges = 8)
    }),

    // true-BPE token counts: train 8 merges, encode the distinct-word
    // dictionary, sum piece counts per document. Iterative merge loop ->
    // rows-only gate (same policy as q_bpe); encode semantics are
    // hand-verified in ScaleSpec on the classic Sennrich example.
    "q_bpe_apply" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis
        .bpeTokenCounts(
          docs,
          "doc_id",
          "text",
          TextAnalysis.bpeMerges(docs, "text", numMerges = 8)
        )
        .orderBy("doc_id")
    }),

    // SentencePiece-style unigram-LM tokenizer training (Kudo 2018):
    // 120-piece vocabulary learned by Viterbi hard-EM over the
    // distinct-word dictionary. Iterative EM -> rows-only gate (same
    // policy as q_bpe); segmentation semantics are hand-verified in
    // ScaleSpec (reconstruction + planted-piece properties).
    "q_unigram_lm" -> ((s, dir) => {
      TextAnalysis
        .unigramLM(t(s, dir, "documents"), "text", vocabSize = 120)
        .orderBy(col("piece_count").desc, col("piece"))
    }),

    // true unigram token counts per document under the trained model —
    // the q_bpe_apply shape with the Viterbi segmenter
    "q_unigram_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis
        .unigramTokenCounts(
          docs, "doc_id", "text",
          TextAnalysis.unigramLM(docs, "text", vocabSize = 120)
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

    // LSH tuning report on a deterministic 10% hash-sample: exact Jaccard
    // truth vs (16,4) MinHash bucketing — the recall/precision dial read
    // before shipping a full-corpus dedup. The sample keeps the exact
    // truth side bounded: this synthetic corpus has a 31-word vocabulary,
    // so EVERY doc pair shares tokens and exact pairing is inherently
    // quadratic in the sample size
    "q_lsh_recall" -> ((s, dir) => {
      Dedup.minHashRecallReport(
        t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, shingleK = 1, numHashes = 16, bands = 4,
        sampleFraction = 0.1
      )
    }),

    // MMR diversified top-3: relevance (deterministic pseudo-score) traded
    // against redundancy via native cosine; oracle = the same 3 greedy
    // rounds unrolled as CTE stages (lambda = 0.75 so 1 - lambda is exact
    // in binary and both engines compute identical objectives)
    "q_mmr" -> ((s, dir) => {
      Similarity
        .diversifiedTopK(
          t(s, dir, "embeddings")
            .filter(col("vec_id") < 150)
            .withColumn(
              "rel",
              ((col("vec_id") * 37) % 101).cast("double")
            ),
          "vec_id", "embedding", "rel", k = 3, lambda = 0.75
        )
        .orderBy("rank")
    }),

    // greedy k-center diversity sample (farthest-point-first) — the
    // selection complement of dedup; oracle = the same 3 rounds unrolled
    // as CTE stages with the identical argmax tie-break
    "q_kcenter" -> ((s, dir) => {
      Similarity
        .kCenterSample(
          t(s, dir, "embeddings").filter(col("vec_id") < 200),
          "vec_id", "embedding", k = 3
        )
        .orderBy("center_rank")
    }),

    // scalable (k-means||-style) k-center: constant distributed rounds of
    // md5-deterministic distance-proportional oversampling, driver-local
    // greedy on the candidate set. Iterative + sampling-driven -> rows-only
    // gate (same policy as q_bpe); coverage-radius bound vs the exact
    // greedy is asserted in ScaleSpec.
    "q_kcenter_scalable" -> ((s, dir) => {
      Similarity
        .kCenterSampleScalable(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 25, oversample = 4.0, rounds = 3
        )
        .orderBy("center_rank")
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

  /** DuckDB expression for cosine(a, b) over FLOAT[64] columns — identical
    * fold order to VectorFunctions.cosineSimilarity. */
  private def duckCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** DuckDB expression for squared Euclidean distance over FLOAT[64]
    * columns — identical fold order to VectorFunctions.squaredDistance
    * (the difference is written out as d*d, NOT pow(d, 2), so the
    * arithmetic matches the Spark loop bit-for-bit). */
  /** Shared DuckDB CTE chain for the DSIR oracles: hashed unigram+bigram
    * buckets (md5 % 8192, bigrams joined with chr(1) — the operator's
    * exact feature map), Laplace-1 smoothed target (lang='zh') vs corpus
    * models, 6-decimal log-ratios summed in DECIMAL. Ends with
    * `w(doc_id, log_weight)`. */
  private def duckDsirWeights: String =
    """d AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL
      |), g AS (
      |  SELECT doc_id, unnest(list_concat(toks,
      |    CASE WHEN len(toks) >= 2
      |         THEN list_transform(range(2, len(toks) + 1),
      |                             i -> toks[i-1] || chr(1) || toks[i])
      |         ELSE CAST([] AS VARCHAR[]) END)) AS gram
      |  FROM d
      |), b AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % 8192 AS bk
      |  FROM g
      |), qm AS (
      |  SELECT bk, count(*) AS qc FROM b GROUP BY bk
      |), pm AS (
      |  SELECT bk, count(*) AS pc FROM b JOIN documents USING (doc_id)
      |  WHERE lang = 'zh' GROUP BY bk
      |), tot AS (
      |  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM b) AS qt,
      |         (SELECT CAST(count(*) AS DOUBLE) FROM b
      |          JOIN documents USING (doc_id) WHERE lang = 'zh') AS pt
      |), r AS (
      |  SELECT COALESCE(qm.bk, pm.bk) AS bk,
      |         CAST(ROUND(LN((COALESCE(pc, 0) + 1.0) / (pt + 8192.0))
      |                  - LN((COALESCE(qc, 0) + 1.0) / (qt + 8192.0)), 6)
      |              AS DECIMAL(18,6)) AS lr
      |  FROM qm FULL JOIN pm ON qm.bk = pm.bk, tot
      |), db AS (
      |  SELECT doc_id, bk, CAST(count(*) AS DECIMAL(10,0)) AS c
      |  FROM b GROUP BY 1, 2
      |), w AS (
      |  SELECT doc_id, ROUND(CAST(sum(c * lr) AS DOUBLE), 6) AS log_weight
      |  FROM db JOIN r USING (bk) GROUP BY doc_id
      |)""".stripMargin

  /** Shared CTE chain for the hashed NB classifier oracle (src0-2 as the
    * positive class, 4096 buckets) — mirrors
    * TextAnalysis.trainTokenClassifier. */
  private def duckNbModel: String =
    """ptoks AS (
      |  SELECT CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS bucket
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents
      |        WHERE text IS NOT NULL AND source IN ('src0','src1','src2'))
      |), ntoks AS (
      |  SELECT CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS bucket
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents
      |        WHERE text IS NOT NULL AND source NOT IN ('src0','src1','src2'))
      |), pc AS (SELECT bucket, count(*) AS cnt FROM ptoks GROUP BY 1
      |), nc AS (SELECT bucket, count(*) AS cnt FROM ntoks GROUP BY 1
      |), model AS (
      |  SELECT b.bucket,
      |         ROUND(LN((COALESCE(p.cnt, 0) + 1) /
      |                  CAST((SELECT count(*) FROM ptoks) + 4096 AS DOUBLE))
      |             - LN((COALESCE(n.cnt, 0) + 1) /
      |                  CAST((SELECT count(*) FROM ntoks) + 4096 AS DOUBLE)), 6)
      |           AS weight
      |  FROM range(0, 4096) AS b(bucket)
      |  LEFT JOIN pc p ON p.bucket = b.bucket
      |  LEFT JOIN nc n ON n.bucket = b.bucket
      |)""".stripMargin

  private def duckSqDist(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65),
       | i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |    * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))""".stripMargin
      .replaceAll("\n", "")

  /** DuckDB CTE chain replaying Similarity.kmeansCluster bit-for-bit on
    * the embeddings table: md5-ranked seeds, `rounds` Lloyd iterations
    * with floor-quantized integer centroid sums (order-independent, so
    * the sequential-fold distance is the only float-sensitive step and
    * it matches the codegen'd loop exactly), empty clusters carrying the
    * previous centroid. Ends with `af(vec_id, cl, d)` = final assignment
    * + squared distance. */
  private def duckKmeansCte(k: Int, rounds: Int): String = {
    val seed =
      s"""sd AS (
         |  SELECT vec_id, embedding,
         |         ROW_NUMBER() OVER (
         |           ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
         |                    vec_id) - 1 AS cl
         |  FROM e
         |), c0 AS (
         |  SELECT cl, embedding AS cv FROM sd WHERE cl < $k
         |)""".stripMargin
    val iters = (1 to rounds).map { r =>
      val prev = s"c${r - 1}"
      s""", a$r AS (
         |  SELECT vec_id, embedding, cl FROM (
         |    SELECT e.vec_id, e.embedding, $prev.cl,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckSqDist("e.embedding", s"$prev.cv")}, $prev.cl) AS rn
         |    FROM e CROSS JOIN $prev
         |  ) WHERE rn = 1
         |), u$r AS (
         |  SELECT cl, i,
         |         CAST(CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
         |              / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS FLOAT) AS v
         |  FROM a$r CROSS JOIN range(1, 65) AS r(i)
         |  GROUP BY cl, i
         |), uc$r AS (
         |  SELECT cl, list(v ORDER BY i) AS cv FROM u$r GROUP BY cl
         |), c$r AS (
         |  SELECT $prev.cl, COALESCE(uc$r.cv, $prev.cv) AS cv
         |  FROM $prev LEFT JOIN uc$r USING (cl)
         |)""".stripMargin
    }.mkString
    val fin = s"c$rounds"
    s"""$seed$iters, af AS (
       |  SELECT vec_id, cl, d FROM (
       |    SELECT e.vec_id, $fin.cl,
       |           ${duckSqDist("e.embedding", s"$fin.cv")} AS d,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${duckSqDist("e.embedding", s"$fin.cv")}, $fin.cl) AS rn
       |    FROM e CROSS JOIN $fin
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  /** DuckDB CTE pair `m, q` computing the per-doc quality score `s`
    * exactly as TextAnalysis.qualityScore / the q_quality oracle —
    * shared by the calibration oracles (q_threshold_sweep, q_auc) so the
    * formula lives in one place. */
  private def duckQualityScoreCte: String = {
    val en = TextAnalysis.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
    s"""m AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
       |         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS punct_count,
       |         CAST(len(list_filter(string_split(lower(text), ' '), t -> list_contains([$en], t))) AS INT) AS stops
       |  FROM documents
       |), q AS (
       |  SELECT doc_id,
       |         ROUND(LEAST(1.0,
       |           (CAST(stops AS DOUBLE) / n_tokens) * 2.0 +
       |           (CASE WHEN n_tokens >= 20 AND n_tokens <= 2000 THEN 0.5 ELSE 0.2 END) +
       |           (CASE WHEN punct_count = 0 THEN 0.1 ELSE 0.0 END)), 6) AS s
       |  FROM m
       |)""".stripMargin
  }

  /** DuckDB literal for one hyperplane + its dot-product vs `embedding`. */
  private def duckPlaneDot(plane: Seq[Double]): String = {
    val lit = plane.mkString("[", ", ", "]")
    s"list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * ($lit)[i]))"
  }

  /** DuckDB CTE chain computing the portable SimHash signature table
    * (doc_id, simhash) — mirrors Dedup.simHashSignatures bit-for-bit: md5
    * split into two 32-bit halves, per-bit majority vote over tokens, bit 63
    * assembled as Long.MinValue to stay in signed-64 range. */
  private def duckSimHashSig(where: String): String = {
    val votes = (0 until 64)
      .map { b =>
        val src = if (b < 32) s"(hi >> $b)" else s"(lo >> ${b - 32})"
        s"SUM($src & 1) AS v$b"
      }
      .mkString(", ")
    val terms = (0 until 64)
      .map { b =>
        val term = if (b == 63) "-9223372036854775808" else (1L << b).toString
        s"(CASE WHEN 2*v$b > n THEN $term ELSE 0 END)"
      }
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
       |  FROM documents $where
       |), h AS (
       |  SELECT doc_id,
       |         CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS hi,
       |         CAST('0x' || substr(md5(t), 9, 8) AS BIGINT) AS lo
       |  FROM tok
       |), v AS (
       |  SELECT doc_id, count(*) AS n, $votes FROM h GROUP BY doc_id
       |), sh AS (
       |  SELECT doc_id, $terms AS simhash FROM v
       |)""".stripMargin
  }

  /** Shared DuckDB CTE chain for the MinHash dedup oracles — mirrors
    * Dedup.minHashSignatures + bucket-minimum candidate pairing: tokens ->
    * md5-derived (a, b) seeds -> 16-component signatures -> 4 band keys ->
    * bucket-min pairs with full-signature agreement (`cl`), plus the exact
    * identical-signature pass (`ex`). NULL-text docs have no shingles:
    * Spark's explode drops them from the signature table so they are always
    * retained; the WHERE mirrors that (without it DuckDB would give them a
    * shared NULL signature and drop all but one). */
  /** Shared DuckDB CTE chain replicating the portable MinHash signature,
    * banding, bucket-min pairing, and exact-signature pass; `extraWhere`
    * restricts the corpus (e.g. the pipeline query dedups only its
    * training slice). */
  private def duckMinHashCommonWhere(extraWhere: String): String =
    s"""d AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL$extraWhere
      |), pre AS (
      |  SELECT doc_id,
      |         list_transform(toks, s -> [
      |           CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT),
      |           CAST(('0x' || substr(md5(s), 16, 15)) AS BIGINT) % 1000000007
      |         ]) AS ab
      |  FROM d
      |), sg AS (
      |  SELECT doc_id,
      |         list_transform(range(0, 16), j ->
      |           list_min(list_transform(ab, p -> (p[1] + j * p[2]) % 1000000007))) AS sig
      |  FROM pre
      |), bd AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(0, 4), b ->
      |           md5(array_to_string(sig[b*4+1:b*4+4], '|')))) AS band
      |  FROM sg
      |), mn AS (
      |  SELECT band, min(doc_id) AS bucket_min FROM bd GROUP BY band
      |), pr AS (
      |  SELECT DISTINCT m.bucket_min AS ia, b.doc_id AS ib
      |  FROM bd b JOIN mn m ON b.band = m.band AND b.doc_id > m.bucket_min
      |), cl AS (
      |  SELECT ia, ib,
      |         len(list_filter(range(1, 17), i -> x.sig[i] = y.sig[i])) / 16.0 AS est
      |  FROM pr JOIN sg x ON x.doc_id = ia JOIN sg y ON y.doc_id = ib
      |), ex AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY sig) AS sig_min FROM sg
      |)""".stripMargin

  private val duckMinHashCommon: String = duckMinHashCommonWhere("")

  private def duckBucketFor(planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex
      .map { case (p, i) =>
        s"(CASE WHEN ${duckPlaneDot(p)} > 0 THEN ${1 << i} ELSE 0 END)"
      }
      .mkString(" + ")

  private val duckBucket: String = duckBucketFor(AnnPlanes)

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

    "q_hash_split" ->
      """WITH b AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bk,
        |         o_totalprice
        |  FROM orders
        |)
        |SELECT CASE WHEN bk < 8000 THEN 'train'
        |            WHEN bk < 9000 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fuzzy_pairs" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 300
        |)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM c a JOIN c b
        |  ON a.c_custkey < b.c_custkey
        | AND abs(length(a.c_name) - length(b.c_name)) <= 2
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

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

    "q_dedup_exact" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $duckMinHashCommon, losers AS (
         |  SELECT doc_id AS ib FROM ex WHERE doc_id > sig_min
         |  UNION
         |  SELECT ib FROM cl WHERE est >= 0.9
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT ib FROM losers)
         |ORDER BY doc_id""".stripMargin,

    // transitive variant: reachability over the qualifying pair graph via a
    // recursive CTE; a doc loses iff any strictly smaller id is reachable
    "q_dedup_minhash_cc" ->
      s"""WITH RECURSIVE $duckMinHashCommon, e AS (
         |  SELECT ia AS a, ib AS b FROM cl WHERE est >= 0.9
         |  UNION
         |  SELECT ib AS a, ia AS b FROM cl WHERE est >= 0.9
         |), reach AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst
         |), comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src
         |), losers AS (
         |  SELECT doc_id AS ib FROM ex WHERE doc_id > sig_min
         |  UNION
         |  SELECT id AS ib FROM comp WHERE id > component
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT ib FROM losers)
         |ORDER BY doc_id""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS st
        |  FROM documents WHERE doc_id < 500
        |), inv AS (
        |  SELECT doc_id, unnest(st) AS sh FROM s
        |), shared AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
        |  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), sz AS (
        |  SELECT doc_id, len(st) AS n FROM s
        |)
        |SELECT ia AS id_a, ib AS id_b,
        |       CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
        |FROM shared JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib
        |WHERE CAST(c AS DOUBLE) / (x.n + y.n - c) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

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

    // reps = floor(w) + (md5 bucket < frac(w)*10000); one row per copy
    "q_weighted_repeat" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END)
        |         + (CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 <
        |                 (CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 5000 ELSE 0 END)
        |            THEN 1 ELSE 0 END) AS reps
        |  FROM documents
        |)
        |SELECT doc_id, source, CAST(unnest(range(reps)) AS BIGINT) AS copy_id
        |FROM r WHERE reps > 0
        |ORDER BY doc_id, copy_id""".stripMargin,

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

    "q_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE doc_id < 500
        |), s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)),
        |    i -> array_to_string(t[i:i+1], ' '))) AS st
        |  FROM toks
        |), inv AS (
        |  SELECT doc_id, unnest(st) AS sh FROM s
        |), shared AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
        |  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |), sz AS (
        |  SELECT doc_id, len(st) AS n FROM s
        |)
        |SELECT ia AS id_a, ib AS id_b, CAST(c AS DOUBLE) / x.n AS containment
        |FROM shared JOIN sz x ON x.doc_id = ia
        |WHERE CAST(c AS DOUBLE) / x.n >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    // word 3-grams via inclusive list slices: gram i = t[i:i+2], i in
    // [1, len-2] (range end is exclusive; empty when len < 3 — matching
    // Spark's shingles() on short docs)
    "q_decontam" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), ng AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS g
        |  FROM toks
        |), te AS (
        |  SELECT DISTINCT unnest(g) AS gram FROM ng WHERE doc_id % 10 = 0
        |), sh AS (
        |  SELECT x.doc_id, count(*) AS n FROM (
        |    SELECT doc_id, unnest(g) AS gram FROM ng WHERE doc_id % 10 <> 0
        |  ) x JOIN te USING (gram) GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(sh.n, 0) AS n_shared_grams,
        |       COALESCE(sh.n, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
        |WHERE d.doc_id % 10 <> 0
        |ORDER BY d.doc_id""".stripMargin,

    // split assignment replicates q_hash_split's md5 buckets; 3-gram slices
    // replicate q_decontam's inclusive-range construction
    "q_split_leakage" ->
      """WITH sp AS (
        |  SELECT doc_id, text,
        |         CASE WHEN bk < 8000 THEN 'train'
        |              WHEN bk < 9000 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM (
        |    SELECT doc_id, text,
        |           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bk
        |    FROM documents
        |  )
        |), ng AS (
        |  SELECT doc_id, split,
        |         list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS g
        |  FROM (SELECT doc_id, split, string_split(lower(text), ' ') AS t FROM sp)
        |), tr AS (
        |  SELECT DISTINCT unnest(g) AS gram FROM ng WHERE split = 'train'
        |), ho AS (
        |  SELECT doc_id, split, unnest(g) AS gram FROM ng WHERE split <> 'train'
        |), tot AS (
        |  SELECT doc_id, split, count(*) AS n_grams FROM ho GROUP BY 1, 2
        |), lk AS (
        |  SELECT ho.doc_id, count(*) AS n_leaked FROM ho JOIN tr USING (gram) GROUP BY 1
        |)
        |SELECT t.doc_id, t.split, t.n_grams,
        |       COALESCE(lk.n_leaked, 0) AS n_leaked,
        |       round(CAST(COALESCE(lk.n_leaked, 0) AS DOUBLE) / t.n_grams, 6) AS leak_frac
        |FROM tot t LEFT JOIN lk ON lk.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // vocab = top-12 terms by (doc_freq, coll_freq, term) — the same
    // deterministic tie-break topTerms uses
    "q_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
        |), stats AS (
        |  SELECT w, count(*) AS cf, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
        |), vocab AS (
        |  SELECT w FROM stats ORDER BY df DESC, cf DESC, w LIMIT 12
        |), cov AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |         count(CASE WHEN v.w IS NULL THEN 1 END) AS n_oov
        |  FROM (SELECT doc_id, w FROM toks WHERE w <> '') t
        |  LEFT JOIN vocab v ON v.w = t.w
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_tokens, n_oov,
        |       round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_frac
        |FROM cov ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), ng AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(t)),
        |           i -> array_to_string(t[i:i+1], ' '))) AS gram
        |  FROM toks
        |), pg AS (
        |  SELECT doc_id, gram, count(*) AS c FROM ng GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |       CAST(sum(c) AS BIGINT) AS total_ngrams,
        |       CAST(max(c) AS BIGINT) AS top_ngram_count,
        |       ROUND(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_ngram_frac,
        |       ROUND(CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
        |             / CAST(sum(c) AS DOUBLE), 6) AS dup_ngram_frac
        |FROM pg GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_redact_text" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|and)\b')) AS INT) AS n_stop_matches,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]+\b', '[NUM]', 'g'),
        |    '\b(the|a|and)\b', '[W]', 'g')) AS redacted_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_simhash" ->
      s"""WITH ${duckSimHashSig("")}
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,

    "q_simhash_pairs" ->
      s"""WITH ${duckSimHashSig("WHERE doc_id < 500")}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3
         |), s AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |         ${duckCosine("q.embedding", "e.embedding")} AS c
         |  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
         |), r AS (
         |  SELECT query_id, neighbor_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // floor(x*127/maxabs + 0.5) quantization replicated exactly (floor,
    // not round: Spark HALF_UP vs DuckDB bankers diverge on .5); integer
    // dot/norms in BIGINT then one double division, matching the native
    // expression's arithmetic order
    "q_ann_quantized" ->
      s"""WITH mm AS (
         |  SELECT vec_id, embedding,
         |         list_max(list_transform(embedding, x -> abs(x))) AS m
         |  FROM embeddings
         |), qe AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x ->
         |           CASE WHEN m > 0
         |                THEN CAST(floor(x * 127.0 / m + 0.5) AS INT)
         |                ELSE 0 END) AS qv
         |  FROM mm
         |), q AS (
         |  SELECT vec_id, qv FROM qe WHERE vec_id < 3
         |), s AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |         CAST(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qv[i] AS BIGINT) * CAST(e.qv[i] AS BIGINT))) AS DOUBLE) /
         |         (sqrt(CAST(list_sum(list_transform(q.qv, v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS DOUBLE)) *
         |          sqrt(CAST(list_sum(list_transform(e.qv, v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS DOUBLE))) AS c
         |  FROM q JOIN qe e ON e.vec_id <> q.vec_id
         |), r AS (
         |  SELECT query_id, neighbor_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine_q, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_ann_topk" ->
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $duckBucket AS bucket FROM embeddings
         |), q AS (
         |  SELECT vec_id, embedding, bucket FROM eb WHERE vec_id < 3
         |), s AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |         ${duckCosine("q.embedding", "e.embedding")} AS c
         |  FROM q JOIN eb e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
         |), r AS (
         |  SELECT query_id, neighbor_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH ${duckSimHashSig("")}, bd AS (
         |  SELECT doc_id,
         |         CAST(q AS VARCHAR) || ':' ||
         |           CAST(((simhash >> (q*16)) & 65535) AS VARCHAR) AS band
         |  FROM sh, range(0, 4) t(q)
         |), mn AS (
         |  SELECT band, min(doc_id) AS bmin FROM bd GROUP BY band
         |), pr AS (
         |  SELECT DISTINCT m.bmin AS ia, b.doc_id AS ib
         |  FROM bd b JOIN mn m ON b.band = m.band AND b.doc_id > m.bmin
         |), hd AS (
         |  SELECT ia, ib FROM pr
         |  JOIN sh x ON x.doc_id = ia JOIN sh y ON y.doc_id = ib
         |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |), ex AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY simhash) AS smin FROM sh
         |), losers AS (
         |  SELECT doc_id AS ib FROM ex WHERE doc_id > smin
         |  UNION
         |  SELECT ib FROM hd
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT ib FROM losers)
         |ORDER BY doc_id""".stripMargin,

    // incremental SimHash: corpus sigs (doc_id < 250) vs batch (>= 250);
    // losers = exact-vs-corpus UNION quarter-bucket-min-vs-corpus UNION
    // the two in-batch passes — mirrors Dedup.dedupNearSimHashIncremental
    "q_dedup_simhash_incremental" ->
      s"""WITH ${duckSimHashSig("")}, cs AS (
         |  SELECT doc_id, simhash FROM sh WHERE doc_id < 250
         |), bs AS (
         |  SELECT doc_id, simhash FROM sh WHERE doc_id >= 250
         |), cb AS (
         |  SELECT doc_id, simhash,
         |         CAST(q AS VARCHAR) || ':' ||
         |           CAST(((simhash >> (q*16)) & 65535) AS VARCHAR) AS band
         |  FROM cs, range(0, 4) t(q)
         |), cmn AS (
         |  SELECT band, min(doc_id) AS cid FROM cb GROUP BY band
         |), bb AS (
         |  SELECT doc_id, simhash,
         |         CAST(q AS VARCHAR) || ':' ||
         |           CAST(((simhash >> (q*16)) & 65535) AS VARCHAR) AS band
         |  FROM bs, range(0, 4) t(q)
         |), exc AS (
         |  SELECT b.doc_id FROM bs b JOIN cs c ON b.simhash = c.simhash
         |), nvc AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM bb b JOIN cmn m ON b.band = m.band
         |  JOIN cs c ON c.doc_id = m.cid
         |  WHERE bit_count(xor(b.simhash, c.simhash)) <= 3
         |), exb AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY simhash) AS smin
         |    FROM bs
         |  ) WHERE doc_id > smin
         |), bmn AS (
         |  SELECT band, min(doc_id) AS bmin FROM bb GROUP BY band
         |), nb AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM bb b JOIN bmn m ON b.band = m.band AND b.doc_id > m.bmin
         |  JOIN bs x ON x.doc_id = m.bmin
         |  WHERE bit_count(xor(x.simhash, b.simhash)) <= 3
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id >= 250 AND doc_id NOT IN (
         |  SELECT doc_id FROM exc UNION SELECT doc_id FROM nvc
         |  UNION SELECT doc_id FROM exb UNION SELECT doc_id FROM nb)
         |ORDER BY doc_id""".stripMargin,

    "q_embed_dedup" ->
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $duckBucket AS bucket FROM embeddings
         |), p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${duckCosine("a.embedding", "b.embedding")} AS c
         |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b, ROUND(c, 6) AS cosine FROM p
         |WHERE c >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // deterministic-codebook IVF: centroids = corpus vectors at
    // vec_id % 64 == 0 (cell = rank of centroid id), squared-Euclidean
    // assignment (argmin, ties -> lowest cell), nProbe=3, cosine top-5
    "q_ivf_topk" ->
      s"""WITH cent AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cell,
         |         embedding AS cv
         |  FROM embeddings WHERE vec_id % 64 = 0
         |), ac AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |         ${duckSqDist("e.embedding", "c.cv")} AS cd
         |  FROM embeddings e CROSS JOIN cent c
         |), assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT vec_id, embedding, cell,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn
         |    FROM ac
         |  ) WHERE rn = 1
         |), probe AS (
         |  SELECT vec_id AS query_id, embedding AS qv, cell FROM (
         |    SELECT vec_id, embedding, cell,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn
         |    FROM ac WHERE vec_id < 3
         |  ) WHERE rn <= 3
         |), s AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |         ${duckCosine("p.qv", "a.embedding")} AS c
         |  FROM probe p JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
         |), r AS (
         |  SELECT query_id, neighbor_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_kmeans" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), ${duckKmeansCte(k = 8, rounds = 2)}
         |SELECT vec_id, CAST(cl AS INT) AS cluster, ROUND(d, 6) AS sq_dist
         |FROM af ORDER BY vec_id""".stripMargin,

    "q_semdedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), ${duckKmeansCte(k = 8, rounds = 2)}, sl AS (
         |  SELECT af.vec_id, e.embedding, af.cl, ROUND(af.d, 6) AS d
         |  FROM af JOIN e USING (vec_id)
         |), pr AS (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib, a.d AS da, b.d AS db
         |  FROM sl a JOIN sl b ON a.cl = b.cl AND a.vec_id < b.vec_id
         |  WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.4
         |), lo AS (
         |  SELECT DISTINCT CASE WHEN da < db THEN ia
         |                       WHEN db < da THEN ib
         |                       ELSE ib END AS loser
         |  FROM pr
         |)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT loser FROM lo)
         |ORDER BY vec_id""".stripMargin,

    "q_cluster_sample" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), ${duckKmeansCte(k = 8, rounds = 2)}, bk AS (
         |  SELECT vec_id, cl,
         |         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
         |  FROM af
         |)
         |SELECT vec_id, CAST(cl AS INT) AS cluster FROM (
         |  SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY cl ORDER BY b, vec_id) AS rn
         |  FROM bk
         |) WHERE rn <= 12 ORDER BY cluster, vec_id""".stripMargin,

    "q_embed_dedup_mb" -> {
      val bucketCols = AnnBanks.zipWithIndex
        .map { case (planes, i) => s"${duckBucketFor(planes)} AS b$i" }
        .mkString(", ")
      val orCond = AnnBanks.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings
         |  WHERE vec_id < 1000
         |), p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${duckCosine("a.embedding", "b.embedding")} AS c
         |  FROM eb a JOIN eb b ON ($orCond) AND a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b, ROUND(c, 6) AS cosine FROM p
         |WHERE c >= 0.4 ORDER BY id_a, id_b""".stripMargin
    },

    "q_embed_dedup_drop" -> {
      val bucketCols = AnnBanks.zipWithIndex
        .map { case (planes, i) => s"${duckBucketFor(planes)} AS b$i" }
        .mkString(", ")
      val orCond = AnnBanks.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings
         |  WHERE vec_id < 1000
         |), p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${duckCosine("a.embedding", "b.embedding")} AS c
         |  FROM eb a JOIN eb b ON ($orCond) AND a.vec_id < b.vec_id
         |), losers AS (
         |  SELECT DISTINCT id_b FROM p WHERE c >= 0.4
         |)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id < 1000 AND vec_id NOT IN (SELECT id_b FROM losers)
         |ORDER BY vec_id""".stripMargin
    },

    "q_knn_graph" -> {
      val bucketCols = AnnBanks.zipWithIndex
        .map { case (planes, i) => s"${duckBucketFor(planes)} AS b$i" }
        .mkString(", ")
      val orCond = AnnBanks.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings
         |  WHERE vec_id < 300
         |), s AS (
         |  SELECT a.vec_id AS id, b.vec_id AS neighbor_id,
         |         ${duckCosine("a.embedding", "b.embedding")} AS c
         |  FROM eb a JOIN eb b ON ($orCond) AND a.vec_id <> b.vec_id
         |), r AS (
         |  SELECT id, neighbor_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, neighbor_id) AS rn
         |  FROM s
         |)
         |SELECT id, neighbor_id, ROUND(c, 6) AS cosine, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 3 ORDER BY id, rank""".stripMargin
    },

    "q_contrastive_pairs" -> {
      val bucketCols = AnnBanks.zipWithIndex
        .map { case (planes, i) => s"${duckBucketFor(planes)} AS b$i" }
        .mkString(", ")
      val orCond = AnnBanks.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings
         |  WHERE vec_id < 300
         |), s AS (
         |  SELECT a.vec_id AS id, b.vec_id AS neighbor_id,
         |         ${duckCosine("a.embedding", "b.embedding")} AS c
         |  FROM eb a JOIN eb b ON ($orCond) AND a.vec_id <> b.vec_id
         |), pos AS (
         |  SELECT id, neighbor_id, c, rn FROM (
         |    SELECT id, neighbor_id, c,
         |           ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, neighbor_id) AS rn
         |    FROM s
         |  ) WHERE rn <= 3
         |), pool AS (
         |  SELECT vec_id AS pid, embedding AS pv FROM eb
         |  ORDER BY CAST(('0x' || substr(md5('pool:cp:' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT), vec_id
         |  LIMIT 64
         |), nc AS (
         |  SELECT a.vec_id AS anchor_id, p.pid, p.pv,
         |         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |           CAST(('0x' || substr(md5('neg:cp:' || CAST(a.vec_id AS VARCHAR) || '|' || CAST(p.pid AS VARCHAR)), 1, 15)) AS BIGINT),
         |           p.pid) AS rn
         |  FROM eb a JOIN pool p ON p.pid <> a.vec_id
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM pos WHERE pos.id = a.vec_id AND pos.neighbor_id = p.pid
         |  )
         |), neg AS (
         |  SELECT nc.anchor_id, nc.pid AS pair_id,
         |         ${duckCosine("a.embedding", "nc.pv")} AS c, nc.rn
         |  FROM nc JOIN eb a ON a.vec_id = nc.anchor_id
         |  WHERE nc.rn <= 3
         |)
         |SELECT anchor_id, pair_id, label, ROUND(c, 6) AS cosine, CAST(rn AS INT) AS rank
         |FROM (
         |  SELECT id AS anchor_id, neighbor_id AS pair_id, 'pos' AS label, c, rn FROM pos
         |  UNION ALL
         |  SELECT anchor_id, pair_id, 'neg' AS label, c, rn FROM neg
         |)
         |ORDER BY anchor_id, label, rank""".stripMargin
    },

    "q_embed_dedup_cc" -> {
      val bucketCols = AnnBanks.zipWithIndex
        .map { case (planes, i) => s"${duckBucketFor(planes)} AS b$i" }
        .mkString(", ")
      val orCond = AnnBanks.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
      s"""WITH RECURSIVE eb AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings
         |  WHERE vec_id < 1000
         |), p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${duckCosine("a.embedding", "b.embedding")} AS c
         |  FROM eb a JOIN eb b ON ($orCond) AND a.vec_id < b.vec_id
         |), e AS (
         |  SELECT id_a AS a, id_b AS b FROM p WHERE c >= 0.4
         |  UNION
         |  SELECT id_b AS a, id_a AS b FROM p WHERE c >= 0.4
         |), reach AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst
         |), comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src
         |), losers AS (
         |  SELECT id FROM comp WHERE id > component
         |)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id < 1000 AND vec_id NOT IN (SELECT id FROM losers)
         |ORDER BY vec_id""".stripMargin
    },

    "q_ann_multiband" -> {
      val bucketCols = AnnBanks.zipWithIndex
        .map { case (planes, i) => s"${duckBucketFor(planes)} AS b$i" }
        .mkString(", ")
      val orCond = AnnBanks.indices.map(i => s"e.b$i = q.b$i").mkString(" OR ")
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings
         |), q AS (
         |  SELECT * FROM eb WHERE vec_id < 3
         |), s AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |         ${duckCosine("q.embedding", "e.embedding")} AS c
         |  FROM q JOIN eb e ON ($orCond) AND e.vec_id <> q.vec_id
         |), r AS (
         |  SELECT query_id, neighbor_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "q_lang_id" -> {
      def score(words: Seq[String]): String =
        s"CAST(len(list_filter(string_split(lower(text), ' '), t -> list_contains([${words.map(w => s"'$w'").mkString(", ")}], t))) AS INT)"
      val Seq(en, es, de, fr) = TextAnalysis.LangMarkers.map(_._2)
      s"""WITH sc AS (
         |  SELECT doc_id,
         |         ${score(en)} AS score_en,
         |         ${score(es)} AS score_es,
         |         ${score(de)} AS score_de,
         |         ${score(fr)} AS score_fr
         |  FROM documents
         |)
         |SELECT doc_id, score_en, score_es, score_de, score_fr,
         |  CASE
         |    WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr AND score_en > 0 THEN 'en'
         |    WHEN score_es >= score_de AND score_es >= score_fr AND score_es > 0 THEN 'es'
         |    WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
         |    WHEN score_fr > 0 THEN 'fr'
         |    ELSE 'unknown'
         |  END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q_quality" -> {
      val en = TextAnalysis.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CAST(length(text) AS INT) AS n_chars_calc,
         |         CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
         |         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS punct_count,
         |         CAST(len(list_filter(string_split(lower(text), ' '), t -> list_contains([$en], t))) AS INT) AS stops
         |  FROM documents
         |)
         |SELECT doc_id, n_chars_calc, n_tokens,
         |       CAST(n_chars_calc - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_token_len,
         |       punct_count,
         |       CAST(stops AS DOUBLE) / n_tokens AS stopword_ratio,
         |       ROUND(LEAST(1.0,
         |         (CAST(stops AS DOUBLE) / n_tokens) * 2.0 +
         |         (CASE WHEN n_tokens >= 20 AND n_tokens <= 2000 THEN 0.5 ELSE 0.2 END) +
         |         (CASE WHEN punct_count = 0 THEN 0.1 ELSE 0.0 END)), 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q_mixture_alloc" -> {
      // ppm literals computed by the SAME normalization as the operator,
      // so the only data-dependent inputs are the per-source token sums
      val weights = Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
      val wSum = weights.map(_._2).sum
      val vals = weights
        .map { case (s, w) => s"('$s', ${math.round(w / wSum * 1e6)})" }
        .mkString(", ")
      val budget = 4000L
      s"""WITH a AS (
         |  SELECT source, SUM(len(string_split(lower(text), ' '))) AS av
         |  FROM documents WHERE text IS NOT NULL GROUP BY source
         |), w(source, wq) AS (VALUES $vals),
         |j AS (
         |  SELECT w.source, CAST(COALESCE(a.av, 0) AS BIGINT) AS av, w.wq,
         |         ($budget * w.wq) // 1000000 AS want,
         |         (CAST(COALESCE(a.av, 0) AS BIGINT) * 1000000) // 1000000 AS cap
         |  FROM w LEFT JOIN a USING (source)
         |), f AS (
         |  SELECT *, LEAST(want, cap) AS a1 FROM j
         |), g AS (
         |  SELECT *,
         |         (SELECT $budget - SUM(a1) FROM f) AS leftover,
         |         (SELECT COALESCE(SUM(wq) FILTER (WHERE a1 < cap), 0) FROM f) AS up
         |  FROM f
         |), h AS (
         |  SELECT source, av, wq, cap,
         |         a1 + CASE WHEN a1 < cap AND up > 0 AND leftover > 0
         |              THEN LEAST((leftover * wq) // up, cap - a1)
         |              ELSE 0 END AS alloc
         |  FROM g
         |)
         |SELECT source, av AS available_tokens,
         |       CAST(wq AS BIGINT) AS weight_ppm,
         |       CAST(alloc AS BIGINT) AS allocated_tokens,
         |       ROUND(CASE WHEN av > 0 THEN CAST(alloc AS DOUBLE) / av
         |             ELSE 0.0 END, 6) AS epochs,
         |       (alloc = cap) AS capped
         |FROM h ORDER BY source""".stripMargin
    },

    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, length(text) + 1), i -> text[i])) AS c
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |), cc AS (
        |  SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c
        |), t AS (
        |  SELECT doc_id, SUM(k) AS n FROM cc GROUP BY doc_id
        |)
        |SELECT cc.doc_id, CAST(t.n AS INT) AS n_chars,
        |       ROUND(CAST(SUM(CAST(ROUND(
        |         -(CAST(k AS DOUBLE) / n) * (ln(CAST(k AS DOUBLE) / n) / ln(2.0)),
        |         9) AS DECIMAL(19,9))) AS DOUBLE), 6) AS char_entropy
        |FROM cc JOIN t USING (doc_id)
        |GROUP BY cc.doc_id, t.n ORDER BY doc_id""".stripMargin,

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

    "q_gopher" -> {
      val en = TextAnalysis.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH m AS (
         |  SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
         |         length(text) AS nc
         |  FROM documents
         |), f AS (
         |  SELECT doc_id,
         |    len(toks) AS n,
         |    CAST(nc - (len(toks) - 1) AS DOUBLE) / len(toks) AS meanlen,
         |    CAST((nc - length(replace(text, '#', ''))) +
         |         (nc - length(replace(text, '...', ''))) / 3 AS DOUBLE)
         |      / len(toks) AS symratio,
         |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
         |      / len(toks) AS alphafrac,
         |    len(list_filter([$en], w -> list_contains(toks, w))) AS stops
         |  FROM m
         |)
         |SELECT doc_id,
         |  n BETWEEN 20 AND 100000 AS word_count_ok,
         |  meanlen BETWEEN 3.0 AND 10.0 AS mean_word_len_ok,
         |  symratio <= 0.1 AS symbol_ratio_ok,
         |  alphafrac >= 0.8 AS alpha_ratio_ok,
         |  stops >= 2 AS stopword_ok,
         |  (n BETWEEN 20 AND 100000) AND (meanlen BETWEEN 3.0 AND 10.0)
         |    AND symratio <= 0.1 AND alphafrac >= 0.8 AND stops >= 2
         |    AS gopher_keep
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q_token_counts" ->
      """SELECT doc_id,
        |       CAST(len(string_split(lower(text), ' ')) AS INT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS canon
        |  FROM documents
        |), tk AS (
        |  SELECT doc_id, canon, string_split(canon, ' ') AS toks FROM c
        |)
        |SELECT doc_id, md5(canon) AS fp_md5,
        |       CASE WHEN len(toks) >= 3 THEN
        |         list_min(list_transform(range(0, len(toks) - 2), i ->
        |           md5(array_to_string(toks[i+1:i+3], ' '))))
        |       END AS fp_min_shingle
        |FROM tk ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      """WITH s AS (
        |  SELECT * FROM documents
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 <
        |        CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 2500 ELSE 1000 END
        |)
        |SELECT lang, count(*) AS n, min(doc_id) AS min_id
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

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

    "q_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), st AS (
        |  SELECT term, count(*) AS coll_freq, count(DISTINCT doc_id) AS doc_freq
        |  FROM tok GROUP BY term
        |), r AS (
        |  SELECT term, coll_freq, doc_freq,
        |         CAST(ROW_NUMBER() OVER (ORDER BY doc_freq DESC, coll_freq DESC, term) AS INT) AS rank
        |  FROM st
        |)
        |SELECT term, coll_freq, doc_freq, rank FROM r
        |WHERE rank <= 25 ORDER BY rank""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term
        |), s AS (
        |  SELECT doc_id, term, tf, df,
        |         ROUND(tf * ln((SELECT count(*) FROM documents) / df), 6) AS tfidf
        |  FROM tf JOIN dfq USING (term)
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        |  FROM s
        |)
        |SELECT doc_id, term, tf, df, tfidf, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,

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

    "q_percentiles" ->
      """SELECT o_orderstatus,
        |       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_asof_purchase_view" ->
      """SELECT event_id, user_id, ts, last_prior_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |         MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_prior_ts
        |  FROM events
        |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_chunk_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), chunks AS (
        |  SELECT doc_id, i AS chunk_id,
        |         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS chunk
        |  FROM toks, unnest(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)
        |), freq AS (
        |  SELECT md5(chunk) AS h, count(*) AS freq FROM chunks GROUP BY 1
        |)
        |SELECT c.doc_id,
        |       CAST(count(*) FILTER (f.freq <= 2) AS INT) AS kept_chunks,
        |       CAST(count(*) FILTER (f.freq > 2) AS INT) AS dropped_chunks,
        |       md5(coalesce(
        |         string_agg(c.chunk, ' ' ORDER BY c.chunk_id)
        |           FILTER (f.freq <= 2), '')) AS clean_md5
        |FROM chunks c JOIN freq f ON md5(c.chunk) = f.h
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,

    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL
        |), vocab AS (
        |  SELECT term, count(*) AS cnt FROM toks GROUP BY 1
        |), model AS (
        |  SELECT term,
        |         ln(CAST(cnt AS DOUBLE)) -
        |           ln(CAST((SELECT sum(cnt) FROM vocab) AS DOUBLE)) AS lp
        |  FROM vocab
        |)
        |SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
        |       ROUND(avg(m.lp), 6) AS avg_logprob
        |FROM toks t JOIN model m USING (term)
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(sum(n_tokens) OVER (
        |           PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           - n_tokens AS start_off
        |  FROM d
        |)
        |SELECT doc_id, source, n_tokens,
        |       start_off // 512 AS block_id,
        |       start_off % 512 AS block_offset
        |FROM r ORDER BY doc_id""".stripMargin,

    // composition of the q_dedup_minhash, q_decontam, q_quality,
    // q_hash_split and q_pack_sequences oracle fragments, each already
    // individually green — the pipeline oracle checks the COMPOSITION
    "q_pipeline_e2e" -> {
      val en = TextAnalysis.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH ${duckMinHashCommonWhere(" AND doc_id % 10 <> 0")}, losers AS (
         |  SELECT doc_id AS ib FROM ex WHERE doc_id > sig_min
         |  UNION
         |  SELECT ib FROM cl WHERE est >= 0.9
         |), dd AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT ib FROM losers)
         |), tk AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
         |), ng AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 2),
         |    i -> array_to_string(t[i:i+3], ' '))) AS g
         |  FROM tk
         |), te AS (
         |  SELECT DISTINCT unnest(g) AS gram FROM ng WHERE doc_id % 10 = 0
         |), cont AS (
         |  SELECT DISTINCT x.doc_id FROM (
         |    SELECT doc_id, unnest(g) AS gram FROM ng WHERE doc_id % 10 <> 0
         |  ) x JOIN te USING (gram)
         |), q AS (
         |  SELECT doc_id, text,
         |         ROUND(LEAST(1.0,
         |           (CAST(stops AS DOUBLE) / nt) * 2.0 +
         |           (CASE WHEN nt >= 20 AND nt <= 2000 THEN 0.5 ELSE 0.2 END) +
         |           (CASE WHEN pc = 0 THEN 0.1 ELSE 0.0 END)), 6) AS quality
         |  FROM (
         |    SELECT doc_id, text,
         |           len(string_split(lower(text), ' ')) AS nt,
         |           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS pc,
         |           len(list_filter(string_split(lower(text), ' '),
         |               w -> list_contains([$en], w))) AS stops
         |    FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |  )
         |), sp AS (
         |  SELECT doc_id, text, quality,
         |         CASE WHEN bk < 8000 THEN 'train'
         |              WHEN bk < 9000 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT *,
         |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bk
         |        FROM q)
         |  WHERE quality >= 0.5
         |), pk AS (
         |  SELECT doc_id, split, quality,
         |         CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
         |         CAST(sum(len(string_split(lower(text), ' '))) OVER (
         |           PARTITION BY split ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |           - len(string_split(lower(text), ' ')) AS start_off
         |  FROM sp WHERE text IS NOT NULL
         |)
         |SELECT doc_id, split, quality, n_tokens,
         |       start_off // 512 AS block_id, start_off % 512 AS block_offset
         |FROM pk ORDER BY doc_id""".stripMargin
    },

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

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_group_sample" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (
        |           PARTITION BY lang, source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |) WHERE rn <= 3 ORDER BY lang, source, doc_id""".stripMargin,

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

    "q_random_projection" ->
      """SELECT vec_id, CAST(j AS INT) AS dim,
        |  CAST(list_sum(list_transform(range(1, 65), i ->
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT)
        |    * (1 - 2 * (CAST('0x' || substr(md5((i-1) || ':' || j), 1, 1) AS BIGINT) % 2))
        |  )) AS DOUBLE) / 10000000.0 AS value
        |FROM embeddings, range(0, 8) r(j)
        |WHERE vec_id < 200
        |ORDER BY vec_id, dim""".stripMargin,

    "q_chunk_text" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL AND doc_id < 300
        |), st AS (
        |  SELECT doc_id, toks,
        |         unnest(range(0, greatest(len(toks) - 1, 0) + 1, 15)) AS start
        |  FROM d
        |)
        |SELECT doc_id, CAST(start / 15 AS INT) AS chunk_id,
        |       array_to_string(toks[start + 1 : start + 20], ' ') AS chunk_text,
        |       CAST(len(toks[start + 1 : start + 20]) AS INT) AS n_chunk_tokens
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "q_bigram_logprob" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(2, len(toks) + 1),
        |                               i -> toks[i-1] || chr(1) || toks[i])) AS big
        |  FROM d WHERE len(toks) >= 2
        |), bc AS (
        |  SELECT big, count(*) AS c FROM bg GROUP BY big
        |), cc AS (
        |  SELECT string_split(big, chr(1))[1] AS prev, sum(c) AS ctx
        |  FROM bc GROUP BY 1
        |)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
        |       ROUND(avg(ln(CAST(bc.c AS DOUBLE)) - ln(CAST(cc.ctx AS DOUBLE))), 6)
        |         AS avg_bigram_logprob
        |FROM bg JOIN bc USING (big)
        |JOIN cc ON string_split(big, chr(1))[1] = cc.prev
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ppl_buckets" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(2, len(toks) + 1),
        |                               i -> toks[i-1] || chr(1) || toks[i])) AS big
        |  FROM d WHERE len(toks) >= 2
        |), bc AS (
        |  SELECT big, count(*) AS c FROM bg GROUP BY big
        |), cc AS (
        |  SELECT string_split(big, chr(1))[1] AS prev, sum(c) AS ctx
        |  FROM bc GROUP BY 1
        |), sc AS (
        |  SELECT bg.doc_id,
        |         ROUND(avg(ln(CAST(bc.c AS DOUBLE)) - ln(CAST(cc.ctx AS DOUBLE))), 6)
        |           AS avg_bigram_logprob
        |  FROM bg JOIN bc USING (big)
        |  JOIN cc ON string_split(big, chr(1))[1] = cc.prev
        |  GROUP BY bg.doc_id
        |), sl AS (
        |  SELECT sc.doc_id, docs.lang, sc.avg_bigram_logprob
        |  FROM sc JOIN documents docs USING (doc_id)
        |), b AS (
        |  SELECT lang,
        |         ROUND(quantile_cont(avg_bigram_logprob, 1.0/3), 6) AS b1,
        |         ROUND(quantile_cont(avg_bigram_logprob, 2.0/3), 6) AS b2
        |  FROM sl GROUP BY lang
        |)
        |SELECT sl.doc_id, sl.lang, sl.avg_bigram_logprob,
        |       CASE WHEN sl.avg_bigram_logprob <= b.b1 THEN 'tail'
        |            WHEN sl.avg_bigram_logprob <= b.b2 THEN 'middle'
        |            ELSE 'head' END AS ppl_bucket
        |FROM sl JOIN b USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "q_semantic_decontam" ->
      s"""WITH ev AS (
         |  SELECT embedding AS evv FROM embeddings WHERE vec_id % 97 = 0
         |), m AS (
         |  SELECT t.vec_id,
         |         ROUND(MAX(${duckCosine("t.embedding", "ev.evv")}), 6)
         |           AS max_eval_cosine
         |  FROM embeddings t, ev GROUP BY t.vec_id
         |)
         |SELECT e.vec_id, m.max_eval_cosine,
         |       COALESCE(m.max_eval_cosine >= 0.95, FALSE) AS contaminated
         |FROM embeddings e LEFT JOIN m USING (vec_id)
         |ORDER BY vec_id""".stripMargin,

    "q_semantic_drop" ->
      s"""WITH ev AS (
         |  SELECT embedding AS evv FROM embeddings WHERE vec_id % 97 = 0
         |), hit AS (
         |  SELECT DISTINCT t.vec_id
         |  FROM embeddings t, ev
         |  WHERE ${duckCosine("t.embedding", "ev.evv")} >= 0.95
         |)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT vec_id FROM hit)
         |ORDER BY vec_id""".stripMargin,

    "q_dsir" ->
      s"""WITH $duckDsirWeights
         |SELECT doc_id, log_weight FROM w ORDER BY doc_id""".stripMargin,

    "q_dsir_select" ->
      s"""WITH $duckDsirWeights
         |SELECT doc_id, log_weight,
         |       ROUND(LN(LN(1.0 / ((CAST(('0x' ||
         |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |           % 10000 + 0.5) / 10000.0))), 6) - log_weight AS sample_key
         |FROM w
         |ORDER BY sample_key, doc_id LIMIT 40""".stripMargin,

    "q_span_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), occ AS (
        |  SELECT doc_id, i AS gpos,
        |         md5(array_to_string(t[(i+1):(i+8)], ' ')) AS gh
        |  FROM base, unnest(range(0, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8
        |), marked AS (
        |  SELECT doc_id, gpos,
        |         count(*) OVER (PARTITION BY gh) AS freq,
        |         row_number() OVER (PARTITION BY gh ORDER BY doc_id, gpos) AS rn
        |  FROM occ
        |), covered AS (
        |  SELECT DISTINCT doc_id, gpos + i AS pos
        |  FROM marked, unnest(range(0, 8)) AS u(i)
        |  WHERE freq > 1 AND rn > 1
        |), toks AS (
        |  SELECT doc_id, i AS pos, t[i+1] AS tok
        |  FROM base, unnest(range(0, len(t))) AS u(i)
        |), kept AS (
        |  SELECT k.doc_id, k.pos, k.tok FROM toks k
        |  WHERE NOT EXISTS (SELECT 1 FROM covered c
        |                    WHERE c.doc_id = k.doc_id AND c.pos = k.pos)
        |)
        |SELECT b.doc_id,
        |       CAST(len(b.t) AS INT) AS n_tokens,
        |       CAST(len(b.t) - count(k.tok) AS INT) AS removed_tokens,
        |       md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), ''))
        |         AS clean_md5
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |GROUP BY b.doc_id, len(b.t)
        |ORDER BY doc_id""".stripMargin,

    "q_nb_train" ->
      s"""WITH $duckNbModel
         |SELECT bucket, weight FROM model ORDER BY bucket""".stripMargin,

    "q_nb_score" ->
      s"""WITH $duckNbModel, toks AS (
         |  SELECT doc_id,
         |         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS bucket
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |        FROM documents WHERE text IS NOT NULL)
         |)
         |SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
         |       ROUND(CAST(sum(CAST(m.weight AS DECIMAL(27,6))) AS DOUBLE)
         |             / count(*), 6) AS nb_logodds
         |FROM toks t JOIN model m USING (bucket)
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "q_shuffle_shards" ->
      """SELECT doc_id,
        |       CAST(CAST(('0x' || substr(md5('shard:ep0:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |                 AS BIGINT) % 16 AS INT) AS shard,
        |       md5('order:ep0:' || CAST(doc_id AS VARCHAR)) AS sort_key
        |FROM documents ORDER BY doc_id""".stripMargin,

    // chr(1)-joined, chr(0)-for-NULL row digest summed per shard — the
    // same bytes Spark's concat_ws(u0001, coalesce(..., u0000)) hashes
    "q_shard_manifest" ->
      """WITH sh AS (
        |  SELECT CAST(CAST(('0x' || substr(md5('shard:ep0:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) % 16 AS INT) AS shard,
        |         CAST(CAST(('0x' || substr(md5(
        |           COALESCE(CAST(doc_id AS VARCHAR), chr(0)) || chr(1) ||
        |           COALESCE(text, chr(0)) || chr(1) ||
        |           COALESCE(lang, chr(0)) || chr(1) ||
        |           COALESCE(source, chr(0)) || chr(1) ||
        |           COALESCE(CAST(n_chars AS VARCHAR), chr(0))
        |         ), 1, 15)) AS BIGINT) AS DECIMAL(20,0)) AS d
        |  FROM documents
        |)
        |SELECT shard, count(*) AS n_rows,
        |       CAST(sum(d) % 1152921504606846883 AS BIGINT) AS checksum
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q_content_overlap" ->
      """WITH da AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 2 = 0
        |), db AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 2 = 1
        |), s AS (
        |  SELECT count(*) AS n_shared FROM da WHERE h IN (SELECT h FROM db)
        |)
        |SELECT CAST((SELECT count(*) FROM da) AS BIGINT) AS n_a,
        |       CAST((SELECT count(*) FROM db) AS BIGINT) AS n_b,
        |       CAST(n_shared AS BIGINT) AS n_shared,
        |       ROUND(CAST(n_shared AS DOUBLE) /
        |             ((SELECT count(*) FROM da) + (SELECT count(*) FROM db) - n_shared), 6) AS jaccard,
        |       ROUND(CAST(n_shared AS DOUBLE) / (SELECT count(*) FROM da), 6) AS containment_a,
        |       ROUND(CAST(n_shared AS DOUBLE) / (SELECT count(*) FROM db), 6) AS containment_b
        |FROM s""".stripMargin,

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

    "q_kfold" ->
      """SELECT CAST(CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 % 5 AS INT) AS fold,
        |       count(*) AS n,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_corpus_report" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
        |  CAST(SUM(CASE WHEN text IS NOT NULL
        |                THEN len(string_split(lower(text), ' ')) ELSE 0 END) AS BIGINT)
        |    AS total_tokens,
        |  ROUND(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
        |        / (count(*) - SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)), 6)
        |    AS dup_fraction,
        |  ROUND(CAST(SUM(CASE WHEN text IS NOT NULL
        |                      THEN len(string_split(lower(text), ' ')) ELSE 0 END) AS DOUBLE)
        |        / (count(*) - SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)), 6)
        |    AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_script_profile" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    length(text) - length(regexp_replace(text,
        |      '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS lat,
        |    length(text) - length(regexp_replace(text,
        |      '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS cjk,
        |    length(text) - length(regexp_replace(text,
        |      '[\x{0400}-\x{04FF}]', '', 'g')) AS cyr,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
        |    length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS spc
        |  FROM documents WHERE doc_id < 300
        |)
        |SELECT doc_id, CAST(COALESCE(n, 0) AS INT) AS n_chars,
        |  CASE WHEN n > 0 THEN round(CAST(lat AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_latin,
        |  CASE WHEN n > 0 THEN round(CAST(cjk AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_cjk,
        |  CASE WHEN n > 0 THEN round(CAST(cyr AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_cyrillic,
        |  CASE WHEN n > 0 THEN round(CAST(dig AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_digit,
        |  CASE WHEN n > 0 THEN round(CAST(spc AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_space,
        |  CASE WHEN n > 0 THEN round(CAST(n - lat - cjk - cyr - dig - spc AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_other
        |FROM d ORDER BY doc_id""".stripMargin,

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

    "q_linkage_score" -> {
      val (ha, hd) = FsW("agree_head")
      val (la, ld) = FsW("agree_lang")
      val (sa, sd) = FsW("agree_source")
      val (na, nd) = FsW("agree_len")
      s"""WITH r AS (
         |  SELECT doc_id, k, substr(k, 1, 3) AS blk,
         |         row_number() OVER (
         |           PARTITION BY substr(k, 1, 3) ORDER BY k, doc_id) AS rn
         |  FROM (SELECT doc_id, lower(trim(substr(text, 1, 40))) AS k
         |        FROM documents WHERE text IS NOT NULL)
         |), p AS (
         |  SELECT CASE WHEN a.doc_id <= b.doc_id THEN a.doc_id ELSE b.doc_id END AS id_a,
         |         CASE WHEN a.doc_id <= b.doc_id THEN b.doc_id ELSE a.doc_id END AS id_b,
         |         levenshtein(a.k, b.k) AS dist
         |  FROM r a JOIN r b
         |    ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4
         |), j AS (
         |  SELECT p.id_a, p.id_b,
         |         (CASE WHEN p.dist IS NULL THEN 0.0
         |               WHEN p.dist <= 5 THEN $ha ELSE $hd END
         |        + CASE WHEN da.lang IS NULL OR db.lang IS NULL THEN 0.0
         |               WHEN da.lang = db.lang THEN $la ELSE $ld END
         |        + CASE WHEN da.source IS NULL OR db.source IS NULL THEN 0.0
         |               WHEN da.source = db.source THEN $sa ELSE $sd END
         |        + CASE WHEN da.n_chars IS NULL OR db.n_chars IS NULL THEN 0.0
         |               WHEN abs(da.n_chars - db.n_chars) <= 20 THEN $na ELSE $nd END)
         |           AS w
         |  FROM p JOIN documents da ON p.id_a = da.doc_id
         |         JOIN documents db ON p.id_b = db.doc_id
         |)
         |SELECT id_a, id_b, round(w, 6) AS match_weight
         |FROM j WHERE round(w, 6) > 0 ORDER BY id_a, id_b""".stripMargin
    },

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

    "q_zipf" ->
      """WITH u AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT w, count(*) AS c FROM u GROUP BY w
        |  ORDER BY c DESC, w LIMIT 500
        |), r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM c
        |), t AS (
        |  SELECT
        |    CAST(round(ln(CAST(rk AS DOUBLE)), 12) AS DECIMAL(28,12)) AS x,
        |    CAST(round(ln(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12)) AS y,
        |    CAST(round(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE)), 12)
        |         AS DECIMAL(28,12)) AS xx,
        |    CAST(round(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 12)
        |         AS DECIMAL(28,12)) AS yy,
        |    CAST(round(ln(CAST(rk AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 12)
        |         AS DECIMAL(28,12)) AS xy
        |  FROM r
        |), s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |         CAST(SUM(xx) AS DOUBLE) AS sxx, CAST(SUM(yy) AS DOUBLE) AS syy,
        |         CAST(SUM(xy) AS DOUBLE) AS sxy
        |  FROM t
        |)
        |SELECT CAST(n AS BIGINT) AS n_ranks,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
        |         AS intercept,
        |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |             ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,

    "q_collocations" ->
      """WITH d AS (
        |  SELECT string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), u AS (
        |  SELECT unnest(toks) AS w FROM d
        |), uc AS (
        |  SELECT w, count(*) AS c FROM u GROUP BY w
        |), bg AS (
        |  SELECT unnest(CASE WHEN len(toks) >= 2
        |       THEN list_transform(range(2, len(toks) + 1),
        |                           i -> toks[i-1] || chr(1) || toks[i])
        |       ELSE CAST([] AS VARCHAR[]) END) AS g
        |  FROM d
        |), bc AS (
        |  SELECT string_split(g, chr(1))[1] AS w1,
        |         string_split(g, chr(1))[2] AS w2,
        |         count(*) AS np
        |  FROM bg GROUP BY 1, 2
        |), tot AS (
        |  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM u) AS nu,
        |         (SELECT CAST(COALESCE(SUM(np), 0) AS DOUBLE) FROM bc) AS nb
        |)
        |SELECT w1, w2, CAST(np AS BIGINT) AS n_pair,
        |       round(ln((CAST(np AS DOUBLE) / nb) /
        |                ((CAST(c1.c AS DOUBLE) / nu) *
        |                 (CAST(c2.c AS DOUBLE) / nu))), 6) AS pmi
        |FROM bc JOIN uc c1 ON bc.w1 = c1.w JOIN uc c2 ON bc.w2 = c2.w, tot
        |WHERE np >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 100""".stripMargin,

    "q_temporal_split" ->
      """SELECT CASE WHEN epoch_us(ts) < 1705708800000000 THEN 'train'
        |            WHEN epoch_us(ts) >= 1705795200000000 THEN 'test'
        |            ELSE 'embargo' END AS split,
        |       event_type, count(*) AS n_events,
        |       min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_vocab_divergence" ->
      """WITH c AS (
        |  SELECT t, SUM(CASE WHEN g = 'en' THEN 1 ELSE 0 END) AS ca,
        |            SUM(CASE WHEN g = 'de' THEN 1 ELSE 0 END) AS cb
        |  FROM (SELECT lang AS g, unnest(string_split(lower(text), ' ')) AS t
        |        FROM documents WHERE lang IN ('en', 'de') AND text IS NOT NULL)
        |  GROUP BY t
        |), tot AS (
        |  SELECT CAST(SUM(ca) AS DOUBLE) AS na, CAST(SUM(cb) AS DOUBLE) AS nb,
        |         CAST(COUNT(*) AS DOUBLE) AS v,
        |         SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS va,
        |         SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS vb,
        |         SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS vs
        |  FROM c
        |), pq AS (
        |  SELECT (CAST(ca AS DOUBLE) + 0.5) / (na + 0.5 * v) AS p,
        |         (CAST(cb AS DOUBLE) + 0.5) / (nb + 0.5 * v) AS q,
        |         va, vb, vs
        |  FROM c, tot
        |), terms AS (
        |  SELECT CAST(round(p * ln(p / q), 12) AS DECIMAL(28,12)) AS kab,
        |         CAST(round(q * ln(q / p), 12) AS DECIMAL(28,12)) AS kba,
        |         CAST(round(p * ln(p / ((p + q) / 2.0)) / 2 +
        |                    q * ln(q / ((p + q) / 2.0)) / 2, 12)
        |              AS DECIMAL(28,12)) AS jt,
        |         va, vb, vs
        |  FROM pq
        |)
        |SELECT CAST(va AS BIGINT) AS n_vocab_a, CAST(vb AS BIGINT) AS n_vocab_b,
        |       CAST(vs AS BIGINT) AS n_vocab_shared,
        |       round(CAST(SUM(kab) AS DOUBLE), 6) AS kl_ab,
        |       round(CAST(SUM(kba) AS DOUBLE), 6) AS kl_ba,
        |       round(CAST(SUM(jt) AS DOUBLE), 6) AS jsd
        |FROM terms GROUP BY 1, 2, 3""".stripMargin,

    "q_snm_pairs" ->
      """WITH r AS (
        |  SELECT doc_id, k, substr(k, 1, 3) AS blk,
        |         row_number() OVER (
        |           PARTITION BY substr(k, 1, 3) ORDER BY k, doc_id) AS rn
        |  FROM (SELECT doc_id, lower(trim(substr(text, 1, 40))) AS k
        |        FROM documents WHERE text IS NOT NULL)
        |)
        |SELECT CASE WHEN a.doc_id <= b.doc_id THEN a.doc_id ELSE b.doc_id END AS id_a,
        |       CASE WHEN a.doc_id <= b.doc_id THEN b.doc_id ELSE a.doc_id END AS id_b,
        |       CASE WHEN a.doc_id <= b.doc_id THEN a.k ELSE b.k END AS key_a,
        |       CASE WHEN a.doc_id <= b.doc_id THEN b.k ELSE a.k END AS key_b,
        |       CAST(levenshtein(a.k, b.k) AS INT) AS dist
        |FROM r a JOIN r b
        |  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4
        |WHERE levenshtein(a.k, b.k) <= 12
        |ORDER BY id_a, id_b""".stripMargin,

    "q_tfidf_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents WHERE text IS NOT NULL AND doc_id < 300
        |), tf AS (
        |  SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfq AS (
        |  SELECT t, count(*) AS df FROM tf GROUP BY 1
        |), w AS (
        |  SELECT tf.doc_id, tf.t,
        |         CAST(FLOOR(CAST(tf AS DOUBLE) * ln(300.0 / df) * 100000) AS BIGINT) AS q
        |  FROM tf JOIN dfq USING (t) WHERE df <= 0.5 * 300
        |), nrm AS (
        |  SELECT doc_id, SUM(q*q) AS ss FROM w GROUP BY 1
        |), dots AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.q * b.q) AS dot
        |  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT id_a, id_b,
        |         ROUND(CAST(dot AS DOUBLE) /
        |               (sqrt(CAST(x.ss AS DOUBLE)) * sqrt(CAST(y.ss AS DOUBLE))), 6) AS cosine
        |  FROM dots JOIN nrm x ON x.doc_id = id_a JOIN nrm y ON y.doc_id = id_b
        |)
        |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

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

    "q_heavy_hitters" ->
      """SELECT user_id, event_type, n, CAST(rank AS INT) AS rank FROM (
        |  SELECT user_id, event_type, count(*) AS n,
        |         row_number() OVER (
        |           PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rank
        |  FROM events WHERE user_id < 50 GROUP BY user_id, event_type
        |) WHERE rank <= 2 ORDER BY user_id, rank""".stripMargin,

    "q_dedup_incremental" ->
      s"""WITH $duckMinHashCommon, cs AS (
         |  SELECT doc_id, sig FROM sg WHERE doc_id < 250
         |), bs AS (
         |  SELECT doc_id, sig FROM sg WHERE doc_id >= 250
         |), cbd AS (
         |  SELECT doc_id, unnest(list_transform(range(0, 4), b ->
         |    md5(array_to_string(sig[b*4+1:b*4+4], '|')))) AS band FROM cs
         |), bbd AS (
         |  SELECT doc_id, unnest(list_transform(range(0, 4), b ->
         |    md5(array_to_string(sig[b*4+1:b*4+4], '|')))) AS band FROM bs
         |), cmn AS (SELECT band, min(doc_id) AS cid FROM cbd GROUP BY band),
         |acorp AS (SELECT DISTINCT b.doc_id FROM bs b JOIN cs c ON b.sig = c.sig),
         |bpair AS (SELECT DISTINCT bb.doc_id, m.cid
         |          FROM bbd bb JOIN cmn m ON bb.band = m.band),
         |bnear AS (
         |  SELECT DISTINCT p.doc_id FROM bpair p
         |  JOIN cs c ON c.doc_id = p.cid JOIN bs b ON b.doc_id = p.doc_id
         |  WHERE len(list_filter(range(1, 17), i -> b.sig[i] = c.sig[i])) / 16.0 >= 0.9
         |), ex2 AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY sig) AS m FROM bs
         |  ) WHERE doc_id > m
         |), bmn AS (SELECT band, min(doc_id) AS bmin FROM bbd GROUP BY band),
         |bpr2 AS (SELECT DISTINCT m.bmin AS ia, b.doc_id AS ib
         |         FROM bbd b JOIN bmn m ON b.band = m.band AND b.doc_id > m.bmin),
         |bcl AS (
         |  SELECT DISTINCT ib FROM bpr2
         |  JOIN bs x ON x.doc_id = ia JOIN bs y ON y.doc_id = ib
         |  WHERE len(list_filter(range(1, 17), i -> x.sig[i] = y.sig[i])) / 16.0 >= 0.9
         |), losers AS (
         |  SELECT doc_id FROM acorp UNION SELECT doc_id FROM bnear
         |  UNION SELECT doc_id FROM ex2 UNION SELECT ib AS doc_id FROM bcl
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    "q_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), d AS (
        |  SELECT doc_id, len(toks) AS dl FROM docs
        |), st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM d
        |), m AS (
        |  SELECT doc_id, term
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
        |  WHERE term IN ('spark', 'shuffle', 'dup')
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM m GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |  FROM m GROUP BY 1
        |), per AS (
        |  SELECT tf.doc_id,
        |         CAST(ROUND(
        |           ln(1.0 + ((SELECT n FROM st) - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |           (CAST(tf.tf AS DOUBLE) * 2.2) /
        |           (CAST(tf.tf AS DOUBLE) +
        |            1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) /
        |                          (SELECT avgdl FROM st))),
        |           6) AS DECIMAL(18,6)) AS s
        |  FROM tf JOIN dfq USING (term) JOIN d USING (doc_id)
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_terms_matched,
        |         CAST(sum(s) AS DOUBLE) AS bm25
        |  FROM per GROUP BY 1
        |)
        |SELECT d.doc_id, CAST(d.dl AS INT) AS dl,
        |       coalesce(a.n_terms_matched, 0) AS n_terms_matched,
        |       coalesce(a.bm25, 0.0) AS bm25
        |FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH parts AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS unit,
        |         unnest(range(len(string_split(text, ' ')))) AS pos
        |  FROM documents WHERE text IS NOT NULL
        |), hot AS (
        |  SELECT unit FROM (
        |    SELECT unit, count(DISTINCT doc_id) AS d FROM parts GROUP BY 1
        |  ) WHERE d > 100
        |), kept AS (
        |  SELECT * FROM parts WHERE unit NOT IN (SELECT unit FROM hot)
        |), totals AS (
        |  SELECT doc_id, count(*) AS nu FROM parts GROUP BY 1
        |), reb AS (
        |  SELECT doc_id, string_agg(unit, ' ' ORDER BY pos) AS text_clean,
        |         count(*) AS nk
        |  FROM kept GROUP BY 1
        |)
        |SELECT t.doc_id, coalesce(r.text_clean, '') AS text_clean,
        |       CAST(t.nu AS INT) AS n_units,
        |       CAST(t.nu - coalesce(r.nk, 0) AS INT) AS n_removed
        |FROM totals t LEFT JOIN reb r USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_rows FROM documents GROUP BY 1
        |), p AS (
        |  SELECT lang, n_rows,
        |         CAST(ROUND(pow(CAST(n_rows AS DOUBLE), 0.5), 6)
        |              AS DECIMAL(28,6)) AS pw
        |  FROM c
        |), tot AS (
        |  SELECT CAST(sum(n_rows) AS DOUBLE) AS nn,
        |         CAST(sum(pw) AS DOUBLE) AS sp
        |  FROM p
        |), mix AS (
        |  SELECT lang, n_rows,
        |         ROUND(CAST(n_rows AS DOUBLE) / (SELECT nn FROM tot), 6)
        |           AS natural_share,
        |         ROUND(CAST(pw AS DOUBLE) / (SELECT sp FROM tot), 6)
        |           AS temp_share,
        |         ROUND(CAST(pw AS DOUBLE) / (SELECT sp FROM tot) *
        |               ((SELECT nn FROM tot) / CAST(n_rows AS DOUBLE)), 6)
        |           AS weight
        |  FROM p
        |), rep AS (
        |  SELECT d.lang,
        |         CAST(floor(m.weight) AS BIGINT) +
        |         CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
        |                        AS BIGINT) % 10000
        |                   < CAST(ROUND((m.weight - floor(m.weight)) * 10000, 0)
        |                          AS BIGINT)
        |              THEN 1 ELSE 0 END AS reps
        |  FROM documents d JOIN mix m USING (lang)
        |), aft AS (
        |  SELECT lang, CAST(sum(reps) AS BIGINT) AS n_after FROM rep GROUP BY 1
        |)
        |SELECT m.lang, m.n_rows, m.natural_share, m.temp_share, m.weight,
        |       CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after
        |FROM mix m LEFT JOIN aft a USING (lang) ORDER BY m.lang""".stripMargin,

    "q_hll_distinct" ->
      """SELECT lang, count(DISTINCT source) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_nfc" ->
      ("SELECT doc_id, md5(nfc_normalize(text || ' café')) AS h_nfc " +
        "FROM documents ORDER BY doc_id"),

    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $duckMinHashCommon, e AS (
         |  SELECT ia AS a, ib AS b FROM cl WHERE est >= 0.9
         |  UNION
         |  SELECT ib AS a, ia AS b FROM cl WHERE est >= 0.9
         |  UNION
         |  SELECT sig_min AS a, doc_id AS b FROM ex WHERE doc_id > sig_min
         |  UNION
         |  SELECT doc_id AS a, sig_min AS b FROM ex WHERE doc_id > sig_min
         |), reach AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst
         |), comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src
         |), ranked AS (
         |  SELECT c.id, c.component,
         |         row_number() OVER (
         |           PARTITION BY c.component
         |           ORDER BY d.n_chars DESC, c.id) AS rn
         |  FROM comp c JOIN documents d ON d.doc_id = c.id
         |), losers AS (
         |  SELECT id FROM ranked WHERE rn > 1
         |)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    "q_budget_select" ->
      """WITH scored AS (
        |  SELECT doc_id, n_chars,
        |         CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens
        |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
        |), c AS (
        |  SELECT doc_id, n_chars, n_tokens,
        |         CAST(sum(CAST(n_tokens AS BIGINT)) OVER (
        |           ORDER BY n_chars DESC, doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM scored
        |)
        |SELECT doc_id, n_chars, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 8000 ORDER BY cum_tokens""".stripMargin,

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
        |       ROUND(CAST(sum(contrib) AS DOUBLE), 6) AS psi
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
        |       ROUND(CAST(sum(contrib) AS DOUBLE), 6) AS psi
        |FROM terms GROUP BY 1, 2""".stripMargin,

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
        |ORDER BY l_id, r_id""".stripMargin,

    "q_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, lang, source, n_chars,
        |         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |               AS BIGINT) % 10000 + 0.5) / 10000.0 AS u
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0
        |)
        |SELECT doc_id, lang, source,
        |       ROUND(POWER(u, 1.0 / CAST(n_chars AS DOUBLE)), 6)
        |         AS sample_score
        |FROM s
        |ORDER BY ROUND(LN(u), 6) / CAST(n_chars AS DOUBLE) DESC, doc_id
        |LIMIT 50""".stripMargin,

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

    "q_lsh_recall" ->
      s"""WITH ${duckMinHashCommonWhere(
           " AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 1000"
         )}, cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |  FROM bd a JOIN bd b ON a.band = b.band AND a.doc_id < b.doc_id
         |), s2 AS (
         |  SELECT doc_id, list_distinct(toks) AS st FROM d
         |), inv AS (
         |  SELECT doc_id, unnest(st) AS sh FROM s2
         |), shared AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
         |  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), sz AS (
         |  SELECT doc_id, len(st) AS n FROM s2
         |), truth AS (
         |  SELECT ia, ib FROM shared
         |  JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib
         |  WHERE CAST(c AS DOUBLE) / (x.n + y.n - c) >= 0.9
         |), hit AS (
         |  SELECT t.ia, t.ib FROM truth t
         |  WHERE EXISTS (SELECT 1 FROM cand c WHERE c.ia = t.ia AND c.ib = t.ib)
         |)
         |SELECT (SELECT count(*) FROM d) AS n_docs,
         |       (SELECT count(*) FROM truth) AS n_true_pairs,
         |       (SELECT count(*) FROM cand) AS n_candidate_pairs,
         |       (SELECT count(*) FROM hit) AS n_hit,
         |       ROUND(CAST((SELECT count(*) FROM hit) AS DOUBLE) /
         |             nullif((SELECT count(*) FROM truth), 0), 6) AS pair_recall,
         |       ROUND(CAST((SELECT count(*) FROM hit) AS DOUBLE) /
         |             nullif((SELECT count(*) FROM cand), 0), 6) AS pair_precision""".stripMargin,

    "q_mmr" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |         CAST((vec_id * 37) % 101 AS DOUBLE) AS rel
         |  FROM embeddings WHERE vec_id < 150
         |), c1 AS (
         |  SELECT vec_id, embedding, 0.75 * rel AS mmr FROM e
         |  ORDER BY 0.75 * rel DESC, vec_id LIMIT 1
         |), m1 AS (
         |  SELECT e.vec_id, e.embedding, e.rel,
         |         ${duckCosine("e.embedding", "c1.embedding")} AS ms
         |  FROM e, c1 WHERE e.vec_id != c1.vec_id
         |), c2 AS (
         |  SELECT vec_id, embedding, ms,
         |         0.75 * rel - (1.0 - 0.75) * ms AS mmr
         |  FROM m1 ORDER BY 0.75 * rel - (1.0 - 0.75) * ms DESC, vec_id LIMIT 1
         |), m2 AS (
         |  SELECT m1.vec_id, m1.rel,
         |         greatest(m1.ms,
         |                  ${duckCosine("m1.embedding", "c2.embedding")}) AS ms
         |  FROM m1, c2 WHERE m1.vec_id != c2.vec_id
         |), c3 AS (
         |  SELECT vec_id, 0.75 * rel - (1.0 - 0.75) * ms AS mmr
         |  FROM m2 ORDER BY 0.75 * rel - (1.0 - 0.75) * ms DESC, vec_id LIMIT 1
         |)
         |SELECT vec_id, CAST(0 AS INT) AS rank, ROUND(mmr, 6) AS mmr FROM c1
         |UNION ALL SELECT vec_id, CAST(1 AS INT), ROUND(mmr, 6) FROM c2
         |UNION ALL SELECT vec_id, CAST(2 AS INT), ROUND(mmr, 6) FROM c3
         |ORDER BY rank""".stripMargin,

    "q_kcenter" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
         |), c1 AS (
         |  SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1
         |), d1 AS (
         |  SELECT e.vec_id, e.embedding,
         |         ${duckSqDist("e.embedding", "c1.embedding")} AS mind
         |  FROM e, c1
         |), c2 AS (
         |  SELECT vec_id, embedding FROM d1 ORDER BY mind DESC, vec_id LIMIT 1
         |), d2 AS (
         |  SELECT d1.vec_id,
         |         least(d1.mind,
         |               ${duckSqDist("d1.embedding", "c2.embedding")}) AS mind
         |  FROM d1, c2
         |), c3 AS (
         |  SELECT vec_id FROM d2 ORDER BY mind DESC, vec_id LIMIT 1
         |)
         |SELECT vec_id, CAST(0 AS INT) AS center_rank FROM c1
         |UNION ALL SELECT vec_id, CAST(1 AS INT) FROM c2
         |UNION ALL SELECT vec_id, CAST(2 AS INT) FROM c3
         |ORDER BY center_rank""".stripMargin,

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
