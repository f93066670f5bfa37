package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for large corpora: exact, MinHash+LSH, SimHash, and exact
  * n-gram Jaccard (north-star extension; no reference counterpart —
  * SURVEY.md §7 `graft.scale`).
  *
  * Scale design:
  *   - Exact dedup is one hash shuffle on the key columns with a streaming
  *     row_number top-1 (`WindowGroupLimit` keeps it memory-bounded).
  *   - MinHash signatures/bands are computed per-row with higher-order
  *     functions — zero shuffle until the band join. Candidate generation
  *     shuffles only (bandKey, id, signature) pairs, never the documents:
  *     at 100 TB the band join moves ~B small rows per doc, and the final
  *     anti-join is a semi shuffle on the id column.
  *   - Verification (signature agreement / exact Jaccard) happens only on
  *     in-bucket candidate pairs, the standard LSH cost model.
  */
object Dedup {

  /** Keep exactly one row per distinct combination of `keyCols` — the first
    * under `tieBreak` ordering (deterministic, unlike dropDuplicates).
    * One shuffle; WindowGroupLimit prunes per partition before the sort. */
  def exactDedup(
      df: DataFrame,
      keyCols: Seq[String],
      tieBreak: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Candidate near-duplicate pairs (idA < idB) via MinHash + LSH banding,
    * with the estimated Jaccard from full-signature agreement.
    *
    * @param shingleK   word-shingle size (1 = order-insensitive token sets)
    * @param numHashes  signature length (bands * rowsPerBand must equal it)
    * @param portable   md5 signatures (oracle-portable) vs xxhash64 (faster)
    */
  def minHashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 1,
      numHashes: Int = 16,
      bands: Int = 4,
      portable: Boolean = true
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig =
      if (portable) minHashSignature(shingles(col(textCol), shingleK), numHashes)
      else minHashSignatureFast(shingles(col(textCol), shingleK), numHashes)

    val signed = df
      .select(col(idCol).as("__id"), sig.as("__sig"))
      .withColumn("__band", explode(lshBands(col("__sig"), bands, r)))

    val a = signed.select(
      col("__band"),
      col("__id").as("id_a"),
      col("__sig").as("sig_a")
    )
    val b = signed.select(
      col("__band"),
      col("__id").as("id_b"),
      col("__sig").as("sig_b")
    )
    a.join(b, Seq("__band"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        minHashSimilarity(col("sig_a"), col("sig_b")).as("est_jaccard")
      )
      .distinct()
  }

  /** Remove near-duplicates: a row is dropped iff some candidate pair links
    * it to a lower-id row with estimated Jaccard >= threshold. (One-hop
    * representative selection — the scalable standard for corpus dedup;
    * full transitive clustering would need iterative connected components.)
    */
  def dedupNearMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.9,
      shingleK: Int = 1,
      numHashes: Int = 16,
      bands: Int = 4,
      portable: Boolean = true
  ): DataFrame = {
    val losers = minHashCandidatePairs(
      df, idCol, textCol, shingleK, numHashes, bands, portable
    )
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as("__loser"))
      .distinct()
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /** Per-row 64-bit SimHash signatures (id, simhash). */
  def simHashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      simHash(tokens(col(textCol))).as("simhash")
    )

  /** Near-duplicate pairs by SimHash: bucket on 16-bit quarters (a pair
    * within hamming distance 3 of 64 bits must agree on at least one
    * quarter), then verify hamming <= maxHamming in-bucket. */
  def simHashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sigs = simHashSignatures(df, idCol, textCol)
      .select(col(idCol).as("__id"), col("simhash"))
    val banded = sigs.withColumn(
      "__band",
      explode(
        array((0 until 4).map { q =>
          concat_ws(
            ":",
            lit(q),
            shiftright(col("simhash"), q * 16).bitwiseAND(lit(0xffffL))
          )
        }: _*)
      )
    )
    val a = banded.select(col("__band"), col("__id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("__band"), col("__id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("__band"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        hammingDistance(col("sh_a"), col("sh_b")).as("hamming")
      )
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for pairs sharing at least one shingle,
    * via an inverted index join: explode distinct shingles, count shared
    * shingles per pair, join per-document set sizes. Returns pairs with
    * jaccard >= threshold. Shuffles (shingle, id) pairs — bounded by corpus
    * token count, never quadratic in documents. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 1,
      threshold: Double = 0.5
  ): DataFrame = {
    val sets = df.select(
      col(idCol).as("__id"),
      array_distinct(shingles(col(textCol), shingleK)).as("__set")
    )
    val sizes = sets.select(col("__id"), size(col("__set")).as("__n"))
    val inverted = sets.select(col("__id"), explode(col("__set")).as("__shingle"))

    val shared = inverted
      .join(inverted.select(col("__id").as("__id2"), col("__shingle")), Seq("__shingle"))
      .filter(col("__id") < col("__id2"))
      .groupBy("__id", "__id2")
      .agg(count(lit(1)).as("__shared"))

    shared
      .join(sizes, Seq("__id"))
      .join(
        sizes.select(col("__id").as("__id2"), col("__n").as("__n2")),
        Seq("__id2")
      )
      .select(
        col("__id").as("id_a"),
        col("__id2").as("id_b"),
        (col("__shared").cast("double") /
          (col("__n") + col("__n2") - col("__shared"))).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among candidates
    * sharing a hyperplane-LSH bucket (see Similarity.annTopK for the
    * bucketing rationale). */
  def embeddingDedupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Seq[Seq[Double]],
      threshold: Double = 0.95
  ): DataFrame = {
    import graft.functions.VectorFunctions._
    val bucketed = df.select(
      col(idCol).as("__id"),
      col(vecCol).as("__v"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket")
    )
    val a = bucketed.select(col("__bucket"), col("__id").as("id_a"), col("__v").as("v_a"))
    val b = bucketed.select(col("__bucket"), col("__id").as("id_b"), col("__v").as("v_b"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        cosineSimilarity(col("v_a"), col("v_b")).as("cosine")
      )
      .distinct()
      .filter(col("cosine") >= threshold)
  }
}
