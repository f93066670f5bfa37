package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test decontamination: find (and drop) training documents that
  * share any word n-gram with a held-out evaluation set — the standard
  * guard against benchmark leakage when assembling LLM training corpora
  * (north-star extension; no reference counterpart).
  *
  * Scale shape: the eval set is small by construction, so its distinct
  * n-gram set is broadcast; the training corpus streams once through
  * explode → broadcast-hash-semi-join → per-doc aggregate. No shuffle of
  * the corpus itself — only the (id, matched-gram) survivors reach the
  * aggregate, with map-side partial counts. At 100 TB the only full pass
  * is the n-gram explode, which is the irreducible work.
  */
object Decontam {

  /** Per-training-doc contamination report: every row of `train` with
    * `n_shared_grams` (distinct `n`-grams also present anywhere in `test`)
    * and a `contaminated` flag. Documents shorter than `n` tokens have no
    * n-grams and are never contaminated.
    */
  def contaminationReport(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val testGrams = broadcast(
      test
        .select(explode(shingles(col(textCol), n)).as("__gram"))
        .distinct()
    )
    val shared = train
      .select(col(idCol), array_distinct(shingles(col(textCol), n)).as("__g"))
      .select(col(idCol), explode(col("__g")).as("__gram"))
      .join(testGrams, Seq("__gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams"))
    train
      .join(shared, Seq(idCol), "left")
      .withColumn("n_shared_grams", coalesce(col("n_shared_grams"), lit(0L)))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** Drop contaminated training documents (anti-join against the ids any of
    * whose n-grams appear in `test`). */
  def decontaminate(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val testGrams = broadcast(
      test
        .select(explode(shingles(col(textCol), n)).as("__gram"))
        .distinct()
    )
    val contaminatedIds = train
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__gram"))
      .join(testGrams, Seq("__gram"), "left_semi")
      .select(idCol)
      .distinct()
    train.join(contaminatedIds, Seq(idCol), "left_anti")
  }
}
