package graft

import graft.operators.Cohort
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Goldens for the cohort module (reference has no test file for it; shapes
  * follow the `cohort_construction.py` docstring examples). */
class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def cohort = Seq(
    (1, Some("id_001"), 30),
    (2, Some("id_002"), 70),
    (3, None, 40)
  ).toDF("row_id", "person_id", "age")

  private val criteria = Seq(
    "valid_id" -> "person_id IS NOT NULL",
    "age_ok" -> "age < 65"
  )

  test("applyInclusionCriteria filters to rows passing all criteria") {
    val got = Cohort.applyInclusionCriteria(cohort, criteria)
    checkRows(got, Seq(Row(1, "id_001", 30)))
    assert(got.columns.toSeq == Seq("row_id", "person_id", "age"))
  }

  test("dropInclusionFlags=false keeps flag and criteria columns") {
    val got =
      Cohort.applyInclusionCriteria(cohort, criteria, dropInclusionFlags = false)
    assert(
      got.columns.toSeq == Seq(
        "row_id", "person_id", "age",
        "valid_id", "age_ok", "criteria_0", "criteria_1", "criteria_2", "include"
      )
    )
    checkRows(
      got.select("row_id", "valid_id", "age_ok", "include"),
      Seq(Row(1, true, true, true))
    )
  }

  test("non-deterministic criteria filter on include so flags stay consistent") {
    // rand()-based sampling criterion: re-evaluating the raw expression in
    // the filter would let surviving rows disagree with their flag columns;
    // the fallback filters on the computed `include` flag instead.
    val many = spark.range(2000).toDF("row_id")
      .withColumn("person_id", col("row_id"))
    val got = Cohort
      .applyInclusionCriteria(
        many,
        Seq("sampled" -> "rand(7) < 0.5", "even" -> "row_id % 2 = 0"),
        dropInclusionFlags = false
      )
      .select("sampled", "even", "include")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2),
        "surviving row disagrees with its flag columns")
    }
  }

  test("createInclusionColumns null expression results become false") {
    val flagged = Cohort.createInclusionColumns(cohort, criteria)
    checkRows(
      flagged.select("row_id", "valid_id", "age_ok", "criteria_1", "criteria_2", "include"),
      Seq(
        Row(1, true, true, true, true, true),
        Row(2, true, false, true, false, false),
        // person_id NULL: "age < 65" true but valid_id false
        Row(3, false, true, false, false, false)
      )
    )
  }

  test("createInclusionFlowchart counts rows/ids and deltas per step") {
    val flagged = Cohort.createInclusionColumns(cohort, criteria)
    val fc = Cohort.createInclusionFlowchart(flagged, criteria)
    checkRows(
      fc,
      Seq(
        Row(0, "criteria_0", "Original table", "", 3L, 2L, null, null),
        Row(1, "criteria_1", "valid_id", "person_id IS NOT NULL", 2L, 2L, 1, 0),
        Row(2, "criteria_2", "age_ok", "age < 65", 1L, 1L, 1, 1)
      )
    )
    assert(
      fc.columns.toSeq == Seq(
        "criteria_index", "criteria", "description", "expression",
        "n_row", "n_distinct_id", "excluded_rows", "excluded_ids"
      )
    )
  }

  test("flowchart n_distinct_id counts nulls out (countDistinct ignores null)") {
    // criteria_0 passes all 3 rows but only 2 distinct non-null person_ids
    val flagged = Cohort.createInclusionColumns(cohort, criteria)
    val fc = Cohort.createInclusionFlowchart(flagged, criteria)
    val base = fc.filter(col("criteria_index") === 0).collect()(0)
    assert(base.getLong(4) == 3L)
    assert(base.getLong(5) == 2L)
  }

  test("flowchartSink receives the flowchart during apply") {
    var captured: Option[Array[Row]] = None
    Cohort.applyInclusionCriteria(
      cohort, criteria,
      flowchartSink = Some(df => captured = Some(df.collect()))
    )
    assert(captured.get.length == 3)
  }

  test("flowchart uses a broadcast join for criterion metadata (plan guard)") {
    val flagged = Cohort.createInclusionColumns(cohort, criteria)
    val fc = Cohort.createInclusionFlowchart(flagged, criteria)
    assertPlanContains(fc, "BroadcastHashJoin")
  }

  test("validation: conflicting columns raise") {
    val bad = cohort.withColumn("include", lit(true))
    intercept[IllegalArgumentException] {
      Cohort.applyInclusionCriteria(bad, criteria)
    }
    val bad2 = cohort.withColumn("criteria_1", lit(true))
    intercept[IllegalArgumentException] {
      Cohort.applyInclusionCriteria(bad2, criteria)
    }
    intercept[IllegalArgumentException] {
      Cohort.applyInclusionCriteria(cohort.withColumn("valid_id", lit(1)), criteria)
    }
  }

  test("validation: missing id columns raise") {
    intercept[IllegalArgumentException] {
      Cohort.applyInclusionCriteria(
        cohort.drop("person_id"), Seq("c" -> "age > 0")
      )
    }
  }

  test("validation: duplicate criteria names raise") {
    intercept[IllegalArgumentException] {
      Cohort.applyInclusionCriteria(
        cohort, Seq("c" -> "age > 0", "c" -> "age < 100")
      )
    }
  }

  test("end-to-end on orders table (row_id=o_orderkey, person_id=o_custkey)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val crits = Seq(
      "status_ok" -> "o_orderstatus IN ('O', 'F')",
      "big" -> "o_totalprice > 100000"
    )
    val got = Cohort.applyInclusionCriteria(
      orders, crits, rowIdCol = "o_orderkey", personIdCol = "o_custkey"
    )
    val expected = orders
      .filter(col("o_orderstatus").isin("O", "F") && col("o_totalprice") > 100000)
    assert(got.count() == expected.count())
    assert(got.count() > 0)
  }
}
