package graft

import graft.operators.TopN
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors reference `tests/test_data_aggregation.py`. */
class TopNSpec extends SparkSpec {
  import spark.implicits._

  private def grouped = Seq(
    ("A", 1), ("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)
  ).toDF("group", "value")

  test("firstRow keeps n rows per group by order") {
    val got = TopN.firstRow(
      grouped, n = 1, partitionBy = Seq(col("group")), orderBy = Seq(col("value"))
    )
    checkRows(got, Seq(Row("A", 1), Row("B", 4)))
  }

  test("firstRow n=2 with index column") {
    val got = TopN.firstRow(
      grouped, n = 2, partitionBy = Seq(col("group")), orderBy = Seq(col("value")),
      returnIndexColumn = true, indexColumnName = "row_number"
    )
    checkRows(
      got,
      Seq(Row("A", 1, 1), Row("A", 1, 2), Row("B", 4, 1), Row("B", 5, 2))
    )
  }

  test("firstRank keeps ties and produces gaps") {
    val got = TopN.firstRank(
      grouped, n = 2, partitionBy = Seq(col("group")), orderBy = Seq(col("value")),
      returnIndexColumn = true, indexColumnName = "rank_index"
    )
    // A: values 1,1 share rank 1; value 2 has rank 3 (> 2, excluded)
    checkRows(
      got,
      Seq(Row("A", 1, 1), Row("A", 1, 1), Row("B", 4, 1), Row("B", 5, 2))
    )
  }

  test("firstDenseRank keeps top n distinct values") {
    val got = TopN.firstDenseRank(
      grouped, n = 2, partitionBy = Seq(col("group")), orderBy = Seq(col("value")),
      returnIndexColumn = true, indexColumnName = "dense_rank_index"
    )
    checkRows(
      got,
      Seq(Row("A", 1, 1), Row("A", 1, 1), Row("A", 2, 2), Row("B", 4, 1), Row("B", 5, 2))
    )
  }

  test("global top-n without partition uses dummy column path") {
    val got = TopN.firstRow(grouped, n = 3, orderBy = Seq(col("value").desc))
    checkRows(got, Seq(Row("B", 6), Row("B", 5), Row("B", 4)))
    assert(!got.columns.contains("_dummy_column"))
  }

  test("dummy column collision raises") {
    val df = grouped.withColumn("_dummy_column", lit(9))
    intercept[IllegalArgumentException] {
      TopN.firstRow(df, n = 1, orderBy = Seq(col("value")))
    }
  }

  test("nulls are smallest by default; asc_nulls_last overrides") {
    val df = Seq(("A", Some(1)), ("A", None), ("B", Some(2))).toDF("group", "value")
    val defaults = TopN.firstRow(
      df, n = 1, partitionBy = Seq(col("group")), orderBy = Seq(col("value"))
    )
    checkRows(defaults, Seq(Row("A", null), Row("B", 2)))
    val nullsLast = TopN.firstRow(
      df, n = 1, partitionBy = Seq(col("group")),
      orderBy = Seq(col("value").asc_nulls_last)
    )
    checkRows(nullsLast, Seq(Row("A", 1), Row("B", 2)))
  }

  test("invalid method and invalid n raise") {
    intercept[IllegalArgumentException] {
      TopN.selectTopRows(grouped, "percentile", 1, Seq(col("group")), Seq(col("value")))
    }
    intercept[IllegalArgumentException] {
      TopN.selectTopRows(grouped, TopN.RowNumber, 0, Seq(col("group")), Seq(col("value")))
    }
  }

  test("physical plan uses WindowGroupLimit (top-k pushdown, perf guard)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val top = TopN.firstRow(
      li, n = 2, partitionBy = Seq(col("l_returnflag")),
      orderBy = Seq(col("l_extendedprice").desc, col("l_orderkey"))
    )
    assertPlanContains(top, "WindowGroupLimit")
  }
}
