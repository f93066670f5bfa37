package graft

import graft.operators.Privacy
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors reference `tests/test_data_privacy.py`. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("roundCountsToMultiple rounds HALF_UP to multiple of 5") {
    val df = Seq((1, 7), (2, 17), (3, 22)).toDF("id", "count")
    val got = Privacy.roundCountsToMultiple(df, Seq("count"), 5)
    checkRows(got, Seq(Row(1, 5L), Row(2, 15L), Row(3, 20L)))
  }

  test("roundCountsToMultiple multiple columns") {
    val df = Seq((1, 7, 12), (2, 17, 18)).toDF("id", "c1", "c2")
    val got = Privacy.roundCountsToMultiple(df, Seq("c1", "c2"), 5)
    checkRows(got, Seq(Row(1, 5L, 10L), Row(2, 15L, 20L)))
  }

  test("kAnonymize keeps exactly the rows in groups of size >= k") {
    val df = Seq(
      (1, "us", "a"), (2, "us", "a"), (3, "us", "a"), // group of 3
      (4, "us", "b"), (5, "us", "b"),                 // group of 2
      (6, "de", "a")                                  // group of 1
    ).toDF("id", "country", "seg")
    val got = Privacy
      .kAnonymize(df, Seq("country", "seg"), k = 2)
      .select("id").collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(1, 2, 3, 4, 5))
    val strict = Privacy
      .kAnonymize(df, Seq("country", "seg"), k = 3)
      .select("id").collect().map(_.getInt(0)).sorted
    assert(strict.toSeq == Seq(1, 2, 3))
    // every surviving quasi-combination really occurs >= k times
    val sizes = Privacy
      .kAnonymize(df, Seq("country", "seg"), k = 2)
      .groupBy("country", "seg").count().collect().map(_.getLong(2))
    assert(sizes.forall(_ >= 2))
  }

  test("kAnonymityViolations reports the suppressed groups with sizes") {
    val df = Seq(
      (1, "us", "a"), (2, "us", "a"), (3, "us", "b"), (4, "de", "a")
    ).toDF("id", "country", "seg")
    val got = Privacy
      .kAnonymityViolations(df, Seq("country", "seg"), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(("de", "a", 1L), ("us", "b", 1L)))
  }

  test("kAnonymize validates its arguments") {
    val df = Seq((1, "x")).toDF("id", "c")
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq("c"), 0))
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq.empty, 2))
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq("nope"), 2))
  }

  test("roundCountsToMultiple properties: divisible and within half-multiple") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(30)((rnd.nextInt(1000000), 1 + rnd.nextInt(100)))
    // one Spark job for all samples: each sample is a row
    val df = samples.zipWithIndex
      .map { case ((x, m), i) => (i, x, m) }
      .toDF("i", "count", "m")
    samples.groupBy(_._2).foreach { case (m, group) =>
      val sub = df.filter(col("m") === m).select("i", "count")
      val rounded = Privacy.roundCountsToMultiple(sub, Seq("count"), m)
      rounded.collect().foreach { r =>
        val x = samples(r.getInt(0))._1
        val v = r.getLong(1)
        assert(v % m == 0)
        assert(math.abs(x - v) <= m / 2.0 + 1e-9)
      }
    }
  }

  test("roundCountsToMultiple error paths") {
    val df = Seq((1, 7)).toDF("id", "count")
    intercept[IllegalArgumentException] {
      Privacy.roundCountsToMultiple(df, Seq("missing"), 5)
    }
    intercept[IllegalArgumentException] {
      Privacy.roundCountsToMultiple(df, Seq("count"), 0)
    }
  }

  test("redactLowCounts nulls values below threshold (incl. null input)") {
    val df = Seq((1, Some(7)), (2, Some(17)), (3, None)).toDF("id", "count")
    val got = Privacy.redactLowCounts(df, Seq("count"), 10)
    checkRows(got, Seq(Row(1, null), Row(2, 17), Row(3, null)))
  }

  test("redactLowCounts with int redaction value") {
    val df = Seq((1, 7), (2, 17)).toDF("id", "count")
    val got = Privacy.redactLowCounts(df, Seq("count"), 10, Some(0))
    checkRows(got, Seq(Row(1, 0), Row(2, 17)))
  }

  test("redactLowCounts with string redaction value widens column to string") {
    val df = Seq((1, 7), (2, 17)).toDF("id", "count")
    val got =
      Privacy.redactLowCounts(df, Seq("count"), 10, Some("[:REDACTED:]"))
    assert(got.schema("count").dataType.typeName == "string")
    checkRows(got, Seq(Row(1, "[:REDACTED:]"), Row(2, "17")))
  }

  test("redactLowCounts property: outputs >= threshold or redacted") {
    val df = (0 to 50).map(i => (i, i)).toDF("id", "count")
    val got = Privacy.redactLowCounts(df, Seq("count"), 10).collect()
    got.foreach { r =>
      assert(r.isNullAt(1) || r.getInt(1) >= 10)
    }
  }

  test("redactLowCounts error paths") {
    val df = Seq((1, 7)).toDF("id", "count")
    intercept[IllegalArgumentException] {
      Privacy.redactLowCounts(df, Seq("count"), 0)
    }
    intercept[IllegalArgumentException] {
      Privacy.redactLowCounts(df, Seq("nope"), 5)
    }
  }

  test("transform chaining composes (reference integration shape)") {
    val df = Seq((1, 7), (2, 17)).toDF("id", "count")
    val got = df
      .transform(Privacy.roundCountsToMultiple(_, Seq("count"), 5))
      .transform(Privacy.redactLowCounts(_, Seq("count"), 10))
    checkRows(got, Seq(Row(1, null), Row(2, 15L)))
  }
}
