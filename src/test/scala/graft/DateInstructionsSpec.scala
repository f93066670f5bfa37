package graft

import graft.functions.DateInstructions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors reference `tests/test_date_functions.py`. */
class DateInstructionsSpec extends SparkSpec {
  import spark.implicits._

  test("parseDateInstruction literal / null / passthrough branches") {
    assert(parseDateInstruction(null) == "cast(NULL as date)")
    assert(parseDateInstruction("2020-01-01") == "date('2020-01-01')")
    assert(parseDateInstruction("index_date") == "index_date")
    assert(parseDateInstruction("current_date()") == "current_date()")
  }

  test("parseDateInstruction unit conversions") {
    assert(
      parseDateInstruction("index_date + 5 days") ==
        "index_date + cast(round(5*1) as int)"
    )
    assert(
      parseDateInstruction("x - 6 weeks") == "x - cast(round(6*7) as int)"
    )
    assert(
      parseDateInstruction("index_date + 3 months") ==
        "index_date + cast(round(3*30) as int)"
    )
    assert(
      parseDateInstruction("index_date - 2 years") ==
        "index_date - cast(round(2*365.25) as int)"
    )
    assert(
      parseDateInstruction("current_date() + 5 days") ==
        "current_date() + cast(round(5*1) as int)"
    )
  }

  test("fractional amounts and multiple unit pairs") {
    assert(
      convertDateUnitsToDays("index_date - 2 years, x - 7.5 weeks") ==
        "index_date - cast(round(2*365.25) as int), x - cast(round(7.5*7) as int)"
    )
  }

  test("invalid dates raise") {
    intercept[IllegalArgumentException](parseDateInstruction("2020-02-30"))
    intercept[IllegalArgumentException](parseDateInstruction("2021-02-29"))
    // quirk parity: date-prefix + remainder routes to the literal branch
    intercept[IllegalArgumentException](
      parseDateInstruction("2020-01-01 + 5 days")
    )
  }

  test("leap years validate correctly") {
    assert(validateDateString("2020-02-29"))
    assert(!validateDateString("2021-02-29"))
    assert(validateDateString("2000-02-29"))
    assert(!validateDateString("1900-02-29"))
    assert(!validateDateString("2020-13-01"))
    assert(!validateDateString("2020-00-10"))
    assert(!validateDateString("not-a-date"))
  }

  test("invalid units raise") {
    intercept[IllegalArgumentException](
      convertDateUnitsToDays("index_date + 5 decades")
    )
    // quirk parity: any stray number+word pair is scanned
    intercept[IllegalArgumentException](
      parseDateInstruction("index_date + 5 days + 3 bananas")
    )
  }

  test("expressions evaluate on a date column via expr()") {
    val df = Seq(Tuple1(java.sql.Date.valueOf("2020-01-01"))).toDF("index_date")
    val got = df.select(
      expr(parseDateInstruction("index_date + 5 days")).as("plus_days"),
      expr(parseDateInstruction("index_date - 6 weeks")).as("minus_weeks"),
      expr(parseDateInstruction("index_date + 3 months")).as("plus_months"),
      expr(parseDateInstruction("index_date - 2 years")).as("minus_years"),
      expr(parseDateInstruction("2024-06-01")).as("lit_date"),
      expr(parseDateInstruction(null)).as("null_date")
    )
    checkRows(
      got,
      Seq(
        Row(
          java.sql.Date.valueOf("2020-01-06"),   // +5
          java.sql.Date.valueOf("2019-11-20"),   // -42
          java.sql.Date.valueOf("2020-03-31"),   // +90
          java.sql.Date.valueOf("2017-12-31"),   // -731 (round(730.5) HALF_UP)
          java.sql.Date.valueOf("2024-06-01"),
          null
        )
      )
    )
  }
}
