package graft.functions

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, ResolverStyle}
import scala.util.matching.Regex

/** Date-instruction mini-DSL: compiles instruction strings into Spark SQL
  * expression strings for consumption by `functions.expr` / `selectExpr`.
  *
  * Capability parity with the reference's date DSL
  * (reference: `src/hds_functions/date_functions.py:17-159`). Pure Scala —
  * no Spark dependency — so instructions compile on the driver and the
  * resulting expressions stay fully inside Catalyst codegen.
  *
  * Unit factors are deliberately day-count arithmetic, not calendar
  * intervals: day=1, week=7, month=30, year=365.25
  * (reference `date_functions.py:108-117`). `date + int` in Spark SQL is
  * `date_add`, so the emitted expressions work directly on date columns.
  */
object DateInstructions {

  private val unitToDays: Map[String, String] = Map(
    "day" -> "1", "days" -> "1",
    "week" -> "7", "weeks" -> "7",
    "month" -> "30", "months" -> "30",
    "year" -> "365.25", "years" -> "365.25"
  )

  private val unitMarkers =
    Seq("day", "days", "week", "weeks", "month", "months", "year", "years")

  private val datePrefix: Regex = """^\d{4}-\d{2}-\d{2}""".r
  private val numberUnit: Regex = """\b(\d+(?:\.\d+)?)\s*(\w+)\b""".r

  /** Parse a date-instruction string into a Spark SQL expression string.
    *
    * Branching mirrors reference `date_functions.py:17-81` exactly,
    * including its quirks:
    *   - null -> `cast(NULL as date)`
    *   - a leading `YYYY-MM-DD` (prefix match, not full match!) routes to the
    *     literal branch; a trailing remainder (e.g. `2020-01-01 + 5 days`)
    *     then fails validation — same error as the reference.
    *   - any *substring* occurrence of a unit word triggers unit conversion
    *     (so e.g. an identifier containing `day` routes there too).
    *   - anything else passes through unchanged (column name / SQL fragment).
    */
  def parseDateInstruction(dateString: String): String = {
    if (dateString == null) "cast(NULL as date)"
    else if (datePrefix.findPrefixOf(dateString).isDefined) {
      if (validateDateString(dateString)) s"date('$dateString')"
      else throw new IllegalArgumentException(s"Invalid date: $dateString")
    } else if (unitMarkers.exists(dateString.contains))
      convertDateUnitsToDays(dateString)
    else dateString
  }

  /** Rewrite every `<number> <unit>` pair in the expression into
    * `cast(round(<number>*<factor>) as int)`. Unknown units raise — including
    * stray number+word pairs elsewhere in the string, mirroring the
    * reference's scan-everything behavior (`date_functions.py:102-132`).
    */
  def convertDateUnitsToDays(dateExpression: String): String = {
    val matches = numberUnit
      .findAllMatchIn(dateExpression)
      .map(m => (m.group(1), m.group(2)))
      .toList
    matches.foldLeft(dateExpression) { case (exprStr, (number, unit)) =>
      val factor = unitToDays.getOrElse(
        unit,
        throw new IllegalArgumentException(
          s"Invalid unit: $unit. Use 'day', 'week', 'month', or 'year'."
        )
      )
      val converted = s"cast(round($number*$factor) as int)"
      // Like the reference, the number is interpolated unescaped ('.' in
      // "7.5" matches any char) — replicated for exact behavioral parity.
      exprStr.replaceAll(
        s"\\b$number\\s*$unit\\b",
        java.util.regex.Matcher.quoteReplacement(converted)
      )
    }
  }

  private val strictDate =
    DateTimeFormatter.ofPattern("uuuu-M-d").withResolverStyle(ResolverStyle.STRICT)

  /** Strict calendar validation of a `YYYY-MM-DD` date string (leap years
    * etc.), mirroring the reference's `strptime` check
    * (`date_functions.py:135-159`). */
  def validateDateString(dateString: String): Boolean =
    try { LocalDate.parse(dateString, strictDate); true }
    catch { case _: java.time.format.DateTimeParseException => false }
}
