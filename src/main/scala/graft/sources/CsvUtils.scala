package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.nio.file.{Files, Paths}

/** CSV read/write/dictionary utilities.
  *
  * Capability parity with the reference's CSV surface
  * (reference: `src/hds_functions/csv_utils.py:18-177`), re-expressed on
  * Spark's native CSV source instead of a pandas bridge.
  *
  * NA semantics: the reference reads with pandas `keep_default_na=False`, so
  * empty fields stay `""`. Spark's CSV reader maps empty quoted fields to ""
  * but unquoted empties to null; we default `emptyAsNull=false` to keep ""
  * for both, matching the reference.
  */
object CsvUtils {

  /** Read a CSV with header into a DataFrame. `inferSchema=false` (default)
    * keeps every column as string — closest to the reference's
    * `keep_default_na=False` pandas read for lookup-style files. */
  def readCsvFile(
      spark: SparkSession,
      path: String,
      inferSchema: Boolean = false,
      emptyAsNull: Boolean = false
  ): DataFrame = {
    var reader = spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      // RFC 4180 quote doubling (Spark's default escape is backslash)
      .option("escape", "\"")
    if (!emptyAsNull) {
      // nullValue set to an impossible sentinel => quoted empty fields
      // survive as "" (unquoted empties are still null at the parser level,
      // which is why the writer quotes empty strings)
      reader = reader.option("nullValue", "\u0000")
    }
    reader.csv(path)
  }

  /** Write a small DataFrame to a single CSV file (driver-side, like the
    * reference's `toPandas().to_csv`). Guards: row count within
    * `maxRowsThreshold`, non-empty, parent directory exists. Mirrors
    * reference `csv_utils.py:51-105`. Deliberately NOT for big data — use
    * `df.write.csv` / `Tables.saveTable` for that. */
  def writeCsvFile(
      df: DataFrame,
      path: String,
      maxRowsThreshold: Int = 1000
  ): Unit = {
    val rowCount = df.count()
    require(
      rowCount <= maxRowsThreshold,
      s"DataFrame exceeds maximum rows threshold of $maxRowsThreshold. " +
        "This function is for small datasets. Use saveTable() for large datasets."
    )
    val dir = Paths.get(path).toAbsolutePath.getParent
    require(dir != null && Files.exists(dir), s"Directory '$dir' does not exist.")
    require(rowCount != 0, "DataFrame is empty")

    val header = df.columns.map(csvField).mkString(",")
    val lines = df.collect().map { row =>
      row.toSeq.map {
        case null  => ""
        case other => csvField(other.toString)
      }.mkString(",")
    }
    Files.writeString(Paths.get(path), (header +: lines).mkString("", "\n", "\n"))
  }

  private def csvField(s: String): String =
    if (s.isEmpty) "\"\"" // quoted so readers keep "" instead of null
    else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Read a CSV and build a driver-side dictionary keyed by `keyColumn`.
    * Value shape mirrors the reference (`csv_utils.py:108-177`):
    * one value column → the bare value; several → a List, or a
    * column-name→value Map when `retainColumnNames`. Key uniqueness is
    * enforced. */
  def createDictFromCsv(
      spark: SparkSession,
      path: String,
      keyColumn: String,
      valueColumns: Seq[String],
      retainColumnNames: Boolean = false,
      castKeyAsString: Boolean = true
  ): Map[Any, Any] = {
    require(valueColumns.nonEmpty, "value_columns must be non-empty")
    val df = readCsvFile(spark, path)
    val rows: Array[Row] =
      df.select((keyColumn +: valueColumns).distinct.map(df(_)): _*).collect()

    val keys = rows.map(_.getAs[Any](keyColumn))
    require(
      keys.distinct.length == keys.length,
      s"Key column '$keyColumn' is not unique"
    )

    rows.map { row =>
      val key: Any = {
        val k = row.getAs[Any](keyColumn)
        if (castKeyAsString) String.valueOf(k) else k
      }
      val values: Any =
        if (valueColumns.size == 1) row.getAs[Any](valueColumns.head)
        else if (retainColumnNames)
          valueColumns.map(c => c -> row.getAs[Any](c)).toMap
        else valueColumns.map(row.getAs[Any]).toList
      key -> values
    }.toMap
  }
}
