package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-name sanitization and dictionary value mapping.
  *
  * Capability parity with the reference's data-wrangling surface
  * (reference: `src/hds_functions/data_wrangling.py:15-120`), re-expressed as
  * `DataFrame => DataFrame` combinators for use with `Dataset.transform`.
  *
  * Both operators are metadata-only / narrow: no shuffle is introduced, so they
  * are free at any data scale (a rename is a driver-side schema operation; the
  * map lookup is a codegen'd `GetMapValue` expression on a literal map).
  */
object Wrangling {

  /** Sanitize a single column name: non-alphanumeric (and non-underscore)
    * characters become `_`, a leading digit gets an `_` prefix, and the result
    * is lowercased. Mirrors reference `data_wrangling.py:39-46`.
    */
  def cleanName(name: String): String = {
    require(name.nonEmpty, "Column name must be non-empty")
    val replaced = name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    val prefixed = if (replaced.head.isDigit) "_" + replaced else replaced
    prefixed.toLowerCase
  }

  /** Clean all column names and make duplicates unique with `_2`, `_3`, ...
    * suffixes.
    *
    * Deliberately replicates the reference's dedup quirk
    * (`data_wrangling.py:49-58`): the suffix counter tracks occurrences of the
    * *cleaned* base name only, so a suffixed name (e.g. `a_2`) can still
    * collide with a column literally named `a_2`. Pure metadata operation —
    * planned as a single `Project`, no job, no shuffle.
    */
  def cleanColumnNames(df: DataFrame): DataFrame = {
    val cleaned = df.columns.map(cleanName)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val unique = cleaned.map { c =>
      val n = seen.getOrElse(c, 0) + 1
      seen(c) = n
      if (n == 1) c else s"${c}_$n"
    }
    df.toDF(unique.toIndexedSeq: _*)
  }

  /** Wide-to-long reshape (pandas `melt` / SQL UNPIVOT): each row of the
    * listed `valueCols` becomes one output row `(idCols..., varCol,
    * valueCol)`. Values are implicitly cast to a common type by `unpivot`
    * (pass compatible columns or cast first). Narrow operation — planned as
    * Spark's native `Unpivot` (an Expand), no shuffle.
    *
    * `dropNulls` mirrors pandas semantics when false: by default Spark's
    * unpivot KEEPS null values; set true to drop them.
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varCol: String = "variable",
      valueCol: String = "value",
      dropNulls: Boolean = false
  ): DataFrame = {
    require(valueCols.nonEmpty, "At least one value column required.")
    (idCols ++ valueCols).foreach { c =>
      require(
        df.columns.contains(c),
        s"Column '$c' does not exist in the DataFrame."
      )
    }
    val out = df.unpivot(
      idCols.map(col).toArray,
      valueCols.map(col).toArray,
      varCol,
      valueCol
    )
    if (dropNulls) out.filter(col(valueCol).isNotNull) else out
  }

  /** Map values of `column` through a literal dictionary; unmatched keys
    * yield null. If `newColumn` is non-empty the result is written there
    * (error if it already exists), otherwise the source column is replaced
    * in place. Mirrors reference `data_wrangling.py:64-120`.
    *
    * Implementation: a `map(lit(k1), lit(v1), ...)` literal indexed with the
    * source column — a codegen'd `GetMapValue`, no UDF, no shuffle, safe to
    * push through any plan. The dictionary is driver-side and assumed small
    * (it is embedded in the plan); for lookup tables of millions of entries
    * use a broadcast join instead.
    */
  def mapColumnValues(
      df: DataFrame,
      mapDict: Map[Any, Any],
      column: String,
      newColumn: String = ""
  ): DataFrame = {
    require(
      df.columns.contains(column),
      s"Column '$column' does not exist in the DataFrame."
    )
    require(mapDict.nonEmpty, "Empty mapping dictionary provided.")
    require(
      newColumn.isEmpty || !df.columns.contains(newColumn),
      s"Column '$newColumn' already exists in the DataFrame."
    )
    val entries: Seq[Column] =
      mapDict.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val mapExpr = map(entries: _*)
    val outName = if (newColumn.nonEmpty) newColumn else column
    // try_element_at: missing keys yield null under both ANSI and legacy
    // modes (plain element_at throws under ANSI, which Spark 4 enables by
    // default).
    df.withColumn(outName, try_element_at(mapExpr, df(column)))
  }

  /** Canonicalize raw text for dedup/fingerprint stability: lowercase,
    * strip control characters, optionally strip punctuation, collapse
    * whitespace runs to single spaces, and trim. Exactly the
    * normalization applied before hashing in web-corpus dedup pipelines —
    * raw text is kept alongside (`outCol` defaults to `<textCol>_norm`)
    * so display text is never destroyed.
    *
    * Per-row codegen'd regexp chain, no shuffle. The regexes stick to the
    * RE2-portable subset (character classes only) so the same
    * normalization is reproducible on other engines.
    */
  def normalizeText(
      df: DataFrame,
      textCol: String,
      stripPunctuation: Boolean = false,
      outCol: String = ""
  ): DataFrame = {
    require(df.columns.contains(textCol), s"Column '$textCol' does not exist in the DataFrame.")
    val outName = if (outCol.nonEmpty) outCol else s"${textCol}_norm"
    val lowered = lower(col(textCol))
    val noControl = regexp_replace(lowered, "[\\x00-\\x1f\\x7f]", " ")
    val noPunct =
      if (stripPunctuation)
        regexp_replace(noControl, "[!-/:-@\\[-`{-~]", " ")
      else noControl
    val collapsed = trim(regexp_replace(noPunct, " +", " "))
    df.withColumn(outName, collapsed)
  }

  /** Schema-on-read for a semi-structured JSON string column (the classic
    * event-properties pattern): parse `column` with an explicit DDL schema
    * and promote each top-level field to its own typed column named
    * `<prefix><field>`. Malformed rows yield nulls in every promoted
    * column (Spark's PERMISSIVE parse mode) rather than failing the job —
    * at corpus scale some malformed payloads are a certainty.
    *
    * Per-row codegen'd `JsonToStructs` parse, no shuffle; column pruning
    * still reaches the scan, so a query touching only promoted fields
    * reads just the JSON column plus whatever else it names.
    */
  def parseJsonColumn(
      df: DataFrame,
      column: String,
      ddlSchema: String,
      prefix: String = "",
      dropSource: Boolean = false
  ): DataFrame = {
    require(df.columns.contains(column), s"Column '$column' does not exist in the DataFrame.")
    val struct = org.apache.spark.sql.types.StructType.fromDDL(ddlSchema)
    val fieldNames = struct.fields.map(_.name)
    val clashes = fieldNames.map(prefix + _).filter(df.columns.contains)
    require(
      clashes.isEmpty,
      s"Parsed field column(s) ${clashes.mkString(", ")} already exist in the DataFrame."
    )
    val parsed = from_json(col(column), struct)
    val withFields = fieldNames.foldLeft(df) { (d, f) =>
      d.withColumn(prefix + f, parsed.getField(f))
    }
    if (dropSource) withFields.drop(column) else withFields
  }

  /** Slowly-changing-dimension (SCD Type 2) history construction: collapse
    * a table of per-key versioned rows (archive snapshots, change events,
    * CDC extracts) into validity intervals — one row per RUN of
    * consecutive versions whose tracked attributes are all unchanged
    * (null-safe comparison), with `valid_from` = the run's first version,
    * `valid_to` = the next run's `valid_from` (NULL on the latest run),
    * `is_current`, and `n_versions` (rows collapsed into the run). The
    * complement to `Tables.upsertArchive`/`getArchiveVersions`: those
    * maintain versioned snapshots; this turns them into the interval
    * form that as-of joins ([[Joins]]) consume.
    *
    * CONTRACT: `versionCol` SHOULD be unique within a key (archive
    * writers guarantee it). When it is not, every ordering in here
    * tie-breaks on the attribute values — run assignment AND the
    * `valid_to` chaining — so tied versions still produce one
    * deterministic history (runs that start at the same tied version
    * necessarily differ in their attributes, making
    * (valid_from, attrs...) a total order over a key's runs); intervals
    * between tied runs are zero-width, which is the honest reading of a
    * tie. NULL versions are dropped.
    *
    * Scale shape: two windows and one aggregate, ALL partitioned by the
    * key — no global ordering anywhere, so the plan scales with the
    * per-key history length, not the table. */
  def scd2History(
      df: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      versionCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    // attr tie-breaks are EXPLICITLY NULLS FIRST: Spark's default asc is
    // nulls-first but DuckDB's is nulls-last, so a SQL oracle over tied
    // versions with NULL attrs would silently diverge unless both engines
    // pin the same null placement (the oracle mirrors with `NULLS FIRST`)
    val order = col(versionCol) +: attrCols.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    // a row starts a new run iff it is the key's first version or any
    // tracked attribute differs (null-safely) from the previous version
    val changed = attrCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col(versionCol), 1).over(w).isNull
    val runs = df
      .filter(col(versionCol).isNotNull)
      .withColumn("__chg", changed.cast("int"))
      .withColumn(
        "__run",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0))
      )
    val grouped = runs
      .groupBy((keyCols.map(col) :+ col("__run")): _*)
      .agg(
        (attrCols.map(c => first(col(c)).as(c)) ++ Seq(
          min(col(versionCol)).as("valid_from"),
          count(lit(1)).as("n_versions")
        )).head,
        (attrCols.map(c => first(col(c)).as(c)) ++ Seq(
          min(col(versionCol)).as("valid_from"),
          count(lit(1)).as("n_versions")
        )).tail: _*
      )
    // valid_from alone is not a total order when versions tie across
    // runs; the attr tie-break (same columns, same order as the run
    // window) pins the lead() chaining deterministically in both engines
    val w2 = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from") +: attrCols.map(c => col(c).asc_nulls_first): _*)
    grouped
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(
        keyCols.map(col) ++ attrCols.map(col) ++ Seq(
          col("valid_from"),
          col("valid_to"),
          col("is_current"),
          col("n_versions")
        ): _*
      )
  }
}
