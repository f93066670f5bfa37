package graft

/** Driver-contract smoke: entry() returns rows; every query has an oracle. */
class EntrySpec extends SparkSpec {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry also works under ANSI mode (driver may use a default session)") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(SparkEntry.entry(spark).count() > 0)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("date DSL query is ANSI-proof (Spark 4 default session)") {
    // `expr("date + int")` semantics differ under ANSI; the DSL must emit
    // date_add-style arithmetic that is identical in both modes.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      val legacy = SparkEntry.queries("q_date_dsl")(spark, sfDir).collect()
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val ansi = SparkEntry.queries("q_date_dsl")(spark, sfDir).collect()
      assert(ansi.sameElements(legacy), "q_date_dsl diverges under ANSI mode")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("every query is ANSI-proof: same row count with spark.sql.ansi.enabled") {
    // Spark 4 sessions default to ANSI mode; the driver may one day run the
    // reference surface under one. Every query must run without ANSI
    // runtime errors (overflow/cast/div-by-zero become exceptions there)
    // and produce the same cardinality as the legacy-mode oracle run.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      val base = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> fn(spark, sfDir).count()
      }
      spark.conf.set("spark.sql.ansi.enabled", "true")
      base.foreach { case (name, expected) =>
        val n =
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch {
            case e: Throwable =>
              fail(s"$name fails under ANSI mode: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        assert(n == expected, s"$name row count diverges under ANSI: $n vs $expected")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("every query runs on sf0.001 and oracle coverage is complete") {
    val missingOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val extraOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extraOracle.isEmpty, s"oracles without queries: $extraOracle")
    // queries without oracle are allowed (weaker rows-only check) but listed:
    if (missingOracle.nonEmpty)
      info(s"rows-only queries (no oracle): ${missingOracle.toSeq.sorted.mkString(", ")}")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
