package graft

import graft.operators.{Sessionize, TimeUtils}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata schema-drift canary.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped the same logical timestamp column under three different parquet
  * physical types (TIMESTAMP(NANOS) → LongType under the legacy
  * `nanosAsLong` conf, micros-without-timezone → TIMESTAMP_NTZ, tz'd
  * micros → TIMESTAMP). A silent drift used to surface as nine cryptic
  * analysis errors deep inside operators; this suite fails FIRST, naming
  * the drifted table.column and the type it arrived as.
  *
  * Two layers:
  *   1. every sf0.001 table column must arrive as a type the loaders
  *      accept (timestamps: any of the three variants; everything else:
  *      exact);
  *   2. the canonical loaders/normalizers must deliver the SAME canonical
  *      type — and the same VALUES — regardless of which variant is on
  *      disk, proven against written fixtures of all three.
  */
class TestdataCanarySpec extends SparkSpec {

  /** Acceptable arrival types per column. Timestamp-ish columns list every
    * physical variant the loaders normalize; exact types elsewhere. */
  private val timestampish: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType),
      "r_name" -> Set(StringType)
    ),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)
    ),
    "customer" -> Map(
      "c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType),
      "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)
    ),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType),
      "s_acctbal" -> Set(DoubleType)
    ),
    "part" -> Map(
      "p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType),
      "p_retailprice" -> Set(DoubleType)
    ),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> timestampish,
      "o_orderpriority" -> Set(StringType)
    ),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> timestampish
    ),
    "events" -> Map(
      "event_id" -> Set(LongType),
      "ts" -> timestampish,
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)
    ),
    "documents" -> Map(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)
    ),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)
    )
  )

  test("every testdata table arrives with loader-acceptable column types") {
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      val missing = cols.keySet -- schema.fieldNames.toSet
      val badType = schema.fields.toSeq.flatMap { f =>
        cols.get(f.name) match {
          case Some(ok) if !ok.contains(f.dataType) =>
            Some(s"$table.${f.name}: arrived as ${f.dataType.simpleString}, " +
              s"loaders accept ${ok.map(_.simpleString).mkString("/")}")
          case _ => None
        }
      }
      missing.toSeq.map(c => s"$table.$c: column MISSING from testdata") ++ badType
    }
    assert(drifted.isEmpty,
      s"testdata schema drift detected:\n  ${drifted.mkString("\n  ")}")
  }

  test("canonical events loader normalizes ts to TIMESTAMP on the real data") {
    val ev = ScaleQueries.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events loader must deliver TIMESTAMP ts, got ${ev.schema("ts").dataType}")
    assert(ev.count() > 0)
  }

  test("loaders and operators agree across all three timestamp physical variants") {
    import spark.implicits._
    // one base dataset of instants, written out in each physical variant
    val base = Seq(
      (1L, "2024-03-01 10:00:00", 7L, "view", 1.0, "{}"),
      (2L, "2024-03-01 10:10:00", 7L, "view", 2.0, "{}"),
      // > 30 min gap -> second session for user 7
      (3L, "2024-03-01 11:00:00", 7L, "purchase", 3.0, "{}"),
      (4L, "2024-03-01 10:05:00", 8L, "view", 4.0, "{}")
    ).toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("s")))
      .drop("s")

    val root = java.nio.file.Files.createTempDirectory("graft-ts-canary").toString
    def writeVariant(name: String, df: DataFrame): String = {
      val dir = s"$root/$name"
      // FileStreamSource-style layout: a dir holding one events.parquet
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val tzDir = writeVariant("tz", base)
    val ntzDir = writeVariant("ntz",
      base.withColumn("ts", col("ts").cast(TimestampNTZType)))
    // TIMESTAMP(NANOS) arrives as LongType under nanosAsLong — simulate the
    // post-read shape directly: a long column of epoch NANOS
    val nanosDir = writeVariant("nanos",
      base.withColumn("ts", unix_micros(col("ts")) * 1000L))

    val variants = Map("tz" -> tzDir, "ntz" -> ntzDir, "nanos" -> nanosDir)
    val results = variants.map { case (name, dir) =>
      val ev = ScaleQueries.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"variant $name: loader must normalize ts to TIMESTAMP, " +
          s"got ${ev.schema("ts").dataType}")
      val sessions = Sessionize
        .sessionize(ev, gapSeconds = 1800L)
        .orderBy("user_id", "session_id")
        .collect()
        .map(_.toString)
        .toSeq
      name -> sessions
    }
    assert(results("tz") == results("ntz"),
      "NTZ variant must sessionize identically to tz'd micros")
    assert(results("tz") == results("nanos"),
      "long-nanos variant must sessionize identically to tz'd micros")
    assert(results("tz").size == 3, s"expected 3 sessions, got ${results("tz")}")
  }

  test("ensureTimestamp names the drifted column instead of failing downstream") {
    import spark.implicits._
    val bad = Seq((1L, "oops")).toDF("id", "when")
    val e = intercept[IllegalArgumentException] {
      TimeUtils.ensureTimestamp(bad, "when")
    }
    assert(e.getMessage.contains("'when'") && e.getMessage.contains("string"))
  }
}
