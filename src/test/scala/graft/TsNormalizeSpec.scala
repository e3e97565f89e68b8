package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Q

/** Time-contract drift guard (round-6 lesson: the testdata generator
  * switched `events.ts` between parquet TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS)/NTZ across rounds). [[Q.normalizeTs]] must map every
  * encoding the generator has ever produced to the SAME canonical
  * epoch-µs long, and reject anything else loudly.
  */
class TsNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // one instant, three encodings: 2024-01-16 00:00:00.123456 UTC
  private val us = 1705363200123456L

  private def roundtrip(write: String => Unit): Long = {
    val dir = Files.createTempDirectory("graft_tsnorm").resolve("events.parquet")
    write(dir.toString)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = Q.normalizeTs(spark.read.parquet(dir.toString))
    assert(df.schema("ts").dataType == LongType)
    df.select("ts").head().getLong(0)
  }

  test("normalizeTs: epoch-nanos long (legacy TIMESTAMP(NANOS) via nanosAsLong)") {
    assert(roundtrip { p =>
      Seq(us * 1000L).toDF("ts").write.parquet(p)
    } == us)
  }

  test("normalizeTs: TIMESTAMP (instant) parquet") {
    assert(roundtrip { p =>
      Seq(us).toDF("u").select(timestamp_micros(col("u")).as("ts")).write.parquet(p)
    } == us)
  }

  test("normalizeTs: TIMESTAMP_NTZ parquet (the round-6 drift encoding)") {
    assert(roundtrip { p =>
      Seq(us).toDF("u")
        .select(timestamp_micros(col("u")).cast(TimestampNTZType).as("ts"))
        .write.parquet(p)
    } == us)
  }

  test("normalizeTs: tables without ts pass through untouched") {
    val df = Seq((1L, "a")).toDF("id", "v")
    assert(Q.normalizeTs(df) eq df)
  }

  test("normalizeTs: unknown ts encoding fails with one loud diagnosis") {
    val e = intercept[IllegalStateException] {
      Q.normalizeTs(Seq(("x", 1.0)).toDF("ts", "v"))
    }
    assert(e.getMessage.contains("drifted"))
  }
}
