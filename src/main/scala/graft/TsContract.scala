package graft

import org.apache.spark.sql.SparkSession

/** Startup self-check for the testdata time contract (round-6 lesson: the
  * testdata generator switched `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS)/NTZ between rounds and 17 queries failed at analysis
  * time with scattered DATATYPE_MISMATCH errors). [[graft.queries.Q.normalizeTs]]
  * canonicalizes every known encoding to an epoch-µs long; this check makes
  * the encoding visible in every Verify/Bench log and turns an UNKNOWN
  * encoding into one loud diagnostic line instead of 17 AnalysisExceptions.
  */
object TsContract {
  /** Print the physical `ts` type of `events.parquet` under `sfDir` and
    * fail fast (via normalizeTs's IllegalStateException) if it is not one
    * of the handled encodings. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val raw = try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
    } catch { case e: Throwable =>
      System.err.println(s"[ts-contract] could not read $sfDir/events.parquet: ${e.getMessage}")
      return
    }
    val tsType = raw.schema.fields.find(_.name == "ts").map(_.dataType)
    System.err.println(s"[ts-contract] events.ts arrives as ${tsType.getOrElse("<absent>")}; " +
      "normalizing to epoch-us long (Q.normalizeTs)")
    graft.queries.Q.normalizeTs(raw) // throws with a one-line diagnosis on drift
    // one compact schema line per table: the next generator drift (a
    // retyped id, a renamed column) should be diagnosable from the log
    // of the FIRST failing round, not reverse-engineered from 17
    // scattered AnalysisExceptions like the ts switch was
    graft.queries.Q.tableNames.foreach { t =>
      try {
        val sch = spark.read.parquet(s"$sfDir/$t.parquet").schema
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        System.err.println(s"[ts-contract] $t{$sch}")
      } catch { case e: Throwable =>
        System.err.println(s"[ts-contract] $t unreadable: ${e.getMessage}")
      }
    }
  }
}
