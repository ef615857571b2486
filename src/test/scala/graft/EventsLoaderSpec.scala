package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.events dual-encoding contract (Graft.scala): the driver-generated
  * lake has shipped `events.ts` under TWO physical encodings across rounds —
  * INT64 TIMESTAMP(NANOS) (which nanosAsLong=true surfaces as LongType
  * nanos) and plain TIMESTAMP µs. Every downstream operator assumes ONE
  * contract: `ts` = Long nanos since epoch, `event_ts` = TimestampType µs.
  * This spec pins that both encodings of the same instants normalize to
  * identical rows — the regression guard for the next silent lake flip.
  */
class EventsLoaderSpec extends SparkSpec {

  // one pre-epoch instant on purpose: negative nanos must round-trip too
  private val instantsNs = Seq(
    -1_000_000_000L,              // 1969-12-31T23:59:59Z
    0L,                           // epoch
    1_704_067_200_000_000_000L,   // 2024-01-01T00:00:00Z
    1_704_067_200_123_456_000L)   // same day, µs-granular fraction

  private def writeBoth(): (String, String) = {
    val root = Files.createTempDirectory("events-enc").toFile
    root.deleteOnExit()
    val (nanosDir, microsDir) =
      (s"$root/nanos", s"$root/micros")

    // encoding 1: ts already LongType nanos (what nanosAsLong=true yields
    // from an INT64 TIMESTAMP(NANOS) file — same Spark-side type/values)
    val longRows = instantsNs.zipWithIndex.map { case (ns, i) =>
      Row(i.toLong, ns)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(longRows, 1),
        StructType(Seq(
          StructField("event_id", LongType, nullable = false),
          StructField("ts", LongType, nullable = false))))
      .write.parquet(s"$nanosDir/events.parquet")

    // encoding 2: ts as TimestampType µs of the SAME instants
    val tsRows = instantsNs.zipWithIndex.map { case (ns, i) =>
      Row(i.toLong, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(ns, 1_000_000_000L),
          Math.floorMod(ns, 1_000_000_000L))))
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(tsRows, 1),
        StructType(Seq(
          StructField("event_id", LongType, nullable = false),
          StructField("ts", TimestampType, nullable = false))))
      .write.parquet(s"$microsDir/events.parquet")

    (nanosDir, microsDir)
  }

  test("both physical encodings normalize to identical (ts, event_ts)") {
    val (nanosDir, microsDir) = writeBoth()
    val fromNanos = Tables.events(spark, nanosDir)
      .select("event_id", "ts", "event_ts").orderBy("event_id").collect()
    val fromMicros = Tables.events(spark, microsDir)
      .select("event_id", "ts", "event_ts").orderBy("event_id").collect()
    assert(fromNanos.toSeq === fromMicros.toSeq)
    // and the normalized ts really is the original nanos value
    assert(fromNanos.map(_.getLong(1)).toSeq === instantsNs)
  }

  test("normalized schema contract: ts Long nanos, event_ts TimestampType") {
    val (nanosDir, microsDir) = writeBoth()
    for (d <- Seq(nanosDir, microsDir, Sf0001)) {
      val sch = Tables.events(spark, d).schema
      assert(sch("ts").dataType === LongType, s"ts in $d")
      assert(sch("event_ts").dataType === TimestampType, s"event_ts in $d")
    }
    // event_ts is exactly ts div 1000 µs (lossless for µs-granular data)
    val mismatch = Tables.events(spark, Sf0001)
      .filter(unix_micros(col("event_ts")) =!= expr("ts div 1000")).count()
    assert(mismatch === 0L)
  }
}
