package graft

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SINK-13: z-order clustering must (a) interleave bits correctly,
  * (b) produce file-level min/max stats that skip most files for a filter
  * on the SECOND dimension — the one a linear sort spreads across every
  * file — while (c) never changing content.
  */
class ZorderSpec extends SparkSpec {

  test("zvalue: bit interleave matches hand-computed values") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (65535L, 0L), (0L, 65535L)).toDF("a", "b")
    val got = rows.select(Layout.zvalue(col("a"), col("b"), bits = 16))
      .collect().map(_.getLong(0)).toSeq
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L)((z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    assert(got === Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (65535L, 0L), (0L, 65535L)).map((ref _).tupled))
    // a=5 (101), b=3 (011): a-bits at even, b-bits at odd positions
    // -> z bits {0,1,3,4} = 011011 = 27
    assert(ref(5L, 3L) === 27L)
  }

  test("z-ordered files skip on the non-sort dimension; linear sort cannot") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // deterministic pseudo-uniform 2-d points (no Math.random in specs)
    val pts = s.range(1 << 14).select(
      ((col("id") * 2654435761L) % 65536).as("a"),
      ((col("id") * 40503L + 12345L) % 65536).as("b"))
    val nFiles = 16
    pts.withColumn("__z", Layout.zvalue(col("a"), col("b"), bits = 16))
      .repartitionByRange(nFiles, col("__z")).sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(s"$tmp/zorder")
    pts.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // per-file [min,max] of b, as the parquet footer would expose it
    def overlapping(dir: String, lo: Long, hi: Long): Long =
      s.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("b").as("mn"), max("b").as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()

    // box query on b only: b < 8192 (1/8 of the range)
    val zFiles = overlapping(s"$tmp/zorder", 0L, 8191L)
    val linFiles = overlapping(s"$tmp/linear", 0L, 8191L)
    assert(linFiles === nFiles.toLong,
      s"a-sorted layout must spread b across all files (got $linFiles)")
    // 16 z-ranges split on (b15, a15, b14, a14): b < 8192 pins b15=b14=0
    // => 4 of 16 rectangles; allow slack for range-boundary straddle
    assert(zFiles <= 6, s"z-order should bound b per file, got $zFiles/16")

    // content identical under the box filter regardless of layout
    def rows(dir: String): Set[(Long, Long)] =
      s.read.parquet(dir).filter(col("b") < 8192)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(s"$tmp/zorder") === rows(s"$tmp/linear"))
  }
}
