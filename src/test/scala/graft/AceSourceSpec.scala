package graft

import org.apache.spark.sql.functions._

/** SOURCE-1 contract: the DataSource V2 `.ace` connector — row parity
  * with the UDF-parser path (the two implementations share
  * parseAceParagraph, so drift means a connector bug), filter pushdown
  * visible in the plan WITHOUT a residual Filter, column pruning at the
  * reader, and directory/multi-file layout. */
class AceSourceSpec extends SparkSpec {

  private val Sample = "/root/repo/fixtures/sample.ace"

  private def viaDsv2 = spark.read.format("ace").load(Sample)

  private def viaUdf = {
    // the scan3/mig1 path: blank-line paragraphs → parseAce UDF
    spark.read.option("lineSep", "\n\n").text(Sample)
      .filter(trim(col("value")) =!= "")
      .select(explode(graft.migration.MigrationOps.parseAce(col("value")))
        .as("d"))
      .select(
        split(col("d.e"), ":").getItem(0).as("cls"),
        expr("substring(d.e, instr(d.e, ':') + 1)").as("ident"),
        col("d.path"), col("d.value"), col("d.op"))
  }

  test("DSv2 rows == UDF-parser rows on the committed fixture") {
    val a = viaDsv2.collect().map(_.toSeq).toSet
    val b = viaUdf.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("cls filter pushes into the source: PushedFilters shows it and " +
      "no residual Filter survives above the scan") {
    val df = viaDsv2.filter(col("cls") === "Gene")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(cls,Gene)"),
      s"cls equality must be pushed:\n$p")
    assert(!p.contains("Filter "),
      s"pushed filter must leave no residual Filter node:\n$p")
    // and the pushed result is CORRECT (the reader honors what it claims)
    assert(df.collect().forall(_.getString(0) == "Gene"))
    assert(df.count() ===
      viaUdf.filter(col("cls") === "Gene").count())
  }

  test("unsupported predicates stay residual and still evaluate") {
    // value LIKE is not in the pushdown set — Spark must keep a Filter
    val df = viaDsv2.filter(col("value").startsWith("a"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Filter"), s"residual filter expected:\n$p")
    val want = viaUdf.filter(col("value").startsWith("a")).count()
    assert(df.count() === want && want > 0)
  }

  test("column pruning reaches the reader: readSchema carries only the " +
      "requested fields") {
    val df = viaDsv2.select("path")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<path:string>"),
      s"reader must materialize only 'path':\n$p")
    assert(df.collect().nonEmpty)
    // zero-width rows for count(*)
    assert(viaDsv2.count() === viaUdf.count())
  }

  test("a directory load maps one partition per .ace file") {
    val dir = java.nio.file.Files
      .createTempDirectory("ace-dsv2").toString
    val para = "Gene : \"G%d\"\nCGC_name \"n%d\"\n"
    for (i <- 0 until 3)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/part_$i.ace"), para.format(i, i))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/notes.txt"), "skip me")
    val df = spark.read.format("ace").load(dir)
    assert(df.rdd.getNumPartitions === 3,
      "one input partition per .ace file")
    assert(df.select("ident").collect().map(_.getString(0)).sorted ===
      Array("G0", "G1", "G2"))
  }

  test("op IN pushdown prunes per datom") {
    val df = viaDsv2.filter(col("op").isin("retract"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("In(op") || p.contains("EqualTo(op,retract)"),
      s"op membership must be pushed:\n$p")
    // sample.ace is all asserts — the pushed filter must yield zero rows,
    // not silently ignore itself
    assert(df.count() === 0)
    assert(viaDsv2.filter(col("op").isin("assert")).count() ===
      viaUdf.count())
  }
}
