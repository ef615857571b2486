package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle_sql.json writer is part of the correctness gate itself — a
  * malformed escape would silently zero a whole round. Round-trip through a
  * real JSON parser (the JDK's nashorn-free option: javax.script is gone,
  * so parse with a minimal hand-rolled check via spark's jackson). */
class VerifyJsonSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def roundTrip(m: Map[String, String]): Map[String, String] = {
    val node = mapper.readTree(Verify.toJsonObject(m))
    val it = node.fields()
    val out = scala.collection.mutable.Map[String, String]()
    while (it.hasNext) {
      val e = it.next()
      out(e.getKey) = e.getValue.asText()
    }
    out.toMap
  }

  test("control chars, quotes, backslashes, unicode survive round-trip") {
    val nasty = Map(
      "tabs" -> "SELECT\t1\nFROM x\r\n",
      "quotes" -> """SELECT '"' AS q, "col" FROM t""",
      "backslash" -> """regexp_extract(c, '\\d+', 0)""",
      "ctrl" -> "abc",
      "unicode" -> "μ-datoms ≥ 0")
    assert(roundTrip(nasty) === nasty)
  }

  test("the real oracle map round-trips and is non-empty") {
    val m = SparkEntry.oracleSql
    assert(m.nonEmpty)
    assert(roundTrip(m) === m)
  }

  test("driver contract: every oracle names a declared query; no collisions") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    // a module defining a name twice would silently shadow via toMap —
    // catch it by comparing against the pre-merge multiset
    val all = Seq(
      operators.Relational, operators.Scans, operators.Funcs,
      llm.LlmOps, streaming.StreamOps, migration.MigrationOps,
      multimodal.MultimodalOps).flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
  }
}
