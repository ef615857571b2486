package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityGate

/** OBS-1: in-flight QA metrics — one scan produces both the data AND the
  * gate counters (no second validation pass). */
class QualityGateSpec extends SparkSpec {

  test("observe: metrics ride the writing action, verdict flags violations") {
    val orders = Tables.orders(spark, Sf0001)
    val (df, obs) = QualityGate.observed(
      orders,
      requiredCols = Seq("o_orderkey", "o_orderstatus"),
      boundedCols = Map("o_totalprice" -> (0.0, 1e9)))
    // ONE action drives rows to the sink and fills the metrics
    df.write.mode("overwrite").format("noop").save()
    val m = obs.getAsJava
    assert(m.get("n_rows") === orders.count())
    assert(m.get("null_o_orderkey") === 0L)
    assert(m.get("oob_o_totalprice") === 0L)
  }

  test("verdict: violations are named, clean runs pass") {
    val s = spark
    import s.implicits._
    val dirty = Seq((1L, Some("a"), 5.0), (2L, None, 5.0), (3L, Some("c"), -1.0))
      .toDF("id", "name", "score")
    val (df, obs) = QualityGate.observed(
      dirty, requiredCols = Seq("name"), boundedCols = Map("score" -> (0.0, 10.0)))
    df.write.mode("overwrite").format("noop").save()
    val schema = org.apache.spark.sql.types.StructType(
      Seq("n_rows", "null_name", "oob_score").map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType)))
    val m = obs.getAsJava
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array(m.get("n_rows"), m.get("null_name"), m.get("oob_score")), schema)
    QualityGate.verdict(row) match {
      case Left(bad) => assert(bad.toSet === Set("null_name", "oob_score"))
      case Right(_)  => fail("dirty input must not pass the gate")
    }
    val clean = Seq((1L, Some("a"), 5.0)).toDF("id", "name", "score")
    val (cdf, cobs) = QualityGate.observed(
      clean, requiredCols = Seq("name"), boundedCols = Map("score" -> (0.0, 10.0)))
    cdf.write.mode("overwrite").format("noop").save()
    val cm = cobs.getAsJava
    val crow = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array(cm.get("n_rows"), cm.get("null_name"), cm.get("oob_score")), schema)
    assert(QualityGate.verdict(crow).isRight)
  }
}
