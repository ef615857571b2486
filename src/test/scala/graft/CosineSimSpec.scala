package graft

import graft.llm.LlmOps
import org.apache.spark.sql.functions._

/** The native CosineSim expression must be bit-identical to the built-in
  * higher-order formulation (same left-to-right double accumulation) in
  * BOTH execution modes — whole-stage codegen and interpreted eval. */
class CosineSimSpec extends SparkSpec {

  test("cosine_sim == HOF cosine, bit-exact, on real embeddings") {
    val e = Tables.embeddings(spark, Sf0001).limit(200)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val pairs = a.join(b, col("a_id") + 1 === col("b_id"))
    val diff = pairs.select(
      LlmOps.cosine(col("a_emb"), col("b_emb")).as("fast"),
      LlmOps.cosineHof(col("a_emb"), col("b_emb")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("cosine_sim interpreted eval matches codegen") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val fromSql = df.selectExpr("cosine_sim(a, b) AS c").head.getDouble(0)
    val expected = 10.0 / math.sqrt(14.0) / math.sqrt(14.0)
    assert(fromSql === expected)
    // interpreted path: evaluate the expression directly
    val ev = graft.functions.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 2.0f, 1.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))).eval(null)
    assert(ev === expected)
  }

  test("cosine_sim nulls on length mismatch and zero norm (HOF parity)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("mismatch", Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),
      ("zero_a", Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      ("ok", Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("k", "a", "b")
    val rows = df.selectExpr("k", "cosine_sim(a, b) AS c")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(rows("mismatch") === null)
    assert(rows("zero_a") === null)
    assert(rows("ok") === 1.0)
    // interpreted path agrees
    def lit(a: Array[Float]) =
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
    assert(graft.functions.CosineSim(
      lit(Array(1.0f, 2.0f)), lit(Array(1.0f, 2.0f, 3.0f))).eval(null) === null)
    assert(graft.functions.CosineSim(
      lit(Array(0.0f)), lit(Array(1.0f))).eval(null) === null)
  }

  test("l2_sq == HOF formulation, bit-exact, on real embeddings; edge " +
    "cases match zip_with/aggregate semantics") {
    val e = Tables.embeddings(spark, Sf0001).limit(200)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    // the pre-r19 interpreted formulation — the bit-parity reference
    def l2Hof(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) =>
        (p.cast("double") - q.cast("double")) *
          (p.cast("double") - q.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    val diff = a.join(b, col("a_id") + 1 === col("b_id"))
      .select(expr("l2_sq(a_emb, b_emb)").as("fast"),
        l2Hof(col("a_emb"), col("b_emb")).as("ref"))
      // null-SAFE inequality: a native-nulls-where-HOF-doesn't regression
      // must fail, not fall out of the comparison
      .filter(!(col("fast") <=> col("ref")))
    assert(diff.count() === 0)
    val s = spark
    import s.implicits._
    val edge = Seq(
      ("mismatch", Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),
      ("empty", Array.empty[Float], Array.empty[Float]),
      ("ok", Array(1.0f, 2.0f), Array(3.0f, 1.0f)))
      .toDF("k", "a", "b")
    val rows = edge.selectExpr("k", "l2_sq(a, b) AS d")
      .collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(rows("mismatch") === null, "length mismatch must null (HOF parity)")
    assert(rows("empty") === 0.0, "empty arrays fold to the 0.0 zero element")
    assert(rows("ok") === 5.0)
    // interpreted eval agrees with codegen
    def lit2(a: Array[Float]) =
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
    assert(graft.functions.L2Sq(
      lit2(Array(1.0f, 2.0f)), lit2(Array(3.0f, 1.0f))).eval(null) === 5.0)
    assert(graft.functions.L2Sq(
      lit2(Array(1.0f)), lit2(Array(1.0f, 2.0f))).eval(null) === null)
    assert(graft.functions.L2Sq(
      lit2(Array.empty[Float]), lit2(Array.empty[Float])).eval(null) === 0.0)
  }

  test("cosine_sim is usable from plain SQL (extension registration)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("stripe_sums: codegen == interpreted == reference; edge cases") {
    val s = spark
    import s.implicits._
    // codegen path over a real dataframe
    val got = Seq("abcdefghij", "", "x")
      .toDF("t").selectExpr("stripe_sums(CAST(t AS BINARY)) AS f")
      .collect().map(_.getSeq[Long](0).toList)
    def ref(str: String): List[Long] = {
      val sums = new Array[Long](8)
      str.getBytes("UTF-8").zipWithIndex.foreach { case (b, i) =>
        sums(i % 8) += b & 0xff }
      sums.toList
    }
    assert(got(0) === ref("abcdefghij"))
    assert(got(1) === List.fill(8)(0L), "empty payload → zero vector")
    assert(got(2) === ref("x"))
    // interpreted eval matches codegen
    val interp = graft.functions.StripeSums(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "abcdefghij".getBytes("UTF-8"),
        org.apache.spark.sql.types.BinaryType)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toList
    assert(interp === ref("abcdefghij"))
    // null payload → null (nullSafeEval contract)
    assert(Seq((Option.empty[Array[Byte]], 1)).toDF("p", "i")
      .selectExpr("stripe_sums(p) AS f").head.isNullAt(0))
  }
}
