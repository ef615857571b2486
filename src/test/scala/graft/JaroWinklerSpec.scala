package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerImpl

/** EXPR-6 kernel + plan checks: the literature goldens the kernel must
  * reproduce (they are also DuckDB's outputs — the oracle contract), and
  * the codegen path staying inside whole-stage codegen. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("kernel reproduces the literature goldens (== DuckDB)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("hello", "hello") === 1.0)
    assert(jw("", "") === 0.0, "both-empty is 0.0 per the oracle")
    assert(jw("abc", "") === 0.0)
    assert(jw("ab", "ba") === 0.0, "window 0: transposed pair no match")
    // boundary: jaro lands just above 0.7 → prefix boost applies (0.79)
    assert(math.abs(jw("abcxy", "abcdef") - 0.79) < 1e-12)
    // symmetric
    assert(jw("dixon", "dicksonx") === jw("dicksonx", "dixon"))
  }

  test("expression runs inside whole-stage codegen") {
    // literal inputs constant-fold (good — foldable works); a real scan
    // exercises the generated code path
    val df = Tables.part(spark, Sf0001)
      .select(expr("jaro_winkler(p_name, reverse(p_name))").as("jw"))
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` stage marker is the compact form of WholeStageCodegen
    assert("\\*\\(\\d+\\) Project \\[jaro_winkler".r.findFirstIn(p).isDefined,
      s"jaro_winkler must not fall out of codegen:\n$p")
    val got = df.collect().map(_.getDouble(0))
    assert(got.forall(v => v >= 0.0 && v <= 1.0) && got.length > 0)
  }
}
