package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro–Winkler kernel — one JVM-static call site so the codegen'd
  * expression stays inside whole-stage codegen (the CmsProbe/BloomNative
  * pattern: generated code calls a static method, no virtual dispatch, no
  * boxing).
  *
  * Semantics mirror DuckDB's `jaro_winkler_similarity` exactly (the
  * oracle): either side empty → 0.0 (INCLUDING both-empty — the textbook
  * definition says 1.0 there, the oracle says 0.0 and record linkage on
  * empty keys is meaningless anyway); match window max(|s1|,|s2|)/2 − 1;
  * transpositions counted over matched sequences; Winkler prefix bonus
  * (≤4 chars, p = 0.1) applied when jaro > 0.7, with the sum association
  * order (m/l1 + m/l2 + (m−t)/m)/3 preserved so boundary doubles land on
  * the same bits in both engines. Verified char-identical against DuckDB
  * on the standard literature pairs (martha/marhta 0.961…, dixon/dicksonx
  * 0.813…, boundary-0.7 boost case 0.79).
  */
object JaroWinklerImpl {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val j = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (j > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}

/** EXPR-6: `jaro_winkler(s1, s2) -> double` — the record-linkage
  * similarity (Winkler 1990) as a native codegen'd expression: er1's
  * levenshtein gives edit DISTANCE (cheap, thresholdable); Jaro–Winkler
  * gives a [0,1] SCORE weighting shared prefixes, the measure census-
  * style name matching actually ranks by. Scalar UDFs would break
  * whole-stage codegen on the blocked-pair hot path; this stays inside.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes() = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(l, r)
}

object StringSimilarityExtensions {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) =>
        JaroWinkler(children(0), children(1))))
  }
}
