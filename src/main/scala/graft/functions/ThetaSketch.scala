package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** AGG-22 — Theta sketches (Apache DataSketches) as first-class aggregate
  * state, the set-INTERSECTION complement to the built-in HLL surface
  * (agg16/agg19/agg21).
  *
  * Why theta and not HLL: HLL state only supports UNION, so intersection
  * cardinality must go through inclusion–exclusion (|A∩B| = |A|+|B|−|A∪B|),
  * whose absolute error scales with |A∪B| — for small overlaps of large
  * sets the estimate can even go negative (agg19 documents a 15% bound for
  * this reason). A theta sketch IS a uniform hash-sample of the set below
  * an adaptive threshold θ, so intersection is computable DIRECTLY on the
  * retained samples (intersect the entry sets, keep min θ) with error
  * proportional to the intersection itself — the DataSketches set-algebra
  * story. Same lakehouse mergeability as agg16: per-slice sketches persist
  * once, any union/intersection/difference is answered from footprint-sized
  * state without rescanning.
  *
  * Execution: [[ThetaSketchAgg]] is a TypedImperativeAggregate[Union] —
  * partial aggregation works map-side (each task builds a local union,
  * serialized as a compact sketch across the shuffle; merge re-unions), so
  * at 100 TB the exchange carries ≤ 2^lgK × 8-byte entries per task, never
  * rows. The scalar estimate expressions run on 1-row final stages — not a
  * hot path, CodegenFallback is fine there.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg does not support ${t.catalogString} input")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => u.update(v.asInstanceOf[Long])
      case IntegerType => u.update(v.asInstanceOf[Int].toLong)
      case ShortType => u.update(v.asInstanceOf[Short].toLong)
      case ByteType => u.update(v.asInstanceOf[Byte].toLong)
      case DoubleType => u.update(v.asInstanceOf[Double])
      case FloatType => u.update(v.asInstanceOf[Float].toDouble)
      // UTF8String.getBytes matches DuckDB/Java UTF-8 hashing of the text
      case StringType =>
        u.update(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      case BinaryType => u.update(v.asInstanceOf[Array[Byte]])
      case t => throw new IllegalStateException(s"unsupported input type $t")
    }
    u
  }

  override def merge(u: Union, other: Union): Union = {
    u.union(other.getResult)
    u
  }

  override def eval(u: Union): Any = u.getResult.toByteArray

  // a Union's mergeable state IS its compact result (union is associative),
  // the same trick Spark's own HllSketchAgg uses
  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** `theta_estimate(sketch_bytes) -> double` — distinct-count estimate. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects binary, got ${t.catalogString}")
  }
  override def nullSafeEval(b: Any): Any =
    Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** `theta_intersect_estimate(a, b) -> double` — |A∩B| computed DIRECTLY on
  * the two sketches' retained samples (no inclusion–exclusion). */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback
    with BinaryLike[Expression] {
  override def prettyName: String = "theta_intersect_estimate"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_estimate expects (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEstimate = copy(l, r)
}

/** Registration (same extension point as VectorExtensions). */
object ThetaExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v, _) => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("theta_sketch_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => ThetaSketchAgg(c)
        case Seq(c, k) => ThetaSketchAgg(c, intLit(k, "theta_sketch_agg lgK"))
        case _ => throw new IllegalArgumentException(
          "theta_sketch_agg(col[, lgK])")
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "theta_estimate"),
      (children: Seq[Expression]) => ThetaEstimate(children.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        "theta_intersect_estimate"),
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName,
        "theta_intersect_estimate"),
      (children: Seq[Expression]) =>
        ThetaIntersectEstimate(children(0), children(1))))
  }
}
