package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** RULE-1 — automatic rewrite of the idiomatic group-wise top-k pattern
  *
  * {{{ Project(drop rn, Filter(rn <= k, Window(row_number() over
  *     (partition by g order by o) as rn, child))) }}}
  *
  * into [[TopKPerGroupPlan]], the heap-based physical operator (PLAN-1).
  * Users writing the textbook window formulation get the bounded-heap
  * plan — no per-group sort, map-side k-row pruning before the exchange —
  * without calling `TopK.perGroup` explicitly. Spark's own
  * InferWindowGroupLimit (SPARK-37099) attacks the same pattern but still
  * sorts every partition and still ships pre-limit rows group-local; this
  * rewrite removes the Window/Sort pair entirely, so the shuffle carries
  * ≤ k rows per (group, map partition) — at 100 TB the difference between
  * an O(n log n) sort stage and an O(n log k) streaming pass.
  *
  * Fires only on the exact shape where it is semantics-preserving:
  *  - the single window expression is `row_number()` (rank()/dense_rank()
  *    admit >k rows on boundary ties — different semantics, not rewritten);
  *  - the filter is a sole `rn <= k` / `rn < k` / `rn = 1` predicate
  *    (either operand order) with k a literal;
  *  - the parent Project drops the rank column (if rn survives, the
  *    positions must be materialized — only a Window can do that);
  *  - `partition by` is non-empty (global top-k is TakeOrdered's domain);
  *  - every sort key translates into the heap's total order (below).
  *
  * Order translation: the heap keeps k-smallest under one expression's
  * interpreted ordering, with struct fields compared ascending nulls-first.
  * Each SortOrder becomes struct field(s):
  *  - (Asc, NullsFirst)  → `key` (struct ordering is nulls-first already);
  *  - (Asc, NullsLast)   → `(isnull flag, key)`;
  *  - (Desc, _)          → `(isnull flag, flip(key))`, numeric-ish only,
  *    where flip is BitwiseNot for integral/date/time types (exact
  *    order-reversal, no Long.MinValue negation overflow) and UnaryMinus
  *    for fractional/decimal. Non-numeric descending keys veto the
  *    rewrite rather than risk a wrong order.
  * On boundary TIES in the sort key, row_number itself assigns positions
  * partition-order-nondeterministically, so any k of the tied rows is a
  * legal result — the heap's choice included.
  *
  * Runs in the extended-operator-optimization batch; if Spark inserted a
  * WindowGroupLimit below the Window first, it is recognized and dropped
  * (the heap subsumes it). Gated by `spark.graft.topk.autoRewrite`
  * (default on) so specs can compare both plans in one session.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.autoRewrite"

  def apply(plan: LogicalPlan): LogicalPlan =
    if (SQLConf.get.getConfString(ConfKey, "true") != "true") plan
    else plan.transformUp {
      case p @ Project(projectList,
          Filter(cond, w @ Window(Seq(a @ Alias(
            WindowExpression(_: RowNumber, _), _)), partSpec, orderSpec,
            wchild, _)))
          if partSpec.nonEmpty &&
            rankLimit(cond, a.toAttribute).exists(_ >= 1) &&
            !projectList.exists(_.references.contains(a.toAttribute)) &&
            orderSpec.forall(orderFields(_).isDefined) =>
        val k = rankLimit(cond, a.toAttribute).get
        // WindowGroupLimit below the Window is Spark's partial attack on
        // the same pattern — subsumed by the heap, so strip it.
        val child = wchild match {
          case WindowGroupLimit(ps, os, _, limit, c)
              if ps == partSpec && os == orderSpec && limit >= k => c
          case other => other
        }
        val ord = CreateStruct(orderSpec.flatMap(orderFields(_).get))
        Project(projectList, TopKPerGroupPlan(partSpec, ord, k, child))
    }

  /** k for a sole rank-limit predicate over `rn`, None if not that shape. */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
    def isRn(e: Expression): Boolean = e.semanticEquals(rn)
    cond match {
      case LessThanOrEqual(l, r) if isRn(l) => lit(r)
      case LessThan(l, r) if isRn(l) => lit(r).map(_ - 1)
      case GreaterThanOrEqual(l, r) if isRn(r) => lit(l)
      case GreaterThan(l, r) if isRn(r) => lit(l).map(_ - 1)
      case EqualTo(l, r) if isRn(l) => lit(r).filter(_ == 1)
      case EqualTo(l, r) if isRn(r) => lit(l).filter(_ == 1)
      case _ => None
    }
  }

  /** Struct fields realizing one SortOrder under ascending-nulls-first
    * struct comparison; None if the direction/type combo is untranslatable. */
  private def orderFields(so: SortOrder): Option[Seq[Expression]] = {
    val key = so.child
    def nullFlag(nullIsLarge: Boolean): Expression =
      If(IsNull(key), Literal(if (nullIsLarge) 1 else 0),
        Literal(if (nullIsLarge) 0 else 1))
    def flip: Option[Expression] = key.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(BitwiseNot(key))
      case DateType => Some(BitwiseNot(Cast(key, IntegerType)))
      case TimestampType | TimestampNTZType =>
        Some(BitwiseNot(Cast(key, LongType)))
      case FloatType | DoubleType | _: DecimalType => Some(UnaryMinus(key))
      case _ => None // strings etc.: no safe order-reversal expression
    }
    if (!RowOrdering.isOrderable(key.dataType)) None
    else (so.direction, so.nullOrdering) match {
      case (Ascending, NullsFirst) => Some(Seq(key))
      case (Ascending, NullsLast) => Some(Seq(nullFlag(nullIsLarge = true), key))
      case (Descending, NullsLast) =>
        flip.map(f => Seq(nullFlag(nullIsLarge = true), f))
      case (Descending, NullsFirst) =>
        flip.map(f => Seq(nullFlag(nullIsLarge = false), f))
    }
  }
}
