package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the "top-1 per key" window pattern
  *
  * {{{ Project(cols, Filter(rn = 1, Window(rn <- row_number() OVER
  *     (PARTITION BY k ORDER BY o...), child))) }}}
  *
  * into a `max_by`/`min_by` hash aggregate:
  *
  * {{{ Project(cols, Aggregate(k, k ++ max_by(struct(values),
  *     struct(o...)), child)) }}}
  *
  * Why (SURVEY §2 G/H "latest per machine"): the window form sorts every
  * partition and shuffles all rows; the aggregate form is a partial+final
  * HashAggregate — O(n), one row per key per map task over the wire.
  * Spark's own `InferWindowGroupLimit` (3.5+) only prunes rows before
  * the sort; it keeps the sort and the full shuffle.
  *
  * Applicability gates (bail out otherwise):
  *  - window function is exactly one `row_number()` aliased and filtered
  *    with `= 1` (rank/dense_rank have different tie semantics);
  *  - ordering directions are all Descending (→ max_by) or all
  *    Ascending (→ min_by) — struct comparison is lexicographic, so a
  *    single ordering struct emulates the multi-key sort;
  *  - the parent Project references only the child's columns (the rn
  *    attribute is dropped).
  *
  * Tie semantics: when the ordering is not total, row_number picks an
  * arbitrary-but-single row, max_by an arbitrary row — both
  * "any tied row"; per-row atomicity is preserved because all value
  * columns travel in ONE struct.
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object RewriteTop1PerKey extends Rule[LogicalPlan] {

  private def isRnEqOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
          Filter(cond,
            Window(Seq(al @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, order, _)), _)), _, _, child, _)))
        if order.nonEmpty && part.nonEmpty &&
          isRnEqOne(cond, al.toAttribute) &&
          projList.forall(_.references.subsetOf(child.outputSet)) &&
          part.forall(_.isInstanceOf[Attribute]) &&
          (order.forall(_.direction == Descending) ||
            order.forall(_.direction == Ascending)) &&
          // max_by/min_by struct comparison uses the direction's DEFAULT
          // null ordering; an explicit NULLS FIRST/LAST override (e.g.
          // DESC NULLS FIRST) would pick a different row when ordering
          // columns are nullable — bail out unless defaults are in use.
          order.forall(o => o.nullOrdering == o.direction.defaultNullOrdering) =>
      val partAttrs = part.map(_.asInstanceOf[Attribute])
      val others = child.output.filterNot(a => partAttrs.exists(_.semanticEquals(a)))
      val ordStruct = CreateStruct(order.map(_.child))
      val valStruct = CreateStruct(others)
      val pick =
        if (order.head.direction == Descending) MaxBy(valStruct, ordStruct)
        else MinBy(valStruct, ordStruct)
      val topAlias = Alias(pick.toAggregateExpression(), "__top1")()
      val agg = Aggregate(partAttrs, (partAttrs :+ topAlias).toSeq, child)
      // restore the child's attribute ids so the parent Project (and
      // everything above it) resolves unchanged
      val restored = others.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(topAlias.toAttribute, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
      Project(projList, Project((partAttrs ++ restored).toSeq, agg))
  }
}

/** Session extensions: `.config("spark.sql.extensions",
  * "graft.plans.GraftExtensions")` or
  * `builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteTop1PerKey)
    // whole-operator extension (tier c): grouped top-k physical operator
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // SQL row-level DML (DELETE FROM / UPDATE / MERGE INTO) over lake
    // catalog tables → the Lake's merge-on-read machinery (Delta's
    // DeltaAnalysis architecture; see graft.io.v2.GraftDmlRule)
    e.injectPostHocResolutionRule(_ => graft.io.v2.GraftDmlRule)
  }
}
