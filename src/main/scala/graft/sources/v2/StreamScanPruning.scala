package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2

/** Column pruning for icelite STREAMING reads.
  *
  * Spark's DSv2 pushdown (`V2ScanRelationPushDown`) only runs on batch
  * relations; the micro-batch planner builds the stream scan straight from
  * `newScanBuilder(options).build()` with no `pruneColumns` call (verified
  * against Spark 4.1's `MicroBatchExecution`), so a streaming source always
  * serves its full declared schema — wasted IO on wide tables, exactly
  * where a 100 TB stream hurts most.
  *
  * This analyzer rule closes the gap at the one hook that runs BEFORE the
  * stream scan is frozen: when a resolved `Project` (optionally over a
  * `Filter`) sits directly on an icelite `StreamingRelationV2` and
  * references a strict subset of its columns, the relation is replaced
  * with one whose [[IceLiteTable]] is narrowed to the referenced columns
  * (table order, original attribute instances kept — parents keep binding
  * by exprId). The micro-batch reader then requests only those columns
  * from parquet. Purely an optimization: with the rule absent the stream
  * still answers correctly from the full schema.
  */
case class StreamScanPruning(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, rel: StreamingRelationV2)
        if prunable(rel, p.references) =>
      p.copy(child = narrow(rel, p.references))
    case p @ Project(_, f @ Filter(cond, rel: StreamingRelationV2))
        if prunable(rel, p.references ++ cond.references) =>
      p.copy(child = f.copy(child = narrow(rel, p.references ++ cond.references)))
    // filter PUSHING (same Spark gap as column pruning: the micro-batch
    // planner never runs DSv2 pushdown): translatable conjuncts ride into
    // the stream table and prune each batch's files against partition
    // values + manifest stats before IO. The Filter node stays — pruning
    // is conservative, row semantics never change.
    case f @ Filter(cond, rel: StreamingRelationV2) if pushableInto(rel) =>
      val translated = splitConjunctivePredicates(cond).flatMap(translate)
      if (translated.isEmpty) f
      else f.copy(child = rel.copy(table =
        rel.table.asInstanceOf[IceLiteTable].withStreamFilters(translated)))
  }

  /** Catalyst predicate -> v1 source Filter, for the shapes FilePrune can
    * use (DataSourceStrategy.translateFilter is protected[sql]). Literal
    * values convert to their external form — what FilePrune compares.
    */
  private def translate(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.{sources => sf}
    import org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala
    def ext(l: ce.Literal): Any = convertToScala(l.value, l.dataType)
    e match {
      case ce.And(l, r) => for (a <- translate(l); b <- translate(r)) yield sf.And(a, b)
      case ce.Or(l, r) => for (a <- translate(l); b <- translate(r)) yield sf.Or(a, b)
      case ce.Not(c) => translate(c).map(sf.Not)
      case ce.EqualTo(a: ce.AttributeReference, l: ce.Literal) => Some(sf.EqualTo(a.name, ext(l)))
      case ce.EqualTo(l: ce.Literal, a: ce.AttributeReference) => Some(sf.EqualTo(a.name, ext(l)))
      case ce.EqualNullSafe(a: ce.AttributeReference, l: ce.Literal) => Some(sf.EqualNullSafe(a.name, ext(l)))
      case ce.EqualNullSafe(l: ce.Literal, a: ce.AttributeReference) => Some(sf.EqualNullSafe(a.name, ext(l)))
      case ce.GreaterThan(a: ce.AttributeReference, l: ce.Literal) => Some(sf.GreaterThan(a.name, ext(l)))
      case ce.GreaterThan(l: ce.Literal, a: ce.AttributeReference) => Some(sf.LessThan(a.name, ext(l)))
      case ce.GreaterThanOrEqual(a: ce.AttributeReference, l: ce.Literal) => Some(sf.GreaterThanOrEqual(a.name, ext(l)))
      case ce.GreaterThanOrEqual(l: ce.Literal, a: ce.AttributeReference) => Some(sf.LessThanOrEqual(a.name, ext(l)))
      case ce.LessThan(a: ce.AttributeReference, l: ce.Literal) => Some(sf.LessThan(a.name, ext(l)))
      case ce.LessThan(l: ce.Literal, a: ce.AttributeReference) => Some(sf.GreaterThan(a.name, ext(l)))
      case ce.LessThanOrEqual(a: ce.AttributeReference, l: ce.Literal) => Some(sf.LessThanOrEqual(a.name, ext(l)))
      case ce.LessThanOrEqual(l: ce.Literal, a: ce.AttributeReference) => Some(sf.GreaterThanOrEqual(a.name, ext(l)))
      case ce.In(a: ce.AttributeReference, vs) if vs.forall(_.isInstanceOf[ce.Literal]) =>
        Some(sf.In(a.name, vs.map(v => ext(v.asInstanceOf[ce.Literal])).toArray))
      case ce.InSet(a: ce.AttributeReference, vs) =>
        Some(sf.In(a.name, vs.map(v => convertToScala(v, a.dataType)).toArray))
      case ce.IsNull(a: ce.AttributeReference) => Some(sf.IsNull(a.name))
      case ce.IsNotNull(a: ce.AttributeReference) => Some(sf.IsNotNull(a.name))
      case ce.StartsWith(a: ce.AttributeReference, l: ce.Literal)
          if l.value != null => Some(sf.StringStartsWith(a.name, l.value.toString))
      case _ => None
    }
  }

  private def prunable(rel: StreamingRelationV2, refs: AttributeSet): Boolean =
    rel.table.isInstanceOf[IceLiteTable] && rel.resolved && {
      val kept = rel.output.count(refs.contains)
      kept > 0 && kept < rel.output.size
    }

  // push only once: a table that already carries stream filters is done
  // (keeps the fixpoint analyzer from re-wrapping forever)
  private def pushableInto(rel: StreamingRelationV2): Boolean =
    rel.resolved && (rel.table match {
      case t: IceLiteTable => t.streamFilters.isEmpty
      case _ => false
    })

  private def narrow(rel: StreamingRelationV2, refs: AttributeSet): StreamingRelationV2 = {
    val kept = rel.output.filter(refs.contains)
    rel.copy(
      table = rel.table.asInstanceOf[IceLiteTable].narrowTo(kept.map(_.name)),
      output = kept)
  }
}
