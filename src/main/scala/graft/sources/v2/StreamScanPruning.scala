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
case class StreamScanPruning(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, rel: StreamingRelationV2)
        if prunable(rel, p.references) =>
      p.copy(child = narrow(rel, p.references))
    case p @ Project(_, f @ Filter(cond, rel: StreamingRelationV2))
        if prunable(rel, p.references ++ cond.references) =>
      p.copy(child = f.copy(child = narrow(rel, p.references ++ cond.references)))
  }

  private def prunable(rel: StreamingRelationV2, refs: AttributeSet): Boolean =
    rel.table.isInstanceOf[IceLiteTable] && rel.resolved && {
      val kept = rel.output.count(refs.contains)
      kept > 0 && kept < rel.output.size
    }

  private def narrow(rel: StreamingRelationV2, refs: AttributeSet): StreamingRelationV2 = {
    val kept = rel.output.filter(refs.contains)
    rel.copy(
      table = rel.table.asInstanceOf[IceLiteTable].narrowTo(kept.map(_.name)),
      output = kept)
  }
}
