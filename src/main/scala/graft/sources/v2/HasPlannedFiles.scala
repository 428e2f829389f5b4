package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Public diagnostic surface of an icelite scan: which data files survived
  * static pruning. Spark's `df.inputFiles` only understands file-source
  * relations (it returns EMPTY for DSv2 scans), so pruning assertions —
  * in specs and inside self-checking queries — read this instead, via
  * [[HasPlannedFiles.of]] on the optimized plan.
  */
trait HasPlannedFiles {
  def plannedFilePaths: Seq[String]
}

object HasPlannedFiles {

  /** Planned data files of every icelite scan in `df`'s optimized plan
    * (after filter pushdown, before runtime filters).
    */
  def of(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collect { case s: HasPlannedFiles => s.plannedFilePaths }.flatten
}
