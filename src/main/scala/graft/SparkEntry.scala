package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator from SURVEY.md §2
  * (reference-surface ops keep their SURVEY ids: s/r/k/d prefixes) or one
  * engine extension (x = dedup / similarity / text / multimodal;
  * q/w/g/j/e = core relational capabilities). [[oracleSql]] holds the
  * DuckDB-equivalent SQL for every query whose semantics are SQL-expressible
  * over the same parquet tables.
  */
object SparkEntry {

  /** All operator definitions, grouped by module. */
  def allDefs: Seq[QDef] =
    Relational.defs ++ RelationalExt.defs ++ TextOps.defs ++ DedupOps.defs ++
      SimilarityOps.defs ++ IceliteOps.defs ++ graft.streaming.StreamOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_topk")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
