package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** Table-valued SQL surface for the CDC changelog:
  * `SELECT * FROM icelite_changes('<warehouse>', '<ns>.<tbl>',
  * <fromSnapshotId>[, <toSnapshotId>])` resolves to the same bounded
  * change-replay plan as `IceTable.changelog` — every committed row change
  * in `(from, to]` with `_change_type`/`_commit_snapshot_id` — so SQL-only
  * consumers (schedulers, BI, notebooks without the library) replay a CDC
  * window. Arguments must be literals: they select table METADATA, which is
  * exactly the planning-time decision a table function makes.
  */
object ChangesTvf {

  /** Parse the shared (warehouse, ns.tbl, from[, to]) argument shape. */
  private def parse(fname: String, args: Seq[Expression])
      : (graft.icelite.IceTable, Long, Option[Long]) = {
    require(args.length == 3 || args.length == 4,
      s"$fname(warehouse, 'ns.tbl', fromSnapshotId[, toSnapshotId]) " +
        s"takes 3-4 arguments, got ${args.length}")
    def lit(i: Int, what: String): Any = {
      val e = args(i)
      require(e.foldable, s"$fname: $what must be a literal, got $e")
      val v = e.eval()
      require(v != null, s"$fname: $what must not be null")
      v
    }
    def str(i: Int, what: String): String = lit(i, what) match {
      case s: UTF8String => s.toString
      case other => other.toString
    }
    def long(i: Int, what: String): Long = lit(i, what) match {
      case n: Number => n.longValue
      case other => throw new IllegalArgumentException(
        s"$fname: $what must be an integer snapshot id, got $other")
    }
    val warehouse = str(0, "warehouse")
    val ident = str(1, "table")
    val parts = ident.split("\\.", 2)
    require(parts.length == 2,
      s"$fname: table must be '<namespace>.<table>', got '$ident'")
    val from = long(2, "fromSnapshotId")
    val to = if (args.length == 4) Some(long(3, "toSnapshotId")) else None
    val tbl = new graft.icelite.IceCatalog(SparkSession.active, warehouse)
      .loadTable(parts(0), parts(1))
    (tbl, from, to)
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    val (tbl, from, to) = parse("icelite_changes", args)
    // the changelog DataFrame's analyzed plan IS the function's expansion
    tbl.changelog(from, to).queryExecution.analyzed
  }

  /** `icelite_appends(warehouse, 'ns.tbl', from[, to])` — the incremental
    * APPEND scan as SQL (rows added by snapshots in `(from, to]`; fails on
    * non-append history, same contract as `changesSince`).
    */
  def buildAppends(args: Seq[Expression]): LogicalPlan = {
    val (tbl, from, to) = parse("icelite_appends", args)
    tbl.changesSince(from, to).queryExecution.analyzed
  }
}
