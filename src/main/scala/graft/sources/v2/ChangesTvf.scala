package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** Table-valued SQL surface for the CDC changelog:
  * `SELECT * FROM icelite_changes('<warehouse>', '<ns>.<tbl>',
  * <from>[, <to>])` resolves to the same bounded change-replay plan as
  * `IceTable.changelog` — every committed row change in `(from, to]` with
  * `_change_type`/`_commit_snapshot_id` — so SQL-only consumers
  * (schedulers, BI, notebooks without the library) replay a CDC window.
  * Bounds are snapshot ids (integer literals), TAG/BRANCH names, or POINTS
  * IN TIME (TIMESTAMP/DATE/string literals, resolved against the snapshot
  * log with `TIMESTAMP AS OF` semantics) — CDC consumers think in time and
  * releases ("what changed between v1 and v2"), not snapshot ids.
  * Arguments must be literals: they select table METADATA, which is
  * exactly the planning-time decision a table function makes.
  */
object ChangesTvf {

  /** A window bound: a snapshot id (integer literal), a tag/branch name,
    * or a point in time (TIMESTAMP/DATE/string literal) resolved against
    * the snapshot log. String bounds try the ref ledger first — "what
    * changed between release tags" is the natural CDC diff question —
    * then parse as a timestamp.
    */
  private sealed trait Bound
  private final case class IdBound(id: Long) extends Bound
  private final case class TimeBound(micros: Long) extends Bound
  private final case class NameBound(s: String) extends Bound

  private def tsMicros(fname: String, what: String, s: String): Long =
    try IceLiteV2.tsMicros(s"$fname: $what", s)
    catch {
      case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$fname: $what string '$s' is neither a tag/branch of this " +
            "table nor a timestamp (use an integer literal for a " +
            "snapshot id)")
    }

  /** `TIMESTAMP AS OF` semantics per bound: the table state at time t is
    * the latest snapshot committed at or before t, so a time `from` means
    * "changes since t" (nothing committed yet → the whole history) and a
    * time `to` pins the window's end state (which must exist).
    */
  private def resolve(fname: String, what: String,
      tbl: graft.icelite.IceTable, b: Bound, isFrom: Boolean): Long = b match {
    case IdBound(id) => id
    case NameBound(s) =>
      tbl.meta.refSnapshot(s) match {
        case Some(id) => id
        case None =>
          resolve(fname, what, tbl, TimeBound(tsMicros(fname, what, s)), isFrom)
      }
    case TimeBound(us) =>
      val ms = us / 1000L
      IceLiteV2.snapshotAtOrBefore(tbl.meta, ms)
        .getOrElse {
          if (isFrom) 0L
          else throw new IllegalArgumentException(
            s"$fname: no snapshot committed at or before the $what bound " +
              s"($ms ms since epoch)")
        }
  }

  /** Parse the shared (warehouse, ns.tbl, from[, to]) argument shape;
    * bounds are snapshot ids or timestamps (see [[resolve]]).
    */
  private def parse(fname: String, args: Seq[Expression])
      : (graft.icelite.IceTable, Long, Option[Long]) = {
    require(args.length == 3 || args.length == 4,
      s"$fname(warehouse, 'ns.tbl', from[, to]) takes 3-4 arguments " +
        s"(bounds: integer snapshot id or TIMESTAMP/DATE/'yyyy-mm-dd …' " +
        s"string), got ${args.length}")
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
    def bound(i: Int, what: String): Bound = {
      import org.apache.spark.sql.types._
      val v = lit(i, what)
      args(i).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          IdBound(v.asInstanceOf[Number].longValue)
        case TimestampType | TimestampNTZType => // micros (sessions pin UTC)
          TimeBound(v.asInstanceOf[Number].longValue)
        case DateType => // epoch day → midnight UTC
          TimeBound(v.asInstanceOf[Number].longValue * 86400000000L)
        case StringType => NameBound(v.toString) // ref first, then timestamp
        case other => throw new IllegalArgumentException(
          s"$fname: $what must be an integer snapshot id or a " +
            s"timestamp/date, got ${other.simpleString}")
      }
    }
    val warehouse = str(0, "warehouse")
    val ident = str(1, "table")
    val parts = ident.split("\\.", 2)
    require(parts.length == 2,
      s"$fname: table must be '<namespace>.<table>', got '$ident'")
    val fromB = bound(2, "from")
    val toB = if (args.length == 4) Some(bound(3, "to")) else None
    val tbl = new graft.icelite.IceCatalog(SparkSession.active, warehouse)
      .loadTable(parts(0), parts(1))
    val from = resolve(fname, "from", tbl, fromB, isFrom = true)
    val to = toB.map(resolve(fname, "to", tbl, _, isFrom = false))
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
