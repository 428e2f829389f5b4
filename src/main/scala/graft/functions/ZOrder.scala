package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaved z-order key over pre-normalized coordinates, as a native
  * codegen'd Catalyst expression.
  *
  * Children are LongType values already normalized into `[0, 2^bits)` (the
  * caller — [[graft.icelite.IceTable.compact]]'s z-order path — rescales
  * each column by its GLOBAL min/max from the committed manifest stats, so
  * normalization costs zero data passes). The key interleaves the top
  * `bits` of every coordinate MSB-first: points close in the key are close
  * in EVERY dimension, which is what makes a z-ordered file layout prune on
  * any clustered column, not just the first sort key.
  *
  * NULL handling: any NULL coordinate yields key 0, clustering NULL rows
  * together at the low end (a deliberate, stable choice — NULLs carry no
  * range information to interleave).
  */
case class ZOrderKey(children: Seq[Expression], bits: Int) extends Expression {

  require(children.nonEmpty && children.size * bits <= 63,
    s"zorder_key: ${children.size} dims x $bits bits must fit in a signed long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key requires long coordinates, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return 0L
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrder.interleave(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val anyNull = children.zip(evals)
      .filter(_._1.nullable).map(_._2.isNull.toString)
    val nullCheck = if (anyNull.isEmpty) "false" else anyNull.mkString(" || ")
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        |$childCode
        |long[] $arr = new long[${children.size}];
        |long ${ev.value} = 0L;
        |if (!($nullCheck)) {
        |  $fill
        |  ${ev.value} = graft.functions.ZOrder.interleave($arr, $bits);
        |}
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
}

object ZOrder {

  /** Interleave the low `bits` of each coordinate, MSB-first: the result's
    * highest bit group is (coord0's top bit, coord1's top bit, ...).
    */
  def interleave(vals: Array[Long], bits: Int): Long = {
    var key = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < vals.length) {
        key = (key << 1) | ((vals(d) >>> b) & 1L)
        d += 1
      }
      b -= 1
    }
    key
  }
}
