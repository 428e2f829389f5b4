package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float vectors in 20-bit fixed point, as a native
  * codegen'd Catalyst expression.
  *
  * Semantics (bit-identical to the SQL the oracle runs, see
  * `graft.queries.SimilarityOps`): every element is quantized
  * `floor(x * 2^20 + 0.5)` — exact in IEEE doubles — so the dot product and
  * both squared norms are int64 sums: order-insensitive, overflow-safe for
  * dims x values in the fixture range, engine-independent. Returns NULL if
  * either vector is NULL or has a zero norm.
  *
  * Why an Expression and not a UDF: the generated Java loops over the two
  * `ArrayData` buffers with no boxing, no Scala closure dispatch, and stays
  * inside whole-stage codegen — the surrounding operator pipeline fuses into
  * one JIT-compiled function. This is the preferred extension point when
  * built-in `functions._` can't express the semantics (builder guidance;
  * SURVEY §7 step 7).
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_cosine requires array<float> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_cosine"

  @inline private def q(x: Float): Long =
    math.floor(x.toDouble * 1048576.0 + 0.5).toLong

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (va, vb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += q(va.getFloat(i)) * q(vb.getFloat(i)); i += 1 }
    var na = 0L
    i = 0
    while (i < va.numElements()) { val x = q(va.getFloat(i)); na += x * x; i += 1 }
    var nb = 0L
    i = 0
    while (i < vb.numElements()) { val x = q(vb.getFloat(i)); nb += x * x; i += 1 }
    if (na == 0L || nb == 0L) null
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qa = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0 + 0.5);
         |  long $qb = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0 + 0.5);
         |  $dot += $qa * $qb;
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $qa = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0 + 0.5);
         |  $na += $qa * $qa;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  long $qb = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0 + 0.5);
         |  $nb += $qb * $qb;
         |}
         |if ($na == 0L || $nb == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (double) $dot / java.lang.Math.sqrt((double) $na * (double) $nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

/** Registration surface for graft's native expressions. */
object GraftFunctions {

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("quantized_cosine",
      new ExpressionInfo(classOf[QuantizedCosine].getName, "quantized_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantized_cosine(a, b) takes two array<float> args")
        QuantizedCosine(args.head, args(1))
      }),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(s) takes one string arg")
        NfcNormalize(args.head)
      }),
    ("zorder_key",
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 6,
          "zorder_key takes 1-6 normalized long coordinates")
        ZOrderKey(args, 63 / args.length)
      }),
    ("ndv_sketch",
      new ExpressionInfo(classOf[NdvSketchAgg].getName, "ndv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "ndv_sketch(col) takes one column")
        NdvSketchAgg(args.head)
      }),
    ("bpe_encode",
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bpe_encode(word, merges) takes a string and a literal array<array<string>>")
        BpeEncode(args.head, args(1))
      }))

  /** Imperative registration into an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
