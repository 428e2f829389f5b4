package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A learned BPE merge table, shipped to executors once per task binary as
  * an expression reference object (rank map rebuilt lazily on each JVM).
  *
  * Encode applies the PRIORITY formulation tokenizers run at inference
  * time: repeatedly find the lowest-rank adjacent symbol pair present in
  * the word and fold its occurrences left-to-right non-overlapping, until
  * no learnable pair remains. For any table produced by BPE TRAINING this
  * is equivalent to Sennrich's sequential replay (apply merge 1..k in
  * order): a learned merge's component symbols are themselves learned at
  * strictly lower ranks, so a lower-rank pair can never newly appear after
  * a higher-rank fold — the divergence case (a rank-1 pair whose left side
  * is a rank-2 product) cannot be emitted by the trainer. `TextBpeSpec`
  * proves the equivalence on the real corpus against an independent
  * sequential reference.
  *
  * Cost per word: O(passes x length) with vocabulary-independent memory —
  * the per-pair rank lookup is a hash probe, so a production-sized table
  * (32k-100k merges) encodes at the same per-word cost as this fixture's
  * 15. The table itself is merge-count-sized (tens of bytes per merge):
  * closure-shipping it is the broadcast, with no corpus-sized state
  * anywhere.
  */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {

  @transient private lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  private def codePoints(w: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    out
  }

  /** Tokenize one word; called from both eval and generated code. */
  def encode(word: UTF8String): ArrayData = {
    var syms = codePoints(word.toString)
    var done = syms.size < 2
    while (!done) {
      // lowest-rank pair present anywhere in the word
      var best = Integer.MAX_VALUE
      var i = 0
      while (i + 1 < syms.size) {
        val r = rank.get((syms.get(i), syms.get(i + 1)))
        if (r != null && r.intValue < best) best = r.intValue
        i += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val (l, r) = merges(best)
        val next = new java.util.ArrayList[String](syms.size)
        i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms.get(i) == l && syms.get(i + 1) == r) {
            next.add(l + r); i += 2 // left-to-right, non-overlapping
          } else { next.add(syms.get(i)); i += 1 }
        }
        syms = next
        if (syms.size < 2) done = true
      }
    }
    val out = new Array[Any](syms.size)
    var j = 0
    while (j < syms.size) { out(j) = UTF8String.fromString(syms.get(j)); j += 1 }
    new GenericArrayData(out)
  }
}

/** `bpe_encode(word, merges)` — the APPLY side of x38's trainer: split the
  * word into code-point symbols and fold the learned merges in, yielding
  * the token array a shipped tokenizer emits. `merges` must be a FOLDABLE
  * `array<array<string>>` of rank-ordered `[left, right]` pairs (the
  * `from_json`-schema-argument pattern): it is evaluated ONCE per
  * expression instance into a [[BpeTable]], never per row.
  *
  * Native expression, not a UDF: the generated code is a single virtual
  * call into [[BpeTable.encode]] on a reference object (the same shape as
  * Spark's own RegExpReplace calling into its compiled Pattern), so the
  * surrounding projection stays inside whole-stage codegen and the merge
  * table is deserialized once per executor, not once per row.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "bpe_encode merges must be a foldable literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires (string, array<array<string>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: BpeTable = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val pairs = new Array[(String, String)](arr.numElements())
    var i = 0
    while (i < pairs.length) {
      val p = arr.getArray(i)
      require(p != null && p.numElements() == 2,
        s"bpe_encode merges[$i] must be a [left, right] pair")
      pairs(i) = (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
      i += 1
    }
    new BpeTable(pairs)
  }

  override def nullSafeEval(w: Any, m: Any): Any =
    table.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $ref.encode($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}
