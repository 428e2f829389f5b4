package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.icelite.{FilePrune, FileStat}

/** Property guard for the partition-exact filter claim: whenever
  * [[FilePrune.exactOnPartitions]] accepts a filter, [[FilePrune.canMatch]]
  * over the file's partition values must equal a reference three-valued SQL
  * evaluation of the filter against the (per-file constant) partition tuple
  * — i.e. file kept ⟺ every row satisfies the filter. Randomized over the
  * claimable filter grammar and partition tuples including the hive null
  * partition, because the DSv2 scan DROPS Spark's re-evaluation for claimed
  * filters: any divergence here is silent wrong results.
  */
class FilePruneExactSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("p", StringType), StructField("k", LongType)))
  private val partCols = Set("p", "k")

  // a manifest entry with NO stats: exact claims must never lean on stats
  private val stat = FileStat("f", rows = 10, bytes = 1)

  private val pVals: Gen[Any] =
    Gen.oneOf[Any](null, "alpha", "apple", "beta", "gamma", "")
  private val kVals: Gen[Any] =
    Gen.oneOf[Any](null, 1L, 2L, 5L, -3L)

  private def leaf: Gen[Filter] = Gen.oneOf(
    pVals.map(v => EqualTo("p", v)),
    kVals.map(v => EqualTo("k", v)),
    pVals.map(v => EqualNullSafe("p", v)),
    Gen.nonEmptyListOf(pVals).map(vs => In("p", vs.toArray)),
    Gen.nonEmptyListOf(kVals).map(vs => In("k", vs.toArray)),
    pVals.map(v => GreaterThan("p", v)),
    kVals.map(v => GreaterThanOrEqual("k", v)),
    pVals.map(v => LessThan("p", v)),
    kVals.map(v => LessThanOrEqual("k", v)),
    Gen.const(IsNull("p")), Gen.const(IsNotNull("p")),
    Gen.const(IsNull("k")), Gen.const(IsNotNull("k")),
    Gen.oneOf("a", "al", "b", "").map(p => StringStartsWith("p", p)))

  private def tree(depth: Int): Gen[Filter] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => And(a, b) },
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => Or(a, b) },
      1 -> tree(depth - 1).map(Not))

  /** Reference three-valued SQL evaluation of `f` against the partition
    * tuple (None = UNKNOWN). Intentionally independent of FilePrune.
    */
  private def eval3(f: Filter, pv: Map[String, Any]): Option[Boolean] = {
    def cmp(c: String, v: Any): Option[Int] = (pv(c), v) match {
      case (null, _) | (_, null) => None
      case (a: String, b: String) => Some(a.compareTo(b))
      case (a: Long, b: Long) => Some(java.lang.Long.compare(a, b))
      case other => sys.error(s"unexpected pair $other")
    }
    f match {
      case And(l, r) => (eval3(l, pv), eval3(r, pv)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval3(l, pv), eval3(r, pv)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval3(c, pv).map(!_)
      case EqualTo(c, v) => cmp(c, v).map(_ == 0)
      case EqualNullSafe(c, v) => Some(pv(c) == v)
      case In(c, vs) =>
        val rs = vs.toSeq.map(v => cmp(c, v).map(_ == 0))
        if (rs.contains(Some(true))) Some(true)
        else if (rs.contains(None)) None
        else Some(false)
      case GreaterThan(c, v) => cmp(c, v).map(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v).map(_ >= 0)
      case LessThan(c, v) => cmp(c, v).map(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v).map(_ <= 0)
      case IsNull(c) => Some(pv(c) == null)
      case IsNotNull(c) => Some(pv(c) != null)
      case StringStartsWith(c, p) => pv(c) match {
        case null => None
        case s: String => Some(s.startsWith(p))
        case other => sys.error(s"unexpected $other")
      }
      case other => sys.error(s"ungenerated shape $other")
    }
  }

  test("claimed filters: canMatch over partition values == three-valued truth") {
    // partValues as FilePrune receives them: decoded externals, null for
    // the hive null partition (UTF8String for strings — mirror
    // PartValues.internalValue's representation)
    def decoded(p: Any, k: Any): Map[String, Any] = Map(
      "p" -> (p match {
        case null => null
        case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      }),
      "k" -> k)
    // seeded hand-rolled driver (scalatestplus isn't on the classpath):
    // 5000 deterministic samples over the claimable grammar
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    def draw[T](g: Gen[T]): T = { val v = g.pureApply(params, seed); seed = seed.next; v }
    var claimed = 0
    for (_ <- 1 to 5000) {
      val f = draw(tree(3)); val p = draw(pVals); val k = draw(kVals)
      if (FilePrune.exactOnPartitions(f, schema, partCols)) {
        claimed += 1
        val kept = FilePrune.canMatch(f, schema, stat, decoded(p, k))
        val truth = eval3(f, Map("p" -> p, "k" -> k)).contains(true)
        assert(kept == truth,
          s"claim diverges for $f over p=$p k=$k: canMatch=$kept truth=$truth")
      }
    }
    assert(claimed > 1000, s"generator produced too few claimable filters: $claimed")
  }

  test("exactness is refused on non-renderable partition column types") {
    // A legacy/externally-written table can have a float/double identity
    // partition column (internalValue decodes them for pruning), but their
    // directory spellings (NaN, -0.0) don't round-trip — cmpExternal can
    // return None and canMatch conservatively KEEPS the file while the
    // claimed filter is never re-evaluated. Such columns must never
    // support an exactness claim; conservative pruning remains fine.
    val dblSchema = StructType(Seq(
      StructField("d", DoubleType), StructField("p", StringType)))
    val cols = Set("d", "p")
    assert(!FilePrune.exactOnPartitions(EqualTo("d", 1.5), dblSchema, cols))
    assert(!FilePrune.exactOnPartitions(GreaterThan("d", 0.0), dblSchema, cols))
    assert(!FilePrune.exactOnPartitions(
      In("d", Array[Any](1.0, 2.0)), dblSchema, cols))
    assert(!FilePrune.exactOnPartitions(
      And(EqualTo("p", "a"), LessThan("d", 3.0)), dblSchema, cols))
    // the renderable column alone still claims
    assert(FilePrune.exactOnPartitions(EqualTo("p", "a"), dblSchema, cols))
  }
}
