package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.icelite.{FilePrune, FileStat, FileStats, Ndv}

/** Randomized SOUNDNESS guard for stat + bloom file pruning: for any row
  * set, the manifest entry a writer would record (min/max/null counts in
  * the stat-string encoding, blooms in the production hash domains), and
  * any filter tree over the pushable grammar, [[FilePrune.canMatch]] must
  * be TRUE whenever SOME row satisfies the filter under three-valued SQL
  * semantics — a false prune is silent missing rows, the one unrecoverable
  * failure mode of this layer. Effectiveness (pruning when nothing
  * matches) is deliberately NOT asserted: conservative keeps are always
  * legal.
  *
  * Domains chosen to hit the sharp edges: longs with extremes, ASCII
  * strings incl. "" (UTF-8 binary order == Java order on ASCII), doubles
  * incl. -0.0/0.0 (SQL-equal, IEEE-ordered), and decimals straddling the
  * p=18 long/byte hash boundary (scheme-v2 bloom + scaled-string stats,
  * incl. values whose unscaled form no longer fits a long).
  */
class FilePruneSoundSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("d", DoubleType), StructField("m", DecimalType(23, 2))))

  private val kDom: Seq[Long] = Seq(Long.MinValue, -7L, 0L, 1L, 42L, Long.MaxValue)
  private val sDom: Seq[String] = Seq("", "a", "ab", "b", "z9", "zz")
  private val dDom: Seq[Double] = Seq(-1.5, -0.0, 0.0, 2.25, 1e9)
  private val mDom: Seq[java.math.BigDecimal] = Seq(
    "-5.00", "0.01", "12.34", "999999999999999999.99", // fits a long unscaled
    "123456789012345678901.23" // p>18: two's-complement byte hash form
  ).map(new java.math.BigDecimal(_))

  private def opt[T](dom: Seq[T]): Gen[Option[T]] =
    Gen.frequency(5 -> Gen.oneOf(dom).map(Some(_)), 1 -> Gen.const(None))

  private case class Row(k: Option[Long], s: Option[String],
      d: Option[Double], m: Option[java.math.BigDecimal])

  private val rowGen: Gen[Row] =
    for { k <- opt(kDom); s <- opt(sDom); d <- opt(dDom); m <- opt(mDom) }
      yield Row(k, s, d, m)

  // -- the manifest entry a writer would record for `rows` ------------------

  private def statOf(rows: Seq[Row], uniq: Int): FileStat = {
    def enc[T](vs: Seq[T], lt: (T, T) => Boolean, render: T => String)
        : (Map[String, String], Map[String, String]) => (Option[String], Option[String]) =
      (_, _) => if (vs.isEmpty) (None, None)
        else (Some(render(vs.reduce((a, b) => if (lt(a, b)) a else b))),
          Some(render(vs.reduce((a, b) => if (lt(a, b)) b else a))))
    val ks = rows.flatMap(_.k); val ss = rows.flatMap(_.s)
    val ds = rows.flatMap(_.d); val ms = rows.flatMap(_.m)
    def put(c: String, lohi: (Option[String], Option[String]),
        into: (Map[String, String], Map[String, String]))
        : (Map[String, String], Map[String, String]) = lohi match {
      case (Some(lo), Some(hi)) => (into._1 + (c -> lo), into._2 + (c -> hi))
      case _ => into
    }
    var mm = (Map.empty[String, String], Map.empty[String, String])
    mm = put("k", enc[Long](ks, _ < _, _.toString)(mm._1, mm._2), mm)
    mm = put("s", enc[String](ss, _ < _, identity)(mm._1, mm._2), mm)
    // -0.0/0.0 tie: either order is a legal writer bound; parseStat
    // normalizes on read. Render raw, exactly as a footer would.
    mm = put("d", enc[Double](ds, java.lang.Double.compare(_, _) < 0,
      _.toString)(mm._1, mm._2), mm)
    mm = put("m", enc[java.math.BigDecimal](ms, _.compareTo(_) < 0,
      _.toPlainString)(mm._1, mm._2), mm)
    val nulls = Map(
      "k" -> rows.count(_.k.isEmpty), "s" -> rows.count(_.s.isEmpty),
      "d" -> rows.count(_.d.isEmpty), "m" -> rows.count(_.m.isEmpty)
    ).map { case (c, n) => c -> n.toString }
    // blooms in the writer's exact hash domains (d is not bloom-eligible)
    def bloom(update: org.apache.datasketches.filters.bloomfilter.BloomFilter => Unit)
        : String = {
      val bf = org.apache.datasketches.filters.bloomfilter.BloomFilterBuilder
        .createByAccuracy(1000, FileStats.BloomFpp, FileStats.BloomSeed)
      update(bf)
      java.util.Base64.getEncoder.encodeToString(bf.toByteArray)
    }
    val blooms = Map(
      "k" -> bloom(bf => ks.foreach(bf.update)),
      "s" -> bloom(bf => ss.foreach { v =>
        val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val sn = new Array[Byte](b.length + 1)
        System.arraycopy(b, 0, sn, 1, b.length)
        bf.update(sn)
      }),
      "m" -> bloom(bf => ms.foreach { v =>
        Ndv.decimalHash(v.setScale(2).unscaledValue()) match {
          case Left(l) => bf.update(l)
          case Right(b) => bf.update(b)
        }
      }),
      FileStats.BloomVersionKey -> FileStats.BloomVersion)
    // uniq keeps FilePrune's (path, bytes, rows, col) bloom-cache keys
    // distinct across iterations — a collision would be a TEST artifact,
    // not a production hazard (committed paths are writer-unique)
    FileStat(s"file:/w/t/data/snap-00001/p-$uniq.parquet",
      rows = rows.length.toLong, bytes = 1000L + uniq,
      min = mm._1, max = mm._2, nulls = nulls, bloom = blooms)
  }

  // -- filter grammar --------------------------------------------------------

  // literal pools: the row domains plus absent-but-in-range probes
  private val kLit: Gen[Any] =
    Gen.oneOf[Any]((kDom: Seq[Any]) ++ Seq[Any](2L, 41L, null))
  private val sLit: Gen[Any] =
    Gen.oneOf[Any]((sDom: Seq[Any]) ++ Seq[Any]("aa", "y", null))
  private val dLit: Gen[Any] =
    Gen.oneOf[Any]((dDom: Seq[Any]) ++ Seq[Any](1.75, -0.0, null))
  private val mLit: Gen[Any] =
    Gen.oneOf[Any]((mDom: Seq[Any]) ++ Seq[Any](new java.math.BigDecimal("7.77"),
      new java.math.BigDecimal("123456789012345678901.24"), null))

  private def leaf: Gen[Filter] = {
    def cmps(c: String, lit: Gen[Any]): Seq[Gen[Filter]] = Seq(
      lit.map(EqualTo(c, _)), lit.map(EqualNullSafe(c, _)),
      Gen.nonEmptyListOf(lit).map(vs => In(c, vs.toArray)),
      lit.map(GreaterThan(c, _)), lit.map(GreaterThanOrEqual(c, _)),
      lit.map(LessThan(c, _)), lit.map(LessThanOrEqual(c, _)),
      Gen.const(IsNull(c)), Gen.const(IsNotNull(c)))
    val all = cmps("k", kLit) ++ cmps("s", sLit) ++ cmps("d", dLit) ++
      cmps("m", mLit) :+ Gen.oneOf("", "a", "z", "ab").map(StringStartsWith("s", _))
    Gen.choose(0, all.length - 1).flatMap(all(_))
  }

  private def tree(depth: Int): Gen[Filter] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => And(a, b) },
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => Or(a, b) },
      1 -> tree(depth - 1).map(Not))

  // -- reference three-valued evaluation (independent of FilePrune) ---------

  private def cmp(c: String, row: Row, v: Any): Option[Int] = {
    if (v == null) return None
    (c, v) match {
      case ("k", b: java.lang.Long) => row.k.map(a => java.lang.Long.compare(a, b))
      case ("s", b: String) => row.s.map(a => a.compareTo(b)) // ASCII == UTF-8 order
      case ("d", b: java.lang.Double) => row.d.map { a =>
        if (a == b.doubleValue) 0 // SQL: -0.0 == 0.0
        else java.lang.Double.compare(a, b.doubleValue)
      }
      case ("m", b: java.math.BigDecimal) => row.m.map(_.compareTo(b))
      case other => sys.error(s"unexpected $other")
    }
  }

  private def isNull(c: String, row: Row): Boolean = c match {
    case "k" => row.k.isEmpty
    case "s" => row.s.isEmpty
    case "d" => row.d.isEmpty
    case "m" => row.m.isEmpty
  }

  private def extEq(c: String, row: Row, v: Any): Boolean = (v, c) match {
    case (null, _) => isNull(c, row)
    case _ => cmp(c, row, v).contains(0)
  }

  private def eval3(f: Filter, row: Row): Option[Boolean] = f match {
    case And(l, r) => (eval3(l, row), eval3(r, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval3(l, row), eval3(r, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval3(c, row).map(!_)
    case EqualTo(c, v) => cmp(c, row, v).map(_ == 0)
    case EqualNullSafe(c, v) => Some(extEq(c, row, v))
    case In(c, vs) =>
      val rs = vs.toSeq.map(v => cmp(c, row, v).map(_ == 0))
      if (rs.contains(Some(true))) Some(true)
      else if (rs.contains(None)) None
      else Some(false)
    case GreaterThan(c, v) => cmp(c, row, v).map(_ > 0)
    case GreaterThanOrEqual(c, v) => cmp(c, row, v).map(_ >= 0)
    case LessThan(c, v) => cmp(c, row, v).map(_ < 0)
    case LessThanOrEqual(c, v) => cmp(c, row, v).map(_ <= 0)
    case IsNull(c) => Some(isNull(c, row))
    case IsNotNull(c) => Some(!isNull(c, row))
    case StringStartsWith(c, p) =>
      if (isNull(c, row)) None else Some(row.s.get.startsWith(p))
    case other => sys.error(s"ungenerated shape $other")
  }

  test("canMatch never prunes a file containing a satisfying row (stats + blooms)") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(4242L)
    def draw[T](g: Gen[T]): T = { val v = g.pureApply(params, seed); seed = seed.next; v }
    var mustKeep = 0
    for (i <- 1 to 4000) {
      val rows = draw(Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, rowGen)))
      val stat = statOf(rows, i)
      val f = draw(tree(3))
      if (rows.exists(r => eval3(f, r).contains(true))) {
        mustKeep += 1
        assert(FilePrune.canMatch(f, schema, stat),
          s"FALSE PRUNE: $f over rows=$rows\nstat=$stat")
      }
    }
    assert(mustKeep > 1000, s"generator produced too few satisfying cases: $mustKeep")
  }

  // -- hidden-partitioning soundness ----------------------------------------
  // A data file's rows all share one transform tuple, so a one-row file IS
  // the general case: dir values = the transforms of that row, rendered the
  // way the row-loop writer renders them (String.valueOf over applyCatalyst,
  // hive null dir for a null source). TransformPrune.canMatch must keep the
  // file whenever the row satisfies the filter.

  test("TransformPrune never prunes the file holding a satisfying row") {
    import graft.icelite.{PartField, Transforms, TransformPrune}
    val tSchema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("dt", DateType), StructField("m", DecimalType(12, 2))))
    val fields = PartField.parseSpec(Seq(
      "bucket(4, k)", "truncate(2, s)", "days(dt)", "bucket(8, m)"))
    val dateDom: Seq[java.time.LocalDate] = Seq(
      java.time.LocalDate.of(1969, 12, 31), java.time.LocalDate.of(1970, 1, 1),
      java.time.LocalDate.of(2024, 2, 29), java.time.LocalDate.of(2030, 7, 4))
    val mDom12: Seq[java.math.BigDecimal] =
      Seq("-5.00", "0.01", "12.34", "9999999999.99").map(new java.math.BigDecimal(_))

    case class PRow(k: Option[Long], s: Option[String],
        dt: Option[java.time.LocalDate], m: Option[java.math.BigDecimal])
    val prow: Gen[PRow] = for {
      k <- opt(kDom); s <- opt(sDom); d <- opt(dateDom); m <- opt(mDom12)
    } yield PRow(k, s, d, m)

    // dir values exactly as the row-loop writer computes them: the
    // catalyst-internal source value through applyCatalyst, String.valueOf
    def dirs(r: PRow): Map[String, Option[String]] = {
      def cat(c: String): Option[Any] = c match {
        case "k" => r.k
        case "s" => r.s.map(org.apache.spark.unsafe.types.UTF8String.fromString)
        case "dt" => r.dt.map(_.toEpochDay.toInt)
        case "m" => r.m.map { bd =>
          val d = org.apache.spark.sql.types.Decimal(bd)
          assert(d.changePrecision(12, 2)); d
        }
      }
      fields.map { f =>
        f.fieldName -> cat(f.source).map(v =>
          String.valueOf(Transforms.applyCatalyst(f, tSchema(f.source).dataType, v)))
      }.toMap
    }

    val dateLit: Gen[Any] = Gen.oneOf[Any]((dateDom.map(d =>
      java.sql.Date.valueOf(d)): Seq[Any]) ++
      Seq[Any](java.time.LocalDate.of(2024, 3, 1), null))
    val m12Lit: Gen[Any] = Gen.oneOf[Any]((mDom12: Seq[Any]) ++
      Seq[Any](new java.math.BigDecimal("7.77"), null))
    def pLeaf: Gen[Filter] = {
      def cmps(c: String, lit: Gen[Any]): Seq[Gen[Filter]] = Seq(
        lit.map(EqualTo(c, _)), lit.map(EqualNullSafe(c, _)),
        Gen.nonEmptyListOf(lit).map(vs => In(c, vs.toArray)),
        lit.map(GreaterThan(c, _)), lit.map(LessThanOrEqual(c, _)),
        Gen.const(IsNull(c)), Gen.const(IsNotNull(c)))
      val all = cmps("k", kLit) ++ cmps("s", sLit) ++ cmps("dt", dateLit) ++
        cmps("m", m12Lit) :+ Gen.oneOf("", "a", "ab", "abc")
          .map(StringStartsWith("s", _))
      Gen.choose(0, all.length - 1).flatMap(all(_))
    }
    def pTree(depth: Int): Gen[Filter] =
      if (depth <= 0) pLeaf
      else Gen.frequency(
        4 -> pLeaf,
        2 -> Gen.zip(pTree(depth - 1), pTree(depth - 1)).map { case (a, b) => And(a, b) },
        2 -> Gen.zip(pTree(depth - 1), pTree(depth - 1)).map { case (a, b) => Or(a, b) },
        1 -> pTree(depth - 1).map(Not))

    def toEpoch(v: Any): Option[Long] = v match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case _ => None
    }
    def pcmp(c: String, row: PRow, v: Any): Option[Int] = {
      if (v == null) return None
      (c, v) match {
        case ("k", b: java.lang.Long) => row.k.map(java.lang.Long.compare(_, b))
        case ("s", b: String) => row.s.map(_.compareTo(b))
        case ("dt", _) =>
          for { a <- row.dt.map(_.toEpochDay); b <- toEpoch(v) }
            yield java.lang.Long.compare(a, b)
        case ("m", b: java.math.BigDecimal) => row.m.map(_.compareTo(b))
        case other => sys.error(s"unexpected $other")
      }
    }
    def pIsNull(c: String, row: PRow): Boolean = c match {
      case "k" => row.k.isEmpty
      case "s" => row.s.isEmpty
      case "dt" => row.dt.isEmpty
      case "m" => row.m.isEmpty
    }
    def pEval(f: Filter, row: PRow): Option[Boolean] = f match {
      case And(l, r) => (pEval(l, row), pEval(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (pEval(l, row), pEval(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => pEval(c, row).map(!_)
      case EqualTo(c, v) => pcmp(c, row, v).map(_ == 0)
      case EqualNullSafe(c, v) =>
        if (v == null) Some(pIsNull(c, row))
        else Some(pcmp(c, row, v).contains(0))
      case In(c, vs) =>
        val rs = vs.toSeq.map(v => pcmp(c, row, v).map(_ == 0))
        if (rs.contains(Some(true))) Some(true)
        else if (rs.contains(None)) None
        else Some(false)
      case GreaterThan(c, v) => pcmp(c, row, v).map(_ > 0)
      case LessThanOrEqual(c, v) => pcmp(c, row, v).map(_ <= 0)
      case IsNull(c) => Some(pIsNull(c, row))
      case IsNotNull(c) => Some(!pIsNull(c, row))
      case StringStartsWith(c, p) =>
        if (pIsNull(c, row)) None else Some(row.s.get.startsWith(p))
      case other => sys.error(s"ungenerated shape $other")
    }

    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(777L)
    def draw[T](g: Gen[T]): T = { val v = g.pureApply(params, seed); seed = seed.next; v }
    var mustKeep = 0
    for (_ <- 1 to 4000) {
      val row = draw(prow)
      val raw = dirs(row)
      val f = draw(pTree(3))
      if (pEval(f, row).contains(true)) {
        mustKeep += 1
        assert(TransformPrune.canMatch(f, tSchema, fields, raw),
          s"FALSE TRANSFORM PRUNE: $f over row=$row dirs=$raw")
      }
    }
    assert(mustKeep > 1000, s"too few satisfying cases: $mustKeep")
  }
}
