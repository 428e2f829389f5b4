package graft

import org.apache.spark.sql.functions._

/** x38 (BPE vocabulary training) has no SQL oracle — the loop is iterative —
  * so its correctness gate is this spec: an INDEPENDENT driver-side
  * reference implementation (plain Scala over the collected word-frequency
  * map, the textbook Sennrich formulation) must produce the identical
  * ranked merge list, including pair counts and the lexicographic
  * tie-break.
  */
class TextBpeSpec extends SparkSpec {

  // code-point split (Spark's length/substring semantics) via a different
  // mechanism than the production codePointSyms
  private def cps(w: String): Vector[String] = {
    import scala.jdk.CollectionConverters._
    w.codePoints().iterator().asScala
      .map(cp => new String(Character.toChars(cp.intValue))).toVector
  }

  private def referenceMerges(words: Map[String, Long], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var state: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (cps(w), f) }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count; ties break on UTF-8 byte order (Spark's string order)
        val ((l, r), cnt) = counts.toSeq.sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
          c1 > c2 || (c1 == c2 && (graft.queries.TextOps.utf8Lt(a1, a2) ||
            (a1 == a2 && graft.queries.TextOps.utf8Lt(b1, b2))))
        }.head
        out += ((rank, l, r, l + r, cnt))
        state = state.map { case (syms, f) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              buf += (l + r); i += 2 // left-to-right, non-overlapping
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), f)
        }
        rank += 1
      }
    }
    out.result()
  }

  test("utf8 tie-break and code-point split match Spark's string semantics") {
    // U+E000 (3 UTF-8 bytes, 0xEE..) sorts BELOW U+1F600 (4 bytes, 0xF0..)
    // in UTF-8 byte order — but Java's UTF-16 compareTo says the opposite
    // (surrogate 0xD83D < 0xE000). The driver loop must use the former.
    assert(graft.queries.TextOps.utf8Lt("", "😀"))
    assert("😀".compareTo("") < 0,
      "if this ever flips, the comment above is stale")
    assert(spark.sql("SELECT '' < '😀' AS lt")
      .collect()(0).getBoolean(0), "Spark must agree with utf8Lt")
    // code-point split: one symbol per code point, surrogate pairs intact
    assert(cps("a😀b") == Vector("a", "😀", "b"))
    assert(spark.sql("SELECT length('a😀b') AS l")
      .collect()(0).getInt(0) == 3,
      "Spark length must be code-point based (the distributed symbolizer relies on it)")
  }

  test("x38: distributed BPE merges equal the driver-side reference") {
    val wordFreqs = graft.queries.QUtil.t(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceMerges(wordFreqs, 15)
    def run(cap: Long) = graft.queries.TextOps
      .bpeTrain(spark, sfDir, merges = 15, driverVocabCap = cap)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // default path: vocab fits the driver cap -> in-memory loop
    val got = run(1L << 20)
    assert(got.nonEmpty, "fixture must yield at least one merge")
    assert(got == expected,
      s"driver-path merges diverge from reference:\n got=$got\n exp=$expected")
    // over-cap path: the same merges must come out of the DISTRIBUTED loop
    val gotDist = run(0L)
    assert(gotDist == expected,
      s"distributed merges diverge from reference:\n got=$gotDist\n exp=$expected")
    // the learned merges are usable: ranks are dense from 1 and merged
    // symbols concatenate their pair
    assert(got.map(_._1) == (1 to got.length))
    assert(got.forall { case (_, l, r, m, _) => m == l + r })
  }
}
