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
    // the batched loop never exceeds one pass per merge (and the synthetic
    // batching case below proves it goes genuinely sub-linear when the top
    // pairs are disjoint — real-text bigrams overlap, so no claim here)
    val passes = graft.queries.TextOps.lastDistributedPasses.get()
    assert(passes > 0 && passes <= gotDist.length,
      s"expected 0 < passes <= ${gotDist.length} merges, got $passes")
    // the learned merges are usable: ranks are dense from 1 and merged
    // symbols concatenate their pair
    assert(got.map(_._1) == (1 to got.length))
    assert(got.forall { case (_, l, r, m, _) => m == l + r })
  }

  test("x38: batched distributed merges survive ties and created-pair traps") {
    import spark.implicits._
    // adversarial corpora: equal counts everywhere (lex tie-breaks decide
    // every rank), chain words where a merge CREATES a pair that ties the
    // next candidate (the case that forces the strict-count truncation),
    // and self-overlap runs ("aaaa")
    val corpora = Seq(
      Map("ab" -> 5L, "cd" -> 5L, "ef" -> 5L, "gh" -> 5L, "ij" -> 5L),
      // merging (a,b) creates (z, ab) with the SAME count as (x, y):
      // sequential must still decide by lex between them
      Map("zab" -> 5L, "xy" -> 5L, "w" -> 1L),
      // overlapping symbols: (a,b) and (b,c) tie, only one can go per pass
      Map("abc" -> 7L, "bc" -> 7L, "ab" -> 7L),
      Map("aaaa" -> 3L, "aa" -> 3L, "baa" -> 2L),
      // deep chain: every merge creates the next round's best pair
      Map("abcdefgh" -> 9L, "x" -> 1L))
    corpora.zipWithIndex.foreach { case (words, ci) =>
      val expected = referenceMerges(words, 10)
      val wf = words.toSeq.toDF("w", "freq")
      val got = graft.queries.TextOps.distributedMerges(spark, wf, 10)
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(got == expected,
        s"corpus #$ci: batched merges diverge from sequential reference:\n" +
          s" got=$got\n exp=$expected")
    }
    // and batching genuinely batches: 10 disjoint, strictly-decreasing
    // pairs learn in ONE pass (one Spark job for 10 merges — the shape a
    // 64k-vocab production run relies on), bit-identical to sequential
    val big = (0 until 10)
      .map(i => (s"${('a' + 2 * i).toChar}${('b' + 2 * i).toChar}",
        (100 - i).toLong)).toMap
    val expB = referenceMerges(big, 10)
    val gotB = graft.queries.TextOps
      .distributedMerges(spark, big.toSeq.toDF("w", "freq"), 10)
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(gotB == expB, s"got=$gotB\n exp=$expB")
    assert(graft.queries.TextOps.lastDistributedPasses.get() == 1,
      s"10 disjoint merges must learn in one pass, took " +
        s"${graft.queries.TextOps.lastDistributedPasses.get()}")
  }

  // x40's encode reference: Sennrich's SEQUENTIAL replay — each learned
  // merge applied once, in rank order, left-to-right non-overlapping (the
  // trainer's own apply step). The production BpeEncode runs the PRIORITY
  // formulation instead (repeatedly fold the lowest-rank pair present);
  // the two coincide for any TRAINED table because a merge's component
  // symbols are always learned at strictly lower ranks — this test proves
  // that equivalence word-for-word on the real corpus.
  private def refEncode(merges: Seq[(String, String)])(w: String): Vector[String] = {
    var syms = cps(w)
    merges.foreach { case (l, r) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          buf += (l + r); i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.result()
    }
    syms
  }

  test("x40: native BPE encode equals the sequential reference word-for-word") {
    import org.apache.spark.sql.Row
    val docs = graft.queries.QUtil.t(spark, sfDir, "documents")
    val wordFreqs = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceMerges(wordFreqs, 15).map(t => (t._2, t._3))
    assert(merges.nonEmpty)
    val ref = refEncode(merges) _

    // 1) word-level: the native expression over every distinct corpus word
    graft.functions.GraftFunctions.register(spark)
    val mergesLit = typedlit(merges.map { case (l, r) => Seq(l, r) })
    val wordsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(wordFreqs.keys.toSeq.map(Row(_)), 8),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.StringType))))
    val got = wordsDf
      .select(col("w"), call_function("bpe_encode", col("w"), mergesLit).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    wordFreqs.keys.foreach { w =>
      assert(got(w) == ref(w),
        s"encode diverges for word '$w': got=${got(w)} exp=${ref(w)}")
    }
    // surrogate-pair safety: a supplementary-plane word must split on code
    // points, not UTF-16 units (no learned merge touches it -> identity)
    val emoji = spark.range(1).select(
      call_function("bpe_encode", lit("😀a"), mergesLit).as("t"))
      .collect()(0).getSeq[String](0)
    assert(emoji == Seq("😀", "a") || emoji == Seq("😀a"),
      s"code-point split sheared a surrogate pair: $emoji")

    // 2) document-level: the x40 corpus pass agrees with per-word sums and
    //    its in-query losslessness check passes end to end
    val x40 = graft.queries.TextOps.encodeBpe(docs, merges).collect()
    assert(x40.nonEmpty)
    val expTokens = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val words = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> (words.length, words.map(w => ref(w).length).sum,
        words.map(w => cps(w).length).sum)
    }.toMap
    x40.foreach { r =>
      val (nw, nt, ncp) = expTokens(r.getLong(0))
      assert(r.getInt(2) == nw && r.getInt(3) == nt && r.getInt(4) == ncp,
        s"doc ${r.getLong(0)}: got (${r.getInt(2)},${r.getInt(3)},${r.getInt(4)})" +
          s" exp ($nw,$nt,$ncp)")
    }
    // merges must actually fire somewhere: total tokens < total codepoints
    assert(x40.map(_.getInt(3)).sum < x40.map(_.getInt(4)).sum,
      "no merge ever applied — encode is vacuous")
  }

  // x26b's oracle (round 15) replays the budget arithmetic over the
  // materialized count fixture, but the COUNTS themselves are only as good
  // as the encoder — this test is the independent gate: tokens counted by
  // the INDEPENDENT sequential encoder, budgets/thresholds recomputed in
  // plain driver Scala with the same IEEE op order, selection re-derived
  // per doc — the query must match row-for-row.
  test("x26b: BPE token budgets select exactly the independently-computed mix") {
    val docs = graft.queries.QUtil.t(spark, sfDir, "documents")
    val wordFreqs = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceMerges(wordFreqs, 15).map(t => (t._2, t._3))
    val ref = refEncode(merges) _
    val docTokens: Map[Long, (String, Long)] =
      docs.select("doc_id", "lang", "text").collect().map { r =>
        val words = r.getString(2).trim.split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> (r.getString(1),
          words.map(w => ref(w).length.toLong).sum)
      }.toMap
    val perLang = docTokens.values.groupBy(_._1)
      .map { case (l, vs) => l -> vs.map(_._2).sum }
    val all = perLang.values.sum.toDouble
    val nLangs = perLang.size
    def thr(lang: String): String = {
      val f = math.min(1.0, (0.6 * (all / nLangs)) / perLang(lang).toDouble)
      if (f >= 1.0) "g"
      else f"${math.floor(f * 4294967296.0).toLong}%08x"
    }
    def md5hex8(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8)
    val expect = docTokens.toSeq.collect {
      case (id, (lang, tk)) if md5hex8(id.toString) < thr(lang) =>
        (id, lang, tk)
    }.sortBy(_._1)
    val got = SparkEntry.queries("x26b_token_budget_mix_bpe")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
      .toSeq
    assert(expect.nonEmpty && got == expect,
      s"x26b mix diverges: got ${got.size} rows, expected ${expect.size}\n" +
        s" firstGot=${got.take(3)}\n firstExp=${expect.take(3)}")
    // the downsample must actually bite on SOME language (otherwise the
    // threshold path is untested)
    assert(got.size < docTokens.size, "no language was over budget")
  }
}
