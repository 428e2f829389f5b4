package graft

/** Smoke-level spec over every registered operator query: each one runs on
  * sf0.001 and yields a sane result. Value-level correctness is enforced by
  * the DuckDB oracle harness (tools/check_oracle.py + graft.Verify), which
  * compares exact values at sf0.01 — this spec guards compilation/runtime
  * health of the whole registry in `sbt test`.
  */
class QueriesSpec extends SparkSpec {

  // queries whose result can legitimately be empty at tiny scale
  private val mayBeEmpty = Set("j2_anti_join", "x4_dedup_ngram_jaccard",
    "x2_dedup_minhash_lsh", "x5_dedup_embedding",
    "x16_dedup_cluster") // empty exactly when x4's pair set is

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // every query is oracle-gated — a3 carries its HLL error bound as a
  // column so even the sketch op hash-compares against DuckDB
  private val rowsOnly = Set.empty[String]

  test("every query name has either an oracle or is documented rows-only") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == rowsOnly, s"undocumented rows-only checks: ${noOracle -- rowsOnly}")
  }

  test("a3_hll_approx estimates within configured rsd of exact") {
    // the query itself now carries the bound as a column (oracle-gated:
    // DuckDB states exact + literal true); this spec re-asserts it locally
    val rows = SparkEntry.queries("a3_hll_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"HLL estimate out of tolerance for ${r.getAs[String]("event_type")}")
    }
  }
}
