package graft

import org.apache.spark.sql.functions._

/** Batch-13 semantics: the winnowing guarantee (any shared run of
  * ≥ W + k − 1 = 7 tokens shares a fingerprint) fires on exactly the
  * planted overlap, sub-shingle overlaps cannot share, the index is
  * strictly smaller than the position set, and a short doc still carries
  * one fingerprint. */
class Queries13Spec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q13_docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[String, (Long, Long, Long, Long)] =
    SparkEntry.queries("fingerprint_winnowing")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_fingerprints"),
          r.getAs[Long]("flagged_docs"), r.getAs[Long]("max_fp_df"))))
      .toMap

  test("winnowing guarantee: a shared >=7-token run flags the later doc; sub-shingle overlap cannot") {
    def toks(prefix: String, n: Int) = (0 until n).map(i => f"$prefix$i%03d")
    val shared = toks("shared", 8) // 8-token run >= W + k - 1 = 7
    val a = (toks("aa", 10) ++ shared ++ toks("az", 10)).mkString(" ")
    // b shares ONLY the 8-token run with a — guarantee says: flagged
    val b = (toks("bb", 12) ++ shared ++ toks("bz", 7)).mkString(" ")
    // c is fully disjoint — must not be flagged
    val c = toks("cc", 25).mkString(" ")
    // d overlaps a by only 3 consecutive tokens (< k = 4): no common
    // 4-shingle can exist, so no fingerprint can match (mod a ~1e-9 hash
    // collision) — must not be flagged
    val d = (toks("dd", 15) ++ shared.take(3) ++ toks("dz", 9)).mkString(" ")
    val got = run(docsDir(Seq(
      (0L, a, "src0"), (1L, b, "src0"), (2L, c, "src0"), (3L, d, "src0"))))
    val (nDocs, nFp, flagged, maxDf) = got("src0")
    assert(nDocs == 4)
    assert(flagged == 1L, s"exactly doc 1 (the >=7-run sharer) must flag, got $flagged")
    assert(maxDf == 2L, "the shared-run fingerprint is held by exactly the two sharers")
    assert(nFp > 4)
  }

  test("winnow_match_spans: planted runs verified exactly, maximal per diagonal, df-capped boilerplate screened") {
    def toks(prefix: String, n: Int) = (0 until n).map(i => f"$prefix$i%03d")
    val run1 = toks("ra", 8) // ≥ 7: guaranteed discovered, emitted as ONE maximal row
    val run2 = toks("rb", 7) // exactly the guarantee threshold
    val short = toks("rs", 6) // < 7: never emitted, discovered or not
    val a = (toks("aa", 10) ++ run1 ++ toks("am", 5) ++ run2 ++ toks("az", 4)).mkString(" ")
    val b = (toks("bb", 12) ++ run1 ++ toks("bm", 3) ++ run2 ++ toks("bz", 6)).mkString(" ")
    val c = (toks("cc", 9) ++ short ++ toks("cz", 8)).mkString(" ")
    val d = (toks("dd", 7) ++ short ++ toks("dz", 10)).mkString(" ")
    // one 9-token boilerplate sentence in 20 docs (> dfCap = 16): its
    // run-interior fingerprints are screened by the df cap and the
    // boundary-straddling shingles are doc-unique (df = 1), so no pair
    // forms — the template-noise screen, NOT a missed detection
    val boiler = toks("bo", 9)
    val noisy = (0 until 20).map(i =>
      (100L + i, (toks(f"n$i%02d", 10) ++ boiler).mkString(" "), "src1"))
    val rows = SparkEntry.queries("winnow_match_spans")(spark, docsDir(Seq(
        (0L, a, "src0"), (1L, b, "src0"), (2L, c, "src0"), (3L, d, "src0")) ++ noisy))
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("a_start"), r.getAs[Int]("b_start"), r.getAs[Long]("run_tokens")))
    // run1: a tokens 10..17, b tokens 12..19; run2: both start at 23 —
    // each maximal (no merge, no sub-runs), nothing else anywhere
    assert(rows.toSet == Set((0L, 1L, 10, 12, 8L), (0L, 1L, 23, 23, 7L)),
      rows.mkString(", "))
    assert(rows.length == 2, s"maximality: expected exactly 2 rows, got ${rows.length}")

    // X58 keep-first application over the same corpus: only the LATER doc
    // of the (0,1) pair sheds tokens — the union of its two runs, 8 + 7
    // (disjoint) = 15 of its 36 tokens; every other doc keeps everything
    val removal = SparkEntry.queries("dedup_span_removal")(spark, docsDir(Seq(
        (0L, a, "src0"), (1L, b, "src0"), (2L, c, "src0"), (3L, d, "src0")) ++ noisy))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_dup_tokens"),
          r.getAs[Long]("n_keep"))))
      .toMap
    assert(removal(1L) == ((36L, 15L, 21L)), removal(1L).toString)
    assert(removal(0L)._2 == 0L, s"the EARLIER doc keeps its spans: ${removal(0L)}")
    assert((removal - 1L).values.forall(_._2 == 0L),
      s"only doc 1 sheds tokens: $removal")

    // X59 emission over the same corpus: doc 1's cleaned text is EXACTLY
    // its tokens minus positions 12..19 (run1) and 23..29 (run2) —
    // bb0..bb11 ++ bm0..bm2 ++ bz0..bz5 — and every other doc's text
    // passes through verbatim
    val clean = SparkEntry.queries("dedup_span_clean")(spark, docsDir(Seq(
        (0L, a, "src0"), (1L, b, "src0"), (2L, c, "src0"), (3L, d, "src0")) ++ noisy))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_keep"), r.getAs[String]("clean_text"))))
      .toMap
    val wantClean = (toks("bb", 12) ++ toks("bm", 3) ++ toks("bz", 6)).mkString(" ")
    assert(clean(1L) == ((21L, wantClean)), clean(1L).toString)
    assert(clean(0L) == ((34L, a)), s"earlier doc verbatim: ${clean(0L)}")
    assert(clean(2L)._2 == c && clean(3L)._2 == d, "span-free docs verbatim")
    assert(clean.size == 24, s"one row per doc: ${clean.size}")
  }

  test("index compression and the short-doc floor") {
    def toks(n: Int) = (0 until n).map(i => f"tok$i%04d")
    // 100 distinct tokens -> 97 shingle hashes -> 94 full windows; the
    // winnowed index keeps the per-window minima, expected density
    // 2/(W+1) = 0.4 — assert strict compression with margin (deterministic
    // hashes, so this is a fixed value, not a flaky sample)
    val long = toks(100).mkString(" ")
    val short = "just two" // < 4 tokens: one whole-text hash, one window
    val got = run(docsDir(Seq((0L, long, "long"), (1L, short, "tiny"))))
    val (_, nFpLong, _, _) = got("long")
    assert(nFpLong < 94 / 2 + 10, s"winnowed index must compress: $nFpLong of 94 windows")
    assert(nFpLong >= 94 / 8, s"winnowed index implausibly small: $nFpLong")
    assert(got("tiny") == ((1L, 1L, 0L, 1L)),
      s"a sub-shingle doc still carries exactly one fingerprint: ${got("tiny")}")
  }

  test("pretokenize_bpe_regex: known-answer pretokenization, contraction split, distincts") {
    // "don't stop  123 now!!" pretokenizes to
    //   ["don", "'t", " stop", "  ", "123", " now", "!!"]   (7 pretokens)
    // — the contraction splits off, a single leading space glues to its
    // word, the DOUBLE space stays standalone (the lookahead-free
    // simplification), digits and punctuation are their own runs.
    // Whitespace split gives 5 tokens (the empty token between the double
    // space counts, the split(" ") contract everywhere else on the
    // surface) → fertility 7/5 = 1.4.
    val dir = docsDir(Seq(
      (0L, "don't stop  123 now!!", "srcA"),
      (1L, "aa aa aa", "srcB"), // repeated pretokens: 3 total, 2 distinct
      (2L, "", "srcC"))) // zero pretokens — posexplode_outer keeps the doc
    val got = SparkEntry.queries("pretokenize_bpe_regex")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("pretokens"),
          r.getAs[Long]("distinct_pretokens"), r.getAs[Long]("ws_tokens"),
          r.getAs[Double]("fertility")))).toMap
    assert(got("srcA") == ((1L, 7L, 7L, 5L, 1.4)), got("srcA").toString)
    assert(got("srcB") == ((1L, 3L, 2L, 3L, 1.0)), got("srcB").toString)
    // an empty text still COUNTS as a doc (and as 1 ws token — split("")
    // yields [""] on every engine); the non-outer explode would silently
    // drop it here while the python audit counted it
    assert(got("srcC") == ((1L, 0L, 0L, 1L, 0.0)), got("srcC").toString)
  }
}
