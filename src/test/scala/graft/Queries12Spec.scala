package graft

import graft.ext.SimSearch
import org.apache.spark.sql.functions._

/** Batch-12 operator semantics: KS hits its two closed-form extremes
  * (identical distributions → 0, disjoint → 1), each Gopher rule fires on
  * exactly the planted violation, and both two-stage retrievers put a
  * planted exact duplicate at rank 1 and keep usable recall vs the exact
  * retriever on the fixture. */
class Queries12Spec extends SparkSpec {

  /** Planted documents table on disk (drift_ks / gopher read `documents`
    * via the registry, so the fixture has to be a directory). */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q12_docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("drift_ks: identical distributions score 0, disjoint score 1") {
    val mk = (src: String, lens: Seq[Int], base: Long) =>
      lens.zipWithIndex.map { case (len, i) =>
        (base + i, "x" * len, src) // n_chars = len
      }
    val same = docsDir(mk("src0", Seq(10, 20, 30), 0L) ++ mk("src10", Seq(10, 20, 30), 100L))
    val s = SparkEntry.queries("drift_ks")(spark, same).collect()(0)
    assert(s.getAs[Double]("ks_d") == 0.0, s"identical dists must read 0: $s")
    assert(s.getAs[Int]("ks_at") == 10, "max-gap argmax tie-break = smallest length")

    val disj = docsDir(mk("src0", Seq(10, 11, 12), 0L) ++ mk("src10", Seq(50, 60, 70), 100L))
    val d = SparkEntry.queries("drift_ks")(spark, disj).collect()(0)
    assert(d.getAs[Double]("ks_d") == 1.0, s"disjoint dists must read 1: $d")
    assert(d.getAs[Int]("ks_at") == 12, "D=1 is attained at the reference max")
  }

  test("gopher rules: each planted violation fires exactly its own rule") {
    // DISTINCT n-char words so no construction trips r_rep by accident.
    def distinct4(n: Int) = (0 until n).map(i => f"w$i%03d")    // 4 chars each
    def distinct2(n: Int) = (0 until n).map(i => ('a' + i / 26).toChar.toString + ('a' + i % 26).toChar)
    // 40 tokens, mean (38·4+2·3)/40 = 3.95, 2 stopwords, all bigrams distinct
    val passing = (distinct4(38) ++ Seq("the", "the")).mkString(" ")
    // 10 tokens: fails ONLY r_len (mean (8·4+6)/10 = 3.8, distinct bigrams)
    val shortDoc = (distinct4(8) ++ Seq("the", "the")).mkString(" ")
    // 2-char words: mean (38·2+6)/40 = 2.05 — fails ONLY r_wordlen
    val thinDoc = (distinct2(38) ++ Seq("the", "the")).mkString(" ")
    // no stopwords at all — fails ONLY r_stop
    val noStop = distinct4(40).mkString(" ")
    // 'the abcd' ×19 then 2 fillers: 40 toks, mean 141/40 = 3.525, 19
    // stopwords, but only 4 distinct of 39 bigrams — fails ONLY r_rep
    val repDoc = ((0 until 19).flatMap(_ => Seq("the", "abcd")) ++ Seq("abcd", "efgh")).mkString(" ")
    val dir = docsDir(Seq(
      (0L, passing, "src0"), (1L, shortDoc, "src1"),
      (2L, thinDoc, "src2"), (3L, noStop, "src3"), (4L, repDoc, "src4")))
    val rows = SparkEntry.queries("quality_gopher_rules")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    def flags(src: String) = {
      val r = rows(src)
      (r.getAs[Long]("p_len"), r.getAs[Long]("p_wordlen"),
        r.getAs[Long]("p_stop"), r.getAs[Long]("p_rep"), r.getAs[Long]("n_pass"))
    }
    assert(flags("src0") == ((1L, 1L, 1L, 1L, 1L)), s"clean doc passes all: ${flags("src0")}")
    assert(flags("src1") == ((0L, 1L, 1L, 1L, 0L)), s"10 tokens fails only r_len: ${flags("src1")}")
    assert(flags("src2") == ((1L, 0L, 1L, 1L, 0L)), s"2-char words fail only r_wordlen: ${flags("src2")}")
    assert(flags("src3") == ((1L, 1L, 0L, 1L, 0L)), s"stopword-free fails only r_stop: ${flags("src3")}")
    assert(flags("src4") == ((1L, 1L, 1L, 0L, 0L)), s"bigram-repeating fails only r_rep: ${flags("src4")}")
  }

  test("hamming retrieval: planted duplicate ranks first with distance 0") {
    import spark.implicits._
    val base = (0 until 23).map { i =>
      (i.toLong, Array.tabulate(23)(j => if (j == i) 1.0f else -1.0f))
    }
    val emb = (base :+ ((23L, base(0)._2))).toDF("vec_id", "embedding")
    val out = SimSearch.hammingTopK(spark, emb, queryVecId = 0, k = 5, cand = 10).collect()
    assert(out(0).getAs[Long]("vec_id") == 23L, s"the planted copy must rank 1: ${out.mkString(",")}")
    assert(out(0).getAs[Int]("hamming") == 0)
    assert(out(0).getAs[Double]("cos") == 1.0)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 5), "dense ranks 1..k")
  }

  test("matryoshka retrieval: planted duplicate ranks first; zero-prefix excluded") {
    import spark.implicits._
    val base = (0 until 23).map { i =>
      (i.toLong, Array.tabulate(40)(j => if (j == i) 1.0f else 0.0f))
    }
    // vec 23 = copy of the query; vec 24 = zero PREFIX (first 32 dims) but
    // nonzero tail — it has no stage-1 direction and must be excluded.
    val planted = base ++ Seq(
      (23L, base(0)._2),
      (24L, Array.tabulate(40)(j => if (j == 39) 1.0f else 0.0f)))
    val emb = planted.toDF("vec_id", "embedding")
    val out = SimSearch.matryoshkaTopK(spark, emb, queryVecId = 0,
      prefixDim = 32, cand = 10, k = 5).collect()
    assert(out(0).getAs[Long]("vec_id") == 23L, s"the planted copy must rank 1: ${out.mkString(",")}")
    assert(out(0).getAs[Long]("s1_micros") == 1000000L)
    assert(out(0).getAs[Double]("cos") == 1.0)
    assert(!out.map(_.getAs[Long]("vec_id")).contains(24L),
      "a zero-prefix vector has no stage-1 score and must not surface")
  }

  test("NFC audit: decomposed text changes and shrinks, precomposed doesn't") {
    val dir = docsDir(Seq(
      (0L, "caf" + "e\u0301", "src0"), // decomposed: 5 codepoints → 4
      (1L, "caf\u00e9", "src1")))      // precomposed: already NFC
    val rows = SparkEntry.queries("text_normalize_nfc")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("src0").getAs[Long]("n_changed") == 1L)
    assert(rows("src0").getAs[Long]("chars_before") == 5L)
    assert(rows("src0").getAs[Long]("chars_after") == 4L)
    assert(rows("src1").getAs[Long]("n_changed") == 0L)
    assert(rows("src1").getAs[Long]("chars_before") == 4L)
    assert(rows("src1").getAs[Long]("chars_after") == 4L)
  }

  test("script mix counts explicit codepoint ranges exactly") {
    // a b ␣ 中 文 ␣ e ́(U+0301) !  → 9 cp: 3 ascii letters, 2 CJK, 1 mark, 3 other
    val dir = docsDir(Seq((0L, "ab \u4e2d\u6587 e\u0301!", "src0")))
    val r = SparkEntry.queries("text_script_mix")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_chars") == 9L, r.toString)
    assert(r.getAs[Long]("ascii_letters") == 3L, r.toString)
    assert(r.getAs[Long]("cjk_chars") == 2L, r.toString)
    assert(r.getAs[Long]("combining_marks") == 1L, r.toString)
    assert(r.getAs[Long]("other_chars") == 3L, r.toString)
  }

  test("epoch repeat plan: deterministic picks, sane bases, ppm-shaped extras") {
    val run1 = SparkEntry.queries("epoch_repeat_plan")(spark, sfDir).collect()
    val run2 = SparkEntry.queries("epoch_repeat_plan")(spark, sfDir).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "hash-threshold picks must be identical across runs")
    run1.foreach { r =>
      val (nd, base, ppm, extra, planned) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("base_epochs"), r.getAs[Long]("frac_ppm"),
        r.getAs[Long]("n_extra"), r.getAs[Long]("planned_instances"))
      assert(base >= 1L, s"2x-corpus budget implies at least one full epoch: $r")
      assert(ppm >= 0L && ppm < 1000000L, r.toString)
      assert(extra >= 0L && extra <= nd, r.toString)
      assert(planned == nd * base + extra, r.toString)
      // murmur picks are uniform: the realized extra share tracks frac_ppm
      // (25 docs/source at sf0.001 → binomial sd ≈ 0.1; ±0.35 is 3.5σ)
      assert(math.abs(extra.toDouble / nd - ppm / 1e6) <= 0.35,
        s"extra share drifted from the planned ppm: $r")
    }
  }

  test("normalized dedup drops NFC/case/whitespace twins, keeps first") {
    val dir = docsDir(Seq(
      (0L, "Cafe\u0301  X", "src0"), // decomposed e+U+0301, double space, caps
      (1L, "café x", "src1"),   // normalized twin of doc 0 → dropped
      (2L, "espresso y", "src1")))    // distinct → kept
    val rows = SparkEntry.queries("dedup_exact_normalized")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("src0").getAs[Long]("n_kept") == 1L, rows.toString)
    assert(rows("src1").getAs[Long]("n_dropped") == 1L,
      s"the normalized twin (higher id) must drop: $rows")
    assert(rows("src1").getAs[Long]("n_kept") == 1L, rows.toString)
  }

  test("embedding QA flags planted dim/NaN/zero defects, clean fixture reads zero") {
    import spark.implicits._
    val clean = SparkEntry.queries("embedding_qa_report")(spark, sfDir).collect()(0)
    assert(clean.getAs[Long]("n_bad_dim") == 0L, clean.toString)
    assert(clean.getAs[Long]("n_nonfinite") == 0L, clean.toString)
    assert(clean.getAs[Long]("n_zero_norm") == 0L, clean.toString)
    assert(clean.getAs[Long]("norm_p95_micros") >= clean.getAs[Long]("norm_p50_micros"))

    // planted: 1 wrong-dim, 1 NaN, 1 +Inf, 1 zero vector, 2 clean unit vecs
    val dir = java.nio.file.Files.createTempDirectory("graft_q12_emb").toString
    Seq(
      (0L, Array.fill(64)(0.0f).updated(0, 1.0f)),
      (1L, Array.fill(64)(0.0f).updated(1, 1.0f)),
      (2L, Array.fill(32)(1.0f)),                          // bad dim
      (3L, Array.fill(64)(0.0f).updated(5, Float.NaN)),    // NaN
      (4L, Array.fill(64)(0.0f).updated(6, Float.PositiveInfinity)), // Inf
      (5L, Array.fill(64)(0.0f)))                          // zero norm
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("embedding_qa_report")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_vecs") == 6L, r.toString)
    assert(r.getAs[Long]("n_bad_dim") == 1L, r.toString)
    assert(r.getAs[Long]("n_nonfinite") == 2L, r.toString)
    assert(r.getAs[Long]("n_zero_norm") == 1L, r.toString)
    // clean norms are 1e6, 1e6, 0 → p50 = 1e6 exactly
    assert(r.getAs[Long]("norm_p50_micros") == 1000000L, r.toString)
  }

  test("two-stage retrievers keep usable recall vs the exact retriever") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = SimSearch.topK(spark, emb, queryVecId = 0, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ham = SparkEntry.queries("simsearch_hamming")(spark, sfDir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val mat = SparkEntry.queries("simsearch_matryoshka")(spark, sfDir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ham.intersect(exact).size >= 5,
      s"hamming recall@10 sank below 0.5: ${ham.intersect(exact).size}/10")
    assert(mat.intersect(exact).size >= 5,
      s"matryoshka recall@10 sank below 0.5: ${mat.intersect(exact).size}/10")
  }
}
