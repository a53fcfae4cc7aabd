package graft

import graft.catalog.TableRegistry
import graft.ext.{Dedup, ExactMath, SimSearch, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-12 — monitoring and retrieval operators rounding out the curation
  * stack: a second drift statistic (two-sample Kolmogorov–Smirnov, the
  * distribution-free complement to drift_psi's binned PSI), a Gopher-style
  * rule-battery quality filter (Rae et al. 2021, arXiv:2112.11446 §A1.1 —
  * the per-rule observability a production filter needs before anyone
  * trusts its composite), and two production retrieval compressions:
  * sign-bit binary codes with Hamming candidate generation and
  * Matryoshka prefix-dimension candidate generation, each re-ranked
  * exactly over a constant-sized candidate set.
  *
  * Numeric discipline: KS is computed entirely in integer arithmetic
  * (cross-multiplied CDF gaps in decimal(38,0) — no count product can
  * overflow at any corpus size); every Gopher rule is an integer
  * comparison (cross-multiplied bounds, never a float ratio); retrieval
  * candidate cuts rank on integers (Hamming distance / micro-rounded
  * stage-1 score) with vec_id tie-breaks, so no candidate set can flip on
  * last-ulp jitter.
  */
object Queries12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  def specs: Seq[QSpec] = Seq(

    QSpec("drift_ks",
      // Two-sample Kolmogorov–Smirnov distance on the doc-length
      // distribution, reference sources (src0-9) vs candidate (src10-19) —
      // drift_psi's split. PSI needs a bucketing choice; KS is the
      // bucket-free twin: D = max_x |F_ref(x) − F_cand(x)|. Integer-exact:
      // one (n_chars → side-counts) pass, cumulative counts over the
      // DISTINCT length values, and the CDF gap compared cross-multiplied
      // (|kr·nc − kc·nr|, decimal(38,0) — exact past 10^18-doc corpora
      // where long products overflow). Surface = the single max-gap row:
      // side totals, the length where the max is attained (smallest such
      // length — deterministic argmax) and D = gap/(nr·nc) via ExactMath.
      // Scale shape: the only window runs over DISTINCT n_chars values —
      // bounded by max doc length, not corpus size (the same
      // bounded-cardinality argument as zipf_fit's constant head); the
      // corpus-wide work is one grouped count. TakeOrdered(1) on the gap.
      (s, dir) => {
        val dec = "decimal(38,0)"
        val c = t(s, dir, "documents")
          .select(
            when(substring(col("source"), 4, 10).cast("int") < 10, "ref")
              .otherwise("cand").as("side"),
            col("n_chars"))
          .groupBy("n_chars")
          .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("cr"),
            sum(when(col("side") === "cand", 1L).otherwise(0L)).as("cc"))
        val w = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = c.agg(sum("cr").as("nr"), sum("cc").as("nc"))
        c.select(col("n_chars"), sum("cr").over(w).as("kr"), sum("cc").over(w).as("kc"))
          .crossJoin(broadcast(tot))
          .withColumn("gap", abs(col("kr").cast(dec) * col("nc").cast(dec)
            - col("kc").cast(dec) * col("nr").cast(dec)))
          .orderBy(desc("gap"), asc("n_chars")).limit(1)
          .select(col("nr").as("n_ref"), col("nc").as("n_cand"),
            col("n_chars").as("ks_at"),
            ExactMath.ratioRounded(col("gap"),
              col("nr").cast(dec) * col("nc").cast(dec), 6).as("ks_d"))
      },
      Some(
        s"""WITH d AS (SELECT CASE WHEN CAST(source[4:] AS INT) < 10
           |      THEN 'ref' ELSE 'cand' END AS side, n_chars FROM documents),
           |c AS (SELECT n_chars,
           |    CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
           |    CAST(SUM(CASE WHEN side = 'cand' THEN 1 ELSE 0 END) AS BIGINT) AS cc
           |  FROM d GROUP BY 1),
           |t AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(cc) AS BIGINT) AS nc FROM c),
           |w AS (SELECT n_chars,
           |    SUM(cr) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kr,
           |    SUM(cc) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kc
           |  FROM c),
           |g AS (SELECT n_chars, abs(CAST(kr AS HUGEINT) * nc - CAST(kc AS HUGEINT) * nr) AS gap
           |  FROM w, t)
           |SELECT nr AS n_ref, nc AS n_cand, n_chars AS ks_at,
           |  ${ExactMath.ratioRoundedSql("gap", "CAST(nr AS HUGEINT) * nc", 6)} AS ks_d
           |FROM g, t ORDER BY gap DESC, n_chars LIMIT 1""".stripMargin)),

    QSpec("quality_gopher_rules",
      // Gopher-style rule battery with PER-RULE observability: a composite
      // quality score (quality_score) tells you a doc is bad; a filter you
      // can operate needs to know WHICH rule fired and at what rate per
      // source. Four rules over the token stream, every one an integer
      // comparison (no float enters the pass/fail decision at all):
      //   r_len      token count ∈ [20, 90]
      //   r_wordlen  mean token length ∈ [3, 5]  (3n ≤ Σlen ≤ 5n
      //              cross-multiplied; Σlen derived as n_chars − (n−1)
      //              under the corpus's single-space tokenization)
      //   r_stop     ≥ 2 stopword ('the'/'a') occurrences
      //   r_rep      duplicate-bigram fraction ≤ 5% ((t−d)·20 ≤ t over
      //              bigram total/distinct counts; < 2 tokens ⇒ no bigrams
      //              ⇒ trivially passes)
      // Surface = per-source doc count, per-rule pass counts, all-rules
      // count and the exact pass fraction. One scan (rules are scan-stage
      // projections), one O(sources)-group shuffle — corpus-linear.
      (s, dir) => {
        val toks = TextAnalysis.tokens(col("text"))
        val n = size(toks).cast("long")
        val charsSum = col("n_chars").cast("long") - (n - lit(1L))
        val stops = size(filter(toks, tk => tk.isin("the", "a"))).cast("long")
        val tbi = when(n >= 2L, n - lit(1L)).otherwise(lit(0L))
        val dbi = when(n >= 2L,
          size(array_distinct(Dedup.shingles(col("text"), 2))).cast("long"))
          .otherwise(lit(0L))
        val rLen = n.between(20L, 90L)
        val rWord = charsSum >= lit(3L) * n && charsSum <= lit(5L) * n
        val rStop = stops >= 2L
        val rRep = (tbi - dbi) * lit(20L) <= tbi
        def cnt(c: org.apache.spark.sql.Column) =
          sum(when(c, 1L).otherwise(0L))
        t(s, dir, "documents")
          .select(col("source"), rLen.as("rl"), rWord.as("rw"),
            rStop.as("rs"), rRep.as("rr"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            cnt(col("rl")).as("p_len"),
            cnt(col("rw")).as("p_wordlen"),
            cnt(col("rs")).as("p_stop"),
            cnt(col("rr")).as("p_rep"),
            cnt(col("rl") && col("rw") && col("rs") && col("rr")).as("n_pass"))
          .withColumn("pass_frac",
            ExactMath.ratioRounded(col("n_pass"), col("n_docs"), 6))
          .orderBy("source")
      },
      Some(
        s"""WITH s AS (SELECT source, n_chars, string_split(text, ' ') AS sp FROM documents),
           |m AS (SELECT source,
           |    CAST(len(sp) AS BIGINT) AS n,
           |    CAST(n_chars - (len(sp) - 1) AS BIGINT) AS ch,
           |    CAST(len(list_filter(sp, t -> t = 'the' OR t = 'a')) AS BIGINT) AS st,
           |    CAST(CASE WHEN len(sp) >= 2 THEN len(sp) - 1 ELSE 0 END AS BIGINT) AS tbi,
           |    CAST(CASE WHEN len(sp) >= 2 THEN len(list_distinct(
           |        list_transform(range(1, len(sp)), i -> sp[i] || ' ' || sp[i+1])))
           |      ELSE 0 END AS BIGINT) AS dbi
           |  FROM s),
           |r AS (SELECT source,
           |    CASE WHEN n BETWEEN 20 AND 90 THEN 1 ELSE 0 END AS r1,
           |    CASE WHEN ch >= 3 * n AND ch <= 5 * n THEN 1 ELSE 0 END AS r2,
           |    CASE WHEN st >= 2 THEN 1 ELSE 0 END AS r3,
           |    CASE WHEN (tbi - dbi) * 20 <= tbi THEN 1 ELSE 0 END AS r4
           |  FROM m)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(r1) AS BIGINT) AS p_len,
           |  CAST(SUM(r2) AS BIGINT) AS p_wordlen,
           |  CAST(SUM(r3) AS BIGINT) AS p_stop,
           |  CAST(SUM(r4) AS BIGINT) AS p_rep,
           |  CAST(SUM(r1 * r2 * r3 * r4) AS BIGINT) AS n_pass,
           |  ${ExactMath.ratioRoundedSql("SUM(r1 * r2 * r3 * r4)", "COUNT(*)", 6)} AS pass_frac
           |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    QSpec("simsearch_hamming",
      // Binary-code retrieval: sign-bit binarize (SignPack — 1 bit/dim,
      // 512× smaller than fp64), Hamming-nearest 50 candidates via
      // XOR+popcount, exact cosine re-rank to top-10. The corpus stage is
      // one fused codegen scan ending in TakeOrdered — 2 ALU ops of
      // distance math per vector; the 64-FLOP exact cosine touches only
      // the 50-row candidate set. Candidate cut ranks on the INTEGER
      // Hamming distance (vec_id tie-break), so the set is identical on
      // every engine. Recall vs the exact top-10 is pinned in
      // Queries12Spec (0.7 on this fixture's near-random embeddings; a
      // planted duplicate ranks first with hamming 0).
      (s, dir) => SimSearch.hammingTopK(s, t(s, dir, "embeddings"),
        queryVecId = 0, k = 10, cand = 50),
      Some(
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
          |  FROM e WHERE list_sum(list_transform(v, x -> x*x)) > 0),
          |q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
          |h AS (SELECT vec_id, v, nrm,
          |    CAST(list_sum(list_transform(range(1, len(v)+1),
          |      i -> CASE WHEN (v[i] >= 0) != (qv[i] >= 0) THEN 1 ELSE 0 END)) AS INT) AS hamming
          |  FROM n, q WHERE vec_id <> 0),
          |c AS (SELECT vec_id, v, nrm, hamming FROM h ORDER BY hamming, vec_id LIMIT 50),
          |rr AS (SELECT vec_id, hamming,
          |    ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i])) / (nrm*qnrm), 6) AS cos
          |  FROM c, q)
          |SELECT rank, vec_id, hamming, cos FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank,
          |    vec_id, hamming, cos FROM rr) x
          |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    QSpec("simsearch_matryoshka",
      // Matryoshka prefix-dimension retrieval (Kusupati et al. 2022): score
      // by the first-32-dim cosine (half the FLOPs and — on a columnar
      // layout — half the bytes per vector), keep the 100 best, re-rank by
      // full-dim cosine to top-10. Stage-1 ranks on the MICRO-rounded
      // score (long) with vec_id tie-break — the candidate set cannot flip
      // on last-ulp jitter; one scan → TakeOrdered, re-rank over the
      // constant 100-row set. Recall@10 = 0.9 on the fixture (pinned with
      // the exact-retrieval twin in Queries12Spec).
      (s, dir) => SimSearch.matryoshkaTopK(s, t(s, dir, "embeddings"),
        queryVecId = 0, prefixDim = 32, cand = 100, k = 10),
      Some(
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm,
          |    list_transform(range(1, 33), i -> v[i]) AS pv
          |  FROM e WHERE list_sum(list_transform(v, x -> x*x)) > 0),
          |n2 AS (SELECT vec_id, v, nrm, pv,
          |    sqrt(list_sum(list_transform(pv, x -> x*x))) AS pnrm
          |  FROM n WHERE list_sum(list_transform(pv, x -> x*x)) > 0),
          |q AS (SELECT v AS qv, nrm AS qnrm, pv AS qpv, pnrm AS qpnrm FROM n2 WHERE vec_id = 0),
          |s1 AS (SELECT vec_id, v, nrm,
          |    CAST(ROUND(list_sum(list_transform(range(1, 33), i -> pv[i]*qpv[i]))
          |      / (pnrm*qpnrm) * 1000000.0, 0) AS BIGINT) AS s1_micros
          |  FROM n2, q WHERE vec_id <> 0),
          |c AS (SELECT vec_id, v, nrm, s1_micros FROM s1 ORDER BY s1_micros DESC, vec_id LIMIT 100),
          |rr AS (SELECT vec_id, s1_micros,
          |    ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i])) / (nrm*qnrm), 6) AS cos
          |  FROM c, q)
          |SELECT rank, vec_id, s1_micros, cos FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank,
          |    vec_id, s1_micros, cos FROM rr) x
          |WHERE rank <= 10 ORDER BY rank""".stripMargin)))
}
