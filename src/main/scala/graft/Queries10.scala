package graft

import graft.catalog.TableRegistry
import graft.ext.{Dedup, ExactMath, QualityModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-10 — curation-model operators: the "learned filter" tier of an LLM
  * data pipeline layered over the batch-1..9 heuristics. A distilled
  * logistic-regression quality classifier (the fastText-filter shape),
  * containment-based near-superset dedup (the truncation/quote case Jaccard
  * under-scores), per-language tokenizer-fertility diagnostics, and
  * token-budget epoch planning for temperature-scaled mixtures.
  */
object Queries10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  /** Per-language fertility rollup over (doc_id, text, lang, n_chars) —
    * factored out of the QSpec so the multibyte behavior is unit-testable
    * (the fixture corpus is ASCII-only, so bytes_per_char > 1 never
    * occurs there). */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        sum("n_chars").as("total_chars"),
        sum("n_bytes").as("total_bytes"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("total_chars"), col("total_bytes"),
        ExactMath.ratioRounded(col("total_chars"), col("total_tokens"), 6)
          .as("chars_per_token"),
        ExactMath.ratioRounded(col("total_bytes"), col("total_chars"), 6)
          .as("bytes_per_char"))
      .orderBy("lang")

  val specs: Seq[QSpec] = Seq(

    QSpec("doc_quality_logreg",
      // Learned quality filter: distill the integer-exact qualityMicros
      // heuristic (the teacher) into a 4-feature logistic regression via 3
      // deterministic full-batch gradient steps (w₀=0, η=2). Each step is
      // one scan aggregating 4 means (map-side combine, 4 doubles to the
      // driver) — model cost is O(steps) scans at any corpus size. The
      // surface is the trained model itself (weights, rounded 6) plus its
      // training accuracy, computed from the ROUNDED margin so the
      // correct-count cannot flip on ~1e-15 cross-engine summation jitter.
      // The oracle replays the 3 steps as chained CTEs (w0 → w1 → w2 → w3),
      // exactly the embedding_pca_power replay discipline.
      (s, dir) => {
        import s.implicits._
        val feat = graft.ext.DfMemo.cached(s, Some(dir), "logreg_feat",
          persistUnkeyed = true) {
          QualityModel.features(t(s, dir, "documents"))
        }
        val w = QualityModel.train(feat, steps = 3, eta = 2.0)
        val acc = feat
          .select(when((round(QualityModel.margin(w), 6) > 0) ===
            (col("y") === 1.0d), 1L).otherwise(0L).as("ok"))
          .agg(sum("ok").as("correct"), count(lit(1)).as("n"))
          .select(ExactMath.ratioRounded(col("correct"), col("n"), 6).as("accuracy"))
        w.zipWithIndex.map { case (x, j) => (j, x) }.toSeq
          .toDF("pos", "w_raw")
          .crossJoin(broadcast(acc))
          .select(col("pos"), round(col("w_raw"), 6).as("weight"), col("accuracy"))
          .orderBy("pos")
      },
      Some {
        def step(k: Int, prev: String): String = {
          val z = s"($prev.b0*x0 + $prev.b1*x1 + $prev.b2*x2 + $prev.b3*x3)"
          val sig = s"1/(1 + exp(-$z))"
          (0 to 3).map(j =>
            s"MAX($prev.b$j) + 2.0*AVG((y - $sig)*x$j) AS b$j")
            .mkString(s"w$k AS (SELECT ", ", ", s" FROM f, $prev)")
        }
        s"""WITH d AS (SELECT doc_id, n_chars, sp,
           |    (2000000 * (4 * LEAST(len(sp),100) * len(sp)
           |      + 300 * len(list_filter(sp, t -> t = 'the' OR t = 'a'))
           |      + 30 * LEAST(list_sum(list_transform(sp, t -> CAST(length(t) AS BIGINT))), 10 * len(sp)))
           |      + 1000 * len(sp)) // (2000 * len(sp)) AS qm
           |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS sp FROM documents)),
           |f AS (SELECT doc_id,
           |    CASE WHEN qm >= ${QualityModel.labelThresholdMicros} THEN 1.0 ELSE 0.0 END AS y,
           |    1.0 AS x0,
           |    CAST(LEAST(n_chars, 2000) AS DOUBLE)/2000 AS x1,
           |    CAST(len(sp) AS DOUBLE)/GREATEST(n_chars, 1) AS x2,
           |    CAST(len(list_filter(sp, t -> t = 'the')) AS DOUBLE)/GREATEST(len(sp), 1) AS x3
           |  FROM d),
           |w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3),
           |${step(1, "w0")},
           |${step(2, "w1")},
           |${step(3, "w2")},
           |m AS (SELECT CASE WHEN (ROUND(w3.b0*x0 + w3.b1*x1 + w3.b2*x2 + w3.b3*x3, 6) > 0)
           |      = (y = 1.0) THEN 1 ELSE 0 END AS ok FROM f, w3),
           |acc AS (SELECT ${ExactMath.ratioRoundedSql("SUM(ok)", "COUNT(*)", 6)} AS accuracy FROM m)
           |SELECT p.pos, ROUND(CASE p.pos WHEN 0 THEN w3.b0 WHEN 1 THEN w3.b1
           |    WHEN 2 THEN w3.b2 ELSE w3.b3 END, 6) AS weight, acc.accuracy
           |FROM (SELECT unnest([0, 1, 2, 3]) AS pos) p, w3, acc
           |ORDER BY pos""".stripMargin
      }),

    QSpec("dedup_ngram_containment",
      // Near-superset dedup: containment C(a,b) = |A∩B| / min(|A|,|B|)
      // flags truncations/quotations at 1.0 where Jaccard reads only
      // inter/union (the fixture's prefix-truncated near-dups score
      // containment 1.0 vs jaccard ≈0.97; a 10%-prefix quote scores ≈1.0
      // vs ≈0.1 — the case this metric exists for). Same inverted-index
      // candidate shape as dedup_ngram_jaccard — the shingle frame is
      // DfMemo-shared with it — and the ratio is integer-exact through
      // ExactMath (count / min(count), a rational that CAN sit on a
      // rounding half-boundary, unlike irrational cosines).
      (s, dir) => Dedup.exactContainment(s, t(s, dir, "documents"),
        shingleW = 3, threshold = 0.5, idCap = 500, cacheKey = Some(dir)),
      Some(
        """WITH sh AS (
          |  SELECT doc_id, list_distinct(CASE WHEN len(sp) < 3 THEN [text]
          |    ELSE list_transform(range(1, len(sp)-1), i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2]) END) AS sh
          |  FROM (SELECT doc_id, text, string_split(text, ' ') AS sp FROM documents WHERE doc_id < 500) d
          |), pairs AS (
          |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |    len(list_intersect(a.sh, b.sh)) AS inter, len(a.sh) AS na, len(b.sh) AS nb
          |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
          |)
          |SELECT a_id, b_id, containment FROM (
          |  SELECT a_id, b_id,
          |    (CAST(((2000000::HUGEINT * inter + LEAST(na, nb)) // (2::HUGEINT * LEAST(na, nb))) AS DOUBLE) / 1000000) AS containment
          |  FROM pairs) c
          |WHERE containment >= 0.5 ORDER BY a_id, b_id""".stripMargin)),

    QSpec("tokenizer_fertility",
      // Per-language tokenizer diagnostics: chars-per-token and
      // bytes-per-char against the table's ground-truth lang label — the
      // fertility table a tokenizer owner reads before committing a vocab
      // (multibyte scripts surface as bytes_per_char > 1, whitespace-poor
      // scripts as high chars_per_token). One grouped aggregation of
      // integer totals; both ratios integer-exact through ExactMath.
      // O(languages) groups at any corpus size.
      (s, dir) => tokenizerFertility(t(s, dir, "documents")),
      Some(
        s"""WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           |    CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
           |  FROM documents GROUP BY lang)
           |SELECT lang, n_docs, total_tokens, total_chars, total_bytes,
           |  ${ExactMath.ratioRoundedSql("total_chars", "total_tokens", 6)} AS chars_per_token,
           |  ${ExactMath.ratioRoundedSql("total_bytes", "total_chars", 6)} AS bytes_per_char
           |FROM g ORDER BY lang""".stripMargin)),

    QSpec("mixture_epochs",
      // Token-budget epoch planning: turn mixture_temperature_weights'
      // α=0.5 weights into an executable plan — per source, how many
      // tokens of a fixed budget (2× the corpus) to draw, and the implied
      // epoch count (repetition factor) over that source. Float enters
      // exactly once (sqrt·1e6, the same IEEE chain on every engine,
      // rounded to integer micros); allocation and epochs are then pure
      // integer arithmetic in decimal(38,0) — the budget×weight product
      // NEVER runs through a Long, so there is no overflow cliff at real
      // corpus scale (100 TB ≈ 2.5e13 tokens × 1e6 micros ≈ 1e19+ > Long).
      // Shapes: one token-count aggregation (O(sources) groups), two
      // broadcast scalars, zero data-proportional shuffles.
      (s, dir) => {
        // the per-source token rollup feeds THREE consumers (weights, the
        // max scalar, the totals scalar) — persist the O(sources)-row
        // result so the corpus-sized token-count scan runs once, not per
        // branch (the plan otherwise re-scans parquet under each scalar)
        val ps = graft.ext.DfMemo.cached(s, Some(dir), "mixture_ps",
          persistUnkeyed = true) {
          t(s, dir, "documents")
            .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
            .groupBy("source").agg(sum("n_tok").as("n_tokens"))
        }
        val mx = ps.agg(max("n_tokens").as("max_tokens"))
        val w = ps.crossJoin(broadcast(mx)).select(
          col("source"), col("n_tokens"),
          round(sqrt(col("n_tokens").cast("double") / col("max_tokens")) * 1e6)
            .cast("long").as("w_micros"))
        val tots = w.agg(sum("w_micros").as("sum_w"), sum("n_tokens").as("total_tok"))
        val d = "decimal(38,0)"
        val alloc = ExactMath.ratioRounded(
          lit(2L).cast(d) * col("total_tok").cast(d) * col("w_micros").cast(d),
          col("sum_w"), 0).cast("long")
        w.crossJoin(broadcast(tots))
          .withColumn("alloc_tokens", alloc)
          .select(col("source"), col("n_tokens"), col("w_micros"), col("alloc_tokens"),
            ExactMath.ratioRounded(col("alloc_tokens"), col("n_tokens"), 3).as("epochs"))
          .orderBy("source")
      },
      Some(
        s"""WITH ps AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY source),
           |mx AS (SELECT MAX(n_tokens) AS max_tokens FROM ps),
           |w AS (SELECT source, n_tokens,
           |    CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE) / max_tokens) * 1000000) AS BIGINT) AS w_micros
           |  FROM ps, mx),
           |t AS (SELECT CAST(SUM(w_micros) AS BIGINT) AS sum_w,
           |    CAST(SUM(n_tokens) AS BIGINT) AS total_tok FROM w),
           |a AS (SELECT source, n_tokens, w_micros,
           |    CAST(${ExactMath.ratioRoundedSql("2::HUGEINT * total_tok * w_micros", "sum_w", 0)} AS BIGINT) AS alloc_tokens
           |  FROM w, t)
           |SELECT source, n_tokens, w_micros, alloc_tokens,
           |  ${ExactMath.ratioRoundedSql("alloc_tokens", "n_tokens", 3)} AS epochs
           |FROM a ORDER BY source""".stripMargin))
  )
}
