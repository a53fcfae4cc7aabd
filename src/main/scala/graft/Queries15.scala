package graft

import graft.catalog.TableRegistry
import graft.ext.{Bpe, ExactMath, SimSearch}
import graft.streaming.StreamingAdmission
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-15 — the r14-verdict surface growth: BPE document tokenization +
  * tokenized-shard manifest (X65, the last stage the pipeline was missing
  * — X60 trains the vocabulary, X63 budgets with it, this emits the ids a
  * trainer ingests), cross-run incremental SemDeDup (X66, the keeper
  * manifest composed with `dedup_incremental`'s ingest discipline), and
  * the streaming admission gate's batch twin (X67 — the governance face
  * the streaming tier lacked; the streaming path itself is exercised in
  * StreamingSpec with a memory source, the `stream_usage_window`
  * convention).
  */
object Queries15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  def specs: Seq[QSpec] = Seq(

    QSpec("bpe_tokenize_shards",
      // X65 — see ext/Bpe.scala tokenizeShards for the full story: per-doc
      // token count + order-pinning polynomial hash of the token-id
      // sequence under the X60-trained 10-merge vocabulary, plus the
      // murmur3(doc_id) pmod 16 shard (the shard_manifest hash family).
      // Shares ONE memoized training run with bpe_train_merges /
      // bpe_encode_fertility; tokenization itself is lookup-only (the
      // final vocab already carries each pretoken's merged symbols).
      (s, dir) => Bpe.tokenizeShards(s, t(s, dir, "documents"),
        nMerges = 10, nShards = 16, cacheKey = Some(dir)),
      Some(Bpe.tokenizeShardsOracleSql(10, 16))),

    QSpec("dedup_semantic_incremental",
      // X66 — a NEW embedding batch (vec_id % 10 >= 7) arrives against an
      // already-deduped corpus (vec_id % 10 < 7): assigned to the
      // EXISTING centroid frame, checked against KEPT base vectors only,
      // the base manifest untouched (keep-first across runs). The batch
      // split is the dedup_incremental fixture policy; k scales with the
      // BASE corpus (the index that exists at ingest time). The driver
      // fixture plants no cross-batch near-dups, so kept = 1 everywhere is
      // the honest corpus answer — the oracle still re-derives both
      // assignments, the base keeper set, and the cross join from scratch;
      // the drop path is pinned by Queries15Spec's planted duplicate.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val b1 = emb.where(expr("vec_id % 10 < 7"))
        val b2 = emb.where(expr("vec_id % 10 >= 7"))
        SimSearch.incrementalKeepers(b2, b1,
          SimSearch.scaledK(b1, Some(s"$dir#b1")),
          threshold = 0.9, cacheKey = Some(s"$dir#b1"))
      },
      Some(
        """WITH e AS (SELECT vec_id, v FROM (
          |    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |    FROM embeddings) raw
          |  WHERE list_sum(list_transform(v, x -> x*x)) > 0),
          |b1 AS (SELECT * FROM e WHERE vec_id % 10 < 7),
          |b2 AS (SELECT * FROM e WHERE vec_id % 10 >= 7),
          |kk AS (SELECT GREATEST(8, COUNT(*) // 256) AS k FROM embeddings WHERE vec_id % 10 < 7),
          |cent AS (SELECT ci, cv, c2 FROM (
          |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v AS cv,
          |      list_sum(list_transform(v, x -> x*x)) AS c2 FROM b1) c, kk
          |  WHERE c.ci < kk.k),
          |asg1 AS (SELECT vec_id, v, ci AS cluster FROM (
          |    SELECT b1.vec_id, b1.v, cent.ci,
          |      row_number() OVER (PARTITION BY b1.vec_id ORDER BY
          |        list_sum(list_transform(range(len(b1.v)), i -> b1.v[i+1]*cent.cv[i+1])) * -2.0 + cent.c2,
          |        cent.ci) AS rk
          |    FROM b1, cent) r WHERE rk = 1),
          |asg2 AS (SELECT vec_id, v, ci AS cluster FROM (
          |    SELECT b2.vec_id, b2.v, cent.ci,
          |      row_number() OVER (PARTITION BY b2.vec_id ORDER BY
          |        list_sum(list_transform(range(len(b2.v)), i -> b2.v[i+1]*cent.cv[i+1])) * -2.0 + cent.c2,
          |        cent.ci) AS rk
          |    FROM b2, cent) r WHERE rk = 1),
          |p1 AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          |    ROUND(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) /
          |      (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cos
          |  FROM asg1 a JOIN asg1 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
          |d1 AS (SELECT DISTINCT b_id FROM p1 WHERE cos >= 0.9),
          |kept1 AS (SELECT asg1.vec_id, asg1.v, asg1.cluster
          |  FROM asg1 LEFT JOIN d1 ON asg1.vec_id = d1.b_id WHERE d1.b_id IS NULL),
          |p2 AS (SELECT n.vec_id AS a_id,
          |    ROUND(list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*k.v[i])) /
          |      (sqrt(list_sum(list_transform(n.v, x -> x*x))) * sqrt(list_sum(list_transform(k.v, x -> x*x)))), 6) AS cos
          |  FROM asg2 n JOIN kept1 k ON n.cluster = k.cluster),
          |d2 AS (SELECT DISTINCT a_id FROM p2 WHERE cos >= 0.9)
          |SELECT asg2.vec_id, asg2.cluster,
          |  CAST(CASE WHEN d2.a_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
          |FROM asg2 LEFT JOIN d2 ON asg2.vec_id = d2.a_id
          |ORDER BY vec_id""".stripMargin)),

    QSpec("admission_gate",
      // X67 batch twin — per-source admission stats under the production
      // screening semantics: a doc is ADMITTED iff all four Gopher rules
      // pass (quality_gopher_rules' exact predicates, shared via
      // TextAnalysis.gopherRules) AND the X62 sequential redaction chain
      // finds zero PII. The driver fixture plants no PII, so n_pii_hit = 0
      // and admitted == quality-pass is the honest corpus answer; the
      // planted-PII path and the streaming face's bounded-state merge are
      // pinned in Queries15Spec / StreamingSpec.
      (s, dir) => StreamingAdmission.batchTwin(t(s, dir, "documents")),
      Some(
        s"""WITH s1 AS (SELECT source, text, n_chars,
           |    len(regexp_extract_all(text, '${Queries14.emailPat}')) AS n_email,
           |    regexp_replace(text, '${Queries14.emailPat}', '<EMAIL>', 'g') AS t1
           |  FROM documents),
           |s2 AS (SELECT source, text, n_chars, n_email,
           |    len(regexp_extract_all(t1, '${Queries14.ipv4Pat}')) AS n_ipv4,
           |    regexp_replace(t1, '${Queries14.ipv4Pat}', '<IP>', 'g') AS t2
           |  FROM s1),
           |s3 AS (SELECT source, text, n_chars, n_email, n_ipv4,
           |    len(regexp_extract_all(t2, '${Queries14.phonePat}')) AS n_phone
           |  FROM s2),
           |m AS (SELECT source, n_email + n_ipv4 + n_phone AS n_red,
           |    string_split(text, ' ') AS sp, n_chars FROM s3),
           |r AS (SELECT source, n_red,
           |    CAST(len(sp) AS BIGINT) AS n,
           |    CAST(n_chars - (len(sp) - 1) AS BIGINT) AS ch,
           |    CAST(len(list_filter(sp, t -> t = 'the' OR t = 'a')) AS BIGINT) AS st,
           |    CAST(CASE WHEN len(sp) >= 2 THEN len(sp) - 1 ELSE 0 END AS BIGINT) AS tbi,
           |    CAST(CASE WHEN len(sp) >= 2 THEN len(list_distinct(
           |        list_transform(range(1, len(sp)), i -> sp[i] || ' ' || sp[i+1])))
           |      ELSE 0 END AS BIGINT) AS dbi
           |  FROM m),
           |q AS (SELECT source, n_red,
           |    CASE WHEN n BETWEEN 20 AND 90 AND ch >= 3 * n AND ch <= 5 * n
           |      AND st >= 2 AND (tbi - dbi) * 20 <= tbi THEN 1 ELSE 0 END AS qp
           |  FROM r)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_red) AS BIGINT) AS n_redactions,
           |  CAST(SUM(1 - qp) AS BIGINT) AS n_quality_fail,
           |  CAST(COUNT(*) FILTER (WHERE n_red > 0) AS BIGINT) AS n_pii_hit,
           |  CAST(SUM(CASE WHEN qp = 1 AND n_red = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
           |  ${ExactMath.ratioRoundedSql(
             "SUM(CASE WHEN qp = 1 AND n_red = 0 THEN 1 ELSE 0 END)",
             "COUNT(*)", 6)} AS admit_frac
           |FROM q GROUP BY source ORDER BY source""".stripMargin)))
}
