package graft

import graft.catalog.TableRegistry
import graft.ext.SimSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-14 — the r13-verdict surface growth: BPE merge training (X60, the
  * operator half X56's fertility measurement presupposed), PII-redacted
  * corpus emission (X62, the governance sibling of `dedup_span_clean`'s
  * ship-the-artifact discipline — the reference's whole advisory posture is
  * acting on findings, cli.py:124-133, and a release pipeline's last act
  * before export is shipping the scrubbed corpus), and filtered ANN (X61,
  * the predicate-plus-top-k composition every RAG deployment runs).
  */
object Queries14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  /** ASCII-explicit PII patterns (the X50 range discipline: explicit
    * classes, no lookahead, no \d/\w/\b property classes — Java regex, RE2
    * and python re run these identically). Phone is the hyphenated
    * NNN-NNN-NNNN shape on purpose: an un-anchored all-digits pattern
    * would be locale guesswork, and the explicit shape keeps every
    * engine's leftmost-greedy scan byte-identical. */
  private[graft] val emailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[graft] val ipv4Pat = """[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"""
  private[graft] val phonePat = """[0-9]{3}-[0-9]{3}-[0-9]{4}"""

  /** The X62 redaction chain, exposed for the planted-PII spec: SEQUENTIAL
    * passes (email → IPv4 → phone), each counting on ITS OWN input — so an
    * IPv4 inside an already-redacted email domain is counted zero times,
    * deterministically, on every engine (the count-then-replace order is
    * part of the declared semantics, not an implementation detail). One
    * scan, per-row regex work only — no shuffle, no join; ORDER BY is the
    * declared key's, not the operator's. */
  private[graft] def piiRedact(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_email",
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).cast("long"))
      .withColumn("t1", regexp_replace(col("text"), emailPat, "<EMAIL>"))
      .withColumn("n_ipv4",
        size(regexp_extract_all(col("t1"), lit(ipv4Pat), lit(0))).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), ipv4Pat, "<IP>"))
      .withColumn("n_phone",
        size(regexp_extract_all(col("t2"), lit(phonePat), lit(0))).cast("long"))
      .withColumn("redacted_text", regexp_replace(col("t2"), phonePat, "<PHONE>"))
      .select(col("doc_id"), col("source"), col("n_email"), col("n_ipv4"),
        col("n_phone"), col("redacted_text"))

  def specs: Seq[QSpec] = Seq(

    QSpec("bpe_train_merges",
      // X60 — see ext/Bpe.scala for the full scale/determinism story: one
      // corpus scan → vocabulary frame, then 10 deterministic merge rounds
      // (highest-count adjacent pair, (l, r)-lexicographic ties) each one
      // vocab-sized aggregation + a single-row argmax collect. The driver
      // fixture's texts are space-joined lowercase words, so the trained
      // merges are real (whole high-frequency words assemble within 10
      // rounds) and the compression trajectory is strictly decreasing.
      (s, dir) => graft.ext.Bpe.trainMerges(s, t(s, dir, "documents"),
        nMerges = 10, cacheKey = Some(dir)),
      Some(graft.ext.Bpe.trainMergesOracleSql(10))),

    QSpec("bpe_encode_fertility",
      // X63 — apply the X60-trained vocabulary: per-source whitespace
      // tokens, ASCII pretokens, and the token count the 10-merge vocab
      // encodes the source to, with encoded-per-ws as the POST-training
      // budget dial (X56's fertility measured the pre-merge stream). The
      // encode never touches symbol strings — counts join the
      // vocabulary-sized (pretoken, n_syms) frame and multiply. Shares the
      // memoized training run with bpe_train_merges.
      (s, dir) => graft.ext.Bpe.encodeFertility(s, t(s, dir, "documents"),
        nMerges = 10, cacheKey = Some(dir)),
      Some(graft.ext.Bpe.encodeFertilityOracleSql(10))),

    QSpec("dedup_semantic_clean",
      // X64 — the keeper manifest dedup_semantic only counts: one row per
      // nonzero-norm vector with (cluster, kept) under the keep-first
      // policy at cos ≥ 0.9 and corpus-scaled k. The fixture plants no
      // semantic dups, so kept = 1 everywhere is the honest corpus answer
      // (the oracle still pins the full assignment + pair chain; the drop
      // path is pinned by Queries14Spec's planted duplicate).
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimSearch.semanticKeepers(emb, SimSearch.scaledK(emb, Some(dir)),
          threshold = 0.9, cacheKey = Some(dir))
      },
      Some(
        s"""${Queries11.assignCtes},
           |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    ROUND(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) /
           |      (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cos
           |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
           |d AS (SELECT DISTINCT b_id FROM p WHERE cos >= 0.9)
           |SELECT vec_id, cluster,
           |  CAST(CASE WHEN d.b_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
           |FROM asg LEFT JOIN d ON asg.vec_id = d.b_id
           |ORDER BY vec_id""".stripMargin)),

    QSpec("pii_redact_clean",
      // X62 — emit the scrubbed corpus + per-doc redaction counts. The
      // driver fixture plants no PII, so zero counts and pass-through text
      // are the honest corpus answer (the dedup_semantic precedent); the
      // full chain — counts, sequential replacement, emission — is still
      // pinned value-for-value by the oracle, and the planted-PII
      // semantics (including the email-shadows-IP ordering) by
      // Queries14Spec.
      (s, dir) => piiRedact(t(s, dir, "documents")).orderBy("doc_id"),
      Some(
        """WITH s1 AS (SELECT doc_id, source, text,
          |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
          |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
          |  FROM documents),
          |s2 AS (SELECT doc_id, source, n_email,
          |    len(regexp_extract_all(t1, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
          |    regexp_replace(t1, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS t2
          |  FROM s1),
          |s3 AS (SELECT doc_id, source, n_email, n_ipv4,
          |    len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
          |    regexp_replace(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted_text
          |  FROM s2)
          |SELECT doc_id, source, CAST(n_email AS BIGINT) AS n_email,
          |  CAST(n_ipv4 AS BIGINT) AS n_ipv4, CAST(n_phone AS BIGINT) AS n_phone,
          |  redacted_text
          |FROM s3 ORDER BY doc_id""".stripMargin)),

    QSpec("simsearch_filtered",
      // X61 — label-filtered top-10 cosine neighbors of vec 0 (whose own
      // label is unconstrained — the probe is looked up unfiltered). The
      // label predicate reaches the parquet scan as a pushed filter
      // (PlanSpec pin), so distance math touches ~10% of the corpus.
      (s, dir) => SimSearch.filteredTopK(s, t(s, dir, "embeddings"),
        queryVecId = 0, k = 10, labelValue = 3),
      Some(
        """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT vec_id, ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i])) /
          |  (sqrt(list_sum(list_transform(v, x -> x*x))) * sqrt(list_sum(list_transform(qv, x -> x*x)))), 6) AS cos
          |FROM e, q WHERE vec_id <> 0 AND label = 3
          |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)))
}
