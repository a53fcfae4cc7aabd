package graft

import graft.catalog.TableRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-13 — document fingerprinting by winnowing (Schleimer, Wilkerson,
  * Aiken, SIGMOD 2003 "Winnowing: Local Algorithms for Document
  * Fingerprinting"): the MOSS selection rule, the classic middle ground
  * between MinHash (whole-doc similarity, no locality) and full shingle
  * inversion (exact, but index ∝ every position). Winnowing keeps, for
  * every window of W consecutive k-gram hashes, the window MINIMUM — an
  * index of size ~2/(W+1) per position that still GUARANTEES any shared
  * substring of ≥ W + k − 1 tokens shares at least one fingerprint (a
  * window fully inside the shared run contains only shared k-gram hashes
  * on both sides, so both docs select the same minimum VALUE — matching on
  * values needs no tie-breaking discipline, unlike position-level MOSS).
  *
  * Numeric discipline: fingerprints are the engine-wide ~30-bit polyHash
  * family ([[Sketches.shingleHashes]], the chunk_cdc kernel), replayed
  * hash-for-hash by the oracle — collisions only ever INFLATE the shared-
  * fingerprint signal (the one-sided-error contract Sketches.bucket
  * documents), and every surfaced column is an integer count.
  */
object Queries13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  def specs: Seq[QSpec] = Seq(

    QSpec("fingerprint_winnowing",
      // Corpus fingerprint audit: per source, how many fingerprints the
      // winnowed index holds, how many docs share at least one fingerprint
      // with an earlier (smaller-id) doc — the overlap-candidate rate the
      // MOSS matcher would go on to verify — and the hottest fingerprint's
      // document frequency (the posting the matcher must cap).
      //
      // Scale shape: text is dropped at the first projection (only
      // (doc_id, source, hash, pos) longs ride); per-doc windows are ONE
      // shuffle by doc_id with frames bounded by doc length; the global
      // min-doc/df pass is ONE shuffle by fingerprint with partitions
      // bounded by the fingerprint's df (the nearDupFlagsBatch window
      // discipline — no pair join, no self-join, so a hot fingerprint
      // costs its posting length, never its posting length squared).
      // Docs shorter than W + k − 1 tokens keep pos 0's (truncated)
      // window, so every doc carries ≥ 1 fingerprint.
      (s, dir) => {
        // k = 4-token shingles, w = 4-hash winnowing window (ext.Winnow
        // holds the selection core, shared with PropertySpec's randomized
        // guarantee sweep)
        val fp = graft.ext.Winnow.fingerprintFrame(t(s, dir, "documents"))
        val byFp = Window.partitionBy("fp")
        fp
          .withColumn("min_doc", min("doc_id").over(byFp))
          .withColumn("fp_df", count(lit(1)).over(byFp))
          .groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_fp"),
            max((col("min_doc") < col("doc_id")).cast("long")).as("flag"),
            max("fp_df").as("max_df"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_fp").as("n_fingerprints"),
            sum("flag").as("flagged_docs"),
            max("max_df").as("max_fp_df"))
          .orderBy("source")
      },
      Some(
        """WITH sh AS (
          |  SELECT doc_id, source, CASE WHEN len(sp) < 4 THEN [text]
          |    ELSE list_transform(range(1, len(sp) - 2),
          |      i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) END AS sh
          |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS sp FROM documents) d),
          |hs AS (SELECT doc_id, source, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (a, c) -> (a * 131 + c) % 1000000007)) AS hl FROM sh),
          |p AS (SELECT doc_id, source, u.pos AS pos, u.h AS h FROM (
          |    SELECT doc_id, source, unnest(list_transform(range(1, len(hl)+1),
          |      i -> {'pos': i - 1, 'h': hl[i]})) AS u FROM hs)),
          |w AS (SELECT doc_id, source, pos, h,
          |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
          |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin FROM p),
          |fp AS (SELECT DISTINCT doc_id, source, wmin AS fp FROM w
          |  WHERE pos <= GREATEST(0, n - 4)),
          |g AS (SELECT doc_id, source,
          |    MIN(doc_id) OVER (PARTITION BY fp) AS min_doc,
          |    COUNT(*) OVER (PARTITION BY fp) AS fp_df FROM fp),
          |d2 AS (SELECT doc_id, source, COUNT(*) AS n_fp,
          |    MAX(CASE WHEN min_doc < doc_id THEN 1 ELSE 0 END) AS flag,
          |    MAX(fp_df) AS max_df FROM g GROUP BY doc_id, source)
          |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(n_fp) AS BIGINT) AS n_fingerprints,
          |  CAST(SUM(flag) AS BIGINT) AS flagged_docs,
          |  CAST(MAX(max_df) AS BIGINT) AS max_fp_df
          |FROM d2 GROUP BY source ORDER BY source""".stripMargin)))
}
