package graft

import graft.catalog.TableRegistry
import graft.ext.{Dedup, Multimodal, SimSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-16 — post-r15 surface growth: perceptual image dedup (X68), the
  * image-tier sibling of the text near-dup family (MinHash/SimHash) the
  * multimodal tier lacked — features/resize/frames measured rasters but
  * nothing deduplicated them, and image dedup is a first-class stage of a
  * multimodal training pipeline.
  */
object Queries16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  def specs: Seq[QSpec] = Seq(

    QSpec("dedup_image_phash",
      // X68 — dHash over the DECODED raster corpus (real PNG decode +
      // 9×8 nearest-neighbor resample, the multimodal_resize kernel), four
      // 16-bit LSH bands, Hamming ≤ 10 verification over DISTINCT hashes,
      // keep-first manifest. The oracle replays pixel values from the
      // PngFixtures generator parameters (the multimodal_features
      // discipline — a wrong decode/resample breaks the hash compare) and
      // the band-share candidate condition as an OR-join.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val fx = Multimodal.PngFixtures.ensure(docs, dir)
        Multimodal.dHashKeepManifest(
          Multimodal.mediaFromBinaryFiles(s, fx, "*.png"), maxHamming = 10)
      },
      Some(
        """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id*3) % 24 AS h FROM documents),
          |p AS (SELECT doc_id, list_transform(range(72), k ->
          |    (31*doc_id + 7*(((k % 9) * w) // 9) + 13*(((k // 9) * h) // 8)) % 256) AS pix FROM d),
          |bits AS (SELECT doc_id, list_transform(range(64), k ->
          |    CASE WHEN pix[(k // 8) * 9 + (k % 8) + 2] > pix[(k // 8) * 9 + (k % 8) + 1]
          |      THEN 1 ELSE 0 END) AS bt FROM p),
          |hs AS (SELECT doc_id,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+1]  * (1 << i))) AS INT) AS b0,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+17] * (1 << i))) AS INT) AS b1,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+33] * (1 << i))) AS INT) AS b2,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+49] * (1 << i))) AS INT) AS b3
          |  FROM bits),
          |hd AS (SELECT b0, b1, b2, b3, MIN(doc_id) AS min_doc FROM hs GROUP BY 1, 2, 3, 4),
          |cand AS (SELECT a.b0, a.b1, a.b2, a.b3, MIN(b.min_doc) AS neigh_min
          |  FROM hd a JOIN hd b
          |    ON (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
          |   AND (a.b0 <> b.b0 OR a.b1 <> b.b1 OR a.b2 <> b.b2 OR a.b3 <> b.b3)
          |  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 10
          |  GROUP BY 1, 2, 3, 4)
          |SELECT hs.doc_id,
          |  printf('%04X%04X%04X%04X', hs.b0, hs.b1, hs.b2, hs.b3) AS hash_hex,
          |  CAST(CASE WHEN hs.doc_id = hd.min_doc
          |      AND (c.neigh_min IS NULL OR c.neigh_min > hs.doc_id)
          |    THEN 1 ELSE 0 END AS INT) AS kept
          |FROM hs JOIN hd USING (b0, b1, b2, b3)
          |LEFT JOIN cand c USING (b0, b1, b2, b3)
          |ORDER BY doc_id""".stripMargin)),

    QSpec("dedup_minhash_incremental",
      // X69 — cross-run incremental MinHash dedup, the text-tier sibling
      // of dedup_semantic_incremental: the NEW batch (doc_id%10 >= 7, the
      // dedup_incremental fixture policy) is screened against the KEPT
      // docs of the already-deduped BASE corpus (doc_id%10 < 7) under the
      // exact dedup_minhash family; the base manifest never changes. The
      // oracle replays the whole chain per-doc — signatures, base banding
      // + keep-first drop set, cross banding against keepers, rounded
      // Jaccard ≥ 0.7 — with no group collapse, certifying the engine's
      // rep-level derivation is a pure optimization.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.minhashIncrementalKeepers(s,
          docs.where(expr("doc_id % 10 >= 7")),
          docs.where(expr("doc_id % 10 < 7")),
          cacheKey = Some(dir))
      },
      Some(
        """WITH sh0 AS (
          |  SELECT doc_id, list_distinct(CASE WHEN len(sp) < 3 THEN [text]
          |    ELSE list_transform(range(1, len(sp)-1), i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2]) END) AS sh
          |  FROM (SELECT doc_id, text, string_split(text, ' ') AS sp FROM documents) d
          |), hs AS (
          |  SELECT doc_id, sh, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (acc, c) -> (acc * 131 + c) % 1000000007)) AS hs
          |  FROM sh0
          |), sig AS (
          |  SELECT doc_id, sh, list_transform(range(20), i ->
          |    list_min(list_transform(hs, h ->
          |      (((i+1) * 2654435761 % 1000000007) * h + ((i+1) * 40503 + 17) % 1000000007) % 1000000007))) AS sig
          |  FROM hs
          |), bsig AS (SELECT * FROM sig WHERE doc_id % 10 < 7),
          |nsig AS (SELECT * FROM sig WHERE doc_id % 10 >= 7),
          |bb AS (SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key FROM bsig, range(5) t(b)),
          |bc AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM bb a JOIN bb b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
          |bdrop AS (SELECT DISTINCT c.b_id FROM bc c
          |  JOIN bsig x ON x.doc_id = c.a_id JOIN bsig y ON y.doc_id = c.b_id
          |  WHERE ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
          |    (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6) >= 0.7),
          |kept AS (SELECT * FROM bsig WHERE doc_id NOT IN (SELECT b_id FROM bdrop)),
          |nb AS (SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key FROM nsig, range(5) t(b)),
          |kb AS (SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key FROM kept, range(5) t(b)),
          |xc AS (SELECT DISTINCT n.doc_id AS n_id, k.doc_id AS k_id
          |  FROM nb n JOIN kb k ON n.b = k.b AND n.key = k.key),
          |hit AS (SELECT DISTINCT c.n_id FROM xc c
          |  JOIN nsig x ON x.doc_id = c.n_id JOIN kept y ON y.doc_id = c.k_id
          |  WHERE ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
          |    (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6) >= 0.7)
          |SELECT n.doc_id,
          |  CAST(CASE WHEN h.n_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
          |FROM nsig n LEFT JOIN hit h ON n.doc_id = h.n_id
          |ORDER BY doc_id""".stripMargin)),

    QSpec("knn_classify",
      // X70 — kNN majority-vote classification over the embedding column,
      // the evaluation face the retrieval tier lacked (knn_join emits
      // neighbors; this turns them into predictions + a confusion matrix):
      // 64 probe vectors classified by the majority label of their 5
      // nearest (rounded-cosine, vec_id-asc ties) among the disjoint rest;
      // vote ties break to the smallest label. Rides the knn_join kernel
      // unchanged (broadcast probes, codegen dot, bounded-heap top-k — no
      // shuffle proportional to the corpus), so the scale story is the
      // retrieval tier's: brute-force per partition at fixture scale, IVF
      // bucketing as the 100 TB path. Surface is the O(labels²) confusion
      // rollup a model-eval job actually reads.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val lab = emb.select(col("vec_id"), col("label"))
        val pred = SimSearch.knnJoin(s, emb, nQueries = 64, k = 5)
          .join(lab, Seq("vec_id"))
          .groupBy("q_id", "label").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("q_id").orderBy(col("n").desc, col("label").asc)))
          .where(col("rk") === 1)
          .select(col("q_id"), col("label").as("pred_label"))
        pred
          .join(lab.select(col("vec_id").as("q_id"), col("label").as("true_label")),
            Seq("q_id"))
          .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
          .orderBy("true_label", "pred_label")
      },
      Some(
        """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
          |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv, nrm AS qn FROM n WHERE vec_id < 64),
          |c AS (SELECT vec_id, label, v, nrm FROM n WHERE vec_id >= 64),
          |p AS (SELECT q_id, c.vec_id, c.label,
          |    ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i])) / (nrm*qn), 6) AS cos
          |  FROM c, q),
          |r AS (SELECT q_id, label, ROW_NUMBER() OVER (
          |    PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank FROM p),
          |v AS (SELECT q_id, label, COUNT(*) AS nv FROM r WHERE rank <= 5 GROUP BY 1, 2),
          |pr AS (SELECT q_id, label AS pred_label FROM (
          |    SELECT q_id, label, nv, ROW_NUMBER() OVER (
          |      PARTITION BY q_id ORDER BY nv DESC, label ASC) AS rk FROM v) z
          |  WHERE rk = 1)
          |SELECT q.true_label, pr.pred_label, CAST(COUNT(*) AS BIGINT) AS n
          |FROM pr JOIN q USING (q_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)))
}
