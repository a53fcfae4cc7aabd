package graft

import graft.catalog.TableRegistry
import graft.ext.{Dedup, Graph, Sketches, SimSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-7 operator surface — mergeable sketch summaries over the
  * SQL-reproducible polynomial hash family. Spark's own approximate
  * aggregates (HLL, approx_percentile) can only be rows-only checked
  * because their mixing is engine-internal; these two build the sketch
  * from plain modular arithmetic, so the DuckDB twin replays the sketch
  * CELL-FOR-CELL and the keys are full hash-compared oracles of the whole
  * approximate structure — estimates, collisions, false positives and all.
  */
object Queries7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  val specs: Seq[QSpec] = Seq(

    QSpec("cms_token_counts",
      // Count-min sketch (d=4 rows × w=64 cells) over corpus token
      // occurrences, reported as (tok, true_cnt, cms_est) for every token
      // type: est ≥ true always (one-sided error), and at these params the
      // fixture corpus produces real collisions, so the key verifies the
      // sketch's estimates AND its characteristic overestimates. Scale
      // shape: cells are sums → partial aggregation on executors IS the
      // sketch merge; the shuffled state is the O(d·w) cell table, never
      // the token stream.
      (s, dir) => Sketches.cmsTokenCounts(t(s, dir, "documents"), d = 4, w = 64),
      Some(
        """WITH tokc AS (SELECT tok, COUNT(*) AS cnt
          |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          |  GROUP BY tok),
          |h AS (SELECT tok, cnt, list_reduce(list_prepend(CAST(7 AS BIGINT),
          |    list_transform(range(1, length(tok)+1), i -> CAST(unicode(tok[i]) AS BIGINT))),
          |    (a, c) -> (a * 131 + c) % 1000000007) AS th FROM tokc),
          |rb AS (SELECT tok, cnt, i,
          |    ((((i * 2654435761) % 1000000007) * th
          |      + (i * 40503 + 17) % 1000000007) % 1000000007) % 64 AS bucket
          |  FROM h, range(1, 5) t(i)),
          |sk AS (SELECT i, bucket, SUM(cnt) AS cell FROM rb GROUP BY i, bucket)
          |SELECT tok, CAST(MAX(cnt) AS BIGINT) AS true_cnt,
          |  CAST(MIN(cell) AS BIGINT) AS cms_est
          |FROM rb JOIN sk USING (i, bucket) GROUP BY tok ORDER BY tok""".stripMargin)),

    QSpec("bloom_prefilter",
      // Bloom-filter dedup prefilter (m=4096 bits, k=3) in front of the
      // incremental-dedup anti-join: historical head fingerprints set the
      // bits; a new-shard doc is flagged iff all its k positions are set.
      // Reports per-source (n_new, n_flagged, n_dup, n_false_pos) — no
      // false negatives by construction, and the fixture corpus produces
      // real false positives, so the key verifies the filter's soundness
      // AND its error behavior. Scale shape: the bit set is an O(m)
      // broadcast (the filter a pipeline persists between ingestion runs);
      // only flagged docs — a few % — would proceed to the exact
      // anti-join of dedup_incremental.
      (s, dir) => Sketches.bloomPrefilter(t(s, dir, "documents"),
        histPred = expr("doc_id % 10 < 7"), newPred = expr("doc_id % 10 >= 7"),
        headTokens = 8, k = 3, m = 4096),
      Some(
        """WITH f AS (SELECT doc_id, source,
          |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS fp
          |  FROM documents),
          |h AS (SELECT doc_id, source, list_reduce(list_prepend(CAST(7 AS BIGINT),
          |    list_transform(range(1, length(fp)+1), i -> CAST(unicode(fp[i]) AS BIGINT))),
          |    (a, c) -> (a * 131 + c) % 1000000007) AS th FROM f),
          |pos AS (SELECT doc_id, source, th, i,
          |    ((((i * 2654435761) % 1000000007) * th
          |      + (i * 40503 + 17) % 1000000007) % 1000000007) % 4096 AS p
          |  FROM h, range(1, 4) t(i)),
          |bits AS (SELECT DISTINCT p FROM pos WHERE doc_id % 10 < 7),
          |histfp AS (SELECT DISTINCT th FROM h WHERE doc_id % 10 < 7),
          |nw AS (SELECT doc_id, source, th,
          |    BOOL_AND(p IN (SELECT p FROM bits)) AS maybe_seen
          |  FROM pos WHERE doc_id % 10 >= 7 GROUP BY doc_id, source, th)
          |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new,
          |  CAST(SUM(CASE WHEN maybe_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          |  CAST(SUM(CASE WHEN th IN (SELECT th FROM histfp) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          |  CAST(SUM(CASE WHEN maybe_seen AND th NOT IN (SELECT th FROM histfp)
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
          |FROM nw GROUP BY source ORDER BY source""".stripMargin)),

    QSpec("chunk_cdc",
      // Content-defined chunking: a chunk boundary opens wherever the
      // rolling 4-token shingle hash ≡ 0 (mod 16) — expected chunk ≈ 16
      // spans, but boundaries depend only on CONTENT, so an insertion
      // early in a doc shifts chunk ids, not every chunk's bytes (the
      // property fixed-stride chunk_overlap lacks, and the reason CDC is
      // the dedup-friendly chunker). Per-doc work stays in one window
      // partition; the boundary rule is the same replayable poly-hash
      // family as the sketch keys.
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            Sketches.polyHashArray(Dedup.shingles(col("text"), 4)).as("hl"))
          .select(col("doc_id"), posexplode(col("hl")).as(Seq("pos", "h")))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        d.withColumn("chunk_id",
            sum(when(col("h") % 16 === 0, 1).otherwise(0)).over(w).cast("int"))
          .groupBy("doc_id", "chunk_id")
          .agg(count(lit(1)).as("n_spans"),
            min("pos").cast("int").as("start_pos"),
            max("pos").cast("int").as("end_pos"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(
        """WITH sh AS (
          |  SELECT doc_id, CASE WHEN len(sp) < 4 THEN [text]
          |    ELSE list_transform(range(1, len(sp) - 2),
          |      i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) END AS sh
          |  FROM (SELECT doc_id, text, string_split(text, ' ') AS sp FROM documents) d),
          |hs AS (SELECT doc_id, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (a, c) -> (a * 131 + c) % 1000000007)) AS hl FROM sh),
          |p AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(hl)+1),
          |      i -> {'pos': i - 1, 'h': hl[i]})) AS u FROM hs)),
          |c AS (SELECT doc_id, pos,
          |    SUM(CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id FROM p)
          |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
          |  CAST(COUNT(*) AS BIGINT) AS n_spans,
          |  CAST(MIN(pos) AS INT) AS start_pos, CAST(MAX(pos) AS INT) AS end_pos
          |FROM c GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin)),

    QSpec("graph_pagerank",
      // PageRank over the ANN similarity graph, in 1e-6 fixed point:
      // integer ranks make every contribution sum exact and commutative,
      // so a 5-iteration power method is hash-comparable across engines —
      // a double-based PageRank never could be (shuffle order would flip
      // low bits). Answers the dedup keep-policy question "which doc is
      // most central to its near-dup neighborhood". Scale shape: each
      // iteration is one shuffle join on the src id + one grouped sum;
      // rank state is O(nodes) and lives in executors, never the driver.
      // The edge pairs reuse simjoin_ann's memoized bucket projection.
      (s, dir) => Graph.pagerankFixedPoint(
        SimSearch.annSelfJoin(s, t(s, dir, "embeddings"),
          dim = 64, nPlanes = 8, threshold = 0.25, cacheKey = Some(dir))
          .select("a_id", "b_id"),
        iters = 5),
      Some {
        def step(prev: String): String =
          s"""(SELECT dg.s AS id, dg.deg,
             |    150000 + (850000 * c.contrib) // 1000000 AS rank
             |  FROM dg JOIN (SELECT ed.d AS id, SUM(r.rank // r.deg) AS contrib
             |    FROM ed JOIN $prev r ON ed.s = r.id GROUP BY ed.d) c ON dg.s = c.id)""".stripMargin
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
           |bk AS (SELECT vec_id, v, nrm,
           |  CAST(list_sum(list_transform(range(8), p -> CASE WHEN
           |    list_sum(list_transform(range(len(v)), i -> v[i+1] * CAST((i*2654435761 + p*40503) % 1000 - 500 AS DOUBLE))) >= 0
           |    THEN (1 << p) ELSE 0 END)) AS INT) AS bucket FROM n),
           |pr AS (SELECT a_id, b_id FROM (
           |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    ROUND(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1]*b.v[i+1])) / (a.nrm*b.nrm), 6) AS cos
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) x
           |  WHERE cos >= 0.25),
           |ed AS (SELECT a_id AS s, b_id AS d FROM pr UNION ALL SELECT b_id, a_id FROM pr),
           |dg AS (SELECT s, COUNT(*) AS deg FROM ed GROUP BY s),
           |r0 AS (SELECT s AS id, deg, CAST(1000000 AS BIGINT) AS rank FROM dg),
           |r1 AS ${step("r0")},
           |r2 AS ${step("r1")},
           |r3 AS ${step("r2")},
           |r4 AS ${step("r3")},
           |r5 AS ${step("r4")}
           |SELECT id AS vec_id, CAST(deg AS BIGINT) AS deg, CAST(rank AS BIGINT) AS rank
           |FROM r5 ORDER BY vec_id""".stripMargin
      }))
}
