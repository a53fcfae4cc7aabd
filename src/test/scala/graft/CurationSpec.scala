package graft

import graft.catalog.TableRegistry
import graft.ext.{Curation, SimSearch}
import org.apache.spark.sql.functions._

/** Batch-5 hygiene operators on hand-built corpora with known answers, plus
  * plan-shape and recall checks for the fixture-driven keys. */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("decontamination flags exactly the train docs sharing an eval shingle") {
    // doc 0 = eval. doc 10 embeds eval 5-gram "a b c d e"; doc 11 shares
    // only shorter runs ("a b c d" then breaks); doc 12 is disjoint and
    // short (whole-text shingle can't match either).
    val docs = Seq(
      (0L, "a b c d e f g"),
      (10L, "z z a b c d e"),
      (11L, "a b c d x e f"),
      (12L, "p q r s")
    ).toDF("doc_id", "text")
    val got = Curation.contaminatedDocIds(docs,
        benchPred = col("doc_id") < 10, trainPred = col("doc_id") >= 10, w = 5)
      .as[Long].collect().toSet
    assert(got === Set(10L))
  }

  test("decontamination check is a broadcast semi-join (no corpus-sized shuffle)") {
    val docs = TableRegistry.table(spark, sfDir, "documents")
    val plan = Curation.contaminatedDocIds(docs,
        col("doc_id") < 20, col("doc_id") >= 20, w = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("funnel orders stages strictly: out-of-order events don't convert") {
    // user 1 completes view→click→purchase in order; user 2 clicked before
    // their first view and purchased before that click, so only stage 1
    // counts them; user 3 never viewed, so no stage counts them.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "purchase", 3L), (2L, "view", 8L),
      (3L, "click", 1L), (3L, "purchase", 2L)
    ).toDF("user_id", "event_type", "ms")
    val got = Curation.funnelStages(ev, Seq("view", "click", "purchase"))
      .as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
  }

  test("funnel ties don't convert (strictly-after semantics)") {
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L))
      .toDF("user_id", "event_type", "ms")
    val got = Curation.funnelStages(ev, Seq("view", "click"))
      .as[(Int, Long)].collect().toMap
    // the unsurvived stage is PRESENT with users = 0, not silently absent
    assert(got === Map(1 -> 1L, 2 -> 0L))
  }

  test("funnel emits every declared stage — zero-survivor tail included") {
    val ev = Seq((1L, "view", 10L), (2L, "view", 5L))
      .toDF("user_id", "event_type", "ms")
    val got = Curation.funnelStages(ev, Seq("view", "click", "purchase"))
      .as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(1 -> 2L, 2 -> 0L, 3 -> 0L))
  }

  test("decontamination finds a SHORT eval prompt embedded in a long training doc") {
    // eval doc 0 has only 3 tokens (< w=5): its whole text must still flag
    // the long training doc that contains it verbatim — w-shingles alone
    // can never equal a sub-w eval phrase (the short-benchmark-prompt case
    // decontamination exists for). Doc 11 contains the tokens but not
    // contiguously; doc 12 is clean.
    val docs = Seq(
      (0L, "two plus two"),
      (10L, "the answer to two plus two is four obviously"),
      (11L, "two minus plus and two more"),
      (12L, "completely unrelated text here")
    ).toDF("doc_id", "text")
    val got = Curation.contaminatedDocIds(docs,
        benchPred = col("doc_id") < 10, trainPred = col("doc_id") >= 10, w = 5)
      .as[Long].collect().toSet
    assert(got === Set(10L))
  }

  test("quantized top-k: codes bounded by ±127 and recall vs exact is high") {
    val emb = TableRegistry.table(spark, sfDir, "embeddings")
    val maxCode = emb.select(SimSearch.quantize(SimSearch.asDouble(col("embedding"))).as("q"))
      .select(array_max(transform(col("q"), x => abs(x))).as("m"))
      .agg(max("m")).as[Double].head()
    assert(maxCode <= 127.0, s"max |code| $maxCode")
    val exact = SimSearch.topK(spark, emb, queryVecId = 0, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val quant = SimSearch.quantizedTopK(spark, emb, queryVecId = 0, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(quant.size === 10)
    val overlap = exact.intersect(quant).size
    assert(overlap >= 7, s"overlap $overlap of 10 vs exact top-k")
  }

  test("knn join: every probe gets k ranked neighbors, cosines non-increasing") {
    val emb = TableRegistry.table(spark, sfDir, "embeddings")
    val rows = SimSearch.knnJoin(spark, emb, nQueries = 8, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.length === 24)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1, 2, 3), s"probe $q ranks")
      val cs = rs.sortBy(_._2).map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"probe $q not sorted")
      assert(rs.forall(_._3 >= 8), s"probe $q matched another probe")
    }
    // every probe is present exactly once at rank 1 (full cosine
    // equivalence is the DuckDB oracle's job)
    val top1 = rows.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    assert(top1.keySet === (0L until 8L).toSet)
  }

  test("unigram LM score favors docs made of corpus-common tokens") {
    val docs = Seq((1L, "a a a"), (2L, "a b q")).toDF("doc_id", "text")
    // counts: a=4, b=1, q=1, N=6 → doc1 = 12/(3·6) ≈ 0.667, doc2 = 6/18 ≈ 0.333
    val got = graft.ext.TextAnalysis.unigramLmScore(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(got(1L) - 12.0 / 18) < 1e-9)
    assert(math.abs(got(2L) - 6.0 / 18) < 1e-9)
  }

  test("length-bucketed batches: every batch is within one bucket and ≤ batch size") {
    val batches = Queries.queries("length_bucket_batches")(spark, sfDir)
    val rows = batches.select("bucket", "batch_id", "n_docs", "max_tok")
      .as[(Int, Int, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, _, nDocs, maxTok) =>
      assert(nDocs <= 8, s"batch of $nDocs docs")
      assert(maxTok >= bucket && maxTok < bucket + 16,
        s"max_tok $maxTok outside bucket [$bucket, ${bucket + 16})")
    }
  }
}
