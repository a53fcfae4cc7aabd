package graft

import graft.catalog.TableRegistry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-9 — corpus-index operators: the search-engine-shaped structures a
  * training-data pipeline builds over the documents table (posting lists,
  * contiguous n-gram statistics). Tokenization matches the engine-wide
  * whitespace contract (`split(text, ' ')` / DuckDB `string_split`), so
  * these keys compose with the text_tokens / vocab_* family.
  */
object Queries9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  val specs: Seq[QSpec] = Seq(

    QSpec("inverted_index",
      // Posting lists: per token, document frequency, total term frequency,
      // and the first 16 doc ids of the sorted posting list (rendered as a
      // comma-joined string — the declared surface stays scalar-typed so
      // the driver's row-hash compare never meets a nested column). The
      // per-doc
      // distinct step aggregates (token, doc) pairs FIRST — map-side combine
      // collapses each doc's repeats before the shuffle, and the second
      // aggregation then builds df/tf/postings in one pass. Postings are
      // CAPPED at 16 ids per token (a head sample, not the full list): an
      // uncapped collect_list on a stopword's posting list is driver-safe
      // here but executor-heap-hostile at 100 TB — the full list at scale
      // lives partitioned by (token bucket, doc range), never in one array.
      // df >= 3 keeps the emitted index to the useful-vocabulary slice.
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
        .groupBy("token").agg(
          count(lit(1)).as("df"),
          sum("tf").as("total_tf"),
          concat_ws(",",
            slice(sort_array(collect_list(col("doc_id"))), 1, 16)).as("postings_head"))
        .where(col("df") >= 3)
        .orderBy("token"),
      Some(
        """WITH td AS (
          |  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
          |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
          |        FROM documents) x
          |  GROUP BY token, doc_id)
          |SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
          |  CAST(SUM(tf) AS BIGINT) AS total_tf,
          |  array_to_string((list_sort(list(doc_id)))[1:16], ',') AS postings_head
          |FROM td GROUP BY token HAVING COUNT(*) >= 3 ORDER BY token""".stripMargin)),

    QSpec("ngram_topk",
      // Corpus-wide top-20 contiguous trigrams. Trigram generation is a
      // per-row transform over the token array (no join, no shuffle until
      // the count), and the top-k plans as TakeOrderedAndProject — partial
      // per-partition heaps, never a full sort of the n-gram space. The
      // size<3 guard matters: Spark's sequence(0, n) with n negative
      // generates a DESCENDING sequence, so an unguarded short doc would
      // fabricate out-of-range indices instead of an empty list.
      // opt-r15: trigram list == the 3-shingle kernel output (adjacent
      // tokens joined by the single spaces they were split on), so the
      // interpreted transform+concat runs as the one-pass codegen
      // ShingleArray kernel; the size<3 guard keeps its meaning (the
      // kernel collapses short docs to ONE whole-text shingle, which this
      // key must exclude, not emit)
      (s, dir) => t(s, dir, "documents")
        .select(col("text"), split(col("text"), " ").as("tk"))
        .select(explode(when(size(col("tk")) >= 3,
          graft.ext.Dedup.shingles(col("text"), 3))
          .otherwise(expr("CAST(array() AS array<string>)"))).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("ngram")).limit(20),
      Some(
        """WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents),
          |g AS (SELECT UNNEST(list_transform(generate_series(1, len(tk) - 2),
          |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ngram
          |      FROM d)
          |SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt
          |FROM g GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin)),

    QSpec("cohort_retention",
      // Cohort-retention matrix over events: each user's cohort is their
      // first active epoch-week; each (cohort, offset) cell counts users
      // still active offset weeks later. Week index is TRUNCATING integer
      // division on the epoch-nanos contract (604800e9 ns/week): Spark
      // `div` and DuckDB `//` both truncate toward zero (they agree even
      // for pre-1970 instants, where floor and trunc differ), so there is
      // no timestamp rounding ambiguity between engines. Plan shape:
      // distinct
      // (user, week) pairs collapse map-side, the cohort comes from a
      // window over the user partition (one shuffle on user_id, NO
      // self-join back), then the cell rollup — since (user, week) rows
      // are already distinct, a plain COUNT per cell IS the distinct-user
      // count, sparing a countDistinct at 100 TB.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wk = t(s, dir, "events")
          .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
          .distinct()
        wk.withColumn("cohort_week", min(col("wk")).over(Window.partitionBy("user_id")))
          .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some(
        """WITH wk AS (SELECT DISTINCT user_id,
          |    epoch_ns(ts) // 604800000000000 AS wk FROM events),
          |c AS (SELECT user_id, wk,
          |    MIN(wk) OVER (PARTITION BY user_id) AS cohort_week FROM wk)
          |SELECT cohort_week, wk - cohort_week AS week_offset,
          |  CAST(COUNT(*) AS BIGINT) AS n_users
          |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QSpec("anomaly_mad",
      // Robust per-type outlier screen: median + MAD (median absolute
      // deviation), flagging |x − med| > 3·1.4826·MAD. Plan shape: the
      // per-type stats are TINY (one row per event_type), so each pass
      // re-joins them back by BROADCAST — the events table is scanned
      // three times but never shuffled by value, and rows are never
      // replicated through a per-type window. NOTE the honest caveat:
      // exact percentile() still accumulates a distinct-value map per
      // group in its agg buffer, so per-group memory is distinct-values-
      // bound either way — at 100 TB the swap is approx_percentile
      // (fixed-size sketch, same plan shape); this key keeps the exact
      // form because the oracle compare must be bit-exact. The PROMOTED
      // default for pipelines/reports is graft.ext.Anomaly.madScreenApprox
      // (the sketch path — ReportExporter's anomaly_metrics artifact uses
      // it); this exact form exists only as the oracle twin. Both engines
      // interpolate even-
      // count medians identically (the agg_median_by_group precedent), and
      // the threshold expression keeps the same literal/multiply order on
      // both sides so the IEEE result is bit-identical.
      (s, dir) => {
        val base = t(s, dir, "events").select("event_type", "value")
        val med = base.groupBy("event_type")
          .agg(expr("percentile(value, 0.5D)").as("med"))
        val stats = base.join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(max(col("med")).as("med"),
            expr("percentile(abs(value - med), 0.5D)").as("mad"))
        base.join(broadcast(stats), "event_type")
          .groupBy("event_type")
          .agg(round(max(col("med")), 6).as("med_r"),
            round(max(col("mad")), 6).as("mad_r"),
            sum(when(abs(col("value") - col("med")) > lit(3) * lit(1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some(
        """WITH m AS (SELECT event_type, median(value) AS med
          |           FROM events GROUP BY 1),
          |s AS (SELECT e.event_type, MAX(m.med) AS med,
          |        median(abs(e.value - m.med)) AS mad
          |      FROM events e JOIN m USING (event_type) GROUP BY 1)
          |SELECT e.event_type, ROUND(MAX(s.med), 6) AS med_r,
          |  ROUND(MAX(s.mad), 6) AS mad_r,
          |  CAST(SUM(CASE WHEN abs(e.value - s.med) > 3 * 1.4826 * s.mad
          |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          |FROM events e JOIN s USING (event_type)
          |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    QSpec("anomaly_mad_approx",
      // The 100 TB form of anomaly_mad: the same three-pass median+MAD
      // plan shape with approx_percentile (GK sketch, accuracy 10000 —
      // a FIXED-SIZE agg buffer) in place of exact percentile's
      // distinct-value map. The driver-visible columns are the EXACT
      // med/MAD/outlier-count (hash-stable, DuckDB-reproducible) plus
      // within-band ASSERTIONS of the sketch path against them — the
      // agg_approx_distinct banding pattern: the key hash-checks that the
      // sketch lands inside the band at every SF the gates run, not just
      // that it produced a row. The production swap simply drops the exact
      // columns from each aggregate; the plan shape (broadcast stats back,
      // events never shuffled by value) is identical. Bands: med within 1%,
      // MAD within 2%, outlier count within max(5%, ±2) — GK at 1e-4 rank
      // error measures ≲0.1% on the fixtures, so each holds with ≥10×
      // margin. Raw sketch outputs stay out of the hashed surface (SURVEY
      // §5 rule 1).
      (s, dir) => {
        val base = t(s, dir, "events").select("event_type", "value")
        val med = base.groupBy("event_type").agg(
          expr("percentile(value, 0.5D)").as("med"),
          expr("approx_percentile(value, 0.5D, 10000)").as("amed"))
        val stats = base.join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(max(col("med")).as("med"), max(col("amed")).as("amed"),
            expr("percentile(abs(value - med), 0.5D)").as("mad"),
            expr("approx_percentile(abs(value - amed), 0.5D, 10000)").as("amad"))
        base.join(broadcast(stats), "event_type")
          .groupBy("event_type")
          .agg(max(col("med")).as("med"), max(col("amed")).as("amed"),
            max(col("mad")).as("mad"), max(col("amad")).as("amad"),
            sum(when(abs(col("value") - col("med")) > lit(3) * lit(1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"),
            sum(when(abs(col("value") - col("amed")) > lit(3) * lit(1.4826) * col("amad"), 1L)
              .otherwise(0L)).as("an_outliers"))
          .select(col("event_type"),
            round(col("med"), 6).as("med_r"),
            round(col("mad"), 6).as("mad_r"),
            col("n_outliers"),
            // band floors SCALE WITH THE DISTRIBUTION (mad is its natural
            // dispersion unit), not a fixed absolute: a group whose median
            // sits near zero would make a |med|-relative band collapse to
            // the absolute floor while GK's value error stays density-
            // dependent (rank error maps to a value gap ~ fractions of
            // mad) — the same fixed-premise class the r9 sf1 stress run
            // killed in agg_heavy_hitters. 1e-6 remains only as the
            // degenerate-group fallback (all-equal values ⇒ both sketches
            // return the exact member, difference 0).
            (abs(col("amed") - col("med")) <=
              greatest(lit(0.01) * abs(col("med")), lit(0.02) * col("mad"),
                lit(1e-6))).as("amed_within_1pct"),
            (abs(col("amad") - col("mad")) <=
              greatest(lit(0.02) * abs(col("mad")), lit(0.01) * abs(col("med")),
                lit(1e-6))).as("amad_within_2pct"),
            (abs(col("an_outliers") - col("n_outliers")).cast("double") <=
              greatest(col("n_outliers").cast("double") * lit(0.05), lit(2.0)))
              .as("outliers_within_5pct"))
          .orderBy("event_type")
      },
      Some(
        """WITH m AS (SELECT event_type, median(value) AS med
          |           FROM events GROUP BY 1),
          |s AS (SELECT e.event_type, MAX(m.med) AS med,
          |        median(abs(e.value - m.med)) AS mad
          |      FROM events e JOIN m USING (event_type) GROUP BY 1)
          |SELECT e.event_type, ROUND(MAX(s.med), 6) AS med_r,
          |  ROUND(MAX(s.mad), 6) AS mad_r,
          |  CAST(SUM(CASE WHEN abs(e.value - s.med) > 3 * 1.4826 * s.mad
          |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
          |  TRUE AS amed_within_1pct, TRUE AS amad_within_2pct,
          |  TRUE AS outliers_within_5pct
          |FROM events e JOIN s USING (event_type)
          |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    QSpec("cdc_merge_upsert",
      // The lakehouse MERGE shape: apply a keyed change log latest-wins.
      // events is read as a CDC stream over user state — key user_id,
      // total order (ts, event_id), op DELETE when event_type = 'error',
      // else UPSERT carrying `value`. The surviving state is the max-seq
      // row per key unless that row is a delete. Latest-wins is an ARGMAX,
      // so it runs as max_by over the (ts, event_id) struct order in ONE
      // partial-aggregable groupBy beside the change count — map-side
      // combine collapses a hot key (a bot user producing half the log, the
      // skew fixture's exact shape) to one row per mapper before the
      // shuffle, where the previous row_number window shipped the hot key's
      // every event to one unsplittable task (r12 hot-key window audit).
      // Values pass through both engines untouched, so the compare is
      // bit-exact with no rounding step. This is how merge-on-read
      // compaction resolves at 100 TB: partial-combine by key, never a
      // self-join against the base.
      (s, dir) => {
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            max_by(
              struct(col("value"), col("event_id"), col("ts"), col("event_type")),
              struct(col("ts"), col("event_id"))).as("last"),
            count(lit(1)).as("n_changes"))
          .where(col("last.event_type") =!= "error")
          .select(col("user_id"), col("last.value").as("last_value"),
            col("last.event_id").as("last_event_id"),
            expr("last.ts div 1000000000").as("last_ts_sec"), col("n_changes"))
          .orderBy("user_id")
      },
      Some(
        """WITH c AS (SELECT user_id, value, event_id, event_type,
          |    epoch_ns(ts) AS tns,
          |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes,
          |    ROW_NUMBER() OVER (PARTITION BY user_id
          |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
          |  FROM events)
          |SELECT user_id, value AS last_value, event_id AS last_event_id,
          |  tns // 1000000000 AS last_ts_sec, n_changes
          |FROM c WHERE rn = 1 AND event_type <> 'error'
          |ORDER BY user_id""".stripMargin)),

    QSpec("partition_size_report",
      // The advisor's WHAT-IF balance check: for each candidate partition
      // transform, the partition-count / row-total / largest-partition
      // numbers and the max-to-mean skew ratio — the evidence that decides
      // whether a recommended spec would produce balanced partitions
      // BEFORE any data is rewritten. Per candidate: one grouped count
      // (map-side combine, shuffle on the candidate's own key) collapsed
      // to a single stats row; the three single-row aggregates union.
      // That per-candidate grouped-count is the 100 TB what-if shape —
      // partition-value cardinality rows ever reach the driver, never
      // data. Skew is integer-exact (ExactMath) like every other
      // oracle-compared ratio; the modulo candidate uses pmod so a
      // negative key cannot diverge between engines.
      (s, dir) => {
        val od = t(s, dir, "orders")
        def report(candidate: String, part: Column) =
          od.groupBy(part.as("pv")).agg(count(lit(1)).as("n"))
            .agg(count(lit(1)).as("n_partitions"),
              sum("n").as("n_rows"), max("n").as("max_rows"))
            .select(lit(candidate).as("candidate"),
              col("n_partitions"), col("n_rows"), col("max_rows"))
        report("mod16(o_custkey)", pmod(col("o_custkey"), lit(16L)))
          .unionAll(report("month(o_orderdate)",
            date_trunc("month", col("o_orderdate"))))
          .unionAll(report("o_orderstatus", col("o_orderstatus")))
          .withColumn("skew_r", graft.ext.ExactMath.ratioRounded(
            col("max_rows").cast("decimal(38,0)") *
              col("n_partitions").cast("decimal(38,0)"),
            col("n_rows"), 6))
          .orderBy("candidate")
      },
      Some {
        val skew = graft.ext.ExactMath.ratioRoundedSql(
          "max_rows::HUGEINT * n_partitions", "n_rows", 6)
        s"""WITH c1 AS (SELECT COUNT(*) AS n FROM orders
           |            GROUP BY ((o_custkey % 16) + 16) % 16),
           |c2 AS (SELECT COUNT(*) AS n FROM orders
           |       GROUP BY date_trunc('month', o_orderdate)),
           |c3 AS (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderstatus),
           |u AS (
           |  SELECT 'mod16(o_custkey)' AS candidate,
           |    CAST(COUNT(*) AS BIGINT) AS n_partitions,
           |    CAST(SUM(n) AS BIGINT) AS n_rows,
           |    CAST(MAX(n) AS BIGINT) AS max_rows FROM c1
           |  UNION ALL SELECT 'month(o_orderdate)', CAST(COUNT(*) AS BIGINT),
           |    CAST(SUM(n) AS BIGINT), CAST(MAX(n) AS BIGINT) FROM c2
           |  UNION ALL SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           |    CAST(SUM(n) AS BIGINT), CAST(MAX(n) AS BIGINT) FROM c3)
           |SELECT candidate, n_partitions, n_rows, max_rows, $skew AS skew_r
           |FROM u ORDER BY candidate""".stripMargin
      }),

    QSpec("parse_trino_dialect",
      // P2 ingestion breadth (r9 verdict "What's missing #1"): a REAL Trino
      // query log is full of Trino-only surface forms — ARRAY[…] literals,
      // double-quoted identifiers, FETCH FIRST, TABLESAMPLE BERNOULLI,
      // JSON casts, UNNEST table functions — that Catalyst's parser rejects
      // (or, for ARRAY[…], silently mis-reads as a subscript on a column
      // named `array`). QueryIntrospector.trinoToSpark pre-translates them;
      // this key pins the (table, join_col, where_col) rows the shimmed
      // parse extracts for one of each form against hand-derived sqlglot
      // ground truth. Parsing is driver-side over twelve constant texts
      // (metadata-sized — no job runs until the VALUES-shaped result is
      // consumed).
      (s, dir) => {
        import s.implicits._
        val refRows = Queries9.trinoDialectTexts.flatMap { case (qk, q) =>
          graft.introspect.QueryIntrospector.parse(s, q).toSeq.flatMap { r =>
            r.tables.groupBy(identity).toSeq.map { case (n, v) =>
              (qk, "table", n, v.size.toLong) } ++
              r.joinColumns.toSeq.map { case (n, c) => (qk, "join_col", n, c.toLong) } ++
              r.whereColumns.toSeq.map { case (n, c) => (qk, "where_col", n, c.toLong) }
          }
        }
        refRows.toDF("qk", "kind", "name", "cnt").orderBy("qk", "kind", "name")
      },
      Some(
        """SELECT qk, kind, name, CAST(cnt AS BIGINT) AS cnt FROM (VALUES
          |  (0, 'table', 'events', 1), (0, 'where_col', 'user_id', 1),
          |  (1, 'table', 'orders', 1), (1, 'where_col', 'o_totalprice', 1),
          |  (2, 'table', 'orders', 1),
          |  (3, 'table', 'lineitem', 1), (3, 'where_col', 'l_quantity', 1),
          |  (4, 'table', 'events', 1), (4, 'where_col', 'value', 1),
          |  (5, 'table', 'documents', 1), (5, 'where_col', 'doc_id', 1),
          |  (6, 'join_col', 'l_orderkey', 1), (6, 'join_col', 'o_orderkey', 1),
          |  (6, 'table', 'lineitem', 1), (6, 'table', 'orders', 1),
          |  (6, 'where_col', 'o_custkey', 1),
          |  (7, 'table', 'events', 1), (7, 'where_col', 'ts', 1),
          |  (8, 'table', 'orders', 1),
          |  (8, 'where_col', 'o_clerk', 1), (8, 'where_col', 'o_custkey', 1),
          |  (9, 'table', 'events', 1), (9, 'where_col', 'props', 1),
          |  (10, 'table', 'orders', 1), (10, 'where_col', 'o_custkey', 1),
          |  (11, 'table', 'events', 1), (11, 'where_col', 'user_id', 1)
          |) AS t(qk, kind, name, cnt)
          |ORDER BY qk, kind, name""".stripMargin)),

    QSpec("shard_manifest",
      // Export planning for a corpus write: deterministic shard assignment
      // (murmur3(doc_id) pmod 16 — the split_train_test hash family: no RNG
      // state, stable under re-runs and any partitioning) plus the per-shard
      // manifest row a distributed writer plans from — doc count, total
      // characters (the bytes proxy this fixture carries), id range, and the
      // integer-exact balance ratio of the shard against the mean. One
      // groupBy with O(shards) groups; the manifest is metadata-sized at any
      // corpus scale, and the assignment column doubles as the physical
      // repartition key for the write itself.
      (s, dir) => {
        val sharded = t(s, dir, "documents")
          .withColumn("shard", pmod(hash(col("doc_id")), lit(16)))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        val total = sharded.agg(sum("n_docs").as("all_docs"),
          count(lit(1)).as("n_shards"))
        sharded.crossJoin(broadcast(total))
          .withColumn("balance_r", graft.ext.ExactMath.ratioRounded(
            col("n_docs").cast("decimal(38,0)") * col("n_shards").cast("decimal(38,0)"),
            col("all_docs"), 6))
          .select("shard", "n_docs", "total_chars", "min_id", "max_id", "balance_r")
          .orderBy("shard")
      },
      Some(Queries.murmurCte("documents", "doc_id", 42) + {
        val bal = graft.ext.ExactMath.ratioRoundedSql(
          "n_docs::HUGEINT * n_shards", "all_docs", 6)
        s""", sharded AS (
           |  SELECT ((sh % 16) + 16) % 16 AS shard,
           |    CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           |    MIN(d.doc_id) AS min_id, MAX(d.doc_id) AS max_id
           |  FROM msigned JOIN documents d ON d.doc_id = msigned.v
           |  GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs,
           |    CAST(COUNT(*) AS BIGINT) AS n_shards FROM sharded)
           |SELECT shard, n_docs, total_chars, min_id, max_id, $bal AS balance_r
           |FROM sharded, tot ORDER BY shard""".stripMargin
      })),

    QSpec("drift_psi",
      // Distribution drift between corpus slices — the population stability
      // index over the doc-length distribution, reference sources (src0-9)
      // vs candidate sources (src10-19). The monitoring shape for "did this
      // snapshot's data shift?": bucket the metric (width-50 chars, capped),
      // count per side in ONE pass (conditional sums — no second scan, no
      // join), Laplace-smooth the proportions (+0.5 per bucket, so an
      // empty-on-one-side bucket contributes a finite term instead of ±inf),
      // psi_term = (p−q)·ln(p/q) per bucket and the total cross-joined as a
      // broadcast scalar (NOT a global window — that would single-partition
      // the frame). O(buckets) groups at any corpus size; ln's last-ulp
      // engine variance is ~9 orders below the round(6) surface.
      (s, dir) => {
        val d = t(s, dir, "documents").select(
          when(substring(col("source"), 4, 10).cast("int") < 10, "ref")
            .otherwise("cand").as("side"),
          least(expr("n_chars div 50"), lit(12L)).cast("int").as("bucket"))
        val c = d.groupBy("bucket").agg(
          sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("side") === "cand", 1L).otherwise(0L)).as("n_cand"))
        val tot = c.agg(sum("n_ref").as("ta"), sum("n_cand").as("tb"),
          count(lit(1)).as("nb"))
        val terms = c.crossJoin(broadcast(tot)).select(
          col("bucket"), col("n_ref"), col("n_cand"),
          ((col("n_ref") + lit(0.5)) / (col("ta") + lit(0.5) * col("nb"))).as("p"),
          ((col("n_cand") + lit(0.5)) / (col("tb") + lit(0.5) * col("nb"))).as("q"))
          .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
        val total = terms.agg(sum("term").as("psi"))
        terms.crossJoin(broadcast(total))
          .select(col("bucket"), col("n_ref"), col("n_cand"),
            round(col("term"), 6).as("psi_term"),
            round(col("psi"), 6).as("psi_total"))
          .orderBy("bucket")
      },
      Some(
        """WITH d AS (SELECT CASE WHEN CAST(source[4:] AS INT) < 10
          |      THEN 'ref' ELSE 'cand' END AS side,
          |    CAST(LEAST(n_chars // 50, 12) AS INT) AS bucket FROM documents),
          |c AS (SELECT bucket,
          |    CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
          |    CAST(SUM(CASE WHEN side = 'cand' THEN 1 ELSE 0 END) AS BIGINT) AS n_cand
          |  FROM d GROUP BY 1),
          |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS ta,
          |    CAST(SUM(n_cand) AS BIGINT) AS tb,
          |    CAST(COUNT(*) AS BIGINT) AS nb FROM c),
          |x AS (SELECT bucket, n_ref, n_cand,
          |    (n_ref + 0.5) / (ta + 0.5 * nb) AS p,
          |    (n_cand + 0.5) / (tb + 0.5 * nb) AS q FROM c, t),
          |y AS (SELECT bucket, n_ref, n_cand, (p - q) * ln(p / q) AS term FROM x),
          |s AS (SELECT SUM(term) AS psi FROM y)
          |SELECT bucket, n_ref, n_cand, ROUND(term, 6) AS psi_term,
          |  ROUND(psi, 6) AS psi_total
          |FROM y, s ORDER BY bucket""".stripMargin)),

    QSpec("embedding_pca_power",
      // Top principal component of the mean-centered embeddings — 3 rounds
      // of distributed power iteration (ext/SimSearch.pcaTopComponent), the
      // whitening / "all-but-the-top" kernel of embedding post-processing.
      // Per round: one scan computing d_i = v·eᵢ − v·μ (codegen VectorDot
      // against the literal direction) and one O(dim)-group shuffle for
      // w_j = Σ dᵢ·e_ij − μ_j·Σ dᵢ; only dim doubles reach the driver, no
      // covariance matrix is ever materialized. Deterministic: v₀ = 1/√dim,
      // no RNG; cross-row double sums commute ~1e-15, round(6) is 9 orders
      // coarser (the agg_vector_centroid contract). The oracle replays the
      // same 3 iterations as chained CTEs — the restart-FREE path only: a
      // null-space restart at this fixture would make the engine diverge
      // from the oracle's division-by-zero and fail LOUDLY, so equality
      // also certifies no restart fired (the restart contract itself is
      // unit-tested on a simplex corpus in ExtSpec).
      (s, dir) => {
        import s.implicits._
        val (v, lam) = graft.ext.SimSearch.pcaTopComponent(
          s, t(s, dir, "embeddings"), iters = 3, cacheKey = Some(dir))
        v.zipWithIndex.toSeq.map { case (x, i) => (i + 1, x, lam) }
          .toDF("pos", "loading_raw", "ev_raw")
          .select(col("pos"), round(col("loading_raw"), 6).as("loading"),
            round(col("ev_raw"), 6).as("eigenvalue"))
          .orderBy("pos")
      },
      Some(pcaOracleCtes +
        """
          |SELECT v3.j AS pos, ROUND(v3.x, 6) AS loading,
          |  ROUND(l3.l / (nn.n - 1), 6) AS eigenvalue
          |FROM v3, l3, nn ORDER BY pos""".stripMargin)),

    QSpec("embedding_abtt",
      // All-but-the-top retrieval (X16 composed into its end effect): strip
      // the corpus mean and the power-iteration top component from every
      // embedding, then rank the top-10 cosine neighbors of query vec 0 in
      // the whitened space. The per-row transform is a codegen'd HOF against
      // LITERAL mean/direction arrays (one scan, no shuffle); ranking is the
      // same broadcast-query TakeOrdered as simsearch_topk. Ordering uses
      // the ROUNDED similarity with vec_id tiebreak so the rank cannot hinge
      // on ~1e-15 cross-row summation jitter between engines. The oracle
      // replays the full chain: 3 PCA iterations, the projection removal,
      // and the cosine ranking.
      (s, dir) => graft.ext.SimSearch.abttTopK(
        s, t(s, dir, "embeddings"), queryVecId = 0, k = 10,
        cacheKey = Some(dir)),
      Some(pcaOracleCtes +
        """,
          |vdm AS (SELECT SUM(v3.x * mu.m) AS s FROM v3 JOIN mu USING (j)),
          |di AS (SELECT e.vec_id, SUM(e.v[v3.j] * v3.x) AS d
          |  FROM e CROSS JOIN v3 GROUP BY 1),
          |tr AS (SELECT e.vec_id, v3.j AS j,
          |    e.v[v3.j] - mu.m - v3.x * (di.d - vdm.s) AS x
          |  FROM e JOIN di USING (vec_id) CROSS JOIN v3
          |  JOIN mu ON mu.j = v3.j CROSS JOIN vdm),
          |nrm AS (SELECT vec_id, sqrt(SUM(x * x)) AS n FROM tr GROUP BY 1),
          |qt AS (SELECT j, x FROM tr WHERE vec_id = 0),
          |qn AS (SELECT n AS qn FROM nrm WHERE vec_id = 0),
          |sim AS (SELECT tr.vec_id, SUM(tr.x * qt.x) AS dt
          |  FROM tr JOIN qt USING (j) WHERE tr.vec_id <> 0 GROUP BY 1)
          |SELECT sim.vec_id, ROUND(sim.dt / (nrm.n * qn.qn), 6) AS cos
          |FROM sim JOIN nrm USING (vec_id) CROSS JOIN qn
          |WHERE nrm.n > 0
          |ORDER BY ROUND(sim.dt / (nrm.n * qn.qn), 6) DESC, vec_id
          |LIMIT 10""".stripMargin))
  )

  /** Chained-CTE replay of [[graft.ext.SimSearch.pcaTop]]'s three power-
    * iteration rounds (e/idx/mu/nn/v0 then d_k/w_k/l_k/v_k per round) —
    * shared by the `embedding_pca_power` and `embedding_abtt` oracles so
    * the two replays cannot drift. Ends after v3 (no trailing newline);
    * callers append `\nSELECT …` or `,\n<more CTEs>`. */
  private def pcaOracleCtes: String = {
    def iter(k: Int, prev: String): String =
      s"""d$k AS (SELECT e.vec_id, SUM((e.v[$prev.j] - mu.m) * $prev.x) AS d
         |  FROM e CROSS JOIN $prev JOIN mu ON mu.j = $prev.j GROUP BY 1),
         |w$k AS (SELECT idx.j, SUM((e.v[idx.j] - mu.m) * d$k.d) AS w
         |  FROM e JOIN d$k USING (vec_id) CROSS JOIN idx
         |  JOIN mu ON mu.j = idx.j GROUP BY 1),
         |l$k AS (SELECT sqrt(SUM(w * w)) AS l FROM w$k),
         |v$k AS (SELECT w$k.j, w$k.w / l$k.l AS x FROM w$k, l$k)""".stripMargin
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |idx AS (SELECT CAST(r.i AS INT) AS j FROM range(1, 65) r(i)),
       |mu AS (SELECT idx.j AS j, AVG(e.v[idx.j]) AS m
       |  FROM e CROSS JOIN idx GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
       |v0 AS (SELECT j, CAST(0.125 AS DOUBLE) AS x FROM idx),
       |${iter(1, "v0")},
       |${iter(2, "v1")},
       |${iter(3, "v2")}""".stripMargin
  }

  /** One canned text per Trino-only surface form the shim translates —
    * shared by the `parse_trino_dialect` key and its third-engine audit. */
  val trinoDialectTexts: Seq[(Int, String)] = Seq(
    0 -> "SELECT event_id FROM events WHERE contains(ARRAY[1, 2, 3], user_id)",
    1 -> "SELECT \"o_comment\" FROM \"orders\" WHERE \"o_totalprice\" > 100.0",
    2 -> "SELECT o_orderkey FROM orders ORDER BY o_totalprice FETCH FIRST 10 ROWS ONLY",
    3 -> "SELECT l_orderkey FROM lineitem TABLESAMPLE BERNOULLI(10) WHERE l_quantity > 5",
    4 -> "SELECT CAST(props AS JSON) FROM events WHERE value > 0.5 FETCH FIRST 5 ROWS ONLY",
    5 -> "SELECT doc_id, tag FROM documents CROSS JOIN UNNEST(split(text, ',')) AS t(tag) WHERE doc_id > 10",
    6 -> ("SELECT o_orderkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE contains(ARRAY[1, 2], o_custkey)"),
    // r10 verdict #4 tier: the AT TIME ZONE operator (fails the plain
    // Spark parse; the shim rewrites it operator-for-operator), plus the
    // function-call-shaped forms ROW(…) and TRY(…) that parse natively as
    // unresolved functions — pinned here so a parser regression that
    // starts rejecting them is caught by the oracle, not a real log
    7 -> ("SELECT event_id FROM events " +
      "WHERE (ts AT TIME ZONE 'UTC') > TIMESTAMP '2020-01-01 00:00:00'"),
    8 -> "SELECT o_orderkey FROM orders WHERE ROW(o_custkey, o_clerk) = ROW(1, 'Clerk#1')",
    9 -> ("SELECT TRY(100.0 / value) FROM events " +
      "WHERE TRY(CAST(props AS JSON)) IS NOT NULL"),
    // LISTAGG … WITHIN GROUP parses NATIVELY in Spark 4 (listagg landed
    // with WITHIN GROUP syntax) — pinned so a parser regression that
    // starts rejecting it is caught by the oracle, not a real log
    10 -> ("SELECT listagg(o_clerk, ',') WITHIN GROUP (ORDER BY o_orderdate) " +
      "FROM orders WHERE o_custkey > 5 GROUP BY o_orderstatus"),
    // r11 verdict "What's missing #1": Trino MATCH_RECOGNIZE — sqlglot
    // (the reference's parser) extracts the FROM-clause table from these;
    // the shim strips the clause (it names no tables) so the refs survive
    // instead of the whole statement degrading to empty usage rows. The
    // pattern variables / MEASURES idents (A, B, match_number) must NOT
    // leak as columns — the clause is removed before the parse.
    11 -> ("SELECT user_id, match_no FROM events MATCH_RECOGNIZE (" +
      "PARTITION BY user_id ORDER BY ts " +
      "MEASURES match_number() AS match_no " +
      "PATTERN (A B+) " +
      "DEFINE B AS value > PREV(value)) AS m WHERE user_id > 5"))
}
