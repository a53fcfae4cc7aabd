package graft

import graft.catalog.TableRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *
  * Plus X56: GPT-2-shape BPE-regex pretokenization counts — the token-
  * budget correction dial between whitespace counts (what the rest of the
  * surface plans with) and the pretoken stream a BPE vocab actually
  * trains over.
  *
  * Plus X57 (r12): `winnow_match_spans` closes the MOSS loop — from the
  * fingerprint index's candidate pairs to the verified maximal shared
  * token runs (what MOSS does after winnowing, Schleimer §4, and the
  * operator an exact-substring span-dedup pipeline actually runs —
  * Lee et al., arXiv:2107.06499).
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
      // min-doc/df pass is a groupBy(fp).agg(min, count) + join back, NOT
      // a whole-partition window — the grouped form gets map-side combine
      // (a hot boilerplate fingerprint collapses to one partial row per
      // mapper before the shuffle) and the join-back is AQE-skew-splittable,
      // where a Window.partitionBy(fp) would ship the hot posting's every
      // row to one unsplittable task. Docs shorter than W + k − 1 tokens
      // keep pos 0's (truncated) window, so every doc carries ≥ 1
      // fingerprint.
      (s, dir) => {
        // k = 4-token shingles, w = 4-hash winnowing window (ext.Winnow
        // holds the selection core, shared with PropertySpec's randomized
        // guarantee sweep)
        val fp = graft.ext.Winnow.fingerprintFrameMemo(s, dir, t(s, dir, "documents"))
        val fpStats = fp.groupBy("fp")
          .agg(min("doc_id").as("min_doc"), count(lit(1)).as("fp_df"))
        fp.join(fpStats, "fp")
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
          |FROM d2 GROUP BY source ORDER BY source""".stripMargin)),

    QSpec("winnow_match_spans",
      // X57 — fingerprint-VERIFIED span extraction: candidate pairs come
      // from the winnowed index (docs sharing a fingerprint whose document
      // frequency is in [2, 16] — the df cap is the boilerplate screen
      // source_overlap_matrix uses: a fingerprint in 30% of the corpus is
      // template noise, and capping it bounds pair work by cap²·|fps|, not
      // corpus²); each pair is then verified EXACTLY by joining its 4-token
      // shingle streams and reading maximal diagonal runs (gaps-and-islands
      // on pb − pa), emitting every maximal shared run of ≥ 7 tokens —
      // exactly the runs the winnowing guarantee promises the index
      // discovers (w + k − 1 = 7), so discovery and verification close.
      //
      // Scale shape: the df pass is groupBy + join-back (map-side combine,
      // AQE-splittable — the r12 posting discipline); pair generation is a
      // self-equi-join on capped fingerprints (≤ cap²/2 pairs per fp);
      // verification joins ride (doc_id) and (doc_id, gram-hash) keys —
      // bodies never shuffle, shingle identity travels as xxhash64 (64-bit;
      // collisions only INFLATE candidate points and are filtered by the
      // consecutive-run check, while the 30-bit polyhash family stays
      // confined to the winnowing stage where its collisions only ADD
      // candidate pairs that verify to nothing); the islands window
      // partitions by (pair, diagonal) — frames bounded by doc length, the
      // accepted doc-bounded window class. Docs shorter than 7 tokens are
      // dropped before the gram join (they cannot contain a 7-token run).
      // Implementation core shared with `dedup_span_removal` (X58):
      // ext.Winnow.matchSpans, memoized per (session, dir).
      (s, dir) =>
        graft.ext.Winnow.matchSpans(s, dir, t(s, dir, "documents"))
          .orderBy("a_id", "b_id", "a_start", "b_start"),
      Some(
        """WITH sp AS (SELECT doc_id, source, text, string_split(text, ' ') AS sp
          |  FROM documents),
          |sh AS (SELECT doc_id, CASE WHEN len(sp) < 4 THEN [text]
          |    ELSE list_transform(range(1, len(sp) - 2),
          |      i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) END AS sh
          |  FROM sp),
          |hs AS (SELECT doc_id, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (a, c) -> (a * 131 + c) % 1000000007)) AS hl FROM sh),
          |p AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(hl)+1),
          |      i -> {'pos': i - 1, 'h': hl[i]})) AS u FROM hs)),
          |wn AS (SELECT doc_id, pos, h,
          |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
          |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin FROM p),
          |fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM wn
          |  WHERE pos <= GREATEST(0, n - 4)),
          |ok AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 16),
          |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM fp a JOIN ok USING (fp) JOIN fp b USING (fp)
          |  WHERE a.doc_id < b.doc_id),
          |g0 AS (SELECT doc_id, list_transform(range(1, len(sp) - 2),
          |    i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) AS gs
          |  FROM sp WHERE len(sp) >= 7),
          |grams AS (SELECT doc_id, u.p AS p, u.g AS g FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(gs)+1),
          |      i -> {'p': i - 1, 'g': gs[i]})) AS u FROM g0)),
          |pts AS (SELECT pr.a_id, pr.b_id, ga.p AS pa, gb.p AS pb
          |  FROM pairs pr
          |  JOIN grams ga ON ga.doc_id = pr.a_id
          |  JOIN grams gb ON gb.doc_id = pr.b_id AND gb.g = ga.g),
          |seg AS (SELECT a_id, b_id, pb - pa AS diag, pa, pb,
          |    CASE WHEN pa - LAG(pa) OVER (PARTITION BY a_id, b_id, pb - pa
          |      ORDER BY pa) = 1 THEN 0 ELSE 1 END AS brk FROM pts),
          |seg2 AS (SELECT a_id, b_id, diag, pa, pb,
          |    SUM(brk) OVER (PARTITION BY a_id, b_id, diag ORDER BY pa
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM seg)
          |SELECT a_id, b_id, CAST(MIN(pa) AS INT) AS a_start,
          |  CAST(MIN(pb) AS INT) AS b_start,
          |  CAST(COUNT(*) + 3 AS BIGINT) AS run_tokens
          |FROM seg2 GROUP BY a_id, b_id, diag, seg
          |HAVING COUNT(*) + 3 >= 7
          |ORDER BY a_id, b_id, a_start, b_start""".stripMargin)),

    QSpec("dedup_span_removal",
      // X58 — APPLY the verified spans: the keep-first policy (Lee et al.,
      // arXiv:2107.06499 — remove the duplicated substring from the later
      // occurrence): the LATER doc of each discovered pair sheds the
      // tokens its shared runs cover; coverage is the UNION of the doc's
      // b-side spans (distinct token positions, so overlapping runs on
      // different diagonals never double-count a token). Surface = per-doc
      // before/removed/after token counts + keep ratio — the attrition
      // accounting a span-dedup stage reports (curation_attrition's
      // sibling at span granularity). Scale shape: spans ride the
      // memoized matchSpans frame (shared with X57 — computed ONCE per
      // session); the position explode is bounded by covered-token count
      // ≤ doc length; then one distinct, one grouped count (map-side
      // combine), and a left join back to the per-doc token counts.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val covered = graft.ext.Winnow.coveredPositions(s, dir, docs)
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
        docs.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup_tokens"),
            (col("n_tok") - coalesce(col("n_dup"), lit(0L))).as("n_keep"),
            graft.ext.ExactMath.ratioRounded(
              col("n_tok") - coalesce(col("n_dup"), lit(0L)), col("n_tok"), 6)
              .as("keep_ratio"))
          .orderBy("doc_id")
      },
      Some(
        """WITH sp AS (SELECT doc_id, source, text, string_split(text, ' ') AS sp
          |  FROM documents),
          |sh AS (SELECT doc_id, CASE WHEN len(sp) < 4 THEN [text]
          |    ELSE list_transform(range(1, len(sp) - 2),
          |      i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) END AS sh
          |  FROM sp),
          |hs AS (SELECT doc_id, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (a, c) -> (a * 131 + c) % 1000000007)) AS hl FROM sh),
          |p AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(hl)+1),
          |      i -> {'pos': i - 1, 'h': hl[i]})) AS u FROM hs)),
          |wn AS (SELECT doc_id, pos, h,
          |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
          |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin FROM p),
          |fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM wn
          |  WHERE pos <= GREATEST(0, n - 4)),
          |ok AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 16),
          |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM fp a JOIN ok USING (fp) JOIN fp b USING (fp)
          |  WHERE a.doc_id < b.doc_id),
          |g0 AS (SELECT doc_id, list_transform(range(1, len(sp) - 2),
          |    i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) AS gs
          |  FROM sp WHERE len(sp) >= 7),
          |grams AS (SELECT doc_id, u.p AS p, u.g AS g FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(gs)+1),
          |      i -> {'p': i - 1, 'g': gs[i]})) AS u FROM g0)),
          |pts AS (SELECT pr.a_id, pr.b_id, ga.p AS pa, gb.p AS pb
          |  FROM pairs pr
          |  JOIN grams ga ON ga.doc_id = pr.a_id
          |  JOIN grams gb ON gb.doc_id = pr.b_id AND gb.g = ga.g),
          |seg AS (SELECT a_id, b_id, pb - pa AS diag, pa, pb,
          |    CASE WHEN pa - LAG(pa) OVER (PARTITION BY a_id, b_id, pb - pa
          |      ORDER BY pa) = 1 THEN 0 ELSE 1 END AS brk FROM pts),
          |seg2 AS (SELECT a_id, b_id, diag, pa, pb,
          |    SUM(brk) OVER (PARTITION BY a_id, b_id, diag ORDER BY pa
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM seg),
          |runs AS (SELECT a_id, b_id, MIN(pa) AS a_start, MIN(pb) AS b_start,
          |    COUNT(*) + 3 AS run_tokens
          |  FROM seg2 GROUP BY a_id, b_id, diag, seg
          |  HAVING COUNT(*) + 3 >= 7),
          |cov AS (SELECT DISTINCT doc_id, pos FROM (
          |    SELECT b_id AS doc_id,
          |      unnest(range(b_start, b_start + run_tokens)) AS pos FROM runs)),
          |cc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
          |  FROM cov GROUP BY doc_id),
          |tk AS (SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents)
          |SELECT tk.doc_id AS doc_id, n_tok,
          |  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_tokens,
          |  CAST(n_tok - COALESCE(n_dup, 0) AS BIGINT) AS n_keep,
          |  """.stripMargin +
        graft.ext.ExactMath.ratioRoundedSql(
          "n_tok - COALESCE(n_dup, 0)", "n_tok", 6) +
        """ AS keep_ratio
          |FROM tk LEFT JOIN cc ON tk.doc_id = cc.doc_id
          |ORDER BY doc_id""".stripMargin)),

    QSpec("dedup_span_clean",
      // X59 — EMIT the deduplicated corpus: each doc's text with its
      // covered token positions (the X58 keep-first union) removed and the
      // survivors re-joined — the artifact a span-dedup stage actually
      // ships (Lee et al., arXiv:2107.06499 §4 trains on the deduplicated
      // text, not on attrition counts). Scale shape: covered positions
      // collapse to ONE sorted per-doc array (bounded by doc length), join
      // docs on doc_id — one row per doc, text rides the join exactly once
      // — and the removal is a per-row indexed-filter HOF over the token
      // array: no token-granularity explode, no token-level shuffle, and
      // docs without spans pass through untouched via the left join.
      // Uncovered docs keep their text verbatim (token-join with single
      // spaces is identity on the single-space fixture contract the whole
      // token surface shares — see n_tok in X58). Removal is kept-position
      // SET SUBTRACTION (r14, closing the r13 verdict's minor finding):
      // array_except(all positions, covered) is hash-set linear in doc
      // length, where the previous per-token array_contains re-scanned the
      // covered array per token — O(len·cov) per doc; both inputs are
      // duplicate-free position arrays and array_except preserves
      // left-operand order, so kept tokens (duplicates included — they sit
      // at distinct positions) are byte-identical to the filter form.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val covArr = graft.ext.Winnow.coveredPositions(s, dir, docs)
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("pos"))).as("cps"))
        docs.join(covArr, Seq("doc_id"), "left")
          .select(col("doc_id"), split(col("text"), " ").as("toks"),
            coalesce(col("cps"), array().cast("array<long>")).as("cps"))
          .select(col("doc_id"), col("toks"),
            array_except(
              sequence(lit(0L), size(col("toks")).cast("long") - 1L),
              col("cps")).as("keep_pos"))
          .select(col("doc_id"),
            transform(col("keep_pos"),
              p => element_at(col("toks"), (p + 1L).cast("int"))).as("kept"))
          .select(col("doc_id"),
            size(col("kept")).cast("long").as("n_keep"),
            array_join(col("kept"), " ").as("clean_text"))
          .orderBy("doc_id")
      },
      Some(
        """WITH sp AS (SELECT doc_id, source, text, string_split(text, ' ') AS sp
          |  FROM documents),
          |sh AS (SELECT doc_id, CASE WHEN len(sp) < 4 THEN [text]
          |    ELSE list_transform(range(1, len(sp) - 2),
          |      i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) END AS sh
          |  FROM sp),
          |hs AS (SELECT doc_id, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (a, c) -> (a * 131 + c) % 1000000007)) AS hl FROM sh),
          |p AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(hl)+1),
          |      i -> {'pos': i - 1, 'h': hl[i]})) AS u FROM hs)),
          |wn AS (SELECT doc_id, pos, h,
          |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
          |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin FROM p),
          |fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM wn
          |  WHERE pos <= GREATEST(0, n - 4)),
          |ok AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 16),
          |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM fp a JOIN ok USING (fp) JOIN fp b USING (fp)
          |  WHERE a.doc_id < b.doc_id),
          |g0 AS (SELECT doc_id, list_transform(range(1, len(sp) - 2),
          |    i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]) AS gs
          |  FROM sp WHERE len(sp) >= 7),
          |grams AS (SELECT doc_id, u.p AS p, u.g AS g FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(gs)+1),
          |      i -> {'p': i - 1, 'g': gs[i]})) AS u FROM g0)),
          |pts AS (SELECT pr.a_id, pr.b_id, ga.p AS pa, gb.p AS pb
          |  FROM pairs pr
          |  JOIN grams ga ON ga.doc_id = pr.a_id
          |  JOIN grams gb ON gb.doc_id = pr.b_id AND gb.g = ga.g),
          |seg AS (SELECT a_id, b_id, pb - pa AS diag, pa, pb,
          |    CASE WHEN pa - LAG(pa) OVER (PARTITION BY a_id, b_id, pb - pa
          |      ORDER BY pa) = 1 THEN 0 ELSE 1 END AS brk FROM pts),
          |seg2 AS (SELECT a_id, b_id, diag, pa, pb,
          |    SUM(brk) OVER (PARTITION BY a_id, b_id, diag ORDER BY pa
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM seg),
          |runs AS (SELECT a_id, b_id, MIN(pa) AS a_start, MIN(pb) AS b_start,
          |    COUNT(*) + 3 AS run_tokens
          |  FROM seg2 GROUP BY a_id, b_id, diag, seg
          |  HAVING COUNT(*) + 3 >= 7),
          |cov AS (SELECT DISTINCT doc_id, pos FROM (
          |    SELECT b_id AS doc_id,
          |      unnest(range(b_start, b_start + run_tokens)) AS pos FROM runs)),
          |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
          |    SELECT doc_id, unnest(list_transform(range(1, len(sp)+1),
          |      i -> {'pos': i - 1, 'tok': sp[i]})) AS u FROM sp)),
          |keep AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
          |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
          |  WHERE c.doc_id IS NULL),
          |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_keep,
          |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
          |  FROM keep GROUP BY doc_id)
          |SELECT d.doc_id AS doc_id,
          |  CAST(COALESCE(a.n_keep, 0) AS BIGINT) AS n_keep,
          |  COALESCE(a.clean_text, '') AS clean_text
          |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
          |ORDER BY doc_id""".stripMargin)),

    QSpec("pretokenize_bpe_regex",
      // BPE-ish pretokenization counts (X56): the GPT-2 pretokenizer shape —
      // contractions, space-glued letter runs, digit runs, punctuation
      // runs, residual space runs — against the whitespace count the rest
      // of the surface uses, with the pretokens-per-ws-token fertility as
      // the budget dial (a BPE vocab is trained over pretokens, so token
      // budgets planned on whitespace counts are off by exactly this
      // ratio). The pattern is deliberately ASCII-EXPLICIT and
      // lookahead-free: Trino/Java, RE2 (DuckDB) and python re all run
      // leftmost-first greedy alternation identically over explicit
      // classes, where \p{L}/\s property classes and GPT-2's \s+(?!\S)
      // lookahead diverge (RE2 has no lookahead at all — the r10 \s
      // lesson). One behavioral consequence, documented: a space run
      // before a word glues to the word only when it is a SINGLE space
      // (the lookahead-free simplification); longer runs stay standalone.
      // Non-ASCII runs land in the residual class as one pretoken per run
      // — count-identical across engines even where Java iterates UTF-16
      // units, because no ASCII class member is a surrogate.
      //
      // Plan: ONE scan, TWO grouped shuffles — an EXPLICIT two-level
      // aggregation: first keyed (source, pretoken), vocabulary-bounded
      // with map-side combine (this grouping IS the distinct; a flat
      // countDistinct-beside-sums would plan the same two exchanges but
      // shuffle the full exploded stream), then the O(vocab) source
      // rollup. Per-doc scalars (ws count, doc marker) ride position 0
      // through both levels as partial sums. posexplode_OUTER, not
      // posexplode: the outer form keeps zero-pretoken docs (an empty
      // text would otherwise vanish in Spark/DuckDB while the python
      // audit still counts it) AND avoids the implicit size()>0 filter
      // the non-outer generator plans, which re-evaluates the full-text
      // regex 2-3× per row across the Filter/Project boundary. Text never
      // survives past the extract.
      (s, dir) => {
        val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
        val isDocRow = col("pos").isNull || col("pos") === 0
        t(s, dir, "documents")
          .select(col("source"),
            regexp_extract_all(col("text"), lit(pat), lit(0)).as("pt"),
            size(split(col("text"), " ")).cast("long").as("ws"))
          .select(col("source"), col("ws"),
            posexplode_outer(col("pt")).as(Seq("pos", "p")))
          .groupBy("source", "p")
          .agg(count(col("p")).as("cnt"),
            sum(when(isDocRow, 1L).otherwise(0L)).as("nd"),
            sum(when(isDocRow, col("ws")).otherwise(0L)).as("wsum"))
          .groupBy("source")
          .agg(sum("nd").as("n_docs"),
            sum("cnt").as("pretokens"),
            count(col("p")).as("distinct_pretokens"),
            sum("wsum").as("ws_tokens"))
          .select(col("source"), col("n_docs"), col("pretokens"),
            col("distinct_pretokens"), col("ws_tokens"),
            graft.ext.ExactMath.ratioRounded(
              col("pretokens"), col("ws_tokens"), 6).as("fertility"))
          .orderBy("source")
      },
      Some {
        val pat = "''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
        s"""WITH b AS (SELECT source,
           |    regexp_extract_all(text, '$pat') AS pt,
           |    len(string_split(text, ' ')) AS ws FROM documents),
           |x AS (SELECT source, ws, u.pos AS pos, u.p AS p FROM (
           |    SELECT source, ws, unnest(CASE WHEN len(pt) = 0
           |      THEN [{'pos': CAST(NULL AS BIGINT), 'p': CAST(NULL AS VARCHAR)}]
           |      ELSE list_transform(range(1, len(pt)+1),
           |        i -> {'pos': i - 1, 'p': pt[i]}) END) AS u FROM b)),
           |g1 AS (SELECT source, p, COUNT(p) AS cnt,
           |    SUM(CASE WHEN pos = 0 OR pos IS NULL THEN 1 ELSE 0 END) AS nd,
           |    SUM(CASE WHEN pos = 0 OR pos IS NULL THEN ws ELSE 0 END) AS wsum
           |  FROM x GROUP BY source, p),
           |g AS (SELECT source,
           |    SUM(nd) AS n_docs,
           |    SUM(cnt) AS pretokens,
           |    COUNT(p) AS distinct_pretokens,
           |    SUM(wsum) AS ws_tokens
           |  FROM g1 GROUP BY source)
           |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(pretokens AS BIGINT) AS pretokens,
           |  CAST(distinct_pretokens AS BIGINT) AS distinct_pretokens,
           |  CAST(ws_tokens AS BIGINT) AS ws_tokens,
           |  ${graft.ext.ExactMath.ratioRoundedSql("pretokens", "ws_tokens", 6)} AS fertility
           |FROM g ORDER BY source""".stripMargin
      }))
}
