package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X60: byte-pair-encoding MERGE TRAINING over the corpus's pretoken
  * counts — the missing half of X56 (`pretokenize_bpe_regex` measures
  * fertility against a vocabulary the engine never built; this builds it).
  * Classic BPE (Sennrich et al. 2016, arXiv:1508.07909 — the GPT-2
  * training shape): start from pretokens as character-symbol sequences
  * weighted by pretoken frequency, repeatedly merge the highest-count
  * adjacent symbol pair (ties broken lexicographically on (left, right)),
  * emitting one merge-table row per round.
  *
  * Scale design — the reason BPE training fits a 100 TB engine at all:
  * after ONE corpus scan collapses the corpus to (pretoken, count), every
  * round works on the VOCABULARY-sized frame (the thing HF/GPT-2 trainers
  * exploit single-node; here it stays a distributed frame, so a 100M-row
  * web vocabulary never lands on the driver). Per round: one pair-count
  * aggregation (map-side combine — the pair stream collapses per mapper
  * before the O(pairs-vocab) exchange), one single-row argmax collect (the
  * merge decision is driver state by definition, like [[SimSearch]]'s
  * k-means centroids), one per-row merge application, and one O(1)-row
  * total. The vocab lineage is checkpoint-truncated every round
  * ([[Dedup.truncate]]) — the memoize-without-truncate lesson: a 10-round
  * chain would otherwise re-analyze a 10-deep plan per consumer.
  *
  * Numeric/cross-engine discipline: symbols are restricted to PRINTABLE
  * ASCII pretokens (`^[ -~]+$`, the X50 range rule) so character
  * splitting, lexicographic tie-breaks (UTF-8 binary = code-point = byte
  * order) and the merge-application replace are engine-identical; all
  * surfaced numbers are exact integer counts. Symbol sequences travel as a
  * single U+001F-delimited string (`␟sym␟␟sym␟` — the separator is
  * outside printable ASCII so it can never collide with symbol bytes, and
  * wrapping EVERY symbol in separators makes the pair pattern
  * `␟l␟␟r␟` full-symbol-anchored), and greedy left-to-right
  * non-overlapping merge application is exactly the semantics of
  * `replace` in Spark, DuckDB, and python alike — the oracle replays the
  * whole loop as chained CTEs on the same representation.
  */
object Bpe {

  /** The X56 GPT-2-shape pretokenizer (see Queries13's
    * `pretokenize_bpe_regex` for the ASCII-explicit / lookahead-free
    * rationale) — merge training runs over the same pretoken stream the
    * fertility key counts. */
  val pretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Unit separator: the one byte guaranteed outside every symbol. */
  private val SEP = "\u001F"
  private val SEP2 = SEP + SEP

  /** Strip the outer separators and split a symbol string back to its
    * symbol array (split's pattern is a regex, but U+001F carries no
    * metacharacters). */
  private def symbols(s: org.apache.spark.sql.Column) =
    split(s.substr(lit(2), length(s) - 2), SEP2)

  /** (pretoken, count) → wrapped single-character symbol string. */
  private def wrap(p: org.apache.spark.sql.Column) =
    concat(lit(SEP),
      array_join(regexp_extract_all(p, lit("."), lit(0)), SEP2), lit(SEP))

  /** (merge table, final (p, n_syms) vocabulary) memo — the training loop
    * is a deterministic driver-side fold over vocab-sized jobs, so the
    * train key and the encode key (X63) share ONE run per (session,
    * fixture, nMerges) instead of each paying the full loop (the
    * [[SimSearch]] centroidMemo discipline). Stopped-session entries are
    * swept on access like [[DfMemo]]'s. */
  private val trainMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), (DataFrame, DataFrame)]()

  /** Drop this session's training memos (the [[DfMemo.clear]] sibling). */
  def clear(spark: SparkSession): Unit = {
    val it = trainMemo.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1 eq spark) it.remove()
  }

  private def trained(spark: SparkSession, docs: DataFrame, nMerges: Int,
      cacheKey: Option[String]): (DataFrame, DataFrame) = {
    val it = trainMemo.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    def compute: (DataFrame, DataFrame) = trainLoop(spark, docs, nMerges)
    cacheKey match {
      case Some(k) =>
        val key = (spark, k, nMerges)
        val existing = trainMemo.get(key)
        if (existing != null) existing
        else {
          // unlike DfMemo's lazy persist, the loop RUNS here (driver fold) —
          // a concurrent duplicate build wastes work but stays correct, and
          // the putIfAbsent loser adopts the winner's frames
          val built = compute
          val prev = trainMemo.putIfAbsent(key, built)
          if (prev != null) prev else built
        }
      case None => compute
    }
  }

  private def trainLoop(spark: SparkSession, docs: DataFrame, nMerges: Int)
      : (DataFrame, DataFrame) = {
    var vocab = Dedup.truncate(
      docs.select(explode(
          regexp_extract_all(col("text"), lit(pretokenPattern), lit(0))).as("p"))
        .where(col("p").rlike("^[ -~]+$"))
        .groupBy("p").agg(count(lit(1)).as("cnt"))
        .select(col("p"), wrap(col("p")).as("s"), col("cnt")))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Long)]()
    (1 to nMerges).foreach { rank =>
      val top = vocab
        .select(col("cnt"), symbols(col("s")).as("tk"))
        .where(size(col("tk")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(tk) - 1), " +
            "j -> struct(element_at(tk, j) AS l, element_at(tk, j + 1) AS r))"))
          .as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("cnt").as("pcnt"))
        .orderBy(desc("pcnt"), asc("l"), asc("r"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE merge round $rank: no adjacent pairs left — corpus fully merged " +
          s"before nMerges=$nMerges (lower nMerges for this corpus)")
      val (l, r, pcnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      vocab = Dedup.truncate(vocab.select(col("p"),
        replace(col("s"), lit(SEP + l + SEP2 + r + SEP), lit(SEP + l + r + SEP)).as("s"),
        col("cnt")))
      val total = vocab
        .select(sum(col("cnt") * size(symbols(col("s")))).as("t"))
        .collect()(0).getLong(0)
      merges += ((rank, l, r, pcnt, total))
    }
    import spark.implicits._
    val table = merges.toSeq
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count", "corpus_symbols")
    (table, vocab.select(col("p"), size(symbols(col("s"))).as("n_syms")))
  }

  /** Train `nMerges` BPE merges over `docs.text`; returns the merge table
    * (merge_rank, left_sym, right_sym, pair_count, corpus_symbols) where
    * corpus_symbols is the frequency-weighted total symbol count AFTER
    * applying that round's merge — the compression trajectory a tokenizer
    * team actually reads off a training run. */
  def trainMerges(spark: SparkSession, docs: DataFrame, nMerges: Int,
      cacheKey: Option[String] = None): DataFrame =
    trained(spark, docs, nMerges, cacheKey)._1

  /** X63 — APPLY the trained vocabulary: per-source whitespace tokens,
    * ASCII pretokens, and the token count the `nMerges`-merge vocab
    * actually encodes the source to, with encoded-per-ws-token as the
    * post-training budget dial (X56's fertility measured the PRE-merge
    * stream; this is the number a trained tokenizer produces). Scale
    * shape: the per-source pretoken counts join the vocabulary-sized
    * (p, n_syms) frame — the encode step never touches symbol strings,
    * only multiplies counts; one grouped rollup per side, one
    * vocab-keyed join. Sources whose every pretoken is non-ASCII (outside
    * the trained range) encode to zero, kept by the left join. */
  def encodeFertility(spark: SparkSession, docs: DataFrame, nMerges: Int,
      cacheKey: Option[String] = None): DataFrame = {
    val vocabSyms = trained(spark, docs, nMerges, cacheKey)._2
    val perSource = docs
      .select(col("source"), explode(
        regexp_extract_all(col("text"), lit(pretokenPattern), lit(0))).as("p"))
      .where(col("p").rlike("^[ -~]+$"))
      .groupBy("source", "p").agg(count(lit(1)).as("cnt"))
      .join(vocabSyms, "p")
      .groupBy("source")
      .agg(sum("cnt").as("ascii_pretokens"),
        sum(col("cnt") * col("n_syms")).as("encoded_tokens"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"))
      .join(perSource, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("ws_tokens"),
        coalesce(col("ascii_pretokens"), lit(0L)).as("ascii_pretokens"),
        coalesce(col("encoded_tokens"), lit(0L)).as("encoded_tokens"),
        ExactMath.ratioRounded(
          coalesce(col("encoded_tokens"), lit(0L)), col("ws_tokens"), 6)
          .as("encoded_per_ws"))
      .orderBy("source")
  }

  /** The DuckDB oracle: the WHOLE training loop replayed as `nMerges`
    * chained CTE blocks over the identical U+001F representation (the
    * doc_quality_logreg replayed-chained-CTE discipline) — an independent
    * second implementation, not a dump of the engine's answer. */
  /** The chained training CTEs shared by both oracles: `pre` → `v0` …
    * `v$nMerges` (each carrying the pretoken `p`, its U+001F symbol string
    * `s`, and `cnt`), plus per-round `p$i`/`m$i`/`t$i`. */
  private def trainCtes(nMerges: Int): String = {
    // '' doubles the quotes for SQL embedding of the pretoken pattern
    val pat = pretokenPattern.replace("'", "''")
    val sep = "chr(31)"
    val sep2 = s"$sep || $sep"
    val header =
      s"""WITH pre AS (SELECT u.p AS p FROM (
         |    SELECT unnest(regexp_extract_all(text, '$pat')) AS p FROM documents) u
         |  WHERE regexp_matches(u.p, '^[ -~]+$$')),
         |v0 AS (SELECT p, $sep || array_to_string(regexp_extract_all(p, '.'), $sep2) || $sep AS s,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM pre GROUP BY p)""".stripMargin
    val rounds = (1 to nMerges).map { i =>
      val prev = s"v${i - 1}"
      s"""p$i AS (SELECT tk[j] AS l, tk[j + 1] AS r, SUM(cnt) AS pcnt FROM (
         |    SELECT tk, cnt, unnest(range(1, len(tk))) AS j FROM (
         |      SELECT string_split(s[2:length(s) - 1], $sep2) AS tk, cnt FROM $prev))
         |  GROUP BY 1, 2),
         |m$i AS (SELECT l, r, pcnt FROM p$i ORDER BY pcnt DESC, l, r LIMIT 1),
         |v$i AS (SELECT p, replace(s, $sep || l || $sep2 || r || $sep,
         |    $sep || l || r || $sep) AS s, cnt FROM $prev, m$i),
         |t$i AS (SELECT SUM(cnt * len(string_split(s[2:length(s) - 1], $sep2))) AS total FROM v$i)""".stripMargin
    }.mkString(",\n")
    s"$header,\n$rounds"
  }

  /** The DuckDB oracle: the WHOLE training loop replayed as `nMerges`
    * chained CTE blocks over the identical U+001F representation (the
    * doc_quality_logreg replayed-chained-CTE discipline) — an independent
    * second implementation, not a dump of the engine's answer. */
  def trainMergesOracleSql(nMerges: Int): String = {
    val rows = (1 to nMerges).map { i =>
      s"SELECT CAST($i AS INT) AS merge_rank, l AS left_sym, r AS right_sym, " +
        s"CAST(pcnt AS BIGINT) AS pair_count, " +
        s"CAST((SELECT total FROM t$i) AS BIGINT) AS corpus_symbols FROM m$i"
    }.mkString("\nUNION ALL\n")
    s"${trainCtes(nMerges)}\n$rows\nUNION ALL\n${oracleGuardArm(nMerges,
      "CAST(NULL AS INT), error('BPE oracle: corpus fully merged before " +
        s"nMerges=$nMerges — the engine aborts loudly here; the oracle must " +
        "not return a truncated merge table'), CAST(NULL AS VARCHAR), " +
        "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)")}\nORDER BY merge_rank"
  }

  /** Failure-parity guard (r14 advice item 4): the engine's trainLoop
    * THROWS when the corpus fully merges before `nMerges`, but an empty
    * p$i would silently empty every later CTE in the oracle's chain and
    * return a truncated merge table. This zero-row-when-healthy UNION arm
    * fires DuckDB's error() exactly when the LAST round's argmax CTE is
    * empty (any earlier round emptying cascades into it), so an
    * oracle-only run fails loudly like the engine instead of diverging.
    * error() is evaluated per-row at runtime — with the WHERE false it
    * emits nothing and is never constant-folded (verified against the
    * driver's DuckDB). */
  private def oracleGuardArm(nMerges: Int, nullRow: String): String =
    s"SELECT $nullRow WHERE (SELECT COUNT(*) FROM m$nMerges) = 0"

  /** X63's oracle: the same training chain, then the per-source encode
    * rollup against the final vocabulary `v$nMerges`. */
  def encodeFertilityOracleSql(nMerges: Int): String = {
    val pat = pretokenPattern.replace("'", "''")
    val sep = "chr(31)"
    val sep2 = s"$sep || $sep"
    s"""${trainCtes(nMerges)},
       |vs AS (SELECT p, len(string_split(s[2:length(s) - 1], $sep2)) AS n_syms FROM v$nMerges),
       |pre2 AS (SELECT source, u.p AS p FROM (
       |    SELECT source, unnest(regexp_extract_all(text, '$pat')) AS p FROM documents) u
       |  WHERE regexp_matches(u.p, '^[ -~]+$$')),
       |sc AS (SELECT source, p, CAST(COUNT(*) AS BIGINT) AS cnt FROM pre2 GROUP BY 1, 2),
       |enc AS (SELECT source, SUM(cnt) AS ascii_pretokens,
       |    SUM(cnt * n_syms) AS encoded_tokens FROM sc JOIN vs USING (p) GROUP BY source),
       |ws AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens
       |  FROM documents GROUP BY source)
       |SELECT ws.source AS source, n_docs, ws_tokens,
       |  CAST(COALESCE(ascii_pretokens, 0) AS BIGINT) AS ascii_pretokens,
       |  CAST(COALESCE(encoded_tokens, 0) AS BIGINT) AS encoded_tokens,
       |  ${ExactMath.ratioRoundedSql("COALESCE(encoded_tokens, 0)", "ws_tokens", 6)} AS encoded_per_ws
       |FROM ws LEFT JOIN enc ON ws.source = enc.source
       |UNION ALL
       |${oracleGuardArm(nMerges,
          "error('BPE oracle: corpus fully merged before nMerges=" + nMerges +
            " — refusing to encode against a truncated vocabulary'), " +
            "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), " +
            "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)")}
       |ORDER BY source""".stripMargin
  }
}
