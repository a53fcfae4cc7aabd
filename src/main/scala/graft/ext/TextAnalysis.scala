package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X6 + north-star text operators: tokenization, quality scoring, language
  * ID, fingerprinting. All per-row higher-order expressions — no UDFs, fully
  * codegen'd, linear scans (the 100 TB posture: these run in the same stage
  * as the parquet scan, no shuffle).
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: whitespace tokens plus an extra unit per 4 chars
    * of token beyond the first 4 (deterministic stand-in for a real BPE
    * vocabulary, which isn't available offline). */
  def bpeishTokenCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + lit(1) + floor(greatest(length(t) - 1, lit(0)) / 4).cast("int"))

  /** Quality composite ∈ [0,1]: 0.4·min(n_tokens/100,1) +
    * 0.3·stopword_ratio + 0.3·min(avg_token_len/10,1). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val stop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double")
    val avgLen = aggregate(toks, lit(0.0), (acc, t) => acc + length(t).cast("double")) / n
    round(least(n / 100.0, lit(1.0)) * 0.4 +
      (stop / n) * 0.3 +
      least(avgLen / 10.0, lit(1.0)) * 0.3, 6)
  }

  /** Marker-word language ID: per language, count tokens in its marker set;
    * predict the argmax (ties → lexicographically first language). A real
    * system uses char-n-gram profiles; the *shape* (per-language score +
    * argmax, one pass) is identical. */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("的", "是", "了"))

  def langScores(text: Column, markers: Seq[(String, Seq[String])] = defaultMarkers): Seq[(String, Column)] = {
    val toks = tokens(text)
    markers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit): _*)))
    }
  }

  def langId(text: Column, markers: Seq[(String, Seq[String])] = defaultMarkers): Column = {
    val scores = langScores(text, markers)
    // argmax with deterministic tie-break: first language (sorted order)
    // with a strictly greater score than all that come before it.
    scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, s)) =>
        (greatest(bestScore, s), when(s > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Positional polynomial fingerprint: Σ_i (len(tok_i) · i) mod 1000003 —
    * deterministic, SQL-expressible on any engine (rolling-hash shape
    * without engine-specific hash functions). */
  def polyFingerprint(text: Column): Column = {
    val toks = tokens(text)
    aggregate(zip_with(toks, sequence(lit(1), size(toks)),
      (t, i) => (length(t).cast("long") * i.cast("long")) % 1000003L),
      lit(0L), (acc, x) => (acc + x) % 1000003L)
  }

  /** xxhash64 content fingerprint (engine-native fast path; not
    * cross-engine reproducible — property-tested, not oracle-checked). */
  def hashFingerprint(text: Column): Column = xxhash64(text)
}
