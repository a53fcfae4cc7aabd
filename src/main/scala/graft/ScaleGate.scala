package graft

/** Standing per-key scaling gate (r13, the window-audit discipline applied
  * to TIME): compare the two per-key bench maps (sf0.1 and the 10×-row sf1
  * stress fixture) and fail any key whose sf1/sf0.1 ratio exceeds
  * [[threshold]] — a key that is ~linear in rows should sit near ×10 and
  * in practice sits at ×3–6 (overhead amortizes); a super-threshold ratio
  * is a quadratic plan announcing itself. The r12 round shipped THREE
  * quadratic plans (simjoin_ann ×60, dedup_simhash ×52, dedup_semantic
  * ×31) under a green total because nothing watched the per-key ratios;
  * this gate is the regression stop for that class.
  *
  * Like the window-partition grep gate (ListenerSpec), the allowlist is
  * NOT a free pass: every entry carries a boundedness class explaining
  * why the growth is intrinsic (output-driven emitters whose RESULT is
  * quadratic in the fixture's clone structure, decode-cost ∝ payload
  * bytes), and an entry whose key no longer exists fails the gate as
  * stale, so the list can only shrink.
  *
  * Run as a main after scripts/bench_round.sh produces both per-key files:
  * `runMain graft.ScaleGate bench_perkey_sf0.1.json bench_perkey_sf1.json`
  * (exit 1 on violations); ScaleGateSpec unit-tests the logic and asserts
  * the real artifacts when both files are present.
  */
object ScaleGate {

  /** Max tolerated sf1/sf0.1 per-key ratio at 10× rows. */
  val threshold: Double = 15.0

  /** Keys spending less than this at sf1 are ignored: a 0.02 s → 0.4 s
    * move is ×20 but pure noise/overhead, not a plan property. */
  val minSf1Sec: Double = 1.0

  /** Denominator floor: below this the sf0.1 time is all fixed overhead
    * and the ratio is unstable. */
  val baseFloorSec: Double = 0.05

  /** key → boundedness class. Keep entries SPECIFIC: the class must say
    * why the growth is bounded by something intrinsic (output size,
    * payload bytes), not why the ratio is acceptable this round. */
  val allow: Map[String, String] = Map(
    "dedup_minhash" -> ("output-quadratic: the sf1 fixture replicates every "
      + "doc 10x, so the TRUE near-dup pair set grows ~100x; the banded "
      + "candidate keyspace scales with the xxhash64 range (cleared in the "
      + "r12 verdict), so candidate work tracks the output, and the output "
      + "itself is the quadratic term"),
    "dedup_cluster_lsh" -> ("output-quadratic: same banded candidate family "
      + "as dedup_minhash (clone cliques emit all-pairs edges before "
      + "star-contraction); candidate keyspace hash-range-scaled"),
    "dedup_ngram_jaccard" -> ("output-quadratic: clone-clique pair emission "
      + "over the same banded candidates (the pair LIST is the output)"),
    "dedup_ngram_containment" -> ("output-quadratic: clone-clique pair "
      + "emission over the same banded candidates"),
    "multimodal_features" -> ("decode-cost ∝ payload bytes: per-partition "
      + "imageio decode of 10x the binary payload; plan shape is one scan + "
      + "mapPartitions, no pair work (profiled r13 — see ROUND13.md)"),
    "multimodal_resize" -> ("decode-cost ∝ payload bytes: same decode "
      + "bound as multimodal_features"))

  final case class Violation(key: String, sf01: Double, sf1: Double,
      ratio: Double, allowed: Option[String]) {
    override def toString: String =
      f"$key: ${sf01}%.2f s -> ${sf1}%.2f s = x$ratio%.1f" +
        allowed.map(c => s" [allowed: $c]").getOrElse("")
  }

  /** Parse the `"queries":{...}` map out of a graft.Bench per_query JSON
    * line (flat string→number object; keys are [A-Za-z0-9_]). Regex-based
    * on purpose — no JSON dependency exists in this build. */
  def parseQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    require(start >= 0, "no \"queries\" object in bench line")
    val body = json.substring(start + "\"queries\":{".length,
      json.indexOf('}', start))
    val entry = """"([A-Za-z0-9_]+)":([0-9.]+)""".r
    entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Ratio of a key across the two maps, with the denominator floored. */
  def ratio(sf01: Double, sf1: Double): Double =
    sf1 / math.max(sf01, baseFloorSec)

  /** All keys over [[threshold]] at ≥ [[minSf1Sec]], allowed or not —
    * callers fail on the non-allowed ones and can report the allowed ones. */
  def violations(sf01: Map[String, Double],
      sf1: Map[String, Double]): Seq[Violation] =
    sf1.toSeq.sortBy(-_._2).flatMap { case (k, t1) =>
      sf01.get(k).flatMap { t0 =>
        val r = ratio(t0, t1)
        if (t1 >= minSf1Sec && r > threshold)
          Some(Violation(k, t0, t1, r, allow.get(k)))
        else None
      }
    }

  /** Allowlist entries naming keys that exist in NEITHER map — a removed
    * or renamed key whose entry would otherwise shadow a future key. */
  def staleAllowEntries(sf01: Map[String, Double],
      sf1: Map[String, Double]): Seq[String] =
    allow.keys.toSeq.sorted.filterNot(k => sf01.contains(k) || sf1.contains(k))

  def main(args: Array[String]): Unit = {
    val Array(f01, f1) = args
    def read(p: String) = parseQueries(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        "UTF-8"))
    val (m01, m1) = (read(f01), read(f1))
    val vs = violations(m01, m1)
    val stale = staleAllowEntries(m01, m1)
    vs.foreach(v => println(s"[scale-gate] ${if (v.allowed.isDefined) "ALLOW" else "FAIL "} $v"))
    stale.foreach(k => println(s"[scale-gate] STALE allowlist entry: $k"))
    val bad = vs.filter(_.allowed.isEmpty)
    if (bad.nonEmpty || stale.nonEmpty) {
      println(s"[scale-gate] ${bad.size} unallowed ratio violation(s), ${stale.size} stale allow entr(ies)")
      sys.exit(1)
    }
    println(s"[scale-gate] ok: ${m1.size} keys, ${vs.size} allowlisted over x$threshold, 0 unallowed")
  }
}
