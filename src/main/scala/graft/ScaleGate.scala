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
  * bytes), AND a per-entry `maxRatio` cap (r14, the r13 verdict's blind-
  * spot fix: an uncapped entry meant the gate never looked at the key
  * again, so an allowlisted key could go super-linear silently — exactly
  * the failure mode the gate exists to stop). An allowlisted key over its
  * own cap FAILS. An entry whose key no longer exists fails the gate as
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

  /** An allowlist entry: the boundedness CLASS says why the growth is
    * bounded by something intrinsic (output size, payload bytes), and
    * `maxRatio` is the entry's own ceiling — the measured intrinsic ratio
    * plus host-noise headroom, NOT threshold-sized. Over it, the entry
    * stops covering the key and the gate fails. */
  final case class Allow(maxRatio: Double, boundedClass: String)

  /** key → cap + boundedness class. Keep entries SPECIFIC, caps TIGHT:
    * the cap must sit just above the measured intrinsic ratio (isolated
    * quiet-host pairing — see MULTIMODAL_ISOLATED_r14.json for the decode
    * keys' stamped evidence), so a regression on an allowlisted key still
    * trips the gate. */
  val allow: Map[String, Allow] = Map(
    // the four dedup output-quadratic entries were REMOVED mid-r14: the
    // distinct-shingle-set pre-collapse (Dedup.groupedSignatures — the
    // dedup_simhash discipline) makes clone-clique work saturate in the
    // DISTINCT set count, so dedup_minhash measures x1.1 and
    // dedup_cluster_lsh x1.7 at 10x rows (quiet-host SPARK_GRAFT_ONLY
    // pairing, ROUND14.md) — far under the x15 gate; if a future fixture
    // pushes them back over, the gate should FAIL and force a fresh look,
    // not silently cover them.
    "multimodal_features" -> Allow(12.0, "decode-cost ∝ payload bytes: "
      + "per-partition decode of 10x the binary payload; plan shape is one "
      + "scan + mapPartitions, no pair work. Isolated quiet-host evidence "
      + "stamped in MULTIMODAL_ISOLATED_r14.json: x9.8-x10.7 (fixed "
      + "overhead amortizes out at sf1, so ~linear reads just over x10; "
      + "ROUND13.md's x5 claim did NOT reproduce)"),
    "multimodal_resize" -> Allow(12.0, "decode-cost ∝ payload bytes: same "
      + "decode bound as multimodal_features (isolated quiet-host "
      + "evidence x10.7 in MULTIMODAL_ISOLATED_r14.json)"))

  final case class Violation(key: String, sf01: Double, sf1: Double,
      ratio: Double, allowed: Option[String]) {
    override def toString: String =
      f"$key: ${sf01}%.2f s -> ${sf1}%.2f s = x$ratio%.1f" +
        allowed.map(c => s" [allowed: $c]").getOrElse("")
  }

  /** Epoch stamp of a per-key bench artifact: the tree (git SHA, -dirty
    * suffixed when the working tree differed from HEAD) and core count
    * that produced it. graft.Bench writes both into every line (r15). */
  final case class Stamp(gitSha: String, cpus: String)

  /** The stamp, if the artifact carries one (pre-r15 artifacts do not). */
  def parseStamp(json: String): Option[Stamp] = {
    val sha = """"git_sha":"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
    val cp = """"cpus":"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
    for (s <- sha; c <- cp) yield Stamp(s, c)
  }

  /** The distinct stale/mixed-pairing diagnosis (r14 verdict #1): HEAD
    * shipped with the standing gate RED because a pre-sweep sf1 per-key
    * map was paired against a post-sweep sf0.1 map — the gate computed
    * fake ×22+ ratios from a cross-epoch pairing instead of refusing it.
    * Returns the refusal message when the two artifacts were produced by
    * different trees, at different core counts, or lack stamps entirely;
    * None when the pairing is gateable. */
  def pairingError(json01: String, json1: String): Option[String] =
    (parseStamp(json01), parseStamp(json1)) match {
      case (Some(a), Some(b)) if a.gitSha != b.gitSha =>
        Some(s"STALE PAIRING: sf0.1 map from tree ${a.gitSha}, sf1 map from " +
          s"tree ${b.gitSha} — per-key ratios across different trees are " +
          "meaningless; re-run bench_round.sh on the current tree")
      case (Some(a), Some(b)) if a.cpus != b.cpus =>
        Some(s"MIXED CONFIG: sf0.1 map at cpus=${a.cpus}, sf1 map at " +
          s"cpus=${b.cpus} — split packing and task overhead shift with core " +
          "count, so cross-config ratios are not comparable")
      case (a, b) if a.isEmpty || b.isEmpty =>
        Some(s"UNSTAMPED artifact (sf0.1 stamped: ${a.isDefined}, sf1 " +
          s"stamped: ${b.isDefined}) — regenerate both per-key maps with the " +
          "stamping graft.Bench (r15+) so epoch mixing is detectable")
      case _ => None
    }

  /** Parse the `"queries":{...}` map out of a graft.Bench per_query JSON
    * line (flat string→number object; keys are [A-Za-z0-9_]). Regex-based
    * on purpose — no JSON dependency exists in this build. Fails LOUDLY on
    * format drift (r13 advice): every ':' separator inside the braces body
    * must become exactly one parsed entry, so a value serialized in
    * scientific notation, a negative number, or any shape this regex does
    * not recognize aborts the gate instead of silently shrinking the map
    * (a dropped key is an unwatched key). */
  def parseQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    require(start >= 0, "no \"queries\" object in bench line")
    val body = json.substring(start + "\"queries\":{".length,
      json.indexOf('}', start))
    val entry = """"([A-Za-z0-9_]+)":([0-9.]+)""".r
    val parsed = entry.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    // the body must be EXACTLY comma-joined matches: stripping every match
    // must leave only commas. This catches both dropped entries (negative
    // values, renamed keys) and PARTIALLY-matched ones (1.2e-3 matches its
    // "1.2" prefix, so a separator count would still balance) — either way
    // the gate would otherwise run on silently-wrong data.
    val residue = entry.replaceAllIn(body, "")
    require(residue.forall(_ == ','),
      s"bench queries format drift: unparseable fragment '${residue.take(80)}' " +
        "in the queries map — refusing to gate on a silently-shrunk/misread map")
    require(parsed.nonEmpty, "empty queries map — nothing to gate")
    val m = parsed.toMap
    require(m.size == parsed.size,
      s"duplicate keys in bench queries map (${parsed.size} entries, " +
        s"${m.size} distinct)")
    m
  }

  /** Ratio of a key across the two maps, with the denominator floored. */
  def ratio(sf01: Double, sf1: Double): Double =
    sf1 / math.max(sf01, baseFloorSec)

  /** All keys over [[threshold]] at ≥ [[minSf1Sec]] — PLUS allowlisted
    * keys over their own per-entry cap even when under the global
    * threshold. A violation is "allowed" (non-failing) only when its
    * entry exists AND the ratio is within that entry's maxRatio. */
  def violations(sf01: Map[String, Double],
      sf1: Map[String, Double]): Seq[Violation] =
    sf1.toSeq.sortBy(-_._2).flatMap { case (k, t1) =>
      sf01.get(k).flatMap { t0 =>
        val r = ratio(t0, t1)
        val entry = allow.get(k)
        val overGlobal = r > threshold
        val overCap = entry.exists(e => r > e.maxRatio)
        if (t1 >= minSf1Sec && (overGlobal || overCap))
          Some(Violation(k, t0, t1, r,
            entry.collect { case e if r <= e.maxRatio => e.boundedClass }))
        else None
      }
    }

  /** Keys that appear in exactly ONE of the two maps: a key that errored
    * or vanished at one scale point has no ratio and would otherwise
    * silently escape the gate (r13 advice). ANY one-sided key fails
    * unconditionally — no materiality filter on purpose (r14 advice
    * resolution): both maps are full-surface registration dumps, so a
    * one-sided key means a run LOST it (error, filtered run leaked into
    * an artifact), and a sub-[[minSf1Sec]] timing doesn't make a lost key
    * any less lost. */
  def oneSidedKeys(sf01: Map[String, Double],
      sf1: Map[String, Double]): Seq[String] =
    ((sf01.keySet -- sf1.keySet) ++
      (sf1.keySet -- sf01.keySet)).toSeq.sorted

  /** Allowlist entries naming keys that exist in NEITHER map — a removed
    * or renamed key whose entry would otherwise shadow a future key. */
  def staleAllowEntries(sf01: Map[String, Double],
      sf1: Map[String, Double]): Seq[String] =
    allow.keys.toSeq.sorted.filterNot(k => sf01.contains(k) || sf1.contains(k))

  def main(args: Array[String]): Unit = {
    val Array(f01, f1) = args
    def raw(p: String) =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        "UTF-8")
    val (r01, r1) = (raw(f01), raw(f1))
    // epoch check FIRST: a cross-tree or cross-config pairing must refuse
    // with its own diagnosis, never reach the ratio math (r14 verdict #1)
    pairingError(r01, r1).foreach { msg =>
      println(s"[scale-gate] $msg")
      sys.exit(1)
    }
    val (m01, m1) = (parseQueries(r01), parseQueries(r1))
    val vs = violations(m01, m1)
    val stale = staleAllowEntries(m01, m1)
    val oneSided = oneSidedKeys(m01, m1)
    vs.foreach(v => println(s"[scale-gate] ${if (v.allowed.isDefined) "ALLOW" else "FAIL "} $v"))
    stale.foreach(k => println(s"[scale-gate] STALE allowlist entry: $k"))
    oneSided.foreach(k => println(s"[scale-gate] ONE-SIDED key (present at only one scale point): $k"))
    val bad = vs.filter(_.allowed.isEmpty)
    if (bad.nonEmpty || stale.nonEmpty || oneSided.nonEmpty) {
      println(s"[scale-gate] ${bad.size} unallowed ratio violation(s), " +
        s"${stale.size} stale allow entr(ies), ${oneSided.size} one-sided key(s)")
      sys.exit(1)
    }
    println(s"[scale-gate] ok: ${m1.size} keys, ${vs.size} allowlisted over x$threshold, 0 unallowed")
  }
}
