package graft

import org.scalatest.funsuite.AnyFunSuite

/** The standing per-key scaling gate (r13): logic pinned on injected data —
  * including the injected-quadratic case the r12 verdict asked the gate to
  * catch — and asserted over the REAL per-key artifacts whenever a bench
  * round has produced both files. */
class ScaleGateSpec extends AnyFunSuite {

  test("an injected quadratic fails the gate; linear keys pass") {
    // linear key: x6 at 10x rows; quadratic key: x60 (the measured r12
    // simjoin_ann shape) — only the quadratic violates
    val sf01 = Map("lin" -> 0.4, "quad" -> 0.4)
    val sf1 = Map("lin" -> 2.4, "quad" -> 24.0)
    val vs = ScaleGate.violations(sf01, sf1)
    assert(vs.map(_.key) == Seq("quad"), vs.mkString(", "))
    assert(vs.head.allowed.isEmpty, "an unallowlisted quadratic must FAIL")
  }

  test("allowlisted keys surface as allowed, not as failures") {
    val sf01 = Map("dedup_minhash" -> 0.3)
    val sf1 = Map("dedup_minhash" -> 11.0)
    val vs = ScaleGate.violations(sf01, sf1)
    assert(vs.size == 1 && vs.head.allowed.isDefined)
    assert(vs.head.allowed.get.contains("output-quadratic"),
      "the allow entry must carry a boundedness class")
  }

  test("sub-second sf1 keys and floored denominators never violate") {
    // 0.01 -> 0.5 is x50 by raw division but below minSf1Sec: ignored;
    // 0.01 -> 1.0 floors the denominator to 0.05 => x20 > 15: violates
    val vs0 = ScaleGate.violations(Map("k" -> 0.01), Map("k" -> 0.5))
    assert(vs0.isEmpty, vs0.mkString(", "))
    val vs1 = ScaleGate.violations(Map("k" -> 0.01), Map("k" -> 1.0))
    assert(vs1.map(_.key) == Seq("k"))
    assert(vs1.head.ratio == 20.0)
  }

  test("an allowlist entry for a key in neither map is stale") {
    val live = ScaleGate.allow.keys.head
    val maps = (Map(live -> 0.1), Map(live -> 0.2))
    assert(ScaleGate.staleAllowEntries(maps._1, maps._2)
      == ScaleGate.allow.keys.toSeq.sorted.filterNot(_ == live))
    // with every allow key present, nothing is stale
    val all = ScaleGate.allow.keys.map(_ -> 0.1).toMap
    assert(ScaleGate.staleAllowEntries(all, all).isEmpty)
  }

  test("bench per_query line parses to the full key map") {
    val line = """{"metric":"per_query","total_sec":1.234,"unit":"sec","sf":"sf0.1","runs":2,"queries":{"q1_agg":0.12,"dedup_minhash":0.3}}"""
    assert(ScaleGate.parseQueries(line)
      == Map("q1_agg" -> 0.12, "dedup_minhash" -> 0.3))
  }

  test("REAL artifacts: no unallowed ratio over the threshold, no stale allow entries") {
    val f01 = new java.io.File("bench_perkey_sf0.1.json")
    val f1 = new java.io.File("bench_perkey_sf1.json")
    // the files are round-bench products (gitignored); the gate runs
    // whenever the round protocol has produced both, and is additionally
    // enforced by bench_round.sh via the ScaleGate main
    assume(f01.isFile && f1.isFile,
      "per-key bench artifacts not present — run scripts/bench_round.sh")
    def read(f: java.io.File) = ScaleGate.parseQueries(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val (m01, m1) = (read(f01), read(f1))
    assert(m01.size > 100 && m1.size > 100, s"${m01.size}/${m1.size} keys")
    val bad = ScaleGate.violations(m01, m1).filter(_.allowed.isEmpty)
    assert(bad.isEmpty, "quadratic-plan suspects (fix the plan or allowlist " +
      s"with a boundedness class): ${bad.mkString("; ")}")
    val stale = ScaleGate.staleAllowEntries(m01, m1)
    assert(stale.isEmpty, s"stale scale-gate allow entries: $stale")
  }
}
