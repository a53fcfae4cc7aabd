package graft

import java.nio.file.{Files, Paths}

import graft.catalog.IcebergMeta
import org.json4s.JInt

/** S5: native Iceberg table-metadata read + REPLACE PARTITION SPEC commit
  * over a hand-authored, spec-compliant (format-version 2) filesystem
  * table — the `$metadata` probe, the partition-spec point read, and the
  * spec-evolution commit protocol (fresh spec-id/field-ids, version bump,
  * hint swing, create-exclusive concurrency, hint-loss recovery). */
class IcebergMetaSpec extends SparkSpec {

  /** Minimal valid v2 metadata per the public Iceberg Table Spec. */
  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_iceberg").toString + "/tbl"
    Files.createDirectories(Paths.get(dir, "metadata"))
    val v1 =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "9c12c3f4-0000-4000-8000-000000000042",
         |  "location": "$dir",
         |  "last-sequence-number": 0,
         |  "last-updated-ms": 1700000000000,
         |  "last-column-id": 3,
         |  "current-schema-id": 0,
         |  "schemas": [{
         |    "type": "struct", "schema-id": 0, "fields": [
         |      {"id": 1, "name": "o_orderkey", "required": true, "type": "long"},
         |      {"id": 2, "name": "o_orderdate", "required": false, "type": "date"},
         |      {"id": 3, "name": "o_orderstatus", "required": false, "type": "string"}
         |    ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "last-partition-id": 999,
         |  "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "properties": {},
         |  "snapshots": []
         |}""".stripMargin
    Files.write(Paths.get(dir, "metadata", "v1.metadata.json"), v1.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "metadata", "version-hint.text"), "1".getBytes("UTF-8"))
    dir
  }

  test("$metadata probe: Iceberg table detected, plain directory rejected") {
    val tbl = freshTable()
    assert(IcebergMeta.isIcebergTable(spark, tbl))
    val plain = Files.createTempDirectory("graft_not_iceberg").toString
    assert(!IcebergMeta.isIcebergTable(spark, plain))
    assert(!IcebergMeta.isIcebergTable(spark, plain + "/missing"))
  }

  test("partition-spec point read: unpartitioned table renders empty") {
    val tbl = freshTable()
    assert(IcebergMeta.partitionSpecString(spark, tbl) == "")
    val m = IcebergMeta.read(spark, tbl)
    assert(m.version == 1 && m.formatVersion == 2)
    assert(m.schemaIds == Map("o_orderkey" -> 1, "o_orderdate" -> 2, "o_orderstatus" -> 3))
  }

  test("REPLACE PARTITION SPEC: evolution commit with fresh ids, read-back, retained history") {
    val tbl = freshTable()
    val v2 = IcebergMeta.replacePartitionSpec(spark, tbl,
      Seq("month(o_orderdate)", "bucket(4, o_orderkey)", "o_orderstatus"))
    assert(v2 == 2)
    assert(IcebergMeta.partitionSpecString(spark, tbl) ==
      "month(o_orderdate), bucket(4, o_orderkey), o_orderstatus")
    val m = IcebergMeta.read(spark, tbl)
    assert(m.version == 2)
    assert(m.defaultSpecId == 1)
    // the old spec stays in partition-specs (old manifests reference it)
    assert(m.specs.keySet == Set(0, 1))
    val fields = m.specs(1)
    assert(fields.map(_.transform) == Seq("month", "bucket[4]", "identity"))
    assert(fields.map(_.sourceId) == Seq(2, 1, 3))
    // fresh partition field ids continue from the 1000 floor
    assert(fields.map(_.fieldId) == Seq(1000, 1001, 1002))
    // a second evolution continues both counters
    val v3 = IcebergMeta.replacePartitionSpec(spark, tbl, Seq("truncate(o_orderkey, 100)"))
    assert(v3 == 3)
    val m3 = IcebergMeta.read(spark, tbl)
    assert(m3.defaultSpecId == 2)
    assert(m3.specs(2).map(f => (f.transform, f.fieldId)) == Seq(("truncate[100]", 1003)))
    assert(IcebergMeta.partitionSpecString(spark, tbl) == "truncate(o_orderkey, 100)")
  }

  test("spec evolution REUSES field ids and names for equivalent fields (Iceberg v2 rule)") {
    val tbl = freshTable()
    IcebergMeta.replacePartitionSpec(spark, tbl,
      Seq("month(o_orderdate)", "bucket(4, o_orderkey)"))
    val first = IcebergMeta.read(spark, tbl).specs(1)
    // re-running the advisor with an overlapping recommendation must NOT
    // mint a same-name field under a new id (real readers reject that when
    // building the unified partition type)
    IcebergMeta.replacePartitionSpec(spark, tbl,
      Seq("bucket(4, o_orderkey)", "o_orderstatus"))
    val second = IcebergMeta.read(spark, tbl).specs(2)
    val reused = second.find(_.transform == "bucket[4]").get
    val orig = first.find(_.transform == "bucket[4]").get
    assert(reused.fieldId == orig.fieldId && reused.name == orig.name)
    // the genuinely new identity field got a fresh id past the high-water mark
    val fresh = second.find(_.transform == "identity").get
    assert(fresh.fieldId > first.map(_.fieldId).max)
    // last-partition-id stays monotonic even when a later spec reuses only
    // old ids
    IcebergMeta.replacePartitionSpec(spark, tbl, Seq("month(o_orderdate)"))
    val m = IcebergMeta.read(spark, tbl)
    val JInt(lastPid) = (m.raw \ "last-partition-id"): @unchecked
    assert(lastPid.toInt >= fresh.fieldId)
  }

  test("same-family duplicate fragments get parameter-qualified names, exact dup is rejected") {
    val tbl = freshTable()
    IcebergMeta.replacePartitionSpec(spark, tbl,
      Seq("bucket(4, o_orderkey)", "bucket(8, o_orderkey)"))
    val names = IcebergMeta.read(spark, tbl).specs(1).map(_.name)
    assert(names.distinct == names, s"duplicate partition field names: $names")
    assert(names.contains("o_orderkey_bucket") && names.contains("o_orderkey_bucket_8"))
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.replacePartitionSpec(spark, tbl,
        Seq("bucket(4, o_orderkey)", "bucket(4, o_orderkey)"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("a NEW field never mints a same-name/new-id collision with an EARLIER spec's field") {
    val tbl = freshTable()
    IcebergMeta.replacePartitionSpec(spark, tbl, Seq("bucket(4, o_orderkey)"))
    val orig = IcebergMeta.read(spark, tbl).specs(1).head
    assert(orig.name == "o_orderkey_bucket")
    // bucket(8, …) is a genuinely NEW field (different transform param) —
    // its conventional base name collides with spec 1's field; it must be
    // qualified, not reuse the name under a new field id (readers reject
    // same-name/new-id when building the unified partition type)
    IcebergMeta.replacePartitionSpec(spark, tbl, Seq("bucket(8, o_orderkey)"))
    val fresh = IcebergMeta.read(spark, tbl).specs(2).head
    assert(fresh.fieldId != orig.fieldId)
    assert(fresh.name != orig.name, s"new field reused name '${orig.name}' under a new id")
    assert(fresh.name == "o_orderkey_bucket_8")
  }

  test("fragment ORDER cannot break reuse: new-before-reused still resolves both names") {
    val tbl = freshTable()
    IcebergMeta.replacePartitionSpec(spark, tbl, Seq("bucket(4, o_orderkey)"))
    // the new bucket(8) listed FIRST must not claim o_orderkey_bucket and
    // trip a bogus 'duplicate partition field' on the legal bucket(4) reuse
    IcebergMeta.replacePartitionSpec(spark, tbl,
      Seq("bucket(8, o_orderkey)", "bucket(4, o_orderkey)"))
    val fields = IcebergMeta.read(spark, tbl).specs(2)
    val b4 = fields.find(_.transform == "bucket[4]").get
    val b8 = fields.find(_.transform == "bucket[8]").get
    assert(b4.name == "o_orderkey_bucket" && b4.fieldId == 1000) // reused
    assert(b8.name == "o_orderkey_bucket_8" && b8.fieldId > 1000)
  }

  test("a commit superseded during an orphan-reclaim race fails loudly, not silently") {
    val tbl = freshTable()
    // simulate the >grace-window stall: after OUR document is written but
    // before the hint swing, a competitor reclaims our v-file as debris and
    // recreates it with ITS OWN content — our commit must not report success
    val competitor = """{"format-version": 2, "the": "competitor's commit"}"""
    IcebergMeta.beforeHintSwing = { target =>
      // the competitor commits through the same Hadoop FS API (delete the
      // debris, recreate exclusively) — nio would desync LocalFileSystem's
      // .crc sidecar and turn the compare into a checksum error instead
      val filesystem = target.getFileSystem(spark.sessionState.newHadoopConf())
      filesystem.delete(target, false)
      val o = filesystem.create(target, false)
      try o.write(competitor.getBytes("UTF-8")) finally o.close()
    }
    try {
      val e = intercept[java.io.IOException] {
        IcebergMeta.replacePartitionSpec(spark, tbl, Seq("o_orderstatus"))
      }
      assert(e.getMessage.contains("superseded"), e.getMessage)
      // the competitor's document is untouched
      assert(new String(Files.readAllBytes(
        Paths.get(tbl, "metadata", "v2.metadata.json")), "UTF-8") == competitor)
    } finally IcebergMeta.beforeHintSwing = _ => ()
  }

  test("a crashed commit's debris unwedges after the grace window; a fresh blocker stays loud") {
    val tbl = freshTable()
    IcebergMeta.replacePartitionSpec(spark, tbl, Seq("o_orderstatus"))
    // simulate a committer that died between create and hint swing: v3
    // exists, hint still says 2
    val orphan = Paths.get(tbl, "metadata", "v3.metadata.json")
    Files.write(orphan, "{\"never\":\"committed\"}".getBytes("UTF-8"))
    // fresh debris: the commit must fail loudly (indistinguishable from a
    // live committer inside its create→swing window)
    val e = intercept[java.io.IOException] {
      IcebergMeta.replacePartitionSpec(spark, tbl, Seq("month(o_orderdate)"))
    }
    assert(e.getMessage.contains("commit race"), e.getMessage)
    // …but once it ages past the grace window it is debris, and the next
    // commit reclaims it instead of being wedged forever
    val old = IcebergMeta.OrphanGraceMs
    IcebergMeta.OrphanGraceMs = 0L
    try {
      val v = IcebergMeta.replacePartitionSpec(spark, tbl, Seq("month(o_orderdate)"))
      assert(v == 3)
      assert(IcebergMeta.partitionSpecString(spark, tbl) == "month(o_orderdate)")
    } finally IcebergMeta.OrphanGraceMs = old
  }

  test("commit safety: lost version-hint recovers by listing; concurrent v-file wins the race") {
    val tbl = freshTable()
    IcebergMeta.replacePartitionSpec(spark, tbl, Seq("o_orderstatus"))
    // hint loss → recovery via highest v<N>.metadata.json (spec guidance)
    Files.delete(Paths.get(tbl, "metadata", "version-hint.text"))
    assert(IcebergMeta.currentVersion(spark, tbl).contains(2))
    assert(IcebergMeta.partitionSpecString(spark, tbl) == "o_orderstatus")
    // a concurrent committer already wrote v3 → this commit must fail loudly
    Files.write(Paths.get(tbl, "metadata", "v3.metadata.json"),
      "{}".getBytes("UTF-8"))
    intercept[Exception] {
      IcebergMeta.replacePartitionSpec(spark, tbl, Seq("month(o_orderdate)"))
    }
    // and the table still reads at its committed state... (v3 is garbage,
    // so the point read goes through the hint, which still says 2)
    Files.write(Paths.get(tbl, "metadata", "version-hint.text"), "2".getBytes("UTF-8"))
    assert(IcebergMeta.partitionSpecString(spark, tbl) == "o_orderstatus")
  }

  test("unknown column in a spec fragment is rejected at commit time") {
    val tbl = freshTable()
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.replacePartitionSpec(spark, tbl, Seq("month(no_such_col)"))
    }
    assert(e.getMessage.contains("no_such_col"))
    // nothing was committed
    assert(IcebergMeta.read(spark, tbl).version == 1)
  }

  test("format-version 1 layout reads too: single schema, flat partition-spec") {
    // v1 metadata has "schema" (no schemas list) and may carry only the
    // flat "partition-spec" field list — both supported read paths
    val dir = Files.createTempDirectory("graft_iceberg_v1").toString + "/tbl"
    Files.createDirectories(Paths.get(dir, "metadata"))
    val v1 =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "9c12c3f4-0000-4000-8000-000000000044",
         |  "location": "$dir",
         |  "last-updated-ms": 1700000000000,
         |  "last-column-id": 2,
         |  "schema": {"type": "struct", "fields": [
         |    {"id": 1, "name": "event_id", "required": true, "type": "long"},
         |    {"id": 2, "name": "event_day", "required": false, "type": "date"}]},
         |  "partition-spec": [
         |    {"name": "event_day_month", "transform": "month", "source-id": 2, "field-id": 1000}],
         |  "properties": {}
         |}""".stripMargin
    Files.write(Paths.get(dir, "metadata", "v1.metadata.json"), v1.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "metadata", "version-hint.text"), "1".getBytes("UTF-8"))
    assert(IcebergMeta.isIcebergTable(spark, dir))
    val m = IcebergMeta.read(spark, dir)
    assert(m.formatVersion == 1)
    assert(m.schemaIds == Map("event_id" -> 1, "event_day" -> 2))
    assert(IcebergMeta.partitionSpecString(spark, dir) == "month(event_day)")
    // spec evolution from the v1 flat form: old spec lands in
    // partition-specs with its field ids preserved, new spec appends
    val v2 = IcebergMeta.replacePartitionSpec(spark, dir, Seq("bucket(8, event_id)"))
    assert(v2 == 2)
    val m2 = IcebergMeta.read(spark, dir)
    assert(m2.specs.keySet == Set(0, 1))
    assert(m2.specs(0).map(_.transform) == Seq("month"))
    assert(m2.specs(1).map(f => (f.transform, f.fieldId)) == Seq(("bucket[8]", 1001)))
    assert(IcebergMeta.partitionSpecString(spark, dir) == "bucket(8, event_id)")
  }

  test("the advisor's emitted spec block applies end to end (the --execute path)") {
    val tbl = freshTable()
    // the exact multi-line fragment shape Recommender.scripts renders
    val block = "month(o_orderdate),\n    bucket(4, o_orderkey)"
    IcebergMeta.applySpec(spark, tbl, block)
    assert(IcebergMeta.partitionSpecString(spark, tbl) ==
      "month(o_orderdate), bucket(4, o_orderkey)")
  }

  test("the REAL advisor recommendation for orders commits as Iceberg spec evolution") {
    // advisor output (S12) → native REPLACE PARTITION SPEC (S5): the loop
    // the reference drives through Trino, closed against table metadata.
    // The fixture schema carries every orders column so any recommended
    // fragment resolves; schema field ids are arbitrary but stable.
    import org.apache.spark.sql.functions.col
    val rec = graft.pipeline.AnalysisPipeline.run(spark, sfDir)
      .where(col("view") === "orders").collect()(0)
    val spec = rec.getAs[String]("partition_spec")
    assert(spec != null && spec.nonEmpty)
    val dir = Files.createTempDirectory("graft_iceberg_orders").toString + "/orders"
    Files.createDirectories(Paths.get(dir, "metadata"))
    val cols = Seq("o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "date", "o_orderpriority" -> "string")
    val fieldJson = cols.zipWithIndex.map { case ((n, t), i) =>
      s"""{"id": ${i + 1}, "name": "$n", "required": false, "type": "$t"}"""
    }.mkString(", ")
    val v1 =
      s"""{"format-version": 2, "table-uuid": "9c12c3f4-0000-4000-8000-000000000043",
         |"location": "$dir", "last-sequence-number": 0,
         |"last-updated-ms": 1700000000000, "last-column-id": ${cols.size},
         |"current-schema-id": 0,
         |"schemas": [{"type": "struct", "schema-id": 0, "fields": [$fieldJson]}],
         |"default-spec-id": 0, "partition-specs": [{"spec-id": 0, "fields": []}],
         |"last-partition-id": 999, "default-sort-order-id": 0,
         |"sort-orders": [{"order-id": 0, "fields": []}],
         |"properties": {}, "snapshots": []}""".stripMargin
    Files.write(Paths.get(dir, "metadata", "v1.metadata.json"), v1.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "metadata", "version-hint.text"), "1".getBytes("UTF-8"))
    IcebergMeta.applySpec(spark, dir, spec)
    // the committed default spec round-trips to the advisor's fragments
    // (same depth-0 comma split applySpec uses)
    def frags(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var depth = 0
      val cur = new StringBuilder
      s.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case c => cur += c
      }
      out += cur.result()
      out.map(_.trim).filter(_.nonEmpty).toSeq
    }
    assert(frags(IcebergMeta.partitionSpecString(spark, dir)) == frags(spec))
  }
}
