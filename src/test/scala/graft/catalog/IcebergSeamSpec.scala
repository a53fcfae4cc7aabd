package graft.catalog

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s.jackson.JsonMethods

/** S5 seam contract, closed under extension: a FOURTH catalog surface —
  * a stub conditional-pointer-swap catalog modeling the Glue-style
  * `UpdateTable(versionId)` shape (the surface the S5 ADR records as
  * environmental: the real one needs the AWS SDK, absent offline) — slots
  * into the shared resolve pipeline
  * ([[IcebergMeta.readDocument]]/[[IcebergMeta.parseMetadata]] →
  * [[IcebergMeta.buildReplacementSpec]] →
  * [[IcebergMeta.replacementDocument]] → [[IcebergMeta.specString]])
  * with ZERO core changes: everything below lives in the TEST tree.
  *
  * The contract a new catalog must supply is exactly two operations:
  *   - pointer READ:  table name → current metadata-document location
  *     (+ whatever commit token the catalog's concurrency story needs);
  *   - pointer SWAP:  atomically move the pointer to a new document,
  *     failing loudly when a concurrent committer moved it first.
  * Everything else — document parsing, spec resolution, field-id/name
  * reuse, document assembly, fragment rendering — is catalog-independent
  * and reused verbatim, which is what keeps the three shipped surfaces
  * (filesystem/REST/HMS) from drifting and makes the fourth a wiring
  * exercise.
  */
class IcebergSeamSpec extends SparkSpec {

  /** In-memory Glue-like catalog: one pointer + a version token per table;
    * commit is compare-and-swap on the token (Glue's optimistic
    * `UpdateTable` with `versionId`; no lock, unlike HMS). */
  final class PointerCatalogStub {
    private val tables = scala.collection.mutable.Map[String, (String, Long)]()
    def register(name: String, loc: String): Unit =
      synchronized { tables(name) = (loc, 0L) }
    def get(name: String): (String, Long) = synchronized { tables(name) }
    def conditionalSwap(name: String, newLoc: String, token: Long): Boolean =
      synchronized {
        val (_, cur) = tables(name)
        if (cur == token) { tables(name) = (newLoc, cur + 1); true } else false
      }
  }

  /** The whole fourth-catalog adapter: pointer read + CAS swap wired to the
    * shared seams. Deliberately the same shape as [[IcebergHms]]'s
    * load/replace pair, minus the lock (CAS carries the concurrency). */
  object FourthCatalog {
    def loadTable(spark: SparkSession, cat: PointerCatalogStub,
        table: String): (IcebergMeta.TableMeta, String, Long) = {
      val (loc, token) = cat.get(table)
      val p = new Path(loc)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      // the catalog owns versioning → the filesystem v<N> notion is -1,
      // exactly the HMS/REST convention
      (IcebergMeta.readDocument(fs, p, -1), loc, token)
    }

    def partitionSpecString(spark: SparkSession, cat: PointerCatalogStub,
        table: String): String =
      IcebergMeta.specString(loadTable(spark, cat, table)._1)

    def replacePartitionSpec(spark: SparkSession, cat: PointerCatalogStub,
        table: String, fragments: Seq[String]): String = {
      val (m, baseLoc, token) = loadTable(spark, cat, table)
      val (newSpecId, fields) =
        IcebergMeta.buildReplacementSpec(m, fragments, table)
      val updated = IcebergMeta.replacementDocument(m, newSpecId, fields)
      // same metadata-file naming convention as the HMS surface
      val target = IcebergHms.nextMetadataPath(baseLoc)
      val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
      val out = fs.create(target, false)
      try out.write(JsonMethods.pretty(JsonMethods.render(updated)).getBytes("UTF-8"))
      finally out.close()
      if (!cat.conditionalSwap(table, target.toString, token)) {
        fs.delete(target, false) // our never-visible document
        throw new java.io.IOException(
          s"conditional pointer swap failed for $table: a concurrent " +
            "committer moved the pointer — re-read and retry")
      }
      target.toString
    }

    def applySpec(spark: SparkSession, cat: PointerCatalogStub,
        table: String, partitionSpec: String): String =
      replacePartitionSpec(spark, cat, table,
        IcebergMeta.splitFragments(partitionSpec))
  }

  /** A v2 metadata document under the catalog-owned naming convention. */
  private def freshPointerTable(cat: PointerCatalogStub, name: String): String = {
    val dir = Files.createTempDirectory("graft_fourth_cat").toString + s"/$name"
    Files.createDirectories(Paths.get(dir, "metadata"))
    val doc =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "9c12c3f4-0000-4000-8000-000000000077",
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
    val loc = Paths.get(dir, "metadata",
      "00000-9c12c3f4-0000-4000-8000-000000000077.metadata.json")
    Files.write(loc, doc.getBytes("UTF-8"))
    cat.register(name, loc.toString)
    dir
  }

  test("fourth catalog: pointer read resolves through the shared parse/render seams") {
    val cat = new PointerCatalogStub
    freshPointerTable(cat, "orders")
    val (m, _, token) = FourthCatalog.loadTable(spark, cat, "orders")
    assert(m.formatVersion == 2 && m.version == -1) // catalog owns versioning
    assert(m.schemaIds == Map("o_orderkey" -> 1, "o_orderdate" -> 2, "o_orderstatus" -> 3))
    assert(token == 0L)
    assert(FourthCatalog.partitionSpecString(spark, cat, "orders") == "")
  }

  test("fourth catalog: spec evolution commits through CAS swap; field ids/names reuse across commits") {
    val cat = new PointerCatalogStub
    freshPointerTable(cat, "orders")
    val loc1 = FourthCatalog.replacePartitionSpec(spark, cat, "orders",
      Seq("month(o_orderdate)", "bucket(4, o_orderkey)"))
    assert(cat.get("orders")._1 == loc1 && cat.get("orders")._2 == 1L)
    assert(FourthCatalog.partitionSpecString(spark, cat, "orders") ==
      "month(o_orderdate), bucket(4, o_orderkey)")
    // metadata-file naming continues the HMS convention: 00001-<uuid>
    assert(new Path(loc1).getName.startsWith("00001-"))
    // second overlapping commit: the equivalent field REUSES id + name
    // (the v2 rule buildReplacementSpec enforces catalog-independently)
    FourthCatalog.replacePartitionSpec(spark, cat, "orders",
      Seq("bucket(4, o_orderkey)", "o_orderstatus"))
    val m = FourthCatalog.loadTable(spark, cat, "orders")._1
    assert(m.specs.keySet == Set(0, 1, 2))
    val first = m.specs(1).find(_.transform == "bucket[4]").get
    val reused = m.specs(2).find(_.transform == "bucket[4]").get
    assert(reused.fieldId == first.fieldId && reused.name == first.name)
    val fresh = m.specs(2).find(_.transform == "identity").get
    assert(fresh.fieldId > m.specs(1).map(_.fieldId).max)
  }

  test("fourth catalog: a lost CAS race fails loudly and leaves the winner authoritative") {
    // two committers read the same state (token 0); A commits first, B's
    // swap must refuse, B's adapter must fail loudly, the pointer must
    // still read A's spec, and B's never-visible document must be cleaned up
    val cat = new PointerCatalogStub
    freshPointerTable(cat, "orders")
    // B's stale read snapshot, taken BEFORE A commits
    val (mB, baseB, tokenB) = FourthCatalog.loadTable(spark, cat, "orders")
    // A wins
    val winner = FourthCatalog.replacePartitionSpec(spark, cat, "orders",
      Seq("month(o_orderdate)"))
    assert(cat.get("orders") == (winner, 1L))
    // B finishes its commit from the stale snapshot — the adapter body,
    // replayed verbatim from the point after loadTable
    val (sidB, fieldsB) = IcebergMeta.buildReplacementSpec(mB, Seq("o_orderstatus"), "orders")
    val docB = IcebergMeta.replacementDocument(mB, sidB, fieldsB)
    val targetB = IcebergHms.nextMetadataPath(baseB)
    val fs = targetB.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(targetB, false)
    try out.write(JsonMethods.pretty(JsonMethods.render(docB)).getBytes("UTF-8"))
    finally out.close()
    val e = intercept[java.io.IOException] {
      if (!cat.conditionalSwap("orders", targetB.toString, tokenB)) {
        fs.delete(targetB, false)
        throw new java.io.IOException(
          "conditional pointer swap failed for orders: a concurrent " +
            "committer moved the pointer — re-read and retry")
      }
    }
    assert(e.getMessage.contains("re-read and retry"))
    // pointer unchanged: A's commit is authoritative and readable
    assert(cat.get("orders") == (winner, 1L))
    assert(FourthCatalog.partitionSpecString(spark, cat, "orders") ==
      "month(o_orderdate)")
    // B's document is gone (no orphan debris under catalog-owned naming)
    assert(!fs.exists(targetB))
    // B retries from a fresh read and now succeeds, reusing nothing stale
    FourthCatalog.replacePartitionSpec(spark, cat, "orders", Seq("o_orderstatus"))
    assert(FourthCatalog.partitionSpecString(spark, cat, "orders") == "o_orderstatus")
    assert(cat.get("orders")._2 == 2L)
  }

  test("fourth catalog: the advisor's rendered spec block applies end to end") {
    val cat = new PointerCatalogStub
    freshPointerTable(cat, "orders")
    val block = "month(o_orderdate),\n    bucket(4, o_orderkey)"
    FourthCatalog.applySpec(spark, cat, "orders", block)
    assert(FourthCatalog.partitionSpecString(spark, cat, "orders") ==
      "month(o_orderdate), bucket(4, o_orderkey)")
  }
}
