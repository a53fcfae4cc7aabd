package graft

import graft.catalog.TableRegistry
import org.apache.spark.sql.types.LongType

/** Ingestion-boundary contract (TableRegistry.normalizeTs): the engine-wide
  * "ts = epoch-nanos bigint" invariant must hold for BOTH vintages the
  * fixture generator has shipped — parquet timestamp[ns] (r1–r6, read as a
  * long via spark.sql.legacy.parquet.nanosAsLong) and timestamp[us]
  * isAdjustedToUTC=false (r7+, read as TIMESTAMP_NTZ). The twin fixtures in
  * src/test/resources encode the SAME instants in each unit (pyarrow-written;
  * Spark cannot write ns parquet). At 100 TB this is the mixed-vintage
  * upstream-parquet case: one table, files written across format changes,
  * one engine contract. */
class BoundarySpec extends SparkSpec {

  test("timestamp[ns] and timestamp[us] parquet land on one epoch-nanos contract") {
    val dir = new java.io.File(
      getClass.getResource("/events_ns.parquet").toURI).getParent
    val ns = TableRegistry.table(spark, dir, "events_ns")
      .select("event_id", "ts").orderBy("event_id")
    val us = TableRegistry.table(spark, dir, "events_us")
      .select("event_id", "ts").orderBy("event_id")
    // both forms surface as bigint nanos…
    assert(ns.schema("ts").dataType == LongType, ns.schema.treeString)
    assert(us.schema("ts").dataType == LongType, us.schema.treeString)
    // …with identical values
    val nsV = ns.collect().map(r => (r.getLong(0), r.getLong(1)))
    val usV = us.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nsV.sameElements(usV), s"${nsV.toSeq} vs ${usV.toSeq}")
    // absolute anchor, not just mutual agreement: row 0 is
    // 2024-01-01T00:00:00Z; row 1 adds exactly 999 µs (sub-ms precision
    // survives); row 3 adds one day (no tz drift across the UTC session)
    val epoch0 = 1704067200L * 1000000000L
    assert(nsV(0)._2 == epoch0)
    assert(nsV(1)._2 == epoch0 + 999000L)
    assert(nsV(3)._2 == epoch0 + 86400L * 1000000000L)
  }
}
