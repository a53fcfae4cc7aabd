package graft

import graft.pipeline.AnalysisPipeline
import org.apache.spark.sql.functions._

/** End-to-end smoke (SURVEY §5.4): full pipeline on sf0.001. */
class PipelineSpec extends SparkSpec {

  private lazy val recs = AnalysisPipeline.run(spark, sfDir).cache()

  test("one recommendation row per profiled view, scripts non-empty") {
    val rows = recs.collect()
    assert(rows.map(_.getAs[String]("view")).toSet ==
      graft.catalog.TableRegistry.profiledTables.toSet)
    assert(rows.forall(_.getAs[String]("script").nonEmpty))
  }

  test("orders recommendation applies a date transform to o_orderdate") {
    val spec = recs.where(col("view") === "orders").collect()(0).getAs[String]("partition_spec")
    assert(spec.contains("year(o_orderdate)"), spec)
  }

  test("scripts carry the reference ALTER TABLE shape") {
    val s = recs.where(col("view") === "lineitem").collect()(0).getAs[String]("script")
    assert(s.startsWith("-- Iceberg Partitioning script for lineitem"))
    assert(s.contains("ALTER TABLE lineitem REPLACE PARTITION SPEC ("))
    assert(s.contains("-- Column scores: ["))
  }

  test("entry() is non-empty (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
