package graft

import graft.catalog.TableRegistry
import graft.recommend.SpecParser
import org.apache.spark.sql.functions._

/** Rendered spec text → evaluable partition column round trip. */
class SpecParserSpec extends SparkSpec {

  private lazy val li = TableRegistry.table(spark, sfDir, "lineitem")

  test("date spec parses and evaluates to truncated dates") {
    val (c, colExpr) = SpecParser.toColumn("month(l_shipdate)", li)
    assert(c == "l_shipdate")
    val v = li.select(colExpr.as("p")).limit(1).collect()(0).getDate(0)
    assert(v.toString.endsWith("-01"))
  }

  test("bucket spec parses with bounded values") {
    val (c, colExpr) = SpecParser.toColumn("bucket(8, l_suppkey)", li)
    assert(c == "l_suppkey")
    val vals = li.select(colExpr.as("p")).distinct().collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 0 && v < 8))
  }

  test("truncate spec parses") {
    val (c, colExpr) = SpecParser.toColumn("truncate(l_partkey, 100)", li)
    assert(c == "l_partkey")
    val vals = li.select(colExpr.as("p")).distinct().collect().map(_.getLong(0))
    assert(vals.forall(_ % 100 == 0))
  }

  test("identity spec falls through") {
    val (c, _) = SpecParser.toColumn("l_returnflag", li)
    assert(c == "l_returnflag")
  }

  test("grammar stays in lockstep with the Iceberg fragment renderer") {
    // hour(c): a unit real Iceberg tables render (IcebergMeta.renderField)
    val ev = graft.catalog.TableRegistry.table(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)").as("event_ts"))
    val (c, colExpr) = SpecParser.toColumn("hour(event_ts)", ev)
    assert(c == "event_ts")
    assert(ev.select(colExpr.as("p")).limit(1).collect()(0).get(0) != null)
    // non-canonical spacing must parse as the SAME transform, never fall
    // through to identity (IcebergMeta accepts `,\s*`)
    val (c2, _) = SpecParser.toColumn("bucket(8,l_suppkey)", li)
    assert(c2 == "l_suppkey")
    // an unrecognized function-call fragment fails LOUDLY at parse time,
    // not later as UNRESOLVED_COLUMN `col("zorder(a, b)")` at write time
    val e = intercept[IllegalArgumentException] {
      SpecParser.toColumn("zorder(a, b)", li)
    }
    assert(e.getMessage.contains("zorder"), e.getMessage)
    // interior whitespace parses the SAME on both sides of the pair — a
    // fragment that materializes through SpecParser must not fail
    // IcebergMeta.parseFragment with a not-a-column error
    val (c3, _) = SpecParser.toColumn("day( l_shipdate )", li)
    assert(c3 == "l_shipdate")
    assert(graft.catalog.IcebergMeta.parseFragment("day( l_shipdate )") ==
      ("l_shipdate", "day"))
    assert(graft.catalog.IcebergMeta.parseFragment("bucket( 8, c )") ==
      ("c", "bucket[8]"))
  }
}
