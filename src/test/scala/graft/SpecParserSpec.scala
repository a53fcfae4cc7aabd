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
}
