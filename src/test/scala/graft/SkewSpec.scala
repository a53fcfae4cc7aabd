package graft

import graft.catalog.TableRegistry
import graft.ext.Skew
import org.apache.spark.sql.functions._

/** Salted join equivalence: same result multiset as the plain join. */
class SkewSpec extends SparkSpec {

  test("salted join equals plain join on a skewed key") {
    val li = TableRegistry.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    val ord = TableRegistry.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))

    val plain = li.join(ord, Seq("k"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, ord, "k", col("l_linenumber"), saltBuckets = 7)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted.map(t => (t._1, t._2)) == plain.map(t => (t._1, t._2)))
  }
}
