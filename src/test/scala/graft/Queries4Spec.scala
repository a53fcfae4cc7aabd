package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Queries4 semantics the oracle alone can't pin. */
class Queries4Spec extends SparkSpec {

  test("window_ntile arithmetic == real ntile() on an uneven (n % k != 0) frame") {
    import spark.implicits._
    // 10 rows, k = 4 → q = 2, r = 2: tiles sized 3,3,2,2 — exercises BOTH
    // branches of the closed formula (every fixture row count is divisible
    // by 4, so the oracle alone never leaves the r = 0 branch), plus a
    // price tie broken by the key.
    val rows = Seq(
      (5.0, 1L), (3.0, 2L), (9.0, 3L), (3.0, 4L), (7.0, 5L),
      (1.0, 6L), (8.0, 7L), (2.0, 8L), (6.0, 9L), (4.0, 10L))
    val df = rows.toDF("o_totalprice", "o_orderkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_ntile").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val got = rowsOf(SparkEntry.queries("window_ntile")(spark, dir))
    val want = rowsOf(df
      .select(ntile(4).over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))).as("tile"),
        col("o_totalprice"))
      .groupBy("tile")
      .agg(count(lit(1)).as("cnt"), round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("tile"))
    assert(got == want, s"got $got want $want")
    assert(got.map(_._2) == Seq(3L, 3L, 2L, 2L), got.map(_._2).toString)
  }
}
