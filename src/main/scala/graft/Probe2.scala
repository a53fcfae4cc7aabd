package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling probe. Not part of the library API. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup
    graft.catalog.TableRegistry.tableNames.foreach(n => spark.read.parquet(s"$sf/$n.parquet").count())
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    timed("lineitem plain (min/max/pct)") {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
      val aggs = cols.map(c => expr(s"percentile($c, array(0.1D,0.5D,0.9D))")) ++
        li.schema.fieldNames.filter(_ != "l_shipdate").flatMap(c => Seq(min(col(c)), max(col(c))))
      li.agg(aggs.head, aggs.tail: _*).collect()
    }
    timed("lineitem distinct pass (Expand x15)") {
      val aggs = li.schema.fieldNames.map(c => countDistinct(col(c))) ++
        Seq(countDistinct(dayofmonth(col("l_shipdate"))),
          countDistinct(month(col("l_shipdate"))), countDistinct(year(col("l_shipdate"))))
      li.agg(aggs.head, aggs.tail: _*).collect()
    }
    Seq("lineitem", "orders", "customer", "supplier", "part").foreach { tb =>
      timed(s"profile $tb") {
        graft.profile.Profiler.profile(spark, tb, spark.read.parquet(s"$sf/$tb.parquet"))
      }
    }
    val log = graft.catalog.TableRegistry.queryLog(spark, sf).cache()
    timed("usage") {
      graft.usage.Usage.weightedFrequency(spark,
        graft.pipeline.AnalysisPipeline.views(spark, sf), log).collect()
    }
    timed("perfMetrics") {
      val (a, b) = graft.score.Scoring.performanceMetrics(spark, log)
      a.collect(); b.collect()
    }
    timed("full scores()") {
      graft.pipeline.AnalysisPipeline.scores(spark, sf).collect()
    }
    timed("full scores() again (cached profiles)") {
      graft.pipeline.AnalysisPipeline.scores(spark, sf).collect()
    }
    spark.stop()
  }
}
