package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main. Not part of the library API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val df = graft.ext.SimSearch.exactSelfJoin(spark, emb, threshold = 0.30)
      .where(col("a_id") < 500 && col("b_id") < 500)
    val t0 = System.nanoTime()
    df.count()
    println(s"exact selfjoin: ${(System.nanoTime() - t0) / 1e9}s")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Filter") || l.contains("Join") || l.contains("FileScan"))
      .mkString("\n"))
    spark.stop()
  }
}
