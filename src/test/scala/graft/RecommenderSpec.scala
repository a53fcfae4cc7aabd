package graft

import graft.recommend.Recommender
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C9 script assembly edge: views with no surviving candidates get the
  * reference's "no suitable columns" comment (partitioning.py:436-437). */
class RecommenderSpec extends SparkSpec {

  test("view with no candidates gets the no-suitable-columns script") {
    val schema = StructType(Seq(
      StructField("view", StringType), StructField("column", StringType),
      StructField("rank", IntegerType), StructField("score", DoubleType),
      StructField("dataType", StringType), StructField("cardinality", LongType),
      StructField("valueRange", DoubleType), StructField("dateGranularity", StringType)))
    val ranked = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    val out = Recommender.scripts(spark, ranked, Seq("emptyview")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("partition_spec") == null)
    assert(out(0).getAs[String]("script")
      .contains("emptyview does not contain suitable columns for partitioning"))
  }

  test("mixed case: one view ranked, one empty") {
    import spark.implicits._
    val ranked = Seq(
      ("viewa", "col1", 1, 42.0, "string", 3L, Option.empty[Double], Option.empty[String]))
      .toDF("view", "column", "rank", "score", "dataType", "cardinality", "valueRange", "dateGranularity")
    val out = Recommender.scripts(spark, ranked, Seq("viewa", "viewb"))
      .collect().map(r => r.getAs[String]("view") -> r.getAs[String]("script")).toMap
    assert(out("viewa").contains("ALTER TABLE viewa REPLACE PARTITION SPEC"))
    assert(out("viewa").contains("col1"))
    assert(out("viewb").contains("does not contain suitable columns"))
  }
}
