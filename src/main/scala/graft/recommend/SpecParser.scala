package graft.recommend

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Parse a rendered partition-spec fragment (`month(c)`, `bucket(8, c)`,
  * `truncate(c, 100)`, or bare `c`) back into an evaluable partition-value
  * column — the bridge from emitted DDL text to T5 physical writes. */
object SpecParser {

  private val DateR = """(day|month|year)\((\w+)\)""".r
  private val BucketR = """bucket\((\d+), (\w+)\)""".r
  private val TruncR = """truncate\((\w+), (\d+)\)""".r

  /** @return (source column name, partition-value column) */
  def toColumn(spec: String, df: DataFrame): (String, Column) = spec.trim match {
    case DateR(unit, c) => (c, DateTransform(unit)(col(c)))
    case BucketR(n, c) => (c, BucketTransform(n.toInt)(col(c)))
    case TruncR(c, w) => (c, TruncateTransform(w.toInt)(col(c)))
    case c => (c, IdentityTransform(col(c)))
  }
}
