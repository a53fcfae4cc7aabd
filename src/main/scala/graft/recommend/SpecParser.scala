package graft.recommend

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Parse a rendered partition-spec fragment (`month(c)`, `bucket(8, c)`,
  * `truncate(c, 100)`, or bare `c`) back into an evaluable partition-value
  * column — the bridge from emitted DDL text to T5 physical writes. */
object SpecParser {

  // Grammar kept in lockstep with IcebergMeta.parseFragment (the commit
  // side) and renderField (the metadata-read side): `hour` is a unit real
  // Iceberg tables use, and separators are `,\s*` — an exactly-one-space
  // requirement would silently mis-parse `bucket(8,c)` into the identity
  // fallback below.
  private val DateR = """(hour|day|month|year)\(\s*(\w+)\s*\)""".r
  private val BucketR = """bucket\(\s*(\d+),\s*(\w+)\s*\)""".r
  private val TruncR = """truncate\(\s*(\w+),\s*(\d+)\s*\)""".r
  private val BareR = """(\w+)""".r

  /** @return (source column name, partition-value column) */
  def toColumn(spec: String, df: DataFrame): (String, Column) = spec.trim match {
    case DateR(unit, c) => (c, DateTransform(unit)(col(c)))
    case BucketR(n, c) => (c, BucketTransform(n.toInt)(col(c)))
    case TruncR(c, w) => (c, TruncateTransform(w.toInt)(col(c)))
    // the identity arm accepts ONLY a bare identifier: an unrecognized
    // function-call fragment falling through to IdentityTransform would
    // surface later as UNRESOLVED_COLUMN `col("hour(ts)")` at write time —
    // or worse, silently partition by the wrong column — instead of a
    // parse error naming the fragment
    case BareR(c) => (c, IdentityTransform(col(c)))
    case other => throw new IllegalArgumentException(
      s"unparseable partition-spec fragment '$other' (expected unit(col), " +
        "bucket(n, col), truncate(col, w), or a bare column name)")
  }
}
