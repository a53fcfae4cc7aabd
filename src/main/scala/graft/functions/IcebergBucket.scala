package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Standard MurmurHash3 x86 32-bit (public algorithm, Austin Appleby) over
  * the byte serializations the Iceberg table spec defines for bucket
  * transforms: int/long/timestamp as 8-byte little-endian long, string as
  * UTF-8 bytes, seed 0. Spark's built-in `hash`/`Murmur3_x86_32` differs in
  * tail handling and long-serialization, which is exactly the T3 caveat this
  * expression removes.
  */
object IcebergMurmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k1i: Int): Int = {
    var k1 = k1i * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def fmix(h1i: Int, len: Int): Int = {
    var h1 = h1i ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashBytes(bytes: Array[Byte], seed: Int): Int = {
    val len = bytes.length
    val nblocks = len / 4
    var h1 = seed
    var i = 0
    while (i < nblocks) {
      val base = 4 * i
      val k1 = (bytes(base) & 0xff) |
        ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) |
        ((bytes(base + 3) & 0xff) << 24)
      h1 ^= mixK1(k1)
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
        h1 ^= mixK1(k1)
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
        h1 ^= mixK1(k1)
      case 1 =>
        k1 ^= bytes(tail) & 0xff
        h1 ^= mixK1(k1)
      case _ =>
    }
    fmix(h1, len)
  }

  /** Iceberg: integral types serialize as 8-byte little-endian longs. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b, 0)
  }

  def hashUtf8(s: UTF8String): Int = hashBytes(s.getBytes, 0)

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Integer.MAX_VALUE) % n

  def bucketUtf8(s: UTF8String, n: Int): Int = (hashUtf8(s) & Integer.MAX_VALUE) % n
}

/** `iceberg_bucket(n, col)` — Iceberg-spec bucket partition transform as a
  * native Catalyst expression with codegen (SURVEY §2.12's custom-Expression
  * candidate made real). Supports integral, timestamp (µs), and string
  * inputs, matching the Iceberg spec's bucket domain for our fixture types.
  */
case class IcebergBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  // left = numBuckets (foldable int), right = value
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!left.foldable || left.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("numBuckets must be an int literal")
    // reject n ≤ 0 (and NULL, which would unbox to 0) at ANALYSIS time:
    // the Iceberg spec requires a positive bucket count, and `% 0` would
    // otherwise surface as a runtime ArithmeticException mid-job
    else if (left.eval() == null || left.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("numBuckets must be a positive int literal")
    else right.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: TimestampType |
          _: TimestampNTZType | _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"unsupported bucket input: $other")
    }
  }

  private lazy val n: Int = left.eval().asInstanceOf[Int]

  override def nullSafeEval(nAny: Any, value: Any): Any = right.dataType match {
    case _: StringType => IcebergMurmur3.bucketUtf8(value.asInstanceOf[UTF8String], n)
    case _: IntegerType => IcebergMurmur3.bucketLong(value.asInstanceOf[Int].toLong, n)
    case _: ShortType => IcebergMurmur3.bucketLong(value.asInstanceOf[Short].toLong, n)
    case _ => IcebergMurmur3.bucketLong(value.asInstanceOf[Long], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.IcebergMurmur3$.MODULE$"
    defineCodeGen(ctx, ev, (nc, vc) => right.dataType match {
      case _: StringType => s"$m.bucketUtf8($vc, $nc)"
      case _: IntegerType | _: ShortType => s"$m.bucketLong((long) $vc, $nc)"
      case _ => s"$m.bucketLong($vc, $nc)"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IcebergBucket =
    copy(left = newLeft, right = newRight)
}

object IcebergBucket {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("iceberg_bucket"),
    new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "iceberg_bucket(numBuckets, col)")
      IcebergBucket(children.head, children(1))
    })
}

/** SparkSessionExtensions plugin — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`,
  * or call [[GraftFunctions.register]] on a live session. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(IcebergBucket.descriptor)
    // Pre-CBO, NOT injectOptimizerRule: operator-optimization extensions run
    // inside two FixedPoint batches (≥2 full-tree passes per plan even when
    // converged), taxing every query in the session. Both rules are
    // single-shot rewrites with no interplay with other operator rules, and
    // pre-CBO still precedes scan pushdown (V1 parquet filters are derived
    // from the optimized logical Filter at physical planning; DSv2/early
    // pushdown runs after the Pre CBO batch) — PlanSpec asserts the events
    // time predicate still reaches PushedFilters under this placement.
    ext.injectPreCBORule(_ => VectorDotRewriteRule)
    ext.injectPreCBORule(_ => EpochNanosPushdownRule)
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      IcebergBucket.descriptor._1, IcebergBucket.descriptor._2, IcebergBucket.descriptor._3)
}
