package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4: the engine-side answer to the
  * reference's skew analysis C6). AQE's skew-join handles most cases at
  * runtime; explicit salting is the lever when one key dominates so heavily
  * that even split partitions hot-spot — the classic 100 TB pattern.
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a deterministic
    * salt derived from a row-unique column; the small side is replicated
    * `saltBuckets`× via explode. Result is identical to
    * `large.join(small, key)` but the shuffle spreads each hot key over
    * `saltBuckets` reducers.
    *
    * @param rowTag any column of `large` that varies within a key group
    *               (used to derive a deterministic salt — no RNG, so plans
    *               stay reproducible and retries are safe).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      rowTag: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    // withColumn would silently REPLACE a same-named user column and the
    // final drop would then delete user data — refuse instead
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves column name '__salt'; rename it on the inputs")
    val salted = large.withColumn("__salt", pmod(hash(rowTag), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
