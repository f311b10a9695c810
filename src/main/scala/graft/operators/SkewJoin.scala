package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * First line of defense at scale is AQE (`spark.sql.adaptive.enabled` +
  * `skewJoin.enabled`, both default-on): it splits oversized shuffle
  * partitions at runtime. Salting is the explicit fallback when AQE can't
  * help — e.g. a single key worth many partitions on both sides, or a
  * non-shuffle consumer downstream. It trades `salt`× replication of the
  * smaller side for an even scatter of the hot key.
  *
  * The salt assignment uses a deterministic per-row hash purely to spread
  * rows; any assignment yields the same join *result* (inner equi-join),
  * so task retries are safe regardless.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right ON key`, with the left side scattered
    * across `salt` buckets and the right side replicated `salt` ways. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltedL = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val saltedR = right.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedL.join(saltedR, Seq(key, "_salt")).drop("_salt")
  }
}
