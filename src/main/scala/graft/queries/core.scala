package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for contract queries.
  *
  * Determinism conventions (SURVEY.md §7.4 — load-bearing for the DuckDB
  * hash-match):
  *   - Money/float aggregation happens in DECIMAL on both engines (exact,
  *     order-independent), and the *final* aggregate is cast to DOUBLE —
  *     casting identical exact decimals gives bit-identical doubles.
  *   - Every query output ends in a total deterministic ORDER BY with a
  *     unique tiebreaker; every window ORDER BY carries a tiebreaker.
  *   - Integer-ish outputs are BIGINT on both sides (DuckDB rank/row_number
  *     return BIGINT; Spark's Int row_number is cast up).
  */
object core {
  type QFn = (SparkSession, String) => DataFrame

  /** Per-JVM unique scratch root. Two JVMs benching the same fixture dir
    * concurrently (the co-tenant scenario BASELINE.md documents) must not
    * race one process's overwrite against the other's read — and
    * String.hashCode of the dir alone can collide across dirs. */
  val scratchRoot: String = new java.io.File(sys.props("java.io.tmpdir"),
    "graft_scratch_" + java.util.UUID.randomUUID().toString.take(8))
    .getAbsolutePath

  /** Collision-resistant key for a fixture dir (r12 advisory fix):
    * String.hashCode has 32 bits and well-known collisions, and a
    * colliding pair of fixture dirs in one JVM would silently SHARE a
    * persisted artifact (the annIndexDir `_built` marker would serve one
    * dir's geometry to the other). MD5 of the path — not security, just
    * a 128-bit injective-in-practice name. */
  def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)

  /** Scratch path unique to (this JVM, fixture dir, tag). */
  def scratch(dir: String, tag: String): String =
    new java.io.File(scratchRoot,
      s"${tag}_" + dirKey(dir)).getAbsolutePath

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  /** Run eager (checkpointing) plan rounds at a reduced shuffle-partition
    * count — iterative stages whose state is DOMAIN-sized (vocabulary,
    * labels) pay per-partition job overhead × rounds at the session's
    * corpus-scan setting; sizing partitions to the state is the same
    * per-stage decision StreamQ makes for state stores. Restored in
    * finally; safe for any key that is partition-count-deterministic
    * (all graft keys are — DeterminismSpec perturbs this very knob).
    *
    * NOT re-entrant and NOT thread-safe on one session: concurrent or
    * nested use races the restore and can leave the session at the
    * reduced count. Verify/Bench run keys sequentially on one thread
    * (the contract every caller relies on); enforced cheaply with a
    * per-session in-flight guard that fails loudly instead of silently
    * clobbering the restore value. */
  private val shufflePartsInFlight =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])
  def withShuffleParts[T](s: SparkSession, n: Int)(body: => T): T = {
    require(shufflePartsInFlight.put(s, java.lang.Boolean.TRUE) == null,
      "withShuffleParts nested or raced on one session — the restore " +
        "of spark.sql.shuffle.partitions would be clobbered; run keys " +
        "sequentially per session")
    val prior = s.conf.get("spark.sql.shuffle.partitions")
    try { s.conf.set("spark.sql.shuffle.partitions", n.toString); body }
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prior)
      shufflePartsInFlight.remove(s)
    }
  }

  /** Cast to an exact decimal before aggregating (both engines). */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(s"decimal($p,$s)")

  def dbl(c: Column): Column = c.cast("double")

  /** Cross-engine rounding of a COMPUTED double. Spark's round() rounds the
    * shortest decimal repr (BigDecimal.valueOf → Double.toString, HALF_UP);
    * DuckDB rounds the binary value — a repr-tie like 0.8053285 splits the
    * engines (hit at sf0.1). floor(x·10^d + 0.5)/10^d is plain double
    * arithmetic, so mirroring it in the oracle SQL is bit-identical by
    * construction. Use round() only on DECIMAL inputs (exact both sides). */
  def rd(c: Column, digits: Int): Column = {
    val p = org.apache.spark.sql.functions.lit(math.pow(10, digits))
    org.apache.spark.sql.functions.floor(c * p +
      org.apache.spark.sql.functions.lit(0.5)) / p
  }
  def r6(c: Column): Column = rd(c, 6)
  /** The same rounding in DuckDB SQL. */
  def r6Sql(expr: String): String =
    s"floor(($expr) * 1000000 + 0.5) / 1000000"

  /** Money sum: round the exact decimal sum to cents BEFORE the double
    * cast. Above ~2^53 decimal *units* (easy at scale 8+ on 100 TB sums)
    * DuckDB's decimal→double double-rounds while Spark's is correctly
    * rounded; at scale 2 the units stay exact in a double and both engines
    * convert identically. */
  def moneySum(c: Column): Column =
    dbl(org.apache.spark.sql.functions.round(
      org.apache.spark.sql.functions.sum(c), 2))

  /** lineitem revenue term, decimal-exact: extprice * (1 - discount). */
  def revenue(ep: Column, disc: Column): Column =
    dec(ep, 18, 4) * (org.apache.spark.sql.functions.lit(1) - dec(disc, 9, 4))

  /** The same revenue term in DuckDB SQL. */
  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"
}
