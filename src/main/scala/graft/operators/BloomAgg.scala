package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Three independent 64-bit key hashes — the Bloom probe set. */
case class BloomProbes(h1: Long, h2: Long, h3: Long)

/** Mergeable Bloom-filter aggregate: builds a fixed-size bitset over a key
  * set, for use as a broadcast runtime pre-filter on the probe side of a
  * join (the pattern behind every engine's "runtime filter" / semi-join
  * reduction — Spark's own InjectRuntimeFilter plants the same
  * BloomFilterAggregate + BloomFilterMightContain pair).
  *
  * Why it matters at 100 TB: a selective dim-side predicate means most
  * fact rows will not survive the join — but a shuffle join still pays to
  * exchange ALL of them. A Bloom bitset over the surviving dim keys is a
  * few KB, rides a 1-row broadcast, and drops non-matching fact rows
  * BEFORE the exchange, so shuffle volume tracks the match rate instead of
  * the fact size. False positives only cost wasted shuffle; the real join
  * afterwards makes the result exact — which is what keeps this key
  * oracle-checkable against the plain join SQL.
  *
  * Mergeability: partial bitsets OR associatively/commutatively, so Spark
  * plans ObjectHashAggregate partial+final and only `words` longs per map
  * partition cross the build-side shuffle.
  *
  * Determinism: the bitset is a pure function of the key SET (OR is
  * order-independent), and the probe recomputes the identical
  * `pmod(xxhash64(key, seed_i), numBits)` positions with codegen'd
  * built-ins — no UDF on the fact-side hot path.
  */
class BloomBitset(numBits: Int) extends Aggregator[BloomProbes, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0)
  private val words = numBits / 64

  private def set(buf: Array[Long], h: Long): Unit = {
    val pos = java.lang.Math.floorMod(h, numBits.toLong)
    buf((pos >>> 6).toInt) |= 1L << (pos & 63L)
  }

  def zero: Array[Long] = new Array[Long](words)

  def reduce(buf: Array[Long], v: BloomProbes): Array[Long] = {
    if (v != null) { set(buf, v.h1); set(buf, v.h2); set(buf, v.h3) }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object BloomBitset {

  /** The three probe hashes for a key (build and probe sides must agree). */
  def probes(key: Column): Seq[Column] =
    Seq(xxhash64(key, lit(1)), xxhash64(key, lit(2)), xxhash64(key, lit(3)))

  /** Aggregate column: bloom_bitset(key) → array<bigint> of numBits/64 words. */
  def agg(numBits: Int)(key: Column): Column = {
    val ps = probes(key)
    udaf(new BloomBitset(numBits)).apply(ps(0), ps(1), ps(2))
  }

  /** Probe predicate over the broadcast bitset — built-ins only (codegen'd
    * on the fact-side hot path): word = bits[pos >> 6], test bit pos & 63.
    * Mirrors `set` above bit-for-bit. */
  def mightContain(bits: Column, key: Column, numBits: Int): Column =
    probes(key).map { h =>
      val pos = pmod(h, lit(numBits.toLong))
      val word = element_at(bits, shiftright(pos, 6).cast("int") + 1)
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
