package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.TextOps

/** Property-based invariants (scalacheck driven through Spark on batched
  * generated data): algebraic laws that must hold for any input, not just
  * the fixtures. */
class PropertySpec extends SparkSpec {

  private def holds(prop: Prop): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
      .passed

  test("CMS estimates never undercount, for any seeded word stream " +
    "(property)") {
    import spark.implicits._
    import java.io.ByteArrayInputStream
    val streamGen = Gen.listOfN(300,
      Gen.oneOf("a", "b", "cc", "ddd", "e", "a", "a")) // skewed on purpose
    val prop = Prop.forAll(streamGen, Gen.chooseNum(1, 1000)) { (ws, seed) =>
      val df = ws.toDF("word")
      val sk = df.agg(expr(
        s"count_min_sketch(word, 0.01d, 0.9d, $seed)")).head()
        .getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new ByteArrayInputStream(sk))
      val exact = ws.groupBy(identity).view.mapValues(_.size)
      exact.forall { case (w, c) =>
        cms.estimateCount(w.getBytes("UTF-8")) >= c
      }
    }
    assert(holds(prop))
  }

  test("spearman_rho is invariant under strictly monotone transforms " +
    "of either variable (property of ranks)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rho_prop").toString
    val dir2 = java.nio.file.Files.createTempDirectory("rho_prop2").toString
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(400)(("A",
      (rng.nextInt(50) + 1).toDouble, rng.nextInt(11) * 0.01))
    rows.toDF("l_returnflag", "l_quantity", "l_discount")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    // x -> x^3 + 7 and y -> exp(y) are strictly increasing: every rank
    // (and hence rho) must survive both transforms bit-for-bit.
    rows.map { case (f, q, d) => (f, q * q * q + 7.0, math.exp(d)) }
      .toDF("l_returnflag", "l_quantity", "l_discount")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir2/lineitem.parquet")
    val a = SparkEntry.queries("spearman_rho")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = SparkEntry.queries("spearman_rho")(spark, dir2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b, s"rho moved under a monotone transform: $a vs $b")
  }

  test("text normalization is idempotent (property)") {
    import spark.implicits._
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaStr, Gen.const("  "),
      Gen.const("\t"), Gen.const("MiXeD"))).map(_.mkString(" "))
    val samples = Gen.listOfN(200, strGen).sample.get
    val df = samples.toDF("text")
      .withColumn("once", TextOps.normText(col("text")))
      .withColumn("twice", TextOps.normText(TextOps.normText(col("text"))))
    assert(df.filter(col("once") =!= col("twice")).count() == 0)
  }

  test("graft_dot is symmetric and self-dot is non-negative (property)") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1e3, 1e3))
    val prop = Prop.forAll(vecGen, vecGen) { (a, b) =>
      val x = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray)
      val y = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)
      val e = graft.expressions.DotProduct(null, null)
      val ab = e.nullSafeEval(x, y).asInstanceOf[Double]
      val ba = e.nullSafeEval(y, x).asInstanceOf[Double]
      val aa = e.nullSafeEval(x, x).asInstanceOf[Double]
      ab == ba && aa >= 0.0
    }
    assert(holds(prop))
  }

  test("CharBigrams ≡ reference scan over code points, any unicode (property)") {
    // Reference model: walk CODE POINTS (not bytes), emit every adjacent
    // pair where both are in 'a'..'z'. The expression scans UTF-8 bytes;
    // equivalence rests on continuation/lead bytes being >= 0x80 — this
    // property hammers that claim with arbitrary unicode (incl. surrogate
    // pairs, which Gen.asciiStr alone would never produce).
    def model(s: String): Seq[String] = {
      val cps = s.codePoints().toArray
      (0 until cps.length - 1).collect {
        case i if cps(i) >= 'a' && cps(i) <= 'z' &&
          cps(i + 1) >= 'a' && cps(i + 1) <= 'z' =>
          new String(Character.toChars(cps(i))) +
            new String(Character.toChars(cps(i + 1)))
      }.toSeq
    }
    val fragGen = Gen.frequency(
      (5, Gen.choose('a', 'z').map(_.toString)),
      (2, Gen.choose('A', 'Z').map(_.toString)),
      (1, Gen.choose(' ', '/').map(_.toString)),
      (1, Gen.choose('À', 'ɏ').map(_.toString)), // latin w/ diacritics
      (1, Gen.choose('぀', 'ヿ').map(_.toString)), // kana
      (1, Gen.const("😀")))                       // surrogate pair
    val strGen = Gen.listOf(fragGen).map(_.mkString)
    val prop = Prop.forAll(strGen) { s =>
      val got = graft.expressions.CharBigrams(
        org.apache.spark.sql.catalyst.expressions.Literal(s)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == model(s)
    }
    assert(holds(prop))
  }

  test("session count is invariant under input row order (property)") {
    import spark.implicits._
    // random per-user event times; feed them in two different orders
    val evGen = for {
      u <- Gen.chooseNum(1L, 5L)
      t <- Gen.chooseNum(0L, 86400L * 1000000L)
    } yield (u, t)
    val sample = Gen.listOfN(300, evGen).sample.get.zipWithIndex
      .map { case ((u, ts), i) => (u, ts, i.toLong) }
    def sessions(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
      val df = rows.toDF("user_id", "ts_us", "event_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val wr = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      df.withColumn("is_new",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          (col("ts_us") - lag(col("ts_us"), 1).over(w)) > 1800000000L, 1L)
          .otherwise(0L))
        .withColumn("sid", sum(col("is_new")).over(wr))
        .groupBy(col("user_id")).agg(max(col("sid")).as("n_sessions"))
        .orderBy(col("user_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(sessions(sample) == sessions(sample.reverse))
    assert(sessions(sample) == sessions(scala.util.Random.shuffle(sample)))
  }

  test("union/except cardinality laws on events") {
    val e = Tables(spark, sf, "events")
    def users(tpe: String) =
      e.filter(col("event_type") === tpe).select("user_id").distinct()
    val view = users("view"); val purchase = users("purchase")
    val union = view.union(purchase).distinct().count()
    val inter = view.intersect(purchase).count()
    val except = view.except(purchase).count()
    assert(union == view.count() + purchase.count() - inter)
    assert(except == view.count() - inter)
  }

  test("prefix filtering is complete: every Jaccard>=0.8 pair is a candidate (property)") {
    // Pure model of neardup_pairs' math: global (df, id) rarity order,
    // prefix length n - ceil(0.8n) + 1 via the same integer arithmetic.
    // The WWW'07 lemma says the min shared element in the global order
    // falls inside BOTH prefixes — scalacheck hunts for counterexamples.
    val docGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 20)).map(_.toSet))
    val corpusGen = Gen.listOfN(12, docGen).map(_.filter(_.nonEmpty))
    val prop = Prop.forAll(corpusGen) { corpus =>
      val df = corpus.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
      def sorted(d: Set[Int]) = d.toSeq.sortBy(x => (df(x), x))
      def plen(n: Int) = n - (4 * n + 4) / 5 + 1
      def prefix(d: Set[Int]) = sorted(d).take(plen(d.size)).toSet
      val pairs = for {
        (a, i) <- corpus.zipWithIndex
        (b, j) <- corpus.zipWithIndex if i < j
        inter = (a intersect b).size
        if inter.toDouble / (a.size + b.size - inter) >= 0.8
      } yield (a, b)
      pairs.forall { case (a, b) => (prefix(a) intersect prefix(b)).nonEmpty }
    }
    assert(holds(prop))
  }

  test("simhash 2x16-bit bands are complete for hamming<=1 (property)") {
    val sigGen = Gen.chooseNum(0L, (1L << 32) - 1)
    // flip zero or one random bit to build a hamming<=1 partner
    val pairGen = for {
      a <- sigGen
      flip <- Gen.chooseNum(-1, 31)
    } yield (a, if (flip < 0) a else a ^ (1L << flip))
    val prop = Prop.forAll(pairGen) { case (a, b) =>
      val sameHigh = (a >>> 16) == (b >>> 16)
      val sameLow = (a & 0xFFFFL) == (b & 0xFFFFL)
      java.lang.Long.bitCount(a ^ b) > 1 || sameHigh || sameLow
    }
    assert(holds(prop))
  }
}
