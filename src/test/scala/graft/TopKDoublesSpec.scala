package graft

import org.apache.spark.sql.functions._
import graft.expressions.TopKDoubles

/** The TypedImperativeAggregate surface: heap-buffer top-k must agree
  * with the window formulation under forced partial aggregation, survive
  * its own serialization, and stay usable from SQL text. */
class TopKDoublesSpec extends SparkSpec {

  test("graft_topk == window row_number<=k under partial aggregation") {
    TopKDoubles.register(spark)
    // 13 partitions force per-partition partials + serialized merge
    val li = Tables(spark, sf, "lineitem").repartition(13)
    val viaAgg = li.groupBy(col("l_returnflag"))
      .agg(call_function("graft_topk", col("l_extendedprice"), lit(7))
        .as("tp"))
      .select(col("l_returnflag"), posexplode(col("tp")).as(Seq("i", "p")))
      .select(col("l_returnflag"), col("i"), col("p"))
      .orderBy(col("l_returnflag"), col("i"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc)
    val viaWin = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select(col("l_returnflag"), (col("rn") - 1).as("i"),
        col("l_extendedprice").as("p"))
      .orderBy(col("l_returnflag"), col("i"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("group smaller than k returns all its values, sorted descending") {
    TopKDoubles.register(spark)
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0))
      .toDF("g", "v")
      .groupBy(col("g"))
      .agg(call_function("graft_topk", col("v"), lit(5)).as("tp"))
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(rows.toSeq == Seq(("a", Seq(3.0, 1.0)), ("b", Seq(2.0))))
  }

  test("serialize/deserialize round-trips the heap buffer exactly") {
    val agg = TopKDoubles(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), 3)
    val buf = agg.createAggregationBuffer()
    Seq(5.0, 1.0, 9.0, 7.0, 3.0).foreach { v =>
      buf.add(v); if (buf.size > 3) buf.poll()
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == buf.size)
    assert(back.iterator().asScala.toSet == buf.iterator().asScala.toSet)
  }

  test("usable from SQL text after registration") {
    TopKDoubles.register(spark)
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_tk")
    val got = spark.sql(
      "SELECT graft_topk(o_totalprice, 2) AS tp FROM orders_tk")
      .collect()(0).getSeq[Double](0)
    assert(got.length == 2 && got(0) >= got(1))
  }

  private implicit class JIterOps[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
