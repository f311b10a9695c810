package graft

import org.apache.spark.sql.functions._
import graft.expressions.DotProduct

/** The custom Catalyst expression: interpreted eval, codegen path, SQL
  * registration, implicit float→double array cast, and agreement with the
  * higher-order-function fold it replaces. */
class DotProductSpec extends SparkSpec {

  test("graft_dot matches the HOF fold on real embeddings (both eval paths)") {
    DotProduct.register(spark)
    val v = transform(col("embedding"), x => x.cast("double"))
    val hof = aggregate(zip_with(v, v, (a, b) => a * b), lit(0.0),
      (acc, x) => acc + x)
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      val rows = Tables(spark, sf, "embeddings")
        .select(call_function("graft_dot", v, v).as("cg"), hof.as("ref"))
        .collect()
      assert(rows.length > 0)
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        s"$codegen: ${r.getDouble(0)} != ${r.getDouble(1)}"))
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("graft_dot is callable from SQL text with implicit float-array cast") {
    DotProduct.register(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM emb_v " +
        "ORDER BY vec_id LIMIT 5").collect()
    assert(r.length == 5 && r.forall(_.getDouble(1) > 0))
  }

  test("null and length-mismatch behavior") {
    DotProduct.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)), " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d))").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 3.0)
  }
}
