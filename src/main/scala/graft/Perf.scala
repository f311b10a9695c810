package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe: time isolated sub-pipelines of the heavy queries.
  * Not part of the engine contract; dev tooling only. */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[perf] $name iter$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }

    val docs = Tables(spark, sfDir, "documents")
    val toks = graft.operators.TextOps.tokens(col("text"))

    time("tokenize-only") {
      docs.select(col("doc_id"), size(toks).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }

    val ws = col("ws")
    val sh3 = when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2),
          element_at(ws, i + 3)))))
      .otherwise(array().cast("array<string>"))

    time("shingle-array") {
      docs.select(col("doc_id"), toks.as("ws"))
        .select(col("doc_id"), size(sh3).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }

    val shingles = docs.select(col("doc_id"), toks.as("ws"))
      .select(col("doc_id"), explode(sh3).as("shingle"))

    time("shingle-explode-count") { shingles.count() }

    val hashed = shingles.select(col("doc_id"), xxhash64(col("shingle")).as("shash"))

    time("pairs-join") {
      hashed.select(col("doc_id").as("a_id"), col("shash"))
        .join(hashed.select(col("doc_id").as("b_id"), col("shash")), "shash")
        .filter(col("a_id") < col("b_id")).count()
    }

    time("pairs-join+agg") {
      hashed.select(col("doc_id").as("a_id"), col("shash"))
        .join(hashed.select(col("doc_id").as("b_id"), col("shash")), "shash")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter")).count()
    }

    // minhash signature aggregation
    time("minhash-sig") {
      val sigAggs = Seq(collect_set(col("shash")).as("shset")) ++
        (0 until 8).map(i => min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"mh$i"))
      shingles.select(col("doc_id"), col("shingle"), xxhash64(col("shingle")).as("shash"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"), sigAggs: _*).count()
    }

    // prefix-filter probes
    val dfs = hashed.groupBy(col("shash")).agg(count(lit(1)).as("df"))
    val docSets = hashed.join(dfs, "shash")
      .groupBy(col("doc_id"))
      .agg(transform(
          sort_array(collect_list(struct(col("df"), col("shash")))),
          x => x.getField("shash")).as("ss"),
        count(lit(1)).as("n"))
      .withColumn("plen",
        (col("n") - floor((col("n") * 4 + 4) / 5) + 1).cast("int"))
    time("docSets-agg") { docSets.count() }
    val pref = docSets
      .select(col("doc_id"), explode(slice(col("ss"), lit(1), col("plen"))).as("shash"))
    time("prefix-rows") { pref.count() }
    val cand = pref.select(col("doc_id").as("a_id"), col("shash"))
      .join(pref.select(col("doc_id").as("b_id"), col("shash")), "shash")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    time("prefix-cand") { cand.count() }
    val ver = cand
      .join(docSets.select(col("doc_id").as("a_id"), col("ss").as("sa"), col("n").as("na")), "a_id")
      .join(docSets.select(col("doc_id").as("b_id"), col("ss").as("sb"), col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
    time("verify") { ver.filter(col("inter") > 0).count() }

    // minhash stage probes
    val sigAggs2 = Seq(collect_set(col("shash")).as("shset")) ++
      (0 until 8).map(i => min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"mh$i"))
    val sig2 = shingles.select(col("doc_id"), col("shingle"), xxhash64(col("shingle")).as("shash"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"), sigAggs2: _*)
    val bands2 = sig2.select(col("doc_id"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band_idx"),
          xxhash64(concat(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}"))).as("bucket"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.bucket"))
    time("mh-bands") { bands2.count() }
    val cand2m = bands2.select(col("doc_id").as("a_id"), col("band_idx"), col("bucket"))
      .join(bands2.select(col("doc_id").as("b_id"), col("band_idx"), col("bucket")),
        Seq("band_idx", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    time("mh-cand") { cand2m.count() }
    val ver2m = cand2m
      .join(sig2.select(col("doc_id").as("a_id"), col("shset").as("sa"), col("n").as("na")), "a_id")
      .join(sig2.select(col("doc_id").as("b_id"), col("shset").as("sb"), col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
    time("mh-verify") { ver2m.filter(col("inter") >= 0).count() }

    spark.stop()
  }
}
