package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-4 curation/graph keys — properties the
  * golden/oracle gates can't see because they hold for ANY input, not
  * just the fixture: quantization range/error bounds, contamination-rate
  * bounds and split soundness, triangle-count consistency against the
  * naive all-triples definition, and interpolation staying inside the
  * surrounding observation envelope.
  */
class CurationSpec extends SparkSpec {

  test("quantize_embed: q in [-127,127], saturation consistent, sse bounded") {
    val rows = SparkEntry.queries("quantize_embed")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val scale = r.getAs[Double]("scale")
      val nSat = r.getAs[Long]("n_sat")
      val sse = r.getAs[Double]("sse")
      assert(scale > 0, "fixture has no zero vectors")
      assert(nSat >= 1, "the max-abs element must saturate to ±127")
      assert(nSat <= 64)
      // per-element |err| ≤ step/2 with step = scale/127 ⇒
      // sse ≤ 64·(scale/254)² (+ rounding slack)
      val bound = 64 * math.pow(scale / 254.0, 2) + 1e-9
      assert(sse >= 0 && sse <= bound, s"sse $sse above bound $bound")
    }
  }

  test("contamination_overlap: rates in [0,1], hits never exceed ngrams, eval split only") {
    val rows = SparkEntry.queries("contamination_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("doc_id") % 17 == 0, "only eval docs may appear")
      val n = r.getAs[Long]("n_ngrams"); val h = r.getAs[Long]("n_hit")
      val rate = r.getAs[Double]("rate")
      assert(h >= 0 && h <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("triangle_count matches the naive all-triples definition") {
    val r = SparkEntry.queries("triangle_count")(spark, sf).collect().head
    // Naive mirror: undirected edge set as a local set, count all
    // vertex triples pairwise connected. Vocabulary is tiny at sf0.001,
    // so the O(V³) check is cheap — and it exercises a completely
    // different counting path than the degree-oriented wedge join.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(col("text")).collect().flatMap(
      _.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(2)
        .collect { case Array(a, b) if a != b => if (a < b) (a, b) else (b, a) })
    val edges = toks.toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = (for {
      i <- verts.indices; j <- (i + 1) until verts.size
      if edges.contains((verts(i), verts(j)))
      k <- (j + 1) until verts.size
      if edges.contains((verts(j), verts(k))) &&
        edges.contains((verts(i), verts(k)))
    } yield 1).size.toLong
    assert(r.getAs[Long]("n_triangles") == naive)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_verts") == verts.size.toLong)
  }

  test("gap_fill_interp: interpolated values stay inside the observation envelope") {
    val rows = SparkEntry.queries("gap_fill_interp")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    for ((_, rs) <- byType) {
      val obs = rs.filter(!_.isNullAt(2)).map(_.getAs[Double]("v"))
      val lo = obs.min; val hi = obs.max
      for (r <- rs) {
        val vli = r.getAs[Double]("v_li")
        assert(vli >= lo - 1e-6 && vli <= hi + 1e-6,
          "interpolation cannot leave the min/max envelope of observations")
      }
      // filled series is complete: no nulls remain
      assert(rs.forall(!_.isNullAt(3)))
      // the injected day%7==3 gaps mean interpolation must actually fire
      assert(rs.exists(r => r.isNullAt(2)),
        "gap injection must leave missing days for the fill to repair")
    }
  }

  test("dedup pipeline: clusters partition the corpus; reps are members") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val rows = SparkEntry.queries("dedup_pipeline_e2e")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs,
      "cluster sizes must sum to the corpus size (a partition)")
    assert(rows.forall(r => r.getAs[Long]("n_docs") >= 1))
    // representative of a singleton cluster is the cluster id itself
    rows.filter(_.getAs[Long]("n_docs") == 1).foreach { r =>
      assert(r.getAs[Long]("rep_doc") == r.getAs[Long]("cluster"))
    }
  }

  test("pack_sequences: bins partition the corpus and conserve tokens") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()
    val totalTok = docs
      .select(size(graft.operators.TextOps.tokens(col("text")))
        .cast("long").as("tok"))
      .agg(sum(col("tok"))).collect()(0).getLong(0)
    val bins = SparkEntry.queries("pack_sequences")(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == total,
      "every doc lands in exactly one bin (a partition)")
    assert(bins.map(_.getAs[Long]("sum_tok")).sum == totalTok,
      "packing conserves the token count")
    // bins are contiguous doc_id ranges per lang: spans never interleave
    bins.groupBy(_.getAs[String]("lang")).foreach { case (_, bs) =>
      val spans = bs.sortBy(_.getAs[Long]("bin"))
        .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      spans.sliding(2).foreach {
        case Array((_, aLast), (bFirst, _)) => assert(aLast < bFirst)
        case _ =>
      }
    }
  }

  test("domain_mix_sample: per-source quota exact, ranks dense from 1") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nBySrc = docs.groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val kept = SparkEntry.queries("domain_mix_sample")(spark, sf).collect()
    kept.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val w = src.replaceAll("\\D+", "").toInt % 4 + 1
      val quota = math.ceil(w * nBySrc(src) / 4.0).toLong
      assert(rows.length == quota, s"$src kept ${rows.length} != $quota")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"$src ranks not dense")
    }
  }

  test("dsir_sample: dense per-source ranks, no replacement, and the " +
    "Efraimidis-Spirakis optimality property against a local key mirror") {
    val smp = SparkEntry.queries("dsir_sample")(spark, sf).collect()
    assert(smp.nonEmpty)
    val bySrc = smp.groupBy(_.getAs[String]("source"))
    for ((src, rows) <- bySrc) {
      val ranks = rows.map(_.getAs[Long]("smp_rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"$src ranks not dense")
      assert(ranks.length <= graft.queries.CurationQ.DsirSampleK)
    }
    // without replacement: one key per doc, a doc appears at most once
    assert(smp.map(_.getAs[Long]("doc_id")).distinct.length == smp.length)
    // ES mirror: recompute every scored doc's key locally with the
    // ENGINE'S decimal pinning (r14 advisory: a plain double mirror
    // drifts up to ~3e-7 after the exp(±8) amplification and can order
    // near-tied keys oppositely — flaky): ln(u) and exp(-av) each
    // HALF_UP-rounded to 10 dp exactly as dec(·,14,10) does, multiplied
    // exactly in BigDecimal. Per source, every SAMPLED key must
    // dominate every unsampled key — no tolerance needed.
    val avg = SparkEntry.queries("dsir_weight")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_avg")).toMap
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def esKey(id: Long): BigDecimal = {
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(12), 16)
      val u = (h + 0.5) / 281474976710656.0
      val av = math.max(-graft.queries.CurationQ.DsirClip,
        math.min(graft.queries.CurationQ.DsirClip, avg(id)))
      val lnu = BigDecimal(math.log(u))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      val w = BigDecimal(math.exp(-av))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      lnu * w
    }
    val sampled = smp.map(_.getAs[Long]("doc_id")).toSet
    for ((src, rows) <- bySrc) {
      val inKeys = rows.map(r => esKey(r.getAs[Long]("doc_id")))
      val outKeys = avg.keys
        .filter(id => srcOf(id) == src && !sampled.contains(id))
        .map(esKey)
      if (outKeys.nonEmpty)
        assert(inKeys.min >= outKeys.max,
          s"$src sampled a dominated key: min(in)=${inKeys.min} " +
            s"< max(out)=${outKeys.max}")
    }
  }
}
