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

  // ---- two-phase (bucketed) prefix aggregation -------------------------
  // The r12 weak class was WindowExec partitioned by a BOUNDED-cardinality
  // key (source ≈ 6, lang ≈ 5, split = 3) over corpus-growing rows: each
  // shard is a single-task sort of ~N/|key| rows — the global-window
  // failure mode divided by a constant, so it still dies at 100×. The
  // scale-safe equivalent is the classic two-phase prefix sum:
  //   1. bucket every row by an ORDER-PRESERVING, BOUNDED-cardinality
  //      prefix of the sort key (md5 hex prefix → ≤256 buckets; key div
  //      width with width ∝ the key domain → ≤B buckets),
  //   2. one map-side-combinable groupBy(part, bucket) partial-sum,
  //   3. the bucket OFFSETS via a window over the bounded (part × bucket)
  //      aggregate (≤ |part|·B rows — never corpus-sized),
  //   4. broadcast the offsets back and finish with a window partitioned
  //      by (part, bucket) — B× the parallelism of the weak plan.
  // Output is bit-identical to sum(value).over(partitionBy(part)
  // .orderBy(order)) because the bucket is monotone in the leading order
  // column, so bucket-major order IS the order; integral sums are exact.

  /** Number of buckets per partition key. 256 spreads a 100 TB shard's
    * sort across ~256 tasks per key value; the offset table stays ≤
    * |part|·256 rows — broadcast-sized at any corpus size. */
  val PrefixBuckets = 256

  /** Order-preserving bounded bucket for an md5-hex sort key: the first
    * two hex chars — equal-width prefix of a fixed-length lowercase hex
    * string, so lexicographic order on the full key implies bucket order.
    */
  def md5Bucket(pri: Column): Column =
    org.apache.spark.sql.functions.substring(pri, 1, 2)

  /** Order-preserving bounded bucket for a non-negative integral sort key
    * with known domain max: key div width, width sized so the bucket
    * count stays ≤ PrefixBuckets as the domain grows. `domainMax` must be
    * an O(metadata) statistic (Tables.statsMaxLong — parquet footer
    * max), never a data scan. */
  def idBucket(key: Column, domainMax: Long): Column = {
    val w = org.apache.spark.sql.functions.lit(
      domainMax / PrefixBuckets + 1L)
    val k = key.cast("long")
    // (k - k%w)/w: Spark's `/` on integrals is DOUBLE division; dividing
    // the exact multiple keeps the integer quotient exact (plain k/w can
    // round up across a bucket edge when the real quotient sits within
    // half an ulp below an integer).
    ((k - k % w) / w).cast("long")
  }

  /** Inclusive running sum of `value` over rows ordered by `order` within
    * each `part` group — the two-phase re-plan of
    * `sum(value).over(Window.partitionBy(part).orderBy(order))` for
    * bounded `part` over corpus-growing rows. `bucket` MUST be an
    * order-preserving bounded bucketing of the leading order column (see
    * md5Bucket / idBucket); `value` must be integral (exact sums).
    * Optionally also attaches the per-part total as `totalOut` (computed
    * on the bounded bucket aggregate — replaces count/sum().over(
    * partitionBy(part)), the other half of the weak shape).
    *
    * PRECONDITIONS (r13 advisory — violations are silent, not errors):
    *   - `part` and the bucket column must be NON-NULL: the offset join
    *     is plain equality, so a NULL partition or bucket key DROPS the
    *     row, where the window it replaces would keep NULL as an
    *     ordinary partition value. Coalesce nullable keys first.
    *   - `order` must be UNIQUE within (part, bucket): the inner window
    *     uses the default RANGE frame, so tied order values all receive
    *     the tie group's maximum running sum (rank semantics), not
    *     distinct row positions. Every call site carries a unique
    *     tiebreaker (TwoPhaseSpec pins the equivalence under that
    *     contract). */
  def bucketedPrefixSum(df: DataFrame, part: Seq[String], bucketC: Column,
      order: Seq[Column], value: Column, out: String,
      totalOut: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__g_bkt", bucketC).withColumn("__g_val", value)
    val wOff = Window.partitionBy(part.map(col): _*).orderBy(col("__g_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bsums = b.groupBy((part :+ "__g_bkt").map(col): _*)
      .agg(sum(col("__g_val")).cast("long").as("__g_bsum"))
    val offs0 = bsums
      .withColumn("__g_off", coalesce(sum(col("__g_bsum")).over(wOff), lit(0L)))
    val offs = totalOut match {
      case Some(tot) => offs0.withColumn(tot,
        sum(col("__g_bsum")).over(Window.partitionBy(part.map(col): _*)))
      case None => offs0
    }
    val wIn = Window.partitionBy((part :+ "__g_bkt").map(col): _*)
      .orderBy(order: _*)
    b.join(broadcast(offs.drop("__g_bsum")), part :+ "__g_bkt")
      .withColumn(out,
        (col("__g_off") + sum(col("__g_val")).over(wIn)).cast("long"))
      .drop("__g_bkt", "__g_val", "__g_off")
  }

  /** row_number() over (partitionBy(part).orderBy(order)), two-phase:
    * bucketedPrefixSum of 1 — BIGINT ranks, same values. Inherits
    * bucketedPrefixSum's preconditions: non-null part/bucket keys and a
    * UNIQUE `order` within (part, bucket) — with ties the RANGE-framed
    * inner sum hands every tied row the tie group's max rank, not
    * distinct row_number values. */
  def bucketedRowNumber(df: DataFrame, part: Seq[String], bucket: Column,
      order: Seq[Column], out: String,
      totalOut: Option[String] = None): DataFrame =
    bucketedPrefixSum(df, part, bucket, order,
      org.apache.spark.sql.functions.lit(1L), out, totalOut)

  /** Artifact-registry root (r14, verdict #6): every persisted-artifact
    * marker/write/read path resolves through the Hadoop `FileSystem` API
    * of THIS root's scheme (the AuditSink pattern), so the registry works
    * unchanged on `file:` (the local default), `hdfs:`, or an
    * object-store scheme — at cluster scale a deployment points
    * `-Dgraft.registry.root=hdfs://…/graft_registry` at durable shared
    * storage and every executor-restart / pipeline-restart re-LOADS
    * instead of retraining. Default = the per-JVM scratch root (local
    * runs stay co-tenant-safe: two JVMs benching the same fixture never
    * share a half-written artifact). */
  def registryRoot: String =
    sys.props.getOrElse("graft.registry.root", scratchRoot)

  /** How long a registry loser waits for a competing writer's commit
    * (and after which a writer lock counts as stale and is broken).
    * Deployments with slow artifact builds raise it; RegistrySpec's
    * crashed-writer test lowers it. */
  private def registryLockTimeoutMs: Long =
    sys.props.getOrElse("graft.registry.lockTimeoutMs", "600000").toLong

  /** Cross-writer ATOMIC publish of an artifact directory (r15, verdict
    * #1): materialize `parent/name` such that concurrent sessions
    * sharing one durable registry root (`-Dgraft.registry.root=hdfs://…`)
    * never observe a partial, mixed, or vanishing artifact. Protocol
    * (the AuditSink 2PC shape, over any Hadoop `FileSystem`):
    *
    *   1. fast path — `name/_built` exists → committed, return;
    *   2. writer ELECTION — atomic `createNewFile(parent/._lock_name)`;
    *      exactly one concurrent writer wins (HDFS/object-store create
    *      is atomic; local FS uses File.createNewFile);
    *   3. the winner builds into a private `parent/._tmp_name_<uuid>`
    *      generation dir, stamps `_built` INSIDE it, then commits with
    *      ONE `fs.rename(tmp, dest)` — artifact and marker appear
    *      atomically, fully formed (parquet scans ignore `_`/`.`
    *      prefixed files, the _SUCCESS convention, so the marker rides
    *      inside the data dir for free);
    *   4. losers poll for the marker; a lock older than
    *      `graft.registry.lockTimeoutMs` (writer died mid-build) is
    *      broken as stale and the election re-runs.
    *
    * A crashed pre-commit writer leaves only a dot-prefixed generation
    * dir readers can never resolve; a crashed post-commit writer leaves
    * a committed artifact plus an eventually-broken lock. Readers that
    * saw the marker keep reading `dest` — nothing ever rewrites a
    * committed artifact in place. */
  def publishOnce(s: SparkSession, parent: org.apache.hadoop.fs.Path,
      name: String)(
      writeTo: org.apache.hadoop.fs.Path => Unit): org.apache.hadoop.fs.Path = {
    val fs = parent.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(parent, name)
    val marker = new org.apache.hadoop.fs.Path(dest, "_built")
    if (fs.exists(marker)) return dest
    fs.mkdirs(parent)
    val lock = new org.apache.hadoop.fs.Path(parent, s"._lock_$name")
    val deadline = System.currentTimeMillis + 2 * registryLockTimeoutMs
    while (!fs.exists(marker)) {
      require(System.currentTimeMillis < deadline,
        s"artifact $name failed to publish within 2x lock timeout")
      val won =
        try fs.createNewFile(lock)
        catch { case _: java.io.IOException => false }
      if (won) {
        try {
          if (!fs.exists(marker)) {
            val tmp = new org.apache.hadoop.fs.Path(parent,
              s"._tmp_${name}_" + java.util.UUID.randomUUID.toString.take(8))
            writeTo(tmp)
            fs.createNewFile(new org.apache.hadoop.fs.Path(tmp, "_built"))
            // dest without an internal marker = pre-protocol garbage
            if (fs.exists(dest)) fs.delete(dest, true)
            require(fs.rename(tmp, dest),
              s"registry commit rename failed: $tmp -> $dest")
          }
        } finally fs.delete(lock, false)
      } else {
        // another writer holds the lock: wait for its commit, breaking
        // the lock as stale if the writer died mid-build
        var waited = 0L
        while (!fs.exists(marker) && fs.exists(lock) &&
            waited < registryLockTimeoutMs) {
          Thread.sleep(100); waited += 100
        }
        if (!fs.exists(marker) && fs.exists(lock) &&
            waited >= registryLockTimeoutMs)
          try fs.delete(lock, false)
          catch { case _: java.io.IOException => () }
      }
    }
    dest
  }

  /** Per-JVM scratch SIDECAR with the atomic publish protocol (r16,
    * verdict task #5): the PQ/OPQ/IVF-PQ reconstruction tables and the
    * IVF coarse assignment are built once per (JVM, fixture dir) and
    * read by every later call — including concurrently from the recall
    * report's chain threads. The old shape gated on `dir.exists()`
    * under one global mutex: a write that died mid-flight left a
    * partial dir that `exists()` treated as built (poisoned for the
    * JVM's lifetime), and the single lock serialized INDEPENDENT tier
    * builds. Now each sidecar publishes through [[publishOnce]]
    * (private generation dir + one atomic rename, `_built` marker
    * inside), with a per-NAME in-process lock as the fast path — a
    * crashed build leaves only an unreachable dot-prefixed temp dir,
    * and distinct sidecars build concurrently. */
  private val sidecarLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def sidecarOnce(s: SparkSession, dir: String, tag: String)(
      write: org.apache.hadoop.fs.Path => Unit): String = {
    val name = s"${tag}_" + dirKey(dir)
    val lock = sidecarLocks.computeIfAbsent(name, _ => new Object)
    lock.synchronized {
      publishOnce(s, new org.apache.hadoop.fs.Path(
        new java.io.File(scratchRoot, "sidecars").getAbsolutePath),
        name)(write).toString
    }
  }

  /** Persist-once artifact store (r13) — the annIndexDir `_built`-marker
    * pattern generalized: build the DataFrame ONCE per (registry root,
    * fixture dir, name), write it to registry parquet, and serve every
    * later call — including from a DIFFERENT SparkSession (a pipeline
    * restart) or a DIFFERENT driver sharing the same durable root —
    * from the persisted copy instead of recomputing. The tokenizer/LM
    * registry (BPE merges, unigram pieces, LM-gate threshold) rides
    * this; `build` is by-name so the ensured path never re-plans it.
    * All filesystem ops go through the Hadoop `FileSystem` of
    * [[registryRoot]]'s scheme (r14); the publish itself is the atomic
    * [[publishOnce]] election+rename protocol (r15), so two drivers
    * racing one shared root build at most twice and commit exactly one
    * winner, never a torn artifact. The JVM-level synchronized is only
    * the in-process fast path (saves local threads the lock-file RTT). */
  def persistedArtifact(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    val path = this.synchronized {
      val root = new org.apache.hadoop.fs.Path(
        registryRoot, "registry_" + dirKey(dir))
      publishOnce(s, root, name) { tmp =>
        build.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      }.toString
    }
    s.read.parquet(path)
  }

  /** Checkpoint mode (r15, verdict #7): `-Dgraft.checkpoint.mode=reliable`
    * flips EVERY eager-checkpoint swap point (the SCALING.md inventory —
    * iterative lineage cuts in kmeans/Lloyd rounds, label propagation,
    * SGNS/GBM training loops, graph contractions) from executor-local
    * blocks (fast; lost with an executor, recomputed from lineage) to
    * RELIABLE `checkpoint()` files on `-Dgraft.checkpoint.dir` — a
    * cluster deployment points that at durable HDFS/object storage and
    * a lost executor replays NOTHING: the truncated lineage re-reads
    * the checkpoint instead of re-running every earlier round. Local
    * default stays `localCheckpoint` (no serialize-to-disk tax). */
  def checkpointMode: String =
    sys.props.getOrElse("graft.checkpoint.mode", "local")

  /** `.ckpt()` — the engine's ONLY eager-checkpoint spelling; dispatches
    * on [[checkpointMode]]. Both modes cut lineage eagerly, so plan
    * shape and results are identical (CheckpointModeSpec pins an
    * iterative key's hashes across modes); only the storage substrate
    * differs. */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame =
      if (checkpointMode == "reliable") {
        val sc = df.sparkSession.sparkContext
        ensureCheckpointDir(sc, sys.props.getOrElse("graft.checkpoint.dir",
          new java.io.File(scratchRoot, "ckpt").getAbsolutePath))
        df.checkpoint()
      } else df.localCheckpoint()
  }

  // setCheckpointDir appends a UUID subdir, so "already set to what we
  // want" can't be read back off the context — remember what we set.
  private val ckptDirSet = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String])
  private def ensureCheckpointDir(sc: org.apache.spark.SparkContext,
      want: String): Unit =
    if (ckptDirSet.get(sc) != want) {
      sc.setCheckpointDir(want); ckptDirSet.put(sc, want)
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
