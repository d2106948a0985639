package graft.dedup

import graft.model.CrawlConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Two-phase URL-seen dedup (SURVEY.md §3.3 J2 — THE hot join at 10^10
  * rows):
  *
  *   phase 1 (optimization): a broadcast Bloom filter over all seen
  *     fingerprints pre-filters candidates — at a 10^10 frontier the
  *     overwhelming majority of rediscovered URLs never reach the
  *     exact-join shuffle.
  *   phase 2 (authority):   an exact `LEFT ANTI` join against the `seen`
  *     table. Correctness is FPP-INDEPENDENT by construction: a Bloom
  *     false positive merely sends a genuinely-new URL into the anti-join,
  *     which keeps it (the anti-join only drops true members); false
  *     negatives are impossible for inserted keys.
  *
  * The filter is built INCREMENTALLY: each round only the new seen delta
  * is folded into the persistent [[FastBloom]] (`orInPlace`), then
  * checkpointed next to the snapshot manifests so resume does not re-scan
  * 10^10 rows to rebuild it.
  *
  * SHARDING (`CrawlConfig.seenShardBits`): at 10^10 fingerprints and 1%
  * FPP a monolithic filter is ~12 GB — one broadcast every executor must
  * fully hold. With 2^b shards, each keyed by Spark's own
  * `HashPartitioning` function (`pmod(murmur3(fingerprint, seed 42), n)`),
  * the probe first `repartition(n, fingerprint)`s the candidates so every
  * task sees exactly one shard value and therefore fetches exactly ONE
  * shard broadcast (~12 GB / 2^b) — per-executor filter residency shrinks
  * to the shards its tasks actually probe. The shard id is computed as an
  * explicit COLUMN (not from the task's partition id), so a plan that
  * re-orders the filter only loses locality, never correctness. The
  * candidate shuffle this costs is the same key the phase-2 anti-join
  * shuffles on anyway. `seenShardBits = 0` (default) keeps the single
  * filter with a pure map-side probe — right below the multi-GB regime.
  *
  * Delta filters are built by ONE RDD job over the (cached) delta:
  * per-partition partials `treeAggregate` into a single shard array
  * EXECUTOR-SIDE (depth 2), so the driver receives exactly one copy
  * regardless of partition count — the per-task-partial-to-driver
  * `maxResultSize` failure mode is structurally impossible, and the
  * merge itself is a bulk word-OR (the previous sketch-aggregate merge
  * profiled at 7.5s of single-task CPU per round on stream-deserialized
  * partials; see FastBloom).
  *
  * Crash consistency: the sidecar is TAGGED with the snapshot id it
  * corresponds to and written BEFORE the store flips `_latest` to that
  * snapshot. A filter AHEAD of the committed seen table (crash between
  * sidecar write and manifest flip) is safe — the extra fingerprints are
  * Bloom positives routed into the exact anti-join, which keeps them; a
  * filter BEHIND the seen table would produce false negatives that bypass
  * the anti-join, so any other tag mismatch forces `rebuildFrom(seen)`.
  * An EMPTY delta still rewrites the sidecar under the new tag (no Spark
  * job): returning early would leave the tag one snapshot behind after
  * the manifest flips, forcing the next resume into the full rescan the
  * sidecar exists to avoid. The sidecar records its shard count and
  * per-shard (numBits, numHashes) sizing, so resume under a changed
  * CrawlConfig detects the drift and rebuilds instead of merging
  * incompatible filters.
  */
final class SeenSet(cfg: CrawlConfig, stateDir: String, latestSnapshot: Option[Int]) {

  private val bloomPath: Path = Paths.get(stateDir, "seen.bloom")

  val nShards: Int = 1 << cfg.seenShardBits

  private def freshShards(): Array[FastBloom] =
    Array.fill(nShards)(FastBloom.create(
      math.max(1L, cfg.bloomExpectedItems / nShards), cfg.bloomFpp))

  private var shards: Array[FastBloom] = null

  /** true iff a checkpointed filter valid for `latestSnapshot` AND the
    * current cfg sizing was found.
    */
  val loadedFromCheckpoint: Boolean = readSidecar() match {
    case Some((tag, loaded)) =>
      val latest = latestSnapshot.getOrElse(-1)
      // tag == latest: clean. tag == latest + 1: crash between sidecar
      // write and manifest flip — ahead-by-one, FP-safe (see scaladoc).
      val want = freshShards()
      val ok = (tag == latest || tag == latest + 1) &&
        loaded.length == want.length &&
        loaded(0).numBits == want(0).numBits &&
        loaded(0).numHashes == want(0).numHashes
      if (ok) { shards = loaded; true } else false
    case None => false
  }

  if (shards == null) shards = freshShards()

  private def readSidecar(): Option[(Int, Array[FastBloom])] = {
    if (!Files.exists(bloomPath)) return None
    try {
      val bytes = Files.readAllBytes(bloomPath)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.getInt != SeenSet.Magic) None
      else {
        val tag = bb.getInt
        val n = bb.getInt
        val arr = Array.fill(n) {
          val len = bb.getInt
          val body = new Array[Byte](len)
          bb.get(body)
          FastBloom.fromBytes(body)
        }
        Some((tag, arr))
      }
    } catch { case _: Exception => None }
  }

  /** ONE job: per-partition partial shard arrays over `colName`, merged
    * executor-side via treeAggregate — exactly one array reaches the
    * driver. Returns None for an empty input.
    */
  private def aggShards(df: DataFrame, colName: String): Option[Array[FastBloom]] = {
    val items = math.max(1L, cfg.bloomExpectedItems / nShards)
    val fpp = cfg.bloomFpp
    val n = nShards
    val rows = df.select(col(colName)).queryExecution.toRdd
    val res = rows.treeAggregate(null.asInstanceOf[Array[FastBloom]])(
      (acc0, r) => {
        if (r.isNullAt(0)) acc0
        else {
          val acc = if (acc0 == null)
            Array.fill(n)(FastBloom.create(items, fpp))
          else acc0
          val bytes = r.getUTF8String(0).getBytes
          val s = if (n == 1) 0 else SeenSet.shardOf(bytes, n)
          acc(s).put(bytes)
          acc
        }
      },
      (a, b) =>
        if (a == null) b
        else if (b == null) a
        else { var i = 0; while (i < a.length) { a(i).orInPlace(b(i)); i += 1 }; a },
      depth = 2)
    Option(res)
  }

  /** Rebuild from the authoritative `seen` table (used on resume when the
    * checkpointed filter is missing or tagged with the wrong snapshot —
    * a stale filter over a newer seen set would wrongly mark rediscovered
    * URLs "definitely new").
    */
  def rebuildFrom(seen: DataFrame): Unit =
    aggShards(seen, "fingerprint").foreach(shards = _)

  /** Fold a round's new fingerprints into the persistent filter and
    * checkpoint it tagged with `snap` (atomic rename). MUST be called
    * before the store commits snapshot `snap` — see class scaladoc.
    * Callers that already know the delta row count (observed metric)
    * pass it to skip the empty-delta probe job.
    */
  def update(seenDelta: DataFrame, snap: Int, knownCount: Long = -1L): Unit = {
    if (!(knownCount == 0L || (knownCount < 0L && seenDelta.isEmpty)))
      aggShards(seenDelta, "fingerprint").foreach { delta =>
        var i = 0
        while (i < shards.length) { shards(i).orInPlace(delta(i)); i += 1 }
      }
    writeSidecar(snap)
  }

  private def writeSidecar(snap: Int): Unit = {
    Files.createDirectories(bloomPath.getParent)
    val tmp = bloomPath.resolveSibling("seen.bloom.tmp")
    val bodies = shards.map(_.toBytes)
    val bb = java.nio.ByteBuffer.allocate(12 + bodies.map(_.length + 4).sum)
    bb.putInt(SeenSet.Magic).putInt(snap).putInt(shards.length)
    bodies.foreach { b => bb.putInt(b.length); bb.put(b) }
    Files.write(tmp, bb.array())
    Files.move(tmp, bloomPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The exact-authority side of the anti-join. With a [[SeenSet.Pruner]]
    * (prefix-partitioned compact base, SnapshotStore.readPrefixPruned) the
    * join reads ONLY the fingerprint-prefix partitions the Bloom-positive
    * candidates actually touch — at a 10^10-row seen table the full-table
    * shuffle this replaces is the single largest recurring cost of a
    * steady-state round. The prefix set costs one tiny extra job over the
    * (cached) candidates; when it covers ≥ 3/4 of the prefix space the
    * pruned read would not beat the full scan, so fall back. EXACTNESS:
    * the pruned read returns every committed row whose prefix is probed
    * (base partitioning is total on the prefix; deltas are read whole),
    * so the anti-join drops exactly the same candidates either way.
    */
  private def exactSide(maybeSeen: DataFrame, seen: DataFrame,
      pruner: Option[SeenSet.Pruner]): DataFrame =
    pruner match {
      case Some(p) if p.prefixLen > 0 =>
        val space = 1 << (4 * math.min(7, p.prefixLen)) // hex chars
        val pfx = maybeSeen
          .select(substring(col("fingerprint"), 1, p.prefixLen).as("_p"))
          .distinct().collect().map(_.getString(0)).toSeq
        if (pfx.length.toLong * 4 >= space.toLong * 3) seen
        else p.read(pfx)
      case _ => seen
    }

  /** candidates minus seen; `candidates` must carry `fingerprint`. */
  def filterNew(candidates: DataFrame, seen: DataFrame,
      pruner: Option[SeenSet.Pruner] = None)(
      implicit spark: SparkSession): DataFrame = {
    if (nShards == 1) {
      val bc = spark.sparkContext.broadcast(shards(0))
      // native codegen'd probe over the UTF8String bytes in place — no
      // per-row String decode/encode (see BloomProbeExpressions)
      val mightContain = graft.functions.BloomProbe.mightContain(bc, col("fingerprint"))
      val definitelyNew = candidates.filter(!mightContain)
      val maybeSeen = candidates.filter(mightContain)
      // exact authority for the (few) Bloom hits
      definitelyNew.unionByName(
        maybeSeen.join(exactSide(maybeSeen, seen, pruner).select("fingerprint"),
          Seq("fingerprint"), "left_anti"))
    } else {
      // sharded: co-partition candidates with the shard function, so each
      // task probes (and each executor fetches) exactly one shard
      // broadcast; shard id travels as a COLUMN — plan reorderings can
      // only cost locality, never correctness
      val bcs = shards.map(spark.sparkContext.broadcast(_))
      val n = nShards
      val sharded = candidates
        .withColumn("_shard", pmod(hash(col("fingerprint")), lit(n)))
        .repartition(n, col("fingerprint"))
      // lazy per-task shard resolution keeps the one-broadcast-per-task
      // residency bound (see ShardedFastBloomMightContain)
      val probe = graft.functions.BloomProbe.mightContainSharded(
        bcs, col("fingerprint"), col("_shard"))
      val definitelyNew = sharded.filter(!probe)
      val maybeSeen = sharded.filter(probe)
      definitelyNew.unionByName(
        maybeSeen.join(exactSide(maybeSeen, seen, pruner).select("fingerprint"),
          Seq("fingerprint"), "left_anti"))
        .drop("_shard")
    }
  }
}

object SeenSet {
  /** sidecar header magic ("GSB4" — graft seen bloom v4: shard count +
    * per-shard FastBloom bodies, self-describing sizing; older magics
    * fail the check and trigger a rebuild).
    */
  private[dedup] val Magic: Int = 0x47534234

  /** THE shard function — the single JVM-side definition of Spark's
    * `HashPartitioning` pid for a UTF-8 fingerprint. Must stay equal to
    * the column expression `pmod(hash(col("fingerprint")), lit(n))`
    * (murmur3 seed 42, positive mod) used in [[SeenSet.filterNew]]'s
    * sharded regime: the sharded-equivalence test in CrawlSpec is the
    * drift detector. Lives in the companion so executor closures don't
    * capture (and serialize) the filter-holding SeenSet instance.
    */
  private[dedup] def shardOf(bytes: Array[Byte], n: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42)
    ((h % n) + n) % n
  }

  /** Prefix-pruned access to the committed seen table (see
    * [[SeenSet.filterNew]]): `read(prefixes)` must return every committed
    * row whose fingerprint starts with one of `prefixes` (supersets are
    * fine — extra rows can only drop candidates that ARE seen).
    * Store-backed: `SnapshotStore.readPrefixPruned("seen", _)`.
    */
  final case class Pruner(prefixLen: Int, read: Seq[String] => org.apache.spark.sql.DataFrame)
}
