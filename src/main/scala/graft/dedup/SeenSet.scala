package graft.dedup

import graft.model.CrawlConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Two-phase URL-seen dedup (SURVEY.md §3.3 J2 — THE hot join at 10^10
  * rows):
  *
  *   phase 1 (optimization): a broadcast Bloom filter over all seen
  *     fingerprints pre-filters candidates on the map side — at a 10^10
  *     frontier the overwhelming majority of rediscovered URLs never
  *     reach the shuffle.
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
  * Delta filters are built by ONE RDD job over the (cached) delta:
  * per-partition partials `treeAggregate` into a single filter
  * EXECUTOR-SIDE (depth 2), so the driver receives exactly one filter
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
  * sidecar exists to avoid. The sidecar records its (numBits, numHashes)
  * sizing, so resume under a changed CrawlConfig detects the drift and
  * rebuilds instead of merging incompatible filters.
  */
final class SeenSet(cfg: CrawlConfig, stateDir: String, latestSnapshot: Option[Int]) {

  private val bloomPath: Path = Paths.get(stateDir, "seen.bloom")

  private def freshBloom(): FastBloom =
    FastBloom.create(cfg.bloomExpectedItems, cfg.bloomFpp)

  private var bloom: FastBloom = null

  /** true iff a checkpointed filter valid for `latestSnapshot` AND the
    * current cfg sizing was found.
    */
  val loadedFromCheckpoint: Boolean = readSidecar() match {
    case Some((tag, bf)) =>
      val latest = latestSnapshot.getOrElse(-1)
      // tag == latest: clean. tag == latest + 1: crash between sidecar
      // write and manifest flip — ahead-by-one, FP-safe (see scaladoc).
      val want = freshBloom()
      val ok = (tag == latest || tag == latest + 1) &&
        bf.numBits == want.numBits && bf.numHashes == want.numHashes
      if (ok) { bloom = bf; true } else false
    case None => false
  }

  if (bloom == null) bloom = freshBloom()

  private def readSidecar(): Option[(Int, FastBloom)] = {
    if (!Files.exists(bloomPath)) return None
    try {
      val bytes = Files.readAllBytes(bloomPath)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.getInt != SeenSet.Magic) None
      else {
        val tag = bb.getInt
        Some((tag, FastBloom.fromBytes(
          java.util.Arrays.copyOfRange(bytes, 8, bytes.length))))
      }
    } catch { case _: Exception => None }
  }

  /** ONE job: per-partition partial filters over `colName`, merged
    * executor-side via treeAggregate — exactly one filter reaches the
    * driver. Returns None for an empty input.
    */
  private def aggBloom(df: DataFrame, colName: String): Option[FastBloom] = {
    val items = cfg.bloomExpectedItems
    val fpp = cfg.bloomFpp
    val rows = df.select(col(colName)).queryExecution.toRdd
    val res = rows.treeAggregate(null.asInstanceOf[FastBloom])(
      (acc, r) => {
        if (r.isNullAt(0)) acc
        else {
          val bf = if (acc == null) FastBloom.create(items, fpp) else acc
          bf.put(r.getUTF8String(0).getBytes)
          bf
        }
      },
      (a, b) => if (a == null) b else if (b == null) a else a.orInPlace(b),
      depth = 2)
    Option(res)
  }

  /** Rebuild from the authoritative `seen` table (used on resume when the
    * checkpointed filter is missing or tagged with the wrong snapshot —
    * a stale filter over a newer seen set would wrongly mark rediscovered
    * URLs "definitely new").
    */
  def rebuildFrom(seen: DataFrame): Unit =
    aggBloom(seen, "fingerprint").foreach(bloom = _)

  /** Fold a round's new fingerprints into the persistent filter and
    * checkpoint it tagged with `snap` (atomic rename). MUST be called
    * before the store commits snapshot `snap` — see class scaladoc.
    * Callers that already know the delta row count (observed metric)
    * pass it to skip the empty-delta probe job.
    */
  def update(seenDelta: DataFrame, snap: Int, knownCount: Long = -1L): Unit = {
    if (!(knownCount == 0L || (knownCount < 0L && seenDelta.isEmpty)))
      aggBloom(seenDelta, "fingerprint").foreach(bloom.orInPlace)
    writeSidecar(snap)
  }

  private def writeSidecar(snap: Int): Unit = {
    Files.createDirectories(bloomPath.getParent)
    val tmp = bloomPath.resolveSibling("seen.bloom.tmp")
    val body = bloom.toBytes
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(SeenSet.Magic).putInt(snap).put(body)
    Files.write(tmp, bb.array())
    Files.move(tmp, bloomPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** candidates minus seen; `candidates` must carry `fingerprint`. */
  def filterNew(candidates: DataFrame, seen: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((fp: String) => fp != null && bc.value.mightContainString(fp))
    val definitelyNew = candidates.filter(!mightContain(col("fingerprint")))
    val maybeSeen = candidates.filter(mightContain(col("fingerprint")))
    // exact authority for the (few) Bloom hits
    definitelyNew.unionByName(
      maybeSeen.join(seen.select("fingerprint"), Seq("fingerprint"), "left_anti"))
  }
}

object SeenSet {
  /** sidecar header magic ("GSB3" — graft seen bloom v3: FastBloom body,
    * self-describing (numBits, numHashes); older magics fail the check
    * and trigger a rebuild).
    */
  private[dedup] val Magic: Int = 0x47534233
}
