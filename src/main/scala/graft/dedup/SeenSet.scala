package graft.dedup

import graft.model.CrawlConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{DataInputStream, DataOutputStream}
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
  * is merged into the persistent filter (`mergeInPlace`), then
  * checkpointed next to the snapshot manifests so resume does not re-scan
  * 10^10 rows to rebuild it.
  *
  * Crash consistency: the sidecar is TAGGED with the snapshot id it
  * corresponds to and written BEFORE the store flips `_latest` to that
  * snapshot. A filter AHEAD of the committed seen table (crash between
  * sidecar write and manifest flip) is safe — the extra fingerprints are
  * Bloom positives routed into the exact anti-join, which keeps them; a
  * filter BEHIND the seen table would produce false negatives that bypass
  * the anti-join, so any other tag mismatch forces `rebuildFrom(seen)`.
  */
final class SeenSet(cfg: CrawlConfig, stateDir: String, latestSnapshot: Option[Int]) {

  private val bloomPath: Path = Paths.get(stateDir, "seen.bloom")

  // identical (expectedItems, numBits) sizing everywhere (persistent
  // filter, per-round delta — whether via stat.bloomFilter or the
  // observed bloom_filter_agg — and rebuild): sketch mergeInPlace
  // requires the exact same bit width and hash count. Sizing goes through
  // clampedSizing so it matches what the NATIVE aggregate will build under
  // the session's runtime-Bloom limits (the aggregate silently Math.min's
  // against them — an unclamped driver-side create() here could never
  // merge an aggregate delta). CrawlLoop raises those confs from the
  // CrawlConfig so a deliberately large filter is honored, not clamped.
  private[dedup] val (expectedItems: Long, numBits: Long) =
    graft.functions.SketchExpressions.clampedSizing(
      cfg.bloomExpectedItems, cfg.bloomFpp)

  private var bloom: BloomFilter = null

  /** true iff a checkpointed filter valid for `latestSnapshot` AND the
    * current sizing was found (a sidecar written under different conf/cfg
    * sizing cannot merge with this run's deltas — treated as stale).
    */
  val loadedFromCheckpoint: Boolean = readSidecar() match {
    case Some((tag, items, bits, bf)) =>
      val latest = latestSnapshot.getOrElse(-1)
      // tag == latest: clean. tag == latest + 1: crash between sidecar
      // write and manifest flip — ahead-by-one, FP-safe (see scaladoc).
      val tagOk = tag == latest || tag == latest + 1
      if (tagOk && items == expectedItems && bits == numBits) {
        bloom = bf; true
      } else false
    case None => false
  }

  if (bloom == null) bloom = BloomFilter.create(expectedItems, numBits)

  private def readSidecar(): Option[(Int, Long, Long, BloomFilter)] = {
    if (!Files.exists(bloomPath)) return None
    val in = new DataInputStream(Files.newInputStream(bloomPath))
    try {
      val magic = in.readInt()
      if (magic != SeenSet.Magic) None
      else Some((in.readInt(), in.readLong(), in.readLong(), BloomFilter.readFrom(in)))
    } catch { case _: java.io.IOException => None } finally in.close()
  }

  /** Rebuild from the authoritative `seen` table (used on resume when the
    * checkpointed filter is missing or tagged with the wrong snapshot —
    * a stale filter over a newer seen set would wrongly mark rediscovered
    * URLs "definitely new").
    */
  def rebuildFrom(seen: DataFrame): Unit = {
    if (seen.isEmpty) return
    bloom = seen.stat.bloomFilter("fingerprint", expectedItems, numBits)
  }

  /** Merge a round's new fingerprints into the persistent filter and
    * checkpoint it tagged with `snap` (atomic rename). MUST be called
    * before the store commits snapshot `snap` — see class scaladoc.
    *
    * ONE two-stage aggregation job over the (cached) delta: partial
    * filters travel through the shuffle to a single final merge, so the
    * driver receives exactly one serialized filter. (Observing the
    * aggregate on the append write instead would ship one multi-MB
    * partial PER WRITE TASK as task results — measured >1 GB per round
    * at bench scale, over spark.driver.maxResultSize.) Callers that
    * already know the delta row count (observed metric) pass it to skip
    * the empty-delta probe job.
    *
    * An EMPTY delta still rewrites the sidecar under the new tag (no
    * Spark job, no merge): returning early would leave the tag one
    * snapshot behind after the manifest flips, forcing the next resume
    * into the full 10^10-row `rebuildFrom` scan the sidecar exists to
    * avoid.
    */
  def update(seenDelta: DataFrame, snap: Int, knownCount: Long = -1L): Unit = {
    if (knownCount == 0L || (knownCount < 0L && seenDelta.isEmpty)) {
      writeSidecar(snap)
      return
    }
    val bytes = seenDelta
      .coalesce(8) // bounds partial-filter count; narrow on the cache
      .select(graft.functions.SketchExpressions.bloom_agg(
        col("fingerprint"), cfg.bloomExpectedItems, cfg.bloomFpp).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    if (bytes != null) {
      bloom.mergeInPlace(
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
    }
    writeSidecar(snap)
  }

  private def writeSidecar(snap: Int): Unit = {
    Files.createDirectories(bloomPath.getParent)
    val tmp = bloomPath.resolveSibling("seen.bloom.tmp")
    val out = new DataOutputStream(Files.newOutputStream(tmp))
    try {
      out.writeInt(SeenSet.Magic)
      out.writeInt(snap)
      out.writeLong(expectedItems)
      out.writeLong(numBits)
      bloom.writeTo(out)
    } finally out.close()
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
  /** sidecar header magic ("GSB2" — graft seen bloom v2: records the
    * (items, bits) sizing so resume detects conf/cfg drift; a v1 sidecar
    * simply fails the magic check and triggers a rebuild).
    */
  private[dedup] val Magic: Int = 0x47534232
}
