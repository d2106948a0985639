package graft.dedup

import graft.model.CrawlConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
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
  * is aggregated into a per-round Bloom merged into the persistent one
  * (`mergeInPlace`), then checkpointed next to the snapshot manifests so
  * resume does not re-scan 10^10 rows to rebuild it.
  */
final class SeenSet(cfg: CrawlConfig, stateDir: String) {

  private val bloomPath: Path = Paths.get(stateDir, "seen.bloom")

  /** true iff a checkpointed filter was found on disk. */
  val loadedFromCheckpoint: Boolean = Files.exists(bloomPath)

  private var bloom: BloomFilter =
    if (loadedFromCheckpoint) {
      val in = Files.newInputStream(bloomPath)
      try BloomFilter.readFrom(in) finally in.close()
    } else BloomFilter.create(cfg.bloomExpectedItems, cfg.bloomFpp)

  /** Rebuild from the authoritative `seen` table (used on resume when the
    * checkpointed filter is missing — an EMPTY filter over a non-empty
    * seen set would wrongly mark everything "definitely new").
    */
  def rebuildFrom(seen: DataFrame): Unit = {
    if (seen.isEmpty) return
    // sized like the deltas so future mergeInPlace stays compatible; an
    // under-sized filter only raises FPP, never breaks correctness
    bloom = seen.stat.bloomFilter(
      "fingerprint", cfg.bloomExpectedItems, cfg.bloomFpp)
  }

  /** Merge a round's new fingerprints into the persistent filter and
    * checkpoint it (atomic rename — crash-safe alongside the manifest).
    */
  def update(seenDelta: DataFrame): Unit = {
    // empty delta: BloomFilterAggregate yields null (NPE in readFrom)
    if (seenDelta.isEmpty) return
    // must be sized identically to the persistent filter or mergeInPlace
    // rejects it (same bit width + hash count required)
    val delta = seenDelta.stat.bloomFilter(
      "fingerprint", cfg.bloomExpectedItems, cfg.bloomFpp)
    bloom.mergeInPlace(delta)
    Files.createDirectories(bloomPath.getParent)
    val tmp = bloomPath.resolveSibling("seen.bloom.tmp")
    val out = Files.newOutputStream(tmp)
    try bloom.writeTo(out) finally out.close()
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
