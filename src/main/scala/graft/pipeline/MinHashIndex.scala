package graft.pipeline

import graft.store.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COMMITTED MinHash-LSH band index — the incremental-maintenance path
  * for near-duplicate detection, completing the committed-index family
  * (`pages_fts` for FTS, [[IvfIndex]] for ANN): at 10^10 docs the
  * signature pass over the corpus is the expensive half of MinHash
  * dedup, so it must persist as a snapshot table and accrete per batch,
  * not recompute inside every [[Dedup.minhashNearDups]] call.
  *
  * One table in a [[SnapshotStore]]:
  *   - `dd_bands(doc_id, band, band_hash)` — the LSH band buckets.
  *     Band rows are PER-DOC independent (each doc's signature depends
  *     only on its own shingles), so [[append]] of a delta is EXACTLY
  *     equivalent to a full [[build]] over the union — set equality,
  *     not a probabilistic claim (PipelineSpec pins committed ≡ inline
  *     byte-for-byte).
  *
  * Query paths:
  *   - [[candidatePairsFor]] joins a DELTA's bands against the whole
  *     committed index — the steady-state crawl shape: each new batch
  *     discovers its near-dups against 10^10 docs at delta-sized cost
  *     (equi join on (band, band_hash), never a corpus rescan);
  *   - [[nearDups]] verifies candidates with exact Jaccard, which
  *     semi-join-prunes the shingle explode to candidate docs only.
  */
object MinHashIndex {

  val BandsTable = "dd_bands"

  private def bandRows(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame =
    Dedup.lshBands(
      Dedup.minhashSignatures(docs, idCol, textCol, shingleK, numHashes),
      idCol, bands, numHashes / bands)

  /** Full (re)build at snapshot `snap`: the band table overwritten
    * atomically. Only needed once; afterwards [[append]] maintains it.
    */
  def build(
      store: SnapshotStore, snap: Int, docs: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit =
    store.commit(snap,
      overwrite = Map(BandsTable ->
        bandRows(docs, idCol, textCol, shingleK, numHashes, bands)),
      append = Map.empty)

  /** Incremental maintenance: band rows of the DELTA only, appended as
    * snapshot `snap`. The committed index is never rescanned.
    */
  def append(
      store: SnapshotStore, snap: Int, newDocs: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit =
    store.commit(snap,
      overwrite = Map.empty,
      append = Map(BandsTable ->
        bandRows(newDocs, idCol, textCol, shingleK, numHashes, bands)))

  /** All candidate pairs in the committed index (id_a < id_b). */
  def candidatePairs(store: SnapshotStore, idCol: String): DataFrame =
    Dedup.pairsFromBands(store.read(BandsTable), idCol)

  /** Candidate pairs TOUCHING the given delta ids — the per-batch query.
    * The probe side is the committed table semi-joined down to the delta
    * ids (a full band-table scan feeds that semi join — the scan is
    * unavoidable without an id-partitioned layout, but everything
    * DOWNSTREAM of it is delta-sized: the probe-vs-index equi join emits
    * only buckets a delta doc touches, so the expensive pair expansion
    * and verification scale with the delta, not the corpus).
    */
  def candidatePairsFor(
      store: SnapshotStore, deltaIds: DataFrame, idCol: String): DataFrame = {
    val banded = store.read(BandsTable)
    val probe = banded.join(
      deltaIds.select(col(idCol).as("did")),
      col(idCol) === col("did"), "left_semi")
    Dedup.pairsTouchingBands(probe, banded, idCol)
  }

  /** Near-dups with exact-Jaccard verification over `docs` texts:
    * identical rows to the inline [[Dedup.minhashNearDups]] with the
    * same parameters (the committed ≡ inline test), because the
    * committed band rows ARE the inline pass's band rows.
    */
  def nearDups(
      store: SnapshotStore, docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, tau: Double = 0.5): DataFrame =
    Dedup.exactJaccard(docs, candidatePairs(store, idCol), idCol, textCol, shingleK)
      .filter(col("jaccard") >= tau)
}
