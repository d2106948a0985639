package graft.pipeline

import graft.store.SnapshotStore
import org.apache.spark.sql.{Column, DataFrame}
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

  /** doc-id prefix-layout width: 16^2 = 256 partition dirs once
    * [[compactPrefix]] has run — the seen-table sizing convention
    * (`SnapshotStore.compact hashPrefix`).
    */
  val PrefixLen = 2

  /** THE doc-id → layout-prefix function — one definition shared by the
    * band rows (layout key) and [[candidatePairsFor]]'s pruned read
    * (probe key), so the two can never drift.
    */
  def pfxCol(id: Column): Column =
    substring(md5(id.cast("string")), 1, PrefixLen)

  private def bandRows(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame =
    Dedup.lshBands(
      Dedup.minhashSignatures(docs, idCol, textCol, shingleK, numHashes),
      idCol, bands, numHashes / bands)
      .withColumn("pfx", pfxCol(col(idCol)))

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

  /** Periodic maintenance: rewrite the accreted band table into the
    * doc-id-prefix partition layout (256 dirs at [[PrefixLen]] = 2) so
    * [[candidatePairsFor]]'s probe-side read prunes to the delta's
    * prefixes instead of scanning 10^10·bands rows. Appends after a
    * compaction stay correct — pruned reads always include the
    * un-partitioned deltas in full (`SnapshotStore.readPrefixPruned`),
    * exactly the seen-table lifecycle.
    */
  def compactPrefix(
      store: SnapshotStore, snap: Int, idCol: String, buckets: Int = 32): Unit =
    store.compact(snap, BandsTable,
      sortCols = Seq("pfx", idCol), buckets = buckets,
      hashPrefix = Some(("pfx", PrefixLen)))

  /** Candidate pairs TOUCHING the given delta ids — the per-batch query.
    * The probe side is the committed table semi-joined down to the delta
    * ids; when the table carries the [[compactPrefix]] layout, the scan
    * feeding that semi join reads ONLY the delta's prefix dirs (plus
    * post-compaction deltas), so the probe side is delta-sized end to
    * end. The INDEX side of the equi join still reads the whole table —
    * that join partner is irreducible without band_hash bucketing — but
    * it emits only buckets a delta doc touches, so pair expansion and
    * verification stay delta-sized.
    */
  def candidatePairsFor(
      store: SnapshotStore, deltaIds: DataFrame, idCol: String): DataFrame = {
    val banded = store.read(BandsTable)
    // delta prefixes: bounded by 16^PrefixLen = 256 strings on the driver
    val prefixes = deltaIds.select(pfxCol(col(idCol)).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq
    val probeSrc = store.readPrefixPruned(BandsTable, prefixes).getOrElse(banded)
    val probe = probeSrc.join(
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
