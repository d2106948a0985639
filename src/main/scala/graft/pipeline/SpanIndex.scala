package graft.pipeline

import graft.store.SnapshotStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COMMITTED duplicate-span index — the incremental-maintenance path for
  * exact-substring dedup ([[Dedup.dupSpanRemoval]]), completing the
  * committed-index family (`pages_fts` for FTS, [[IvfIndex]] for ANN,
  * [[MinHashIndex]] for near-dup banding): at 10^10 docs the corpus-wide
  * window census is the expensive half of span dedup, so it must persist
  * as a snapshot table and accrete per batch, not recount inside every
  * call.
  *
  * One table in a [[SnapshotStore]]:
  *   - `dd_spans(wh, cnt, pfx)` — PARTIAL window-hash counts. Rows are
  *     per-batch partial sums; every reader aggregates `sum(cnt)` per
  *     `wh` before use, so [[append]]-ing a delta's counts is EXACTLY
  *     equivalent to a full rebuild over the union (integer sums are
  *     associative — set-equality, not a probabilistic claim). All
  *     partials of a hash share its `pfx`, so compaction co-locates
  *     them without needing a merging rewrite.
  *
  * Query path: [[dupSpanRemovalFor]] flags a NEW batch's windows against
  * the committed census at delta-sized cost — the committed side is read
  * prefix-pruned to the ≤ 16^[[PrefixLen]] hash-prefix dirs the delta
  * touches (plus post-compaction deltas in full), never a corpus rescan.
  * INGEST ORDER CONTRACT: flag the batch FIRST, [[append]] it after
  * (the [[StreamingDedup]] drain order) — the batch's own occurrences
  * enter the census via its delta counts, so calling [[append]] first
  * would double-count them.
  */
object SpanIndex {

  val SpansTable = "dd_spans"

  /** hash-prefix layout width: 16^2 = 256 partition dirs once
    * [[compactPrefix]] has run (the seen-table sizing convention).
    */
  val PrefixLen = 2

  /** THE wh → layout-prefix function — shared by the census rows
    * (layout key) and [[dupSpanRemovalFor]]'s pruned read (probe key),
    * so the two can never drift.
    */
  def pfxCol(wh: Column): Column =
    substring(md5(wh.cast("string")), 1, PrefixLen)

  private[graft] def censusRows(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, family: HashFamily): DataFrame =
    Dedup.windowHashes(
        docs.select(col(idCol).as("did"), Dedup.tokenSeq(col(textCol)).as("tk")),
        k, family)
      .groupBy(col("wh")).agg(count(lit(1)).as("cnt"))
      .withColumn("pfx", pfxCol(col("wh")))

  /** Full (re)build at snapshot `snap`. Only needed once; afterwards
    * [[append]] maintains the census.
    */
  def build(
      store: SnapshotStore, snap: Int, docs: DataFrame,
      idCol: String, textCol: String,
      k: Int = 8, family: HashFamily = HashFamily.XxHash64): Unit =
    store.commit(snap,
      overwrite = Map(SpansTable -> censusRows(docs, idCol, textCol, k, family)),
      append = Map.empty)

  /** Incremental maintenance: the DELTA's partial counts appended as
    * snapshot `snap`. The committed census is never rescanned.
    */
  def append(
      store: SnapshotStore, snap: Int, newDocs: DataFrame,
      idCol: String, textCol: String,
      k: Int = 8, family: HashFamily = HashFamily.XxHash64): Unit =
    store.commit(snap,
      overwrite = Map.empty,
      append = Map(SpansTable -> censusRows(newDocs, idCol, textCol, k, family)))

  /** Periodic maintenance: rewrite the accreted partial-count rows into
    * the hash-prefix layout so steady-state probes cost delta-sized I/O.
    * Partials of one hash land in one dir (pfx is a function of wh);
    * appends after a compaction stay correct — pruned reads always
    * include the un-partitioned deltas in full
    * (`SnapshotStore.readPrefixPruned`), exactly the seen-table
    * lifecycle.
    */
  def compactPrefix(store: SnapshotStore, snap: Int, buckets: Int = 32): Unit =
    store.compact(snap, SpansTable,
      sortCols = Seq("pfx", "wh"), buckets = buckets,
      hashPrefix = Some(("pfx", PrefixLen)))

  /** Duplicate-span removal for a NEW batch against the committed census
    * plus the batch itself: identical rows to
    * [[Dedup.dupSpanRemoval]](committed corpus ∪ batch) restricted to
    * the batch's ids (PipelineSpec pins the equality), at delta-sized
    * cost — the committed side reads only the ≤ 256 hash-prefix dirs
    * the batch's windows touch, semi-joins down to those hashes, and
    * the flag condition is `delta count + committed count >= 2`.
    */
  def dupSpanRemovalFor(
      store: SnapshotStore, newDocs: DataFrame, idCol: String,
      textCol: String, k: Int = 8,
      family: HashFamily = HashFamily.XxHash64): DataFrame = {
    val toks = newDocs.select(col(idCol).as("did"),
      Dedup.tokenSeq(col(textCol)).as("tk"))
    val wins = Dedup.windowHashes(toks, k, family)
    val deltaCnt = wins.groupBy(col("wh")).agg(count(lit(1)).as("dc"))
    // touched prefixes: bounded by 16^PrefixLen = 256 strings driver-side
    val prefixes = wins.select(pfxCol(col("wh")).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq
    // a store without the census table (shared store, nothing built yet)
    // reduces to an empty census — the inline operator over the batch
    // alone (advice fix, round 7)
    val committed =
      if (!store.latestSnapshot.exists(s => store.tablesAt(s).contains(SpansTable)))
        wins.select(col("wh"), lit(0L).as("cnt"), lit("").as("pfx")).limit(0)
      else store.readPrefixPruned(SpansTable, prefixes)
        .getOrElse(store.read(SpansTable))
    val commCnt = committed
      .join(deltaCnt.select(col("wh")), Seq("wh"), "left_semi")
      .groupBy(col("wh")).agg(sum(col("cnt")).as("cc"))
    val dup = deltaCnt.join(commCnt, Seq("wh"), "left")
      .filter(col("dc") + coalesce(col("cc"), lit(0L)) >= 2)
      .select("wh")
    Dedup.removeCovered(toks, wins.join(dup, Seq("wh"), "left_semi"), idCol, k)
  }
}
