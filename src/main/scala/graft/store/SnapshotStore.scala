package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped snapshot layer over Parquet + JSON manifests
  * (SURVEY.md §9.4 — `/opt/spark/jars` ships no Iceberg runtime, so this
  * implements the Iceberg semantics the engine relies on behind a small
  * surface that an Iceberg catalog implementation can replace verbatim:
  *
  *   - atomic snapshot commit: data files written first, then a manifest
  *     JSON listing every table's data directories is moved into place
  *     with an atomic rename; `_latest` is flipped last. A crashed commit
  *     leaves the previous snapshot intact (readers never see partials).
  *   - time travel: `readAt(table, snapshot)` reads the manifest of any
  *     retained snapshot.
  *   - append tables accumulate per-snapshot delta directories (like
  *     Iceberg appends adding data files); `compact` rewrites a table's
  *     deltas into one sorted directory and commits a manifest pointing
  *     at it (like a bin-pack rewrite + snapshot expiry).
  *
  * With a real Iceberg runtime, `commit` becomes `MERGE INTO`/append on
  * `spark.table("cat.db.t")` and the manifest handling disappears.
  */
final class SnapshotStore(val rootDir: String, spark: SparkSession) {

  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  private def manifestPath(snap: Int): Path = root.resolve(f"_snap-$snap%06d.json")
  private def latestPath: Path = root.resolve("_latest")

  def latestSnapshot: Option[Int] =
    if (Files.exists(latestPath)) Some(Files.readString(latestPath).trim.toInt) else None

  /** table -> list of data dirs (relative to root). */
  private def readManifest(snap: Int): Map[String, Seq[String]] = {
    val txt = Files.readString(manifestPath(snap))
    parseManifest(txt)
  }

  /** Commit snapshot `snap`: `overwrite` tables get a fresh dir replacing
    * prior ones; `append` tables add a delta dir to the prior list.
    * DataFrames are written (action) before any manifest metadata moves.
    */
  def commit(
      snap: Int,
      overwrite: Map[String, DataFrame],
      append: Map[String, DataFrame]): Unit = {
    val prev: Map[String, Seq[String]] =
      latestSnapshot.map(readManifest).getOrElse(Map.empty)

    val timing = sys.env.contains("GRAFT_TIMING")
    def timedWrite(t: String, rel: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(root.resolve(rel).toString)
      if (timing) println(f"[timing] snap=$snap%d write $t%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    val entries = scala.collection.mutable.Map[String, Seq[String]](prev.toSeq: _*)
    // overwrite tables first, sequentially: they sit atop the round's
    // cached intermediates and materialize them once for everyone
    overwrite.foreach { case (t, df) =>
      val rel = f"$t/snap-$snap%06d"
      timedWrite(t, rel, df)
      entries(t) = Seq(rel)
    }
    // append deltas are independent sinks over already-materialized
    // caches: submit them CONCURRENTLY so driver-side planning/codegen of
    // one write overlaps executor work of another (the driver is the
    // bottleneck between small stages, not the executors)
    // Sequential by default: measured on the 32-core sandbox, concurrent
    // delta writes oversubscribe the executor threads (8 jobs x 32-task
    // stages) and cost ~55% throughput at local[32]; they only help when
    // cores far exceed per-job parallelism. Opt in with GRAFT_PAR_COMMIT.
    if (!sys.env.contains("GRAFT_PAR_COMMIT")) {
      append.foreach { case (t, df) =>
        val rel = f"$t/delta-$snap%06d"
        timedWrite(t, rel, df)
        entries(t) = entries.getOrElse(t, Seq.empty) :+ rel
      }
    } else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = SnapshotStore.commitPool
      val futures = append.toSeq.map { case (t, df) =>
        val rel = f"$t/delta-$snap%06d"
        entries(t) = entries.getOrElse(t, Seq.empty) :+ rel
        Future(timedWrite(t, rel, df))
      }
      futures.foreach(Await.result(_, Duration.Inf))
    }

    val tmp = root.resolve(f"_snap-$snap%06d.json.tmp")
    Files.writeString(tmp, renderManifest(entries.toMap))
    Files.move(tmp, manifestPath(snap), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val tmpLatest = root.resolve("_latest.tmp")
    Files.writeString(tmpLatest, snap.toString)
    Files.move(tmpLatest, latestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(table: String): DataFrame =
    readAt(table, latestSnapshot.getOrElse(
      throw new IllegalStateException(s"no snapshot committed under $rootDir")))

  def readAt(table: String, snap: Int): DataFrame = {
    val dirs = readManifest(snap).getOrElse(table,
      throw new IllegalArgumentException(s"table $table absent in snapshot $snap"))
    spark.read.parquet(dirs.map(d => root.resolve(d).toString): _*)
  }

  def tablesAt(snap: Int): Set[String] = readManifest(snap).keySet

  /** Bin-pack an append table's deltas into one directory sorted by
    * `sortCols` (keeps the 10^10-row `seen` anti-join input clustered by
    * fingerprint — SURVEY.md §5 physical layout). Commits snapshot `snap`.
    */
  def compact(snap: Int, table: String, sortCols: Seq[String], buckets: Int): Unit = {
    val df = read(table)
    import org.apache.spark.sql.functions.col
    val rel = f"$table/compact-$snap%06d"
    df.repartitionByRange(buckets, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(root.resolve(rel).toString)
    val prev = latestSnapshot.map(readManifest).getOrElse(Map.empty)
    val entries = prev.updated(table, Seq(rel))
    val tmp = root.resolve(f"_snap-$snap%06d.json.tmp")
    Files.writeString(tmp, renderManifest(entries))
    Files.move(tmp, manifestPath(snap), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val tmpLatest = root.resolve("_latest.tmp")
    Files.writeString(tmpLatest, snap.toString)
    Files.move(tmpLatest, latestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // --- tiny hand-rolled JSON (flat {str: [str]} shape only) ---

  private def renderManifest(m: Map[String, Seq[String]]): String =
    m.toSeq.sortBy(_._1).map { case (t, dirs) =>
      "\"" + t + "\": [" + dirs.map(d => "\"" + d + "\"").mkString(", ") + "]"
    }.mkString("{\n  ", ",\n  ", "\n}\n")

  private def parseManifest(txt: String): Map[String, Seq[String]] = {
    val entryRx = """"([^"]+)"\s*:\s*\[([^\]]*)\]""".r
    val strRx = """"([^"]+)"""".r
    entryRx.findAllMatchIn(txt).map { m =>
      m.group(1) -> strRx.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
    }.toMap
  }
}

object SnapshotStore {
  /** Shared pool for concurrent append writes (bounded — each write is
    * itself a parallel Spark job).
    */
  private[store] lazy val commitPool =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        8,
        r => {
          val t = new Thread(r, "snapshot-commit")
          t.setDaemon(true)
          t
        }))
}
