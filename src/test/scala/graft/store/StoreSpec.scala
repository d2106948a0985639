package graft.store

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SnapshotStore prefix-layout lifecycle: marker set/cleared by compact,
  * reads identical across layouts, pruned reads exact with deltas and
  * with combined retain/rewrite, empty-prefix read = deltas only.
  */
class StoreSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def freshStore(): SnapshotStore =
    new SnapshotStore(Files.createTempDirectory("store").toString, spark)

  private def rows(n: Int, tag: String): Seq[(String, String, Int)] =
    (0 until n).map { i =>
      val fp = graft.url.Urls.sha1Hex(s"$tag-$i")
      (fp, s"http://$tag$i.onion/", i)
    }

  test("prefix compact: marker lifecycle, read equality, pruned exactness incl. deltas") {
    val st = freshStore()
    val base = rows(64, "a").toDF("fingerprint", "url", "first_round")
    st.commit(0, Map.empty, Map("seen" -> base))
    assert(st.prefixInfo("seen").isEmpty)

    st.compact(1, "seen", Seq("fingerprint"), buckets = 4,
      hashPrefix = Some(("fingerprint", 2)))
    assert(st.prefixInfo("seen").contains(("fingerprint", 2)))
    val afterCompact = st.read("seen").as[(String, String, Int)].collect().toSet
    assert(afterCompact == rows(64, "a").toSet)
    // names+types identical (nullability relaxes through the parquet
    // round-trip, as for every store table); no _pfx column leaks
    assert(st.read("seen").schema.map(f => (f.name, f.dataType)) ==
      base.schema.map(f => (f.name, f.dataType)))

    // delta appended AFTER the prefix compact: pruned read must include
    // ALL delta rows regardless of their prefix
    val delta = rows(16, "b").toDF("fingerprint", "url", "first_round")
    st.commit(2, Map.empty, Map("seen" -> delta))
    val all = rows(64, "a").toSet ++ rows(16, "b").toSet
    assert(st.read("seen").as[(String, String, Int)].collect().toSet == all)

    val somePfx = rows(64, "a").map(_._1.take(2)).distinct.sorted.take(4)
    val pruned = st.readPrefixPruned("seen", somePfx).get
      .as[(String, String, Int)].collect().toSet
    // exact: every base row with a probed prefix + every delta row
    val want = rows(64, "a").filter(r => somePfx.contains(r._1.take(2))).toSet ++
      rows(16, "b").toSet
    assert(pruned == want)
    // empty prefix list → deltas only
    assert(st.readPrefixPruned("seen", Seq.empty).get
      .as[(String, String, Int)].collect().toSet == rows(16, "b").toSet)

    // plain compact clears the marker and flattens the layout
    st.compact(3, "seen", Seq("fingerprint"), buckets = 4)
    assert(st.prefixInfo("seen").isEmpty)
    assert(st.readPrefixPruned("seen", somePfx).isEmpty)
    assert(st.read("seen").as[(String, String, Int)].collect().toSet == all)

    // time travel: the old prefix-partitioned snapshot still reads whole
    assert(st.readAt("seen", 1).as[(String, String, Int)].collect().toSet ==
      rows(64, "a").toSet)
  }

  test("prefix compact composes with retain + rewrite") {
    val st = freshStore()
    val base = rows(40, "c").toDF("fingerprint", "url", "first_round")
    st.commit(0, Map.empty, Map("seen" -> base))
    st.compact(1, "seen", Seq("fingerprint"), buckets = 2,
      retain = Some(col("first_round") >= 10),
      rewrite = Some(df => df.withColumn("first_round", col("first_round") + 100)),
      hashPrefix = Some(("fingerprint", 2)))
    val got = st.read("seen").as[(String, String, Int)].collect().toSet
    val want = rows(40, "c").filter(_._3 >= 10)
      .map { case (f, u, r) => (f, u, r + 100) }.toSet
    assert(got == want)
    // pruned read sees the rewritten rows
    val pfx = want.map(_._1.take(2)).toSeq.sorted.take(2)
    val pruned = st.readPrefixPruned("seen", pfx).get
      .as[(String, String, Int)].collect().toSet
    assert(pruned == want.filter(r => pfx.contains(r._1.take(2))))
  }

  test("commit rejects a table appearing in both overwrite and append") {
    // the solo path would aim two writeUnion overwrites at one dir and
    // silently clobber — the guard makes the contradiction loud
    val st = freshStore()
    val df = rows(4, "x").toDF("fingerprint", "url", "first_round")
    val e = intercept[IllegalArgumentException] {
      st.commit(0, overwrite = Map("seen" -> df), append = Map("seen" -> df))
    }
    assert(e.getMessage.contains("seen"))
  }
}
