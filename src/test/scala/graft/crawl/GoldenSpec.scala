package graft.crawl

import graft.SparkTestSession
import graft.queries.CrawlQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Frozen-golden replay (SURVEY.md §7 t2 / FIXTURES.md B5): the crawl
  * order and seen set of the fixture crawl are committed to
  * `src/test/resources/golden/` and byte-compared on every run — any
  * semantic drift in canonicalization, ordering, politeness, dedup or
  * tiering shows up as a diff here even if it is self-consistent.
  *
  * Regenerate intentionally with: GRAFT_REGEN_GOLDEN=1 sbt test
  * (then commit the diff consciously).
  */
class GoldenSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def currentCrawlLog: Seq[String] = {
    val st = CrawlQueries.store(spark)
    st.read("crawl_log").orderBy("seq")
      .select("seq", "round", "url", "host", "priority")
      .collect()
      .map(r => s"${r.getLong(0)}\t${r.getInt(1)}\t${r.getString(2)}\t${r.getString(3)}\t${r.getInt(4)}")
      .toSeq
  }

  private def currentSeen: Seq[String] = {
    val st = CrawlQueries.store(spark)
    st.read("seen").select("fingerprint").as[String].collect().sorted.toSeq
  }

  private def checkOrRegen(name: String, lines: Seq[String]): Unit = {
    val path = goldenDir.resolve(name)
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.createDirectories(goldenDir)
      val tmp = Files.createTempFile("golden", ".txt")
      Files.writeString(tmp, lines.mkString("\n") + "\n")
      Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
      info(s"regenerated $name (${lines.size} lines)")
    } else {
      assert(Files.exists(path),
        s"golden $name missing — run once with GRAFT_REGEN_GOLDEN=1")
      val expected = Files.readString(path).split("\n").filter(_.nonEmpty).toSeq
      assert(lines == expected,
        s"$name drifted: ${lines.size} vs ${expected.size} lines; first diff: " +
          lines.zipAll(expected, "<missing>", "<missing>")
            .find { case (a, b) => a != b }.getOrElse(("", "")))
    }
  }

  test("crawl_log matches the frozen golden exactly (order + content)") {
    checkOrRegen("crawl_log.tsv", currentCrawlLog)
  }

  test("seen fingerprint set matches the frozen golden exactly") {
    checkOrRegen("seen.txt", currentSeen)
  }
}
