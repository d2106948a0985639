package graft.frontier

import graft.SparkTestSession
import graft.fixtures.SyntheticCorpus
import graft.model.CrawlConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Both robots-gate execution paths must be semantically identical and
  * keep the frontier shuffle-free (broadcast-only exchanges).
  */
class RobotsSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val cfg = CrawlConfig()
  private val rules = SyntheticCorpus.robotsLocal(60).toDS()

  private def frontier = (0L until 60L).flatMap { i =>
    Seq(
      (s"http://${SyntheticCorpus.hostName(i)}/", SyntheticCorpus.hostName(i)),
      (s"http://${SyntheticCorpus.hostName(i)}/private/area", SyntheticCorpus.hostName(i)),
      (s"http://${SyntheticCorpus.hostName(i)}/p1?a=1", SyntheticCorpus.hostName(i)))
  }.toDF("url", "host")

  test("broadcast-map path and join path produce identical gates") {
    val small = Robots.prepareBroadcastMap(rules, cfg)
    val big = Robots.prepareJoin(rules, cfg)
    val a = small(frontier).orderBy("url")
      .select("url", "robots_allowed", "crawl_delay").collect().toSeq
    val b = big(frontier).orderBy("url")
      .select("url", "robots_allowed", "crawl_delay").collect().toSeq
    assert(a == b)
    // the fixture denies /private on every 5th host — both paths see it
    assert(a.exists(r => !r.getBoolean(1)))
  }

  /** executedPlan under AQE is an AdaptiveSparkPlanExec LEAF — collect()
    * never descends into it, silently emptying any plan assertion. Pull
    * the current inner plan out first.
    */
  private def innerPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("neither path shuffles the frontier (its rows never cross an exchange)") {
    for (gate <- Seq(Robots.prepareBroadcastMap(rules, cfg), Robots.prepareJoin(rules, cfg))) {
      val plan = innerPlan(gate(frontier))
      // a shuffle on the (tiny, once-per-run) rules aggregation is fine;
      // a shuffle whose subtree contains the frontier leaf is not
      val offending = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if s.collectLeaves().exists(_.output.exists(_.name == "url")) => s
      }
      assert(offending.isEmpty, s"frontier shuffled:\n$plan")
    }
  }

  test("prepare() picks the path by rule count") {
    assert(Robots.prepare(rules, cfg, maxBroadcastRules = 1L << 20)
      .isInstanceOf[BroadcastMapGate])
    assert(Robots.prepare(rules, cfg, maxBroadcastRules = 1L)
      .isInstanceOf[JoinGate])
  }

  test("third regime (shuffle-hash above the broadcast-host bound): identical gate, SHJ plan") {
    // force the bound below the fixture's host count
    val shuffled = Robots.prepare(rules, cfg,
      maxBroadcastRules = 1L, maxBroadcastHosts = 1L)
    assert(shuffled match {
      case JoinGate(_, _, broadcastSide) => !broadcastSide
      case _                             => false
    })
    val want = Robots.prepareBroadcastMap(rules, cfg).apply(frontier)
      .orderBy("url").select("url", "robots_allowed", "crawl_delay").collect().toSeq
    val got = shuffled(frontier)
      .orderBy("url").select("url", "robots_allowed", "crawl_delay").collect().toSeq
    assert(got == want)
    // and it really is a shuffled hash join, not a silent 8GB broadcast
    val plan = innerPlan(shuffled(frontier))
    assert(plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isDefined, s"expected ShuffledHashJoin:\n$plan")
    assert(plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.isEmpty, s"unexpected broadcast:\n$plan")
  }
}
