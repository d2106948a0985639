package graft.crawl

import graft.SparkTestSession
import graft.frontier.Politeness
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-safe golden sequencer must (a) equal the single-task
  * `row_number() OVER (ORDER BY <crawl order>)` definition bit-for-bit,
  * (b) run with NO single-partition exchange, and (c) produce the same
  * sequence at any partition count (range boundaries must not matter).
  */
class SequencerSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def schedule(n: Int, parts: Int) = {
    val rows = (0 until n).map { i =>
      (s"http://h${graft.url.Hashing.nonNeg(graft.url.Hashing.mix(i.toLong))}.onion/p$i",
        s"h${i % 37}.onion", i % 3, graft.url.Hashing.mix(i * 7L))
    }
    GoldenSeq.layout(rows.toDF("url", "host", "priority", "enqueue_seq"), parts)
  }

  private def reference(n: Int, seqBase: Long): Seq[(Long, String)] = {
    val rows = (0 until n).map { i =>
      (s"http://h${graft.url.Hashing.nonNeg(graft.url.Hashing.mix(i.toLong))}.onion/p$i",
        s"h${i % 37}.onion", i % 3, graft.url.Hashing.mix(i * 7L))
    }
    rows.toDF("url", "host", "priority", "enqueue_seq")
      .withColumn("seq", row_number().over(Window.orderBy(Politeness.Order: _*))
        .cast("long") + lit(seqBase))
      .select("seq", "url").as[(Long, String)].collect().sortBy(_._1).toSeq
  }

  test("sequence equals the global-window definition, at two partition counts") {
    val expect = reference(997, seqBase = 41L)
    for (parts <- Seq(3, 11)) {
      val sched = schedule(997, parts)
      val st = GoldenSeq.stats(sched, bloomItems = 2048)
      assert(st.total == 997)
      val got = GoldenSeq.assign(sched, st, round = 1, seqBase = 41L)
        .select("seq", "url").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == expect, s"sequence drifted at $parts partitions")
      sched.unpersist()
    }
  }

  test("no single-partition exchange anywhere in the sequencer plan") {
    val sched = schedule(997, 8)
    val st = GoldenSeq.stats(sched, bloomItems = 2048)
    val plan = GoldenSeq.assign(sched, st, 1, 0L).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-task stage:\n$plan")
    assert(st.counts.size > 1, "bench-shape input collapsed to one range")
    sched.unpersist()
  }

  test("sequence survives consumption inside a union (combined-write shape)") {
    // union members get renumbered task partition ids — the stored _pid
    // must keep the offsets correct (regression: TaskContext-based ids
    // produced duplicate/gapped sequences under the batched append write)
    val expect = reference(997, seqBase = 41L)
    val sched = schedule(997, 5)
    val st = GoldenSeq.stats(sched, bloomItems = 2048)
    val log = GoldenSeq.assign(sched, st, 1, 41L)
      .withColumn("_t", lit("crawl_log"))
    val other = spark.range(100)
      .selectExpr("concat('u', id) AS url").withColumn("_t", lit("x"))
    val got = other.unionByName(log, allowMissingColumns = true)
      .filter(col("_t") === "crawl_log")
      .select("seq", "url").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == expect, "sequence drifted when consumed through a union")
    sched.unpersist()
  }

  test("stats bloom covers every scheduled url (prefilter completeness)") {
    val sched = schedule(500, 4)
    val st = GoldenSeq.stats(sched, bloomItems = 1000)
    val urls = sched.select("url").as[String].collect()
    urls.foreach(u => assert(st.urlBloom.mightContainString(u)))
    sched.unpersist()
  }
}
