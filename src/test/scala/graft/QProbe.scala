package graft

/** Ad-hoc query timing probe: `runMain graft.QProbe <sfDir> <reps> q1 q2 ...`
  * — warm run then `reps` timed runs per query, prints the min (the
  * window-robust statistic; BENCH/BASELINE.md protocol). `dd03_xx64`
  * names the production-family MinHash pipeline like Bench does.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    // mirror Bench's session shape so timings are table-comparable
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      val run: () => Unit = name match {
        case "dd03_xx64" => () =>
          graft.pipeline.Dedup.minhashNearDups(
            graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
            tau = 0.3).count()
        case "dd04_oldtok" => () => {
          // same-window A/B twin of dd04: SimHash over the interpreted
          // token composition instead of FastTokens
          import org.apache.spark.sql.functions._
          import graft.pipeline.{Dedup, HashFamily}
          val family = HashFamily.Md5
          val docs = graft.queries.PipelineQueries.docs(spark, sfDir)
          val tok = docs.select(col("doc_id"),
            explode(Dedup.tokens(col("text"))).as("t"))
            .withColumn("h", family.bitSource(col("t")))
          val votes = (0 until 64).map { j =>
            sum(when(family.bitAt(col("h"), j) === 1L, 1)
              .otherwise(-1)).as(s"b$j")
          }
          val sigs = tok.groupBy(col("doc_id"))
            .agg(votes.head, votes.tail: _*)
            .select(col("doc_id"),
              (0 until 64).map(j => when(col(s"b$j") > 0,
                shiftleft(lit(1L), j)).otherwise(lit(0L)))
                .reduce[org.apache.spark.sql.Column]((a, b) => a.bitwiseOR(b)).as("simhash"))
          val chunked = sigs.select(col("doc_id"), col("simhash"),
            posexplode(array((0 until 4).map(c =>
              shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*))
              .as(Seq("chunk", "chunk_val")))
          val a = chunked.as("a")
          val b = chunked.as("b")
          val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          a.join(b,
              col("a.chunk") === col("b.chunk") &&
                col("a.chunk_val") === col("b.chunk_val") &&
                col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
              hamming.as("hamming"))
            .distinct()
            .filter(col("hamming") <= 8)
            .orderBy(col("id_a"), col("id_b"))
            .count()
        }
        case "dd04_xx64" => () =>
          // production family: the fused SimHash64 signature stage
          graft.pipeline.Dedup.simhashNearDups(
            graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
            maxHamming = 8).count()
        case "dd04_xx64_composed" => () =>
          // A/B twin: identical pair stage, signature stage forced through
          // the exploded-votes composition (the executable spec)
          graft.pipeline.Dedup.simhashPairs(
            graft.pipeline.Dedup.simhashComposed(
              graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
              graft.pipeline.HashFamily.XxHash64),
            "doc_id", maxHamming = 8).count()
        case "dd12_xx64" => () =>
          // production family: xxhash64 window keys (Bench's
          // dd12_dupspan_xx64 series)
          graft.pipeline.Dedup.dupSpanRemoval(
            graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
            k = 8).count()
        case "ta04_xx64" => () =>
          // production family: the fused WinnowFp fingerprint stage
          graft.pipeline.TextAnalysis.winnowingFingerprint(
            graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text")
            .count()
        case "ta04_xx64_composed" => () =>
          // A/B twin: the interpreted window-minima composition under
          // the same production family
          graft.pipeline.TextAnalysis.winnowingFingerprintComposed(
            graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
            window = 4, family = graft.pipeline.HashFamily.XxHash64)
            .count()
        case n => () => SparkEntry.queries(n)(spark, sfDir).count()
      }
      run()
      val times = (1 to reps).map(_ => time(run()))
      println(f"QPROBE $name%-28s min=${times.min}%.3f all=[${times.map(t => f"$t%.3f").mkString(", ")}]")
    }
  }
}
